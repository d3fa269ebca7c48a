package graft.operators

import graft.SparkSuite
import graft.core.TypedTables
import org.apache.spark.sql.functions._

class TypedOpsSpec extends SparkSuite {

  test("every entity case class round-trips its table schema") {
    // .as[T] throws at analysis on any name/type mismatch; touching a
    // row exercises the full deserializer
    assert(TypedTables.region(spark, sf0001).head().r_regionkey >= 0)
    assert(TypedTables.nation(spark, sf0001).head().n_name.nonEmpty)
    assert(TypedTables.supplier(spark, sf0001).head().s_suppkey >= 0)
    assert(TypedTables.customer(spark, sf0001).head().c_custkey >= 0)
    assert(TypedTables.part(spark, sf0001).head().p_partkey >= 0)
    assert(TypedTables.orders(spark, sf0001).head().o_orderdate != null)
    assert(TypedTables.lineitem(spark, sf0001).head().l_shipdate != null)
    assert(TypedTables.events(spark, sf0001).head().ts != null)
    assert(TypedTables.documents(spark, sf0001).head().text != null)
    assert(TypedTables.embeddings(spark, sf0001).head().embedding.nonEmpty)
  }

  test("typed column filter still reaches the parquet scan") {
    val plan = TypedOps.q46TypedAgg(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_quantity,10.0)]"),
      s"filter not pushed:\n$plan")
  }

  test("typed Aggregator agrees with the DataFrame formulation") {
    val typed = TypedOps.q46TypedAgg(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val df = graft.core.Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") >= 10)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("s"),
        max("l_extendedprice").as("m"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(typed == df)
  }
}

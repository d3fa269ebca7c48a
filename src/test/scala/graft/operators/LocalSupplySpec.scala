package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Plan + differential checks for q62_local_supply (the TPC-H Q5
  * shape): the dimension side must broadcast and only the two fact
  * joins may shuffle — at 100 TB those are the exchanges you cannot
  * avoid, and any extra one is a regression.
  */
class LocalSupplySpec extends SparkSuite {

  test("dims broadcast; only fact joins and the final agg shuffle") {
    val df = AnalyticsOps.q62LocalSupply(spark, sf001)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
    // custkey join, orderkey join, group-by partials: nothing else
    assert(shuffles <= 3, s"expected <=3 hash exchanges, got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("revenue matches a driver recount") {
    val nations = Tables.nation(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    val regions = Tables.region(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    val asia = regions.filter(_._2 == "ASIA").map(_._1).toSet
    val nk = nations.filter(n => asia(n._3)).map(n => n._1 -> n._2).toMap
    val custNation = Tables.customer(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val suppNation = Tables.supplier(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val orderCust = Tables.orders(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) " +
          "as bigint)").as("rev_c"))
      .collect().foreach { r =>
        val cn = custNation(orderCust(r.getLong(0)))
        val sn = suppNation(r.getLong(1))
        if (cn == sn && nk.contains(sn)) {
          val (n, s) = agg.getOrElse(nk(sn), (0L, 0L))
          agg(nk(sn)) = (n + 1L, s + r.getLong(2))
        }
      }
    val got = AnalyticsOps.q62LocalSupply(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == agg.toMap, s"got $got\nwant $agg")
  }
}

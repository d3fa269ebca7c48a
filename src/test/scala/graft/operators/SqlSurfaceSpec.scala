package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Invariants for the modern-SQL surface (q50-q54) that the DuckDB
  * oracle can't express: plan shapes, sketch guarantees, differential
  * checks against independent in-Spark computations.
  */
class SqlSurfaceSpec extends SparkSuite {

  test("q50 xml roundtrip equals the direct parquet aggregate") {
    val viaXml = SqlSurfaceOps.q50XmlRoundtrip(spark, sf0001).collect()
    val direct = Tables.orders(spark, sf0001)
      .filter(col("o_orderkey") < 5000)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("sum_price"),
        max("o_orderkey").as("max_key"))
      .orderBy("o_orderpriority").collect()
    assert(viaXml.toSeq == direct.toSeq)
  }

  test("q51 lateral: 2 rows per region, counts non-increasing in-group") {
    val rows = SqlSurfaceOps.q51LateralTopn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (region, g) =>
      assert(g.length == 2, s"$region: expected top-2, got ${g.length}")
      assert(g.head._3 >= g.last._3, s"$region: counts out of order")
    }
  }

  test("q51 lateral decorrelates: no nested-loop-per-row plan") {
    val plan = SqlSurfaceOps.q51LateralTopn(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the correlated LIMIT must lower to a partitioned window group
    // limit, not a per-outer-row subquery re-execution
    assert(plan.contains("WindowGroupLimit"), s"no group-limit:\n$plan")
  }

  test("q52 recursive calendar: contiguous months, totals conserved") {
    val rows = SqlSurfaceOps.q52RecursiveCalendar(spark, sf0001).collect()
    val months = rows.map(_.getString(0))
    assert(months.length >= 12 && months.toSet.size == months.length)
    months.sliding(2).foreach { case Array(a, b) =>
      val Array(ay, am) = a.split("-").map(_.toInt)
      val Array(by, bm) = b.split("-").map(_.toInt)
      assert(ay * 12 + am + 1 == by * 12 + bm, s"gap between $a and $b")
    }
    val totalOrders = rows.map(_.getLong(1)).sum
    assert(totalOrders == Tables.orders(spark, sf0001).count())
  }

  test("q53 variant_get matches get_json_object field-for-field") {
    val diff = Tables.events(spark, sf0001)
      .withColumn("kv", expr("variant_get(parse_json(props), '$.k', 'int')"))
      .withColumn("kj", get_json_object(col("props"), "$.k").cast("int"))
      .filter(!(col("kv") <=> col("kj")))
      .count()
    assert(diff == 0L)
  }

  test("q54 count-min estimates >= truth, exact in collision-free regime") {
    val est = SqlSurfaceOps.q54CmsFreq(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted $k: ${est(k)} < $n")
      assert(est(k) == n, s"collision at width 2/eps: $k ${est(k)} != $n")
    }
  }
}

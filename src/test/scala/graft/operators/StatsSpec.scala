package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSuite {

  test("approx_count_distinct is within its 2% rsd bound of exact") {
    val rows = StatsOps.statApproxDistinctRaw(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cust").toDouble
      val approx = r.getAs[Long]("approx_cust").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.08,
        s"nation ${r.get(0)}: rel err $relErr (exact=$exact approx=$approx)")
    }
  }

  test("catalog stat_approx_distinct exports an all-true in-band flag") {
    val rows = StatsOps.statApproxDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_in_band"),
      s"nation ${r.get(0)} estimate out of band"))
  }

  test("catalog stat_approx_quantiles exports all-true in-band flags") {
    val rows = StatsOps.statApproxQuantiles(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_in_band"),
        s"${r.get(0)} p50 estimate out of band")
      assert(r.getAs[Boolean]("p95_in_band"),
        s"${r.get(0)} p95 estimate out of band")
    }
  }

  test("percentile_approx p50/p95 sit at the right rank of the exact sort") {
    val approx = StatsOps.statApproxQuantilesRaw(spark, sf001).collect()
      .map(r => (r.getString(0),
        r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Long]("n")))
    approx.foreach { case (prio, p50, p95, n) =>
      val vals = graft.core.Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === prio)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      // accuracy=10000 -> rank error <= n/10000; allow one extra rank slop
      val slop = math.max(2, n / 10000 + 1).toInt
      def rankOk(v: Double, q: Double): Boolean = {
        val lo = vals(math.max(0, (q * n).toInt - slop))
        val hi = vals(math.min(vals.length - 1, (q * n).toInt + slop))
        v >= lo - 0.01 && v <= hi + 0.01
      }
      assert(rankOk(p50, 0.5), s"$prio p50=$p50 outside rank window")
      assert(rankOk(p95, 0.95), s"$prio p95=$p95 outside rank window")
    }
  }

  test("HLL sketch union at region level matches exact distinct within 3%") {
    val approx = StatsOps.statHllUnionRaw(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("approx_region_cust"))).toMap
    val c = graft.core.Tables.customer(spark, sf001)
    val n = graft.core.Tables.nation(spark, sf001)
    val o = graft.core.Tables.orders(spark, sf001)
    val exact = o
      .join(c.select("c_custkey", "c_nationkey"),
        o("o_custkey") === c("c_custkey"))
      .join(n.select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(countDistinct("o_custkey").as("exact"))
      .collect().map(r => (r.getInt(0), r.getAs[Long]("exact"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (region, ex) =>
      val ap = approx(region).toDouble
      val relErr = math.abs(ap - ex) / ex
      assert(relErr <= 0.03,
        s"region $region: rel err $relErr (exact=$ex approx=$ap)")
    }
  }
}

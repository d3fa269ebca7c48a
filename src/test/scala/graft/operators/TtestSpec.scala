package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for stat_ttest against a textbook driver
  * computation of Welch's statistic.
  */
class TtestSpec extends SparkSuite {

  test("t and df match a driver Welch computation") {
    val vals = Tables.events(spark, sf001)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        expr("cast(cast(value as decimal(18,2)) as double)").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "purchase").map(_._2)
    val b = vals.filter(_._1 == "click").map(_._2)
    def meanVar(xs: Array[Double]): (Double, Double) = {
      val n = xs.length.toDouble
      val m = xs.sum / n
      (m, xs.map(x => (x - m) * (x - m)).sum / (n - 1) / n)
    }
    val (ma, va) = meanVar(a)
    val (mb, vb) = meanVar(b)
    val t = (ma - mb) / math.sqrt(va + vb)
    val df = (va + vb) * (va + vb) /
      (va * va / (a.length - 1) + vb * vb / (b.length - 1))

    val r = StatsOps.statTtest(spark, sf001).head()
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(math.abs(r.getDouble(2) - ma) < 1e-3, "mean_a")
    assert(math.abs(r.getDouble(3) - mb) < 1e-3, "mean_b")
    assert(math.abs(r.getDouble(4) - t) < 1e-3, s"t: ${r.getDouble(4)} vs $t")
    assert(math.abs(r.getDouble(5) - df) < 0.51, s"df: ${r.getDouble(5)} vs $df")
    // both dfs bracket between min(n)-1 and na+nb-2, as Welch requires
    assert(r.getDouble(5) >= math.min(a.length, b.length) - 1 &&
      r.getDouble(5) <= a.length + b.length - 2)
  }
}

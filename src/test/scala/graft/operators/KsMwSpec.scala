package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential checks for stat_ks_test and stat_mannwhitney against
  * textbook driver computations over the collected cents population —
  * independent of the window/decimal machinery the operators use
  * (ranks here come from an explicit sort + tie-averaging walk, the
  * ECDF sup from a scan over the merged support).
  */
class KsMwSpec extends SparkSuite {

  /** (cents, isPurchase) pairs at sf0.001 — a Seq, never a Map, so
    * duplicate cents values keep their multiplicity.
    */
  private lazy val pop: Seq[(Long, Boolean)] =
    Tables.events(spark, sf0001)
      .filter(col("event_type").isin("purchase", "click"))
      .select(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"),
        col("event_type") === "purchase")
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getBoolean(1)))

  test("ks_gap row 1 equals the driver sup|Fa - Fb| and cum counts check out") {
    val a = pop.filter(_._2).map(_._1).sorted
    val b = pop.filterNot(_._2).map(_._1).sorted
    val na = a.length.toDouble
    val nb = b.length.toDouble
    val support = (a ++ b).distinct.sorted
    def ecdf(xs: Seq[Long], t: Long): Double =
      xs.count(_ <= t).toDouble
    val gaps = support.map(t =>
      (t, math.abs(ecdf(a, t) / na - ecdf(b, t) / nb)))
    val dStat = gaps.map(_._2).max

    val rows = StatsOps.statKsTest(spark, sf0001).collect()
    assert(rows.length == math.min(10, support.length))
    val top = rows.head
    assert(math.abs(top.getDouble(3) - dStat) < 1e-6,
      s"ks_gap ${top.getDouble(3)} vs driver $dStat")
    // the reported threshold really attains the sup
    val atTop = gaps.find(_._1 == math.round(top.getDouble(0) * 100)).get
    assert(math.abs(atTop._2 - dStat) < 1e-12)
    // cum counts at the reported threshold match the driver ECDF counts
    assert(top.getLong(1) == a.count(_ <= atTop._1).toLong)
    assert(top.getLong(2) == b.count(_ <= atTop._1).toLong)
    // rows come back sorted by gap descending
    val ds = rows.map(_.getDouble(3)).toSeq
    assert(ds == ds.sortBy(-_))
  }

  test("u, auc and z match a driver average-rank computation") {
    val aCount = pop.count(_._2)
    val bCount = pop.size - aCount
    // explicit tie-averaged ranks over the pooled sorted population
    val sorted = pop.sortBy(_._1)
    var i = 0
    var rank = 1L
    var ra = 0.0
    val tieCubes = scala.collection.mutable.ArrayBuffer.empty[Double]
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val t = (j - i).toDouble
      val avg = (rank + (rank + (j - i) - 1)) / 2.0
      ra += sorted.slice(i, j).count(_._2) * avg
      tieCubes += t * t * t - t
      rank += j - i
      i = j
    }
    val u = ra - aCount.toDouble * (aCount + 1) / 2.0
    val n = (aCount + bCount).toDouble
    val tieT = tieCubes.sum
    val varU = aCount.toDouble * bCount / 12.0 *
      ((n + 1) - tieT / (n * (n - 1)))
    val z = (u - aCount.toDouble * bCount / 2.0) / math.sqrt(varU)

    val r = StatsOps.statMannWhitney(spark, sf0001).head()
    assert(r.getLong(0) == aCount.toLong && r.getLong(1) == bCount.toLong)
    assert(math.abs(r.getDouble(2) - u) < 1e-6,
      s"u_a ${r.getDouble(2)} vs driver $u")
    assert(math.abs(r.getDouble(3) - u / (aCount.toDouble * bCount)) < 1e-5)
    assert(math.abs(r.getDouble(4) - z) < 1e-3,
      s"z ${r.getDouble(4)} vs driver $z")
    // auc stays a probability
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }
}

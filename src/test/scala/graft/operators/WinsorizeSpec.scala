package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for stat_winsorize: the percentile_disc band and
  * the clamped sum must match a by-definition driver computation
  * (smallest value whose cume_dist >= p; SQL-standard percentile_disc).
  */
class WinsorizeSpec extends SparkSuite {

  test("band edges and winsorized sums match the definition") {
    val bals = Tables.customer(spark, sf001)
      .select(col("c_mktsegment"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("bal_c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }

    def disc(sorted: Seq[Long], p: Double): Long =
      // smallest value v with cume_dist(v) >= p  ==  element at
      // ceil(p * n) - 1 (0-based) of the sorted sequence
      sorted(math.ceil(p * sorted.length).toInt - 1)

    val got = StatsOps.statWinsorize(spark, sf001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap

    assert(got.keySet == bals.keySet)
    bals.foreach { case (seg, xs) =>
      val (p05, p95) = (disc(xs, 0.05), disc(xs, 0.95))
      val clamped = xs.map(b => math.min(math.max(b, p05), p95))
      val (gp05, gp95, n, nLo, nHi, sum) = got(seg)
      assert(gp05 == p05 && gp95 == p95, s"$seg band edges")
      assert(n == xs.length.toLong, s"$seg n")
      assert(nLo == xs.count(_ < p05).toLong, s"$seg n_lo")
      assert(nHi == xs.count(_ > p95).toLong, s"$seg n_hi")
      assert(sum == clamped.sum, s"$seg winsorized sum")
      // winsorizing pulls the sum toward the band: clamp count > 0 here
      assert(nLo > 0 && nHi > 0, s"$seg degenerate fixture")
    }
  }
}

package graft.operators

import graft.SparkSuite

/** Differential test for [[StatsOps.statGini]]: recompute the Gini
  * coefficient of each population from first principles — the mean
  * absolute difference definition G = ΣᵢΣⱼ|xᵢ−xⱼ| / (2n²μ), O(n²) on
  * the sf0.001 fixture — and compare against the op's tied-rank
  * identity. The two formulations agreeing pins the tie handling.
  */
class GiniSpec extends SparkSuite {

  test("stat_gini matches the mean-absolute-difference definition") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as long) as cents")
      .filter("event_type in ('purchase', 'click')")
      .collect().map(r => (r.getString(0), r.getLong(1)))

    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def giniMad(xs: Seq[Long]): Double = {
      val n = xs.length.toDouble
      val mu = xs.sum.toDouble / n
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b).toDouble).sum
      mad / (2 * n * n * mu)
    }

    val rows = StatsOps.statGini(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    for (tag <- Seq("purchase", "click")) {
      val xs = ev.filter(_._1 == tag).map(_._2).toSeq
      val (n, mean, gini) = rows(tag)
      assert(n == xs.length.toLong, s"$tag n")
      assert(math.abs(mean - rnd(xs.sum.toDouble / xs.length / 100, 4))
        < 1e-9, s"$tag mean")
      assert(math.abs(gini - giniMad(xs)) < 1e-6, s"$tag gini")
      assert(gini >= 0.0 && gini < 1.0, s"$tag gini range")
    }
    // the fixture must contain tied cents values, or the tied-rank
    // identity is untested
    assert(ev.groupBy(identity).exists(_._2.length > 1), "no ties")
  }
}

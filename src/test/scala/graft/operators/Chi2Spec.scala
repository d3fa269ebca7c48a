package graft.operators

import graft.SparkSuite

/** Differential test for [[StatsOps.statChi2Independence]]: recompute
  * the full per-cell chi-square decomposition of the (lang, source)
  * contingency in plain driver-side Scala from raw counts and compare
  * row-for-row, plus pin the chi-square invariants (marginals add up,
  * expected sums to n, cell terms non-negative).
  */
class Chi2Spec extends SparkSuite {

  test("stat_chi2_independence matches a driver recompute") {
    val pairs = graft.core.Tables.documents(spark, sf0001)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))

    val o = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = pairs.length.toLong

    def rnd4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    // full densified contingency: zero cells included
    val expected = (for {
      lang <- r.keys.toSeq
      source <- c.keys.toSeq
    } yield {
      val obs = o.getOrElse((lang, source), 0L)
      val e = r(lang).toDouble * c(source).toDouble / n.toDouble
      (lang, source, obs, r(lang), c(source), rnd4(e),
        rnd4((obs.toDouble - e) * (obs.toDouble - e) / e))
    }).sortBy(t => (t._1, t._2))

    val got = StatsOps.statChi2Independence(spark, sf0001).collect().map {
      row => (row.getString(0), row.getString(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getDouble(5), row.getDouble(6))
    }.toSeq

    assert(got == expected)
    // invariants: each lang's observed cells sum to its marginal, and
    // the expected counts sum back to n (within float tolerance)
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum == rows.head._4, s"marginal of $lang")
    }
    assert(math.abs(got.map(_._6).sum - n.toDouble) < 1e-6)
    assert(got.forall(_._7 >= 0.0))
  }
}

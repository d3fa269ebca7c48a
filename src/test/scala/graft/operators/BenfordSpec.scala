package graft.operators

import graft.SparkSuite

/** Differential test for [[StatsOps.statBenford]]: recompute the
  * first-digit census and per-digit chi-square on the driver from raw
  * values and compare, plus pin the invariants (observed masses sum
  * to ~1e6, every digit 1-9 present in the spine, expected masses are
  * the Benford constants).
  */
class BenfordSpec extends SparkSuite {

  test("stat_benford matches a driver recompute") {
    val cents = graft.core.Tables.events(spark, sf0001)
      .selectExpr("cast(floor(value * 100 + 0.5) as long) as c")
      .filter("c >= 1")
      .collect().map(_.getLong(0))
    val digit = cents.map(c => c.toString.charAt(0) - '0')
    val n = digit.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = digit.length.toLong
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def expE6(d: Int) = math.round(math.log10(1.0 + 1.0 / d) * 1e6)

    val expected = (1 to 9).map { d =>
      val c = n.getOrElse(d, 0L)
      val e = tot.toDouble * expE6(d) / 1e6
      (d, c, (c * 1000000L + tot / 2) / tot, expE6(d),
        rnd4((c - e) * (c - e) / e))
    }

    val got = StatsOps.statBenford(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq

    assert(got == expected)
    // masses: observed e6 fixed-point sums to 1e6 within rounding slack
    assert(math.abs(got.map(_._3).sum - 1000000L) <= 9)
    assert(math.abs(got.map(_._4).sum - 1000000L) <= 9)
    assert(got.map(_._2).sum == tot)
  }
}

package graft.operators

import graft.SparkSuite

/** Differential test for [[StatsOps.statOlsTrend]]: recompute the
  * per-type daily-revenue OLS in exact BigInt driver arithmetic
  * (slope via the same truncating integer division, r² via the same
  * double display rule) and compare every row.
  */
class StatOlsTrendSpec extends SparkSuite {

  test("stat_ols_trend matches a driver closed-form recompute") {
    val dayUs = 86400L * 1000000L
    val ev = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val day0 = ev.map(_._2 / dayUs).min
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, xs) =>
        val daily = xs.groupBy(_._2 / dayUs).toSeq
          .map { case (d, ys) => (BigInt(d - day0), BigInt(ys.map(_._3).sum)) }
        val n = BigInt(daily.length)
        val sx = daily.map(_._1).sum
        val sy = daily.map(_._2).sum
        val sxy = daily.map(p => p._1 * p._2).sum
        val sxx = daily.map(p => p._1 * p._1).sum
        val syy = daily.map(p => p._2 * p._2).sum
        val covN = n * sxy - sx * sy
        val varX = n * sxx - sx * sx
        val varY = n * syy - sy * sy
        val slopeE6 = (covN * 1000000) / varX // BigInt / truncates like div
        val r2 = BigDecimal(
          covN.toDouble * covN.toDouble / (varX.toDouble * varY.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, daily.length.toLong, daily.map(_._2).sum.toLong,
          slopeE6.toLong, r2)
    }
    val got = StatsOps.statOlsTrend(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
  }
}

package graft.streaming

import graft.SparkSuite

/** Differential test for [[EventWindows.forecastBaseline]]: rebuild
  * the densified per-type hourly grid on the driver, score every hour
  * with the lag-1 and lag-24 baselines, and compare the exact MAE
  * table.
  */
class ForecastBaselineSpec extends SparkSuite {

  test("ev_forecast_baseline matches a driver recompute") {
    val hourUs = 3600L * 1000000L
    val rows = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", s"unix_micros(ts) div $hourUs as h")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = rows.groupBy(_._1)
    val globalMax = rows.map(_._2).max
    val expected = byType.toSeq.map { case (t, xs) =>
      val counts = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val h0 = xs.map(_._2).min
      val grid = (h0 to globalMax).map(h => counts.getOrElse(h, 0L))
      val scored = (24 until grid.length).map { i =>
        (math.abs(grid(i) - grid(i - 1)), math.abs(grid(i) - grid(i - 24)))
      }
      val ns = scored.length.toLong
      val ae1 = scored.map(_._1).sum
      val ae24 = scored.map(_._2).sum
      (t, ns, (ae1 * 10000L + ns / 2) / ns, (ae24 * 10000L + ns / 2) / ns,
        ae24 < ae1)
    }.sortBy(_._1)

    val got = EventWindows.forecastBaseline(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq

    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._2 > 0))
  }
}

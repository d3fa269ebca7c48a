package graft.streaming

import graft.SparkSuite
import graft.core.Tables

/** Differential check for ev_gap_stats: the whole statistic re-derived
  * on the driver from the raw sf0.001 events (a few thousand rows) must
  * match the distributed window+agg exactly — gaps are integer micros,
  * so there is no tolerance, including the med2 doubling trick.
  */
class GapStatsSpec extends SparkSuite {

  test("gap stats match a driver-side recomputation exactly") {
    val raw = Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) as us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

    // per-user ordered (ts, event_id) stream -> consecutive gaps keyed
    // by the LATER event's type (the operator's documented convention)
    val gaps = raw.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      sorted.sliding(2).collect {
        case Array(prev, cur) => (cur._3, cur._4 - prev._4)
      }
    }.toSeq

    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val expect = gaps.groupBy(_._1).view.mapValues { g =>
      val v = g.map(_._2)
      (v.length.toLong, med2(v), v.min, v.max, v.sum)
    }.toMap

    val got = EventWindows.gapStats(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      .toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (k, v) => assert(v == expect(k), s"mismatch at $k") }

    // every user contributes (events - 1) gaps: nothing dropped/double-counted
    val nUsers = raw.map(_._1).distinct.length
    assert(got.values.map(_._1).sum == raw.length - nUsers)
  }
}

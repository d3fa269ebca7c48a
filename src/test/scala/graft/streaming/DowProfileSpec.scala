package graft.streaming

import graft.SparkSuite

/** Differential test for [[EventWindows.dowProfile]]: recompute the
  * (type × weekday) census and lifts on the driver, pin the epoch
  * anchor (1970-01-01 is a Thursday → dow 3 under the Monday=0
  * convention), and the lift identity Σ n·lift ≈ 7e6·n_type within
  * truncation.
  */
class DowProfileSpec extends SparkSuite {

  test("ev_dow_profile matches a driver recompute") {
    val dayUs = 86400L * 1000000L
    val ev = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def dow(us: Long): Long = (us / dayUs + 3) % 7
    assert(dow(0L) == 3, "epoch anchor: 1970-01-01 must be Thursday")
    val expected = ev.groupBy(e => (e._1, dow(e._2))).toSeq
      .map { case ((t, d), xs) =>
        val nType = ev.count(_._1 == t).toLong
        (t, d, xs.length.toLong, xs.map(_._3).sum,
          xs.length.toLong * 7000000L / nType)
      }
      .sortBy(t => (t._1, t._2))
    val got = EventWindows.dowProfile(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // lift identity: Σ_dow lift = Σ n_d·7e6/n_type = 7e6, up to one
    // truncation unit per weekday
    got.groupBy(_._1).foreach { case (t, rows) =>
      val liftSum = rows.map(_._5).sum
      assert(math.abs(liftSum - 7000000L) <= 7,
        s"$t lift sum $liftSum drifted from 7e6")
    }
  }
}

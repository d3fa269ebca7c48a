package graft.streaming

import graft.SparkSuite

/** Differential test for [[EventWindows.holtWinters]]: replay the
  * exact e6 integer Holt-Winters recursion in plain Scala from the
  * raw fixture — independent of both the Spark HOF and the DuckDB
  * recursive CTE, which could share an algorithmic bug.
  */
class HoltWintersSpec extends SparkSuite {

  test("ev_holt_winters matches a driver recompute at sf0.001") {
    val dayUs = 86400L * 1000000L
    val rows = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(ts) as us").collect()
      .map(r => (r.getString(0), r.getLong(1) / dayUs))
    val dmax = rows.map(_._2).max
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (et, rs) =>
        val byDay = rs.groupBy(_._2).view.mapValues(_.size.toLong)
        val d0 = rs.map(_._2).min
        val ys = (d0 to dmax).map(d => byDay.getOrElse(d, 0L))
        if (ys.size < 14) Seq.empty
        else {
          val w1 = ys.slice(0, 7).sum
          val w2 = ys.slice(7, 14).sum
          var l = w1 * 1000000L / 7
          var b = (w2 - w1) * 1000000L / 49
          var s = ys.slice(0, 7).map(_ * 1000000L - l).toVector
          ys.drop(7).foreach { y =>
            val lNew = (200000L * (y * 1000000L - s.head) +
              800000L * (l + b)) / 1000000L
            val bNew = (100000L * (lNew - l) + 900000L * b) / 1000000L
            val sNew = (300000L * (y * 1000000L - lNew) +
              700000L * s.head) / 1000000L
            l = lNew; b = bNew; s = s.tail :+ sNew
          }
          (1 to 7).map(h => (et, ys.size.toLong, l / 10000L, b / 10000L,
            h.toLong, (l + h * b + s(h - 1)) / 10000L))
        }
    }
    val got = EventWindows.holtWinters(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must span >= 14 days")
  }
}

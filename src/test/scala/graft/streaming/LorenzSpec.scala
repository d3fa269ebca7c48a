package graft.streaming

import graft.SparkSuite

/** Differential test for [[EventWindows.lorenzCurve]]: recompute the
  * per-user spend totals, the shared log-bucketing, and every
  * top-down cumulative share on the driver; plus the Lorenz
  * invariants (both cumulative shares are non-decreasing top-down and
  * end at 1e6; revenue share dominates user share at every point —
  * richer buckets first).
  */
class LorenzSpec extends SparkSuite {

  test("ev_lorenz_curve matches a driver recompute") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", "user_id",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def bucket(m: Long): Long = {
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(m)
      val shift = math.max(bits - 5, 0)
      shift.toLong * 32 + (m >> shift)
    }
    val census = ev.filter(_._1 == "purchase").groupBy(_._2).toSeq
      .map { case (_, xs) => bucket(xs.map(_._3).sum) -> xs.map(_._3).sum }
      .groupBy(_._1).toSeq
      .map { case (b, xs) => (b, xs.length.toLong, xs.map(_._2).sum) }
      .sortBy(-_._1)
    val totU = census.map(_._2).sum
    val totC = census.map(_._3).sum
    val expected = census
      .zip(census.scanLeft((0L, 0L)) { case ((u, c), r) =>
        (u + r._2, c + r._3)
      }.tail)
      .map { case ((b, nu, ct), (cu, cc)) =>
        (b, nu, ct, cu * 1000000L / totU, cc * 1000000L / totC)
      }
    val got = EventWindows.lorenzCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.last._4 == 1000000L && got.last._5 == 1000000L)
    got.foreach { case (_, _, _, up, cp) =>
      assert(cp >= up, "revenue share must dominate user share top-down")
    }
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._4 >= a._4 && b._5 >= a._5)
      case _ =>
    }
  }
}

package graft.streaming

import graft.SparkSuite

/** Differential test for [[EventWindows.cohortLtv]]: recompute the
  * cohort × week LTV matrix on the driver and compare every cell,
  * plus pin the matrix invariants (week_idx ≥ 0 — a purchase can
  * never precede its user's first event; per-cohort cumulative
  * revenue is the running sum of the cells).
  */
class CohortLtvSpec extends SparkSuite {

  test("ev_cohort_ltv matches a driver recompute") {
    val weekUs = 7L * 86400L * 1000000L
    val ev = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", "user_id", "unix_micros(ts) as us",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cohort = ev.groupBy(_._2).map { case (u, xs) =>
      u -> xs.map(_._3).min / weekUs
    }
    val cells = ev.filter(_._1 == "purchase")
      .map(e => ((cohort(e._2), e._3 / weekUs - cohort(e._2)), e))
      .groupBy(_._1).toSeq
      .map { case ((cw, wi), xs) =>
        (cw, wi, xs.map(_._2._2).distinct.size.toLong,
          xs.map(_._2._4).sum)
      }
      .sortBy(t => (t._1, t._2))
    val expected = cells.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(_._2)
      sorted.zip(sorted.scanLeft(0L)(_ + _._4).tail)
        .map { case ((cw, wi, nb, rev), cum) => (cw, wi, nb, rev, cum) }
    }.sortBy(t => (t._1, t._2))

    val got = EventWindows.cohortLtv(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    got.foreach { case (_, wi, nb, rev, _) =>
      assert(wi >= 0, "purchase before its user's first event")
      assert(nb >= 1 && rev >= 0)
    }
  }
}

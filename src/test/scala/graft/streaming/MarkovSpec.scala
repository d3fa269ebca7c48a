package graft.streaming

import graft.SparkSuite
import graft.core.Tables

/** Differential + stochasticity checks for ev_markov. */
class MarkovSpec extends SparkSuite {

  test("transition counts match a driver recount; rows are stochastic") {
    val evs = Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as us",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = evs.groupBy(_._1).values.flatMap { es =>
      val types = es.sortBy(e => (e._3, e._2)).map(_._4)
      types.zip(types.drop(1))
    }.toSeq.groupBy(p => p).map { case (k, v) => k -> v.length.toLong }

    val got = EventWindows.markovTransitions(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, cnt) =>
      assert(got(k)._1 == cnt, s"count at $k")
    }
    // row-stochastic up to floor-division: each row's ppm sum lands in
    // (1e6 - #cells, 1e6]
    got.groupBy(_._1._1).foreach { case (from, rows) =>
      val s = rows.values.map(_._2).sum
      assert(s <= 1000000L && s > 1000000L - rows.size,
        s"row $from ppm sum $s")
      // exact ppm re-derivation
      val total = rows.values.map(_._1).sum
      rows.foreach { case ((_, to), (cnt, ppm)) =>
        assert(ppm == cnt * 1000000L / total, s"ppm at ($from,$to)")
      }
    }
  }
}

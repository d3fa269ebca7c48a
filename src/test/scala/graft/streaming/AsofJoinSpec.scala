package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Differential check for the union-window as-of join: an independent
  * driver-side per-click scan over the collected fixture must produce
  * the identical enrichment (same `<=` semantics, same (ts, event_id)
  * tiebreak). The DuckDB oracle already cross-checks via LATERAL; this
  * guards the Spark-side window ordering (side sorts purchases before
  * clicks at equal ts) against refactors.
  */
class AsofJoinSpec extends SparkSuite {

  test("as-of join matches a driver-side reference scan") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val purchasesByUser = ev.filter(_._4 == "purchase")
      .groupBy(_._2).view.mapValues(_.sortBy(p => (p._3, p._1))).toMap
    val expected = ev.filter(_._4 == "click").sortBy(_._1).map { c =>
      val prior = purchasesByUser.getOrElse(c._2, Array.empty[(Long, Long,
        Long, String, Double)]).filter(_._3 <= c._3)
      val last = prior.lastOption // max (ts, event_id) <= click ts
      (c._1, c._2, c._3, last.map(_._1), last.map(_._5))
    }.toSeq

    val got = EventWindows.asofJoin(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toSeq

    assert(got.size == expected.size,
      s"${got.size} rows != ${expected.size}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"mismatch: got $g, expected $e")
    }
    // the fixture must exercise both arms: enriched clicks AND clicks
    // with no prior purchase (null extension)
    assert(expected.exists(_._4.isEmpty), "no never-purchased click")
    assert(expected.exists(_._4.nonEmpty), "no enriched click")
  }

  test("as-of join shuffles once on user_id before the presentation sort") {
    val plan = EventWindows.asofJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    // union + window must share ONE hashpartitioning(user_id) Exchange;
    // the only other Exchange is the final ORDER BY's rangepartitioning
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 user_id Exchange, got $hashEx:\n$plan")
  }
}

package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stream==batch differential for the inter-event-gap monitor, plus
  * the out-of-order observability contract.
  */
class GapStreamSpec extends SparkSuite {

  private def events: Array[(Long, Long, Long, String)] =
    Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as ts_us",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  private def msg(e: (Long, Long, Long, String)): String =
    s"""{"user_id": ${e._1}, "event_id": ${e._2}, "ts_us": ${e._3},""" +
      s""" "event_type": "${e._4}"}"""

  private def parsed(src: MemorySource) =
    src.load(spark)
      .select(from_json(col("value").cast("string"),
        StructType.fromDDL(
          "user_id long, event_id long, ts_us long, event_type string"))
        .as("j"))
      .select("j.*")

  test("in-order replay reproduces the batch gap aggregate exactly") {
    val evs = events.sortBy(e => (e._3, e._2)) // global event-time order
    val src = new MemorySource(spark)
    val q = GapStream.gapStream(parsed(src))
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    try {
      evs.map(msg).grouped(evs.length / 3 + 1).foreach { b =>
        src.add(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.sql(
        """select event_type, count(*) as n, min(gap_us) as mn,
          |  max(gap_us) as mx, sum(gap_us) as s
          |from gap_stream where not late group by event_type"""
          .stripMargin)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(spark.sql("select * from gap_stream where late").count() == 0)

    val expect = EventWindows.gapStats(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("cross-batch stragglers are flagged late and don't corrupt state") {
    val evs = events.sortBy(e => (e._3, e._2)).take(400)
    // hold back every 10th event to a LATER batch: it arrives after its
    // user's stream has moved past it
    val (held, onTime) = evs.zipWithIndex.partition(_._2 % 10 == 5)
    val src = new MemorySource(spark)
    val q = GapStream.gapStream(parsed(src))
      .writeStream.format("memory").queryName("gap_stream_late")
      .outputMode("append").start()
    try {
      src.add(onTime.map(e => msg(e._1)).toSeq); q.processAllAvailable()
      src.add(held.map(e => msg(e._1)).toSeq); q.processAllAvailable()
    } finally q.stop()

    val lateRows = spark.sql(
      "select gap_us from gap_stream_late where late").collect()
    assert(lateRows.nonEmpty, "stragglers were not flagged")
    // a straggler measures against a LATER last event: gap must be <= 0
    assert(lateRows.forall(_.getLong(0) <= 0))

    // the non-late rows must equal a driver replay of the fold over the
    // same two batches: stragglers flagged, but a held event landing
    // AFTER its user's last on-time event advances state normally
    val got = spark.sql(
        """select event_type, count(*) as n, sum(gap_us) as s
          |from gap_stream_late where not late group by event_type"""
          .stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val last = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    Seq(onTime, held).foreach { batch =>
      batch.map(_._1).groupBy(_._1).foreach { case (uid, g) =>
        g.sortBy(e => (e._3, e._2)).foreach { case (_, id, ts, tpe) =>
          last.get(uid) match {
            case None => last(uid) = (ts, id)
            case Some((lts, lid)) if ts > lts || (ts == lts && id >= lid) =>
              emitted += ((tpe, ts - lts)); last(uid) = (ts, id)
            case Some(_) => () // late: flagged by the stream, no advance
          }
        }
      }
    }
    val exp = emitted.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(got == exp)
  }

  test("stateTtl: dormant user state decays after watermark passage") {
    val src = new MemorySource(spark)
    val base = 1700000000000000L
    val hourUs = 3600L * 1000000L
    val q = GapStream.gapStream(parsed(src),
        stateTtl = Some(java.time.Duration.ofHours(1)))
      .writeStream.format("memory").queryName("gap_ttl")
      .outputMode("append").start()
    try {
      // user 1: two events → one gap; then goes dormant
      src.add(Seq(msg((1L, 10L, base, "click")),
        msg((1L, 11L, base + 1000L, "click"))))
      q.processAllAvailable()
      // user 2 far in the future advances the watermark past user 1's
      // ttl — the timeout fires and user 1's state is removed
      src.add(Seq(msg((2L, 20L, base + 10 * hourUs, "click"))))
      q.processAllAvailable()
      src.add(Seq(msg((2L, 21L, base + 10 * hourUs + 1000L, "click"))))
      q.processAllAvailable()
      // user 1 re-arrives post-expiry: treated as FIRST event (no gap
      // emitted), proving the old lastUs is gone
      src.add(Seq(msg((1L, 12L, base + 11 * hourUs, "click"))))
      q.processAllAvailable()
      val gapsByUser = spark.table("gap_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      assert(gapsByUser(1L).map(_._2).toSeq == Seq(1000L),
        s"user 1 must have exactly the pre-expiry gap: ${gapsByUser.get(1L)}")
      val stateRows = q.lastProgress.stateOperators.headOption
        .map(_.numRowsTotal).getOrElse(-1L)
      assert(stateRows <= 2L,
        s"state must not retain expired users, got $stateRows rows")
    } finally q.stop()
  }
}

package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Differential tests for the streaming funnel/retention twins: the
  * REAL sf0.001 events table is replayed through a memory stream in
  * event-time-ordered micro-batches, and the streaming final state
  * must equal the batch operator's result row-for-row — the same
  * standard the sessionize/hourly twins meet (StreamingSpec,
  * StatefulSessionsSpec).
  */
class FunnelRetentionStreamSpec extends SparkSuite {
  import spark.implicits._

  // events replayed in global ts order, split into micro-batches —
  // the in-order-per-user contract the incremental fold requires
  private lazy val orderedMsgs: Seq[Seq[String]] = {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(r => (r._2, r._1, r._3))
    val msgs = evs.map { case (u, ts, et) =>
      s"""{"user_id": $u, "ts_us": $ts, "event_type": "$et"}"""
    }
    msgs.grouped(math.max(1, msgs.length / 3 + 1)).map(_.toSeq).toSeq
  }

  private def parsed(src: MemorySource) =
    src.load(spark)
      .select(from_json(col("value").cast("string"),
        StructType.fromDDL(
          "user_id long, ts_us long, event_type string")).as("j"))
      .select("j.*")

  test("streaming funnel final state matches the batch funnel") {
    val src = new MemorySource(spark)
    val q = FunnelRetentionStream.funnelStream(parsed(src))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    orderedMsgs.foreach { batch =>
      src.add(batch)
      q.processAllAvailable()
    }
    q.stop()

    // update mode re-emits a user's row each touched batch; n_seen is
    // monotone, so max(n_seen) marks the final row per user
    val fin = spark.sql(
      """select user_id, t_view_us, t_click_us, t_purchase_us, stage
        |from (select *, row_number() over (partition by user_id
        |        order by n_seen desc) as rn from funnel_stream)
        |where rn = 1""".stripMargin)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getInt(4))))
      .toMap

    val batch = EventWindows.funnel(spark, sf0001).collect()
      .map { r =>
        def opt(i: Int): Option[Long] =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getInt(4)))
      }.toMap

    assert(fin.keySet == batch.keySet,
      s"user sets differ: ${fin.size} streamed vs ${batch.size} batch")
    batch.foreach { case (u, want) =>
      assert(fin(u) == want, s"user $u: stream ${fin(u)} != batch $want")
    }
    // the fixture must exercise every converted stage, not just stage 0
    assert(batch.values.exists(_._4 == 3))
    // in-order replay: the late-event counter must stay at zero — it
    // only fires on cross-batch event-time regressions
    val late = spark.sql("select max(n_late) from funnel_stream")
      .collect()(0).getLong(0)
    assert(late == 0L, s"in-order replay reported $late late events")
  }

  test("funnel absorbs arbitrary disorder inside a single batch") {
    // the processors sort by ts within a batch, so feeding the WHOLE
    // stream as one reverse-ordered batch must still equal the batch
    // operator — the in-batch half of the exactness contract
    val src = new MemorySource(spark)
    val q = FunnelRetentionStream.funnelStream(parsed(src))
      .writeStream.format("memory").queryName("funnel_rev")
      .outputMode("update").start()
    src.add(orderedMsgs.flatten.reverse)
    q.processAllAvailable()
    q.stop()
    val fin = spark.sql(
      "select user_id, stage from funnel_rev").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = EventWindows.funnel(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(fin == batch)
  }

  test("cross-batch event-time regressions are counted in n_late") {
    def msg(u: Long, tsUs: Long, et: String): String =
      s"""{"user_id": $u, "ts_us": $tsUs, "event_type": "$et"}"""
    val src = new MemorySource(spark)
    val q = FunnelRetentionStream.funnelStream(parsed(src))
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode("update").start()
    // batch 1: view at t=2_000_000; batch 2: click at t=1_000_000 —
    // an event-time regression across the batch boundary. The click
    // precedes the view, so it must NOT advance the funnel (chained
    // rule), and it must be flagged in n_late instead of vanishing.
    src.add(Seq(msg(7L, 2000000L, "view")))
    q.processAllAvailable()
    src.add(Seq(msg(7L, 1000000L, "click")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "select stage, n_seen, n_late from funnel_late where user_id = 7 " +
        "order by n_seen").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1, 1L, 0L), (1, 2L, 1L)),
      s"expected late click flagged, stage unchanged; got $rows")
  }

  test("funnel state expires once the watermark passes lastSeen + ttl") {
    def msg(u: Long, tsUs: Long, et: String): String =
      s"""{"user_id": $u, "ts_us": $tsUs, "event_type": "$et"}"""
    val hourUs = 3600L * 1000000L
    val src = new MemorySource(spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_funnel_ttl").toString
    val q = FunnelRetentionStream.funnelStream(parsed(src),
        stateTtl = Some(java.time.Duration.ofHours(1)))
      .writeStream.format("memory").queryName("funnel_ttl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    // user 1 goes idle; user 2's later events advance the watermark
    // past user 1's lastSeen + 1h, so user 1's timeout fires on the
    // next micro-batch and its state row is dropped
    src.add(Seq(msg(1L, hourUs, "view")))
    q.processAllAvailable()
    src.add(Seq(msg(2L, 10L * hourUs, "view")))
    q.processAllAvailable()
    src.add(Seq(msg(2L, 11L * hourUs, "click")))
    q.processAllAvailable()
    q.stop()
    // offline state read (the production way — StateInspectSpec):
    // only user 2 may remain
    val remaining = graft.streaming.StateInspect.state(spark, ckpt)
      .select("key.value").as[Long].collect().toSet
    assert(remaining == Set(2L),
      s"expected only user 2's state to survive the TTL, got $remaining")
  }

  test("retention state expires once the watermark passes lastSeen + ttl") {
    def msg(u: Long, tsUs: Long): String =
      s"""{"user_id": $u, "ts_us": $tsUs, "event_type": "view"}"""
    val weekUs = 7L * 86400L * 1000000L
    val src = new MemorySource(spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ret_ttl").toString
    val q = FunnelRetentionStream.retentionCells(parsed(src),
        stateTtl = Some(java.time.Duration.ofDays(7)))
      .writeStream.format("memory").queryName("ret_ttl")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // user 1's cohort opens in week 1; user 2 keeps the stream alive
    // 10 weeks later, pushing the watermark past week1 + 7d TTL
    src.add(Seq(msg(1L, weekUs)))
    q.processAllAvailable()
    src.add(Seq(msg(2L, 10L * weekUs)))
    q.processAllAvailable()
    src.add(Seq(msg(2L, 10L * weekUs + 1000000L)))
    q.processAllAvailable()
    q.stop()
    val remaining = graft.streaming.StateInspect.state(spark, ckpt)
      .select("key.value").as[Long].collect().toSet
    assert(remaining == Set(2L),
      s"expected only user 2's retention state to survive, got $remaining")
    // the expired user's already-emitted cohort cell is still in the
    // sink — expiry drops STATE, not history
    val cells = spark.sql(
      "select user_id, cohort_week, week_offset from ret_ttl")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cells.contains((1L, 1L, 0L)), s"user 1 cohort cell lost: $cells")
  }

  test("retention rejects far-future offsets instead of growing the bitmap") {
    def msg(u: Long, tsUs: Long): String =
      s"""{"user_id": $u, "ts_us": $tsUs, "event_type": "view"}"""
    val weekUs = 7L * 86400L * 1000000L
    val src = new MemorySource(spark)
    val q = FunnelRetentionStream.retentionCells(parsed(src))
      .writeStream.format("memory").queryName("ret_clamp")
      .outputMode("append").start()
    // cohort opens at a realistic 2026-era week; then the classic
    // ms-vs-µs unit error inflates one event ×1000 — millions of weeks
    // out, far past maxWeekOffset (an unclamped bitmap would allocate
    // ~46k longs for it); then a sane next-week event follows
    val w0 = 2950L
    src.add(Seq(msg(1L, w0 * weekUs)))
    q.processAllAvailable()
    src.add(Seq(msg(1L, w0 * weekUs * 1000L)))
    q.processAllAvailable()
    src.add(Seq(msg(1L, (w0 + 1L) * weekUs)))
    q.processAllAvailable()
    q.stop()
    val cells = spark.sql(
      "select cohort_week, week_offset from ret_clamp where user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the corrupt event produced a reject MARKER, not a credit — and
    // the sane next-week credit still lands on intact state
    assert(cells == Set((w0, 0L), (w0, FunnelRetentionStream.RejectOffset),
      (w0, 1L)), s"unexpected cells: $cells")
  }

  test("retention re-opens a cohort poisoned by a corrupt first event") {
    def msg(u: Long, tsUs: Long): String =
      s"""{"user_id": $u, "ts_us": $tsUs, "event_type": "view"}"""
    val weekUs = 7L * 86400L * 1000000L
    val src = new MemorySource(spark)
    val q = FunnelRetentionStream.retentionCells(parsed(src))
      .writeStream.format("memory").queryName("ret_reopen")
      .outputMode("append").start()
    // the user's FIRST event is the corrupt one: a bogus far-future
    // cohort opens (nothing to clamp against yet); the sane events
    // that follow are millions of weeks BEFORE it, which triggers the
    // retroactive reset
    val w0 = 2950L
    val corrupt = w0 * weekUs * 1000L
    src.add(Seq(msg(7L, corrupt)))
    q.processAllAvailable()
    src.add(Seq(msg(7L, w0 * weekUs)))
    q.processAllAvailable()
    src.add(Seq(msg(7L, (w0 + 1L) * weekUs)))
    q.processAllAvailable()
    q.stop()
    val wCorrupt = corrupt / weekUs
    val cells = spark.sql(
      "select cohort_week, week_offset from ret_reopen where user_id = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // phantom cohort cell + its tombstone marker, then the re-opened
    // sane cohort with normal credits
    assert(cells == Set(
      (wCorrupt, 0L), (wCorrupt, FunnelRetentionStream.RejectOffset),
      (w0, 0L), (w0, 1L)), s"unexpected cells: $cells")
  }

  test("streaming retention cells aggregate to the batch retention matrix") {
    val src = new MemorySource(spark)
    val q = FunnelRetentionStream.retentionCells(parsed(src))
      .writeStream.format("memory").queryName("ret_cells")
      .outputMode("append").start()
    orderedMsgs.foreach { batch =>
      src.add(batch)
      q.processAllAvailable()
    }
    q.stop()

    // each cell credit is emitted exactly once, so the matrix is a
    // plain count over the sink plus the offset-0 cohort size —
    // the aggregation a dashboard store runs over ingested deltas
    val got = spark.sql(
      """with cells as (
        |  select cohort_week, week_offset,
        |    count(*) as n_active
        |  from ret_cells group by 1, 2),
        |sizes as (
        |  select cohort_week, n_active as cohort_n
        |  from cells where week_offset = 0)
        |select c.cohort_week, c.week_offset, c.n_active, s.cohort_n,
        |  (c.n_active * 10000 + s.cohort_n div 2) div s.cohort_n as ret_e4
        |from cells c join sizes s on s.cohort_week = c.cohort_week""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    val want = EventWindows.retention(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    assert(got.keySet == want.keySet,
      s"cell sets differ: ${got.size} streamed vs ${want.size} batch")
    want.foreach { case (k, w) =>
      assert(got(k) == w, s"cell $k: stream ${got(k)} != batch $w")
    }
    // no duplicate credits: every (cohort, offset, user) emitted once
    val n = spark.sql("select count(*) from ret_cells").collect()(0).getLong(0)
    val d = spark.sql(
      "select count(distinct cohort_week, week_offset, user_id) from ret_cells")
      .collect()(0).getLong(0)
    assert(n == d, s"duplicate cell credits: $n rows, $d distinct")
  }
}

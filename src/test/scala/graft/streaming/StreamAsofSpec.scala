package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Differential: replaying the sf0.001 events in event-time order
  * through the streaming as-of operator must reproduce the batch
  * [[EventWindows.asofJoin]] result bit-exactly — including the
  * purchases-before-clicks ordering at equal timestamps, exercised
  * both WITHIN a batch (the per-group sort) and ACROSS the batch cut
  * (state carried forward).
  */
class StreamAsofSpec extends SparkSuite {
  import spark.implicits._

  test("streaming as-of replay equals the batch as-of join") {
    implicit val sqlCtx = spark.sqlContext
    // (event_id, ts_us, user_id, event_type, value), event-time order
    // with the batch window's (ts, side, event_id) tiebreak
    val rows = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
      .sortBy(r => (r._2, if (r._4 == "purchase") 0 else 1, r._1))

    val src = MemoryStream[(Long, Long, Long, String, Double)]
    val events = src.toDF
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamAsof.asofStream(events)
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 5)).foreach { chunk =>
        src.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("asof_out").collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      }.sortBy(_._1).toSeq
      val want = EventWindows.asofJoin(spark, sf0001).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      }.sortBy(_._1).toSeq
      assert(got.size == want.size, s"${got.size} != ${want.size} rows")
      got.zip(want).foreach { case (g, w) =>
        assert(g == w, s"streaming $g != batch $w")
      }
      assert(want.exists(_._4.isEmpty) && want.exists(_._4.nonEmpty),
        "fixture must exercise both enriched and never-purchased clicks")
    } finally q.stop()
  }

  test("stateTtl expires dormant purchase state after watermark passage") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000L // realistic µs so nothing sits on wm 0
    val hourUs = 3600L * 1000000L
    val src = MemoryStream[(Long, Long, Long, String, Double)]
    val events = src.toDF
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamAsof.asofStream(events,
        stateTtl = Some(java.time.Duration.ofHours(1)))
      .writeStream.format("memory").queryName("asof_ttl")
      .outputMode("append").start()
    try {
      // batch 1: user 1 purchases, then clicks → enriched
      src.addData((10L, base, 1L, "purchase", 5.0))
      q.processAllAvailable()
      src.addData((11L, base + 1000L, 1L, "click", 0.0))
      q.processAllAvailable()
      // batch 3: another user far in the future — advances the
      // watermark past user 1's ttl (purchase + 1h), firing the timeout
      src.addData((20L, base + 10 * hourUs, 2L, "purchase", 7.0))
      q.processAllAvailable()
      src.addData((21L, base + 10 * hourUs + 1000L, 2L, "click", 0.0))
      q.processAllAvailable()
      // batch 5: user 1 clicks again AFTER expiry — state must be gone,
      // so the click enriches to None (with NoTimeout it would be 10)
      src.addData((12L, base + 11 * hourUs, 1L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_ttl").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      assert(got(11L).contains(10L), s"pre-ttl click: ${got(11L)}")
      assert(got(21L).contains(20L), s"fresh user click: ${got(21L)}")
      assert(got(12L).isEmpty,
        s"post-ttl click must find no purchase state, got ${got(12L)}")
      // state metrics agree: the store holds only user 2 now
      val prog = q.lastProgress
      val stateRows = prog.stateOperators.headOption
        .map(_.numRowsTotal).getOrElse(-1L)
      assert(stateRows == 1L,
        s"state should decay to 1 live user after ttl, got $stateRows")
    } finally q.stop()
  }
}

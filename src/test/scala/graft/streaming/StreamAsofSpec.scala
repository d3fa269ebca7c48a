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
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming deduplication — the stream-side of the dedup suite
  * (graft.dedup covers batch). A 100 TB ingest pipeline dedups AT THE
  * EDGE, before anything lands: exactly-once per event id, with state
  * bounded by a watermark instead of growing forever.
  *
  * Two built-in mechanisms, different contracts:
  *  - `dropDuplicates(id, eventTimeCol)` + watermark: state for an id
  *    is dropped once the watermark passes its event time; a duplicate
  *    arriving later than the watermark delay can re-emit.
  *  - `dropDuplicatesWithinWatermark(id)` (Spark 3.5+): dedups ids
  *    whose FIRST occurrence is within the watermark delay, without
  *    requiring the event-time column inside the key — the right shape
  *    when duplicates carry slightly different timestamps (retries,
  *    at-least-once sources).
  *
  * Reference analog: the driver-side `(ts,value)` dedup in the JSON
  * file sink (`app/spark_stream_web.py:44-47`, SURVEY S11) — done
  * there in pandas on the driver; here it is distributed state with a
  * watermark bound.
  */
object StreamDedup {

  /** Parse the demo JSON stream `{ts, value, id}` into typed columns
    * with an event-time timestamp. */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, ts BIGINT, value DOUBLE")).as("j"))
      .select(col("j.id").as("id"),
        timestamp_millis(col("j.ts")).as("event_time"),
        col("j.value").as("value"))

  /** Watermarked exact-key dedup: one row per (id, event_time); state
    * expires as the watermark passes. */
  def dedupByKey(parsed: DataFrame, delay: String = "10 minutes"): DataFrame =
    parsed
      .withWatermark("event_time", delay)
      .dropDuplicates("id", "event_time")

  /** Watermark-window dedup on id alone — duplicates may carry
    * different timestamps (at-least-once redelivery) and still
    * collapse, as long as they arrive within the delay. */
  def dedupWithinWatermark(parsed: DataFrame,
      delay: String = "10 minutes"): DataFrame =
    parsed
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("id")

  /** Start a dedup stream into an append-mode memory sink. */
  def startMemoryAppend(deduped: DataFrame, name: String): StreamingQuery =
    deduped.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
}

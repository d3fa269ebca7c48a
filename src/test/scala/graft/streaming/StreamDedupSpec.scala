package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

class StreamDedupSpec extends SparkSuite {

  // epoch-0 event times sit exactly on the initial watermark and get
  // dropped as late — use a realistic base
  private val base = 1700000000000L

  private def msg(id: Long, tsMs: Long, v: Double): String =
    s"""{"id": $id, "ts": ${base + tsMs}, "value": $v}"""

  test("watermarked dropDuplicates emits each (id, ts) exactly once") {
    val src = new MemorySource(spark)
    val q = StreamDedup.startMemoryAppend(
      StreamDedup.dedupByKey(StreamDedup.parse(src.load(spark))),
      "dedup_key_test")
    // batch 1: ids 0-9, with 0-4 duplicated inside the batch
    src.add((0L until 10L).map(i => msg(i, 1000 * i, i * 0.5)) ++
      (0L until 5L).map(i => msg(i, 1000 * i, i * 0.5)))
    q.processAllAvailable()
    // batch 2: ids 5-14 — 5-9 are cross-batch duplicates
    src.add((5L until 15L).map(i => msg(i, 1000 * i, i * 0.5)))
    q.processAllAvailable()
    val rows = spark.sql("select id from dedup_key_test").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(rows == (0L until 15L).toSeq,
      s"expected one row per id, got $rows")
    q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses retries with drifted ts") {
    val src = new MemorySource(spark)
    val q = StreamDedup.startMemoryAppend(
      StreamDedup.dedupWithinWatermark(StreamDedup.parse(src.load(spark))),
      "dedup_wm_test")
    // same id redelivered with a 5s-later timestamp (at-least-once
    // retry): key-based dedup would emit both; within-watermark
    // dedup must collapse them
    src.add(Seq(msg(1, 10000, 1.0), msg(1, 15000, 1.0),
      msg(2, 12000, 2.0)))
    q.processAllAvailable()
    src.add(Seq(msg(2, 16000, 2.0), msg(3, 20000, 3.0)))
    q.processAllAvailable()
    val ids = spark.sql("select id from dedup_wm_test").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"expected collapsed ids, got $ids")
    q.stop()
  }

  test("streaming dedup agrees with batch dropDuplicates (differential)") {
    import spark.implicits._
    val msgs = (0L until 50L).flatMap { i =>
      val base = Seq(msg(i, 1000 * i, i * 0.1))
      if (i % 3 == 0) base :+ msg(i, 1000 * i, i * 0.1) else base
    }
    val src = new MemorySource(spark)
    val q = StreamDedup.startMemoryAppend(
      StreamDedup.dedupByKey(StreamDedup.parse(src.load(spark))),
      "dedup_diff_test")
    src.add(msgs)
    q.processAllAvailable()
    val streamed = spark.sql("select id, value from dedup_diff_test")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = StreamDedup.parse(msgs.toDF("value"))
      .dropDuplicates("id", "event_time")
      .select("id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed == batch)
    q.stop()
  }
}

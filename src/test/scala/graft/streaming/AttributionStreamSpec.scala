package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stream==batch differential for the live attribution monitor. */
class AttributionStreamSpec extends SparkSuite {

  private def parsed(src: MemorySource) =
    src.load(spark)
      .select(from_json(col("value").cast("string"),
        StructType.fromDDL(
          "event_id long, ts_us long, user_id long, event_type string"))
        .as("j"))
      .select("j.*")

  test("event-time replay reproduces the batch credits exactly") {
    val evs = Tables.events(spark, sf0001)
      .selectExpr("event_id", "unix_micros(ts) as ts_us", "user_id",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._2, e._1))

    val src = new MemorySource(spark)
    val q = AttributionStream.attributionStream(parsed(src))
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      evs.map(e =>
          s"""{"event_id": ${e._1}, "ts_us": ${e._2}, "user_id": ${e._3},""" +
            s""" "event_type": "${e._4}"}""")
        .grouped(evs.length / 4 + 1)
        .foreach { b => src.add(b.toSeq); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("attr_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    val want = EventWindows.attribution(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    assert(want.nonEmpty, "degenerate fixture")
    assert(got == want,
      s"missing ${(want.keySet -- got.keySet).take(3)}; " +
        s"spurious ${(got.keySet -- want.keySet).take(3)}")
  }

  test("idle users' click windows expire once the watermark passes +24h") {
    // r10 advice: NoTimeout kept every idle user's window forever.
    // Feed 50 users one click each, then advance the watermark far past
    // click + 24h with a lone later event: the timed-out invocations
    // must clear the 50 windows (state rows drop to ~1, not 51).
    val base = 1700000000000000L // µs, realistic epoch
    val src = new MemorySource(spark)
    val q = AttributionStream.attributionStream(parsed(src))
      .writeStream.format("memory").queryName("attr_expire")
      .outputMode("append").start()
    try {
      src.add((1 to 50).map(u =>
        s"""{"event_id": $u, "ts_us": ${base + u}, "user_id": $u,""" +
          s""" "event_type": "click"}"""))
      q.processAllAvailable()
      // 30 h later: watermark (delay 1 h) passes base + 24 h
      val later = base + 30L * 3600L * 1000000L
      src.add(Seq(s"""{"event_id": 999, "ts_us": $later,""" +
        s""" "user_id": 999, "event_type": "click"}"""))
      q.processAllAvailable()
      // one more batch so timed-out groups are actually invoked against
      // the advanced watermark
      src.add(Seq(s"""{"event_id": 1000, "ts_us": ${later + 1},""" +
        s""" "user_id": 999, "event_type": "click"}"""))
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(rows <= 2, s"state retained $rows rows; idle windows leaked")
    } finally q.stop()
  }
}

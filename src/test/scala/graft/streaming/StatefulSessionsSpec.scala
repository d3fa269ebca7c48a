package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

class StatefulSessionsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): String = {
    val t = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusMinutes(minute.toLong)
    f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:00"
  }

  test("stateful sessionization: in-batch splits + timeout emission") {
    val src = new MemorySource(spark)
    val parsed = DemoStream // reuse JSON parse? no — build directly
    val events = src.load(spark)
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "ts timestamp, user_id long, value double")).as("j"))
      .select("j.*")
    val sessions = StatefulSessions.sessionizeStream(
      events, gapMinutes = 30, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()

    def msg(minute: Int, uid: Long, v: Double): String =
      s"""{"ts": "${ts(minute)}", "user_id": $uid, "value": $v}"""

    // user 1: events at 0,10 then a 40-min gap then 50 -> first session
    // closes IN batch; user 2: single event at 5
    src.add(Seq(msg(0, 1, 1.0), msg(10, 1, 2.0), msg(50, 1, 3.0),
      msg(5, 2, 4.0)))
    q.processAllAvailable()
    // two sessions are already out: user 1's first (split in-batch) and
    // user 2's (timed out by the 0-delay watermark in the follow-up
    // no-data micro-batch); user 1's trailing session is still open
    val afterBatch1 = spark.sql("select * from sessions_out").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    assert(afterBatch1 == Set((1L, 2L, 3.0), (2L, 1L, 4.0)))

    // push the watermark far ahead -> open sessions time out and emit
    src.add(Seq(msg(600, 9, 0.0)))
    q.processAllAvailable()
    src.add(Seq(msg(700, 9, 0.0)))
    q.processAllAvailable()
    q.stop()
    val all = spark.sql("select * from sessions_out").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    // user 1 second session (1 event, v=3) and user 2 session now out
    assert(all.contains((1L, 1L, 3.0)))
    assert(all.contains((2L, 1L, 4.0)))
  }

  test("stateful sessionization agrees with batch sessionize on closed sessions") {
    val src = new MemorySource(spark)
    val events = src.load(spark)
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "ts timestamp, user_id long, value double, event_id long")).as("j"))
      .select("j.*")
    val sessions = StatefulSessions.sessionizeStream(
      events, gapMinutes = 30, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_diff").outputMode("append").start()

    val rnd = new scala.util.Random(7)
    val msgs = (0 until 200).map { i =>
      val uid = rnd.nextInt(5)
      val minute = rnd.nextInt(300)
      s"""{"ts": "${ts(minute)}", "user_id": $uid, "value": 1.0, "event_id": $i}"""
    }
    src.add(msgs)
    q.processAllAvailable()
    // advance watermark so every session closes
    src.add(Seq(s"""{"ts": "${ts(2000)}", "user_id": 99, "value": 0.0, "event_id": 999}"""))
    q.processAllAvailable()
    src.add(Seq(s"""{"ts": "${ts(2100)}", "user_id": 99, "value": 0.0, "event_id": 1000}"""))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      "select user_id, start_us, end_us, n_events from sessions_diff " +
        "where user_id < 50").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch reference: same gap logic via window functions
    import org.apache.spark.sql.expressions.Window
    val batch = spark.read.json(spark.createDataset(msgs))
      .withColumn("ts_us", unix_micros(to_timestamp(col("ts"))))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val expected = batch
      .withColumn("prev", lag("ts_us", 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        col("ts_us") - col("prev") > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        count(lit(1)).as("n"))
      .select("user_id", "start_us", "end_us", "n")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == expected,
      s"stream ${streamed.size} vs batch ${expected.size} sessions")
  }
}

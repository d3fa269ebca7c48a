package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(minute.toLong))

  test("clicks attribute to impressions within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val impStream = MemoryStream[(Long, java.sql.Timestamp)]
    val clkStream = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamJoins.clickAttribution(
      impStream.toDF.toDF("imp_id", "imp_ts"),
      clkStream.toDF.toDF("click_id", "imp_id", "click_ts"),
      windowMinutes = 60, watermarkDelay = "0 seconds")
    val q = joined.writeStream.format("memory")
      .queryName("attrib_out").outputMode("append").start()

    impStream.addData((1L, ts(0)), (2L, ts(5)))
    // click 10 inside imp 1's window; click 11 AFTER imp 2's window;
    // click 12 references a missing impression
    clkStream.addData((10L, 1L, ts(30)), (11L, 2L, ts(90)), (12L, 7L, ts(31)))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("select imp_id, click_id, latency_us from attrib_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 30L * 60 * 1000000)))
  }

  test("outer join emits unconverted impressions after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val impStream = MemoryStream[(Long, java.sql.Timestamp)]
    val clkStream = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamJoins.clickAttributionOuter(
      impStream.toDF.toDF("imp_id", "imp_ts"),
      clkStream.toDF.toDF("click_id", "imp_id", "click_ts"),
      windowMinutes = 60, watermarkDelay = "0 seconds")
    val q = joined.writeStream.format("memory")
      .queryName("attrib_outer").outputMode("append").start()

    impStream.addData((1L, ts(0)), (2L, ts(5)))
    clkStream.addData((10L, 1L, ts(30)))
    q.processAllAvailable()
    // advance BOTH watermarks far past imp 2's window end (5 + 60 min)
    impStream.addData((99L, ts(1000)))
    clkStream.addData((98L, 99L, ts(1001)))
    q.processAllAvailable()
    impStream.addData((97L, ts(1100)))
    clkStream.addData((96L, 97L, ts(1101)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql(
      "select imp_id, click_id from attrib_outer where imp_id in (1, 2)")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows == Set((1L, 10L), (2L, -1L)),
      s"expected matched imp 1 and null-click imp 2, got $rows")
  }
}

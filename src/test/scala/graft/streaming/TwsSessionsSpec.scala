package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TwsSessionsSpec extends SparkSuite {

  private def ts(minute: Int): String = {
    val t = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusMinutes(minute.toLong)
    f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:00"
  }


  test("transformWithState sessionization matches flatMapGroupsWithState") {
    withRocksDb {
      val rnd = new scala.util.Random(11)
      val msgs = (0 until 200).map { i =>
        val uid = rnd.nextInt(5)
        val minute = rnd.nextInt(300)
        s"""{"ts": "${ts(minute)}", "user_id": $uid, "value": 1.0}"""
      } ++ Seq(
        // watermark pushers so every real session times out and emits
        s"""{"ts": "${ts(2000)}", "user_id": 99, "value": 0.0}""",
        s"""{"ts": "${ts(2100)}", "user_id": 99, "value": 0.0}""")

      def run(name: String,
          f: org.apache.spark.sql.DataFrame =>
            org.apache.spark.sql.Dataset[StatefulSessions.SessionOut])
          : Set[(Long, Long, Long, Long)] = {
        val src = new MemorySource(spark)
        val events = src.load(spark)
          .select(from_json(col("value").cast("string"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "ts timestamp, user_id long, value double")).as("j"))
          .select("j.*")
        val q = f(events).writeStream.format("memory")
          .queryName(name).outputMode("append").start()
        msgs.grouped(50).foreach { g => src.add(g); q.processAllAvailable() }
        q.processAllAvailable()
        q.stop()
        spark.sql(s"select user_id, start_us, end_us, n_events from $name " +
            "where user_id < 50").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      }

      val tws = run("tws_out",
        df => TwsSessions.sessionizeStream(df, 30, "0 seconds"))
      val fmgws = run("fmgws_out",
        df => StatefulSessions.sessionizeStream(df, 30, "0 seconds"))
      assert(tws.nonEmpty)
      assert(tws == fmgws,
        s"tws ${tws.size} vs fmgws ${fmgws.size} sessions")
    }
  }

  test("timer extension: stale timers do not close an extended session") {
    withRocksDb {
      val src = new MemorySource(spark)
      val events = src.load(spark)
        .select(from_json(col("value").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "ts timestamp, user_id long, value double")).as("j"))
        .select("j.*")
      val q = TwsSessions.sessionizeStream(events, 30, "0 seconds")
        .writeStream.format("memory")
        .queryName("tws_ext").outputMode("append").start()

      def msg(minute: Int, uid: Long, v: Double): String =
        s"""{"ts": "${ts(minute)}", "user_id": $uid, "value": $v}"""

      // batch 1: session [0,10]; batch 2 extends it to 35 (within gap)
      // while the watermark is still behind — the old timer at 10+30=40
      // must not fire and close the extended session early
      src.add(Seq(msg(0, 1, 1.0), msg(10, 1, 1.0)))
      q.processAllAvailable()
      src.add(Seq(msg(35, 1, 1.0)))
      q.processAllAvailable()
      // push watermark past 35+30
      src.add(Seq(msg(500, 9, 0.0)))
      q.processAllAvailable()
      src.add(Seq(msg(600, 9, 0.0)))
      q.processAllAvailable()
      q.stop()
      val out = spark.sql(
        "select user_id, n_events, sum_value from tws_ext where user_id = 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.toSeq == Seq((1L, 3L, 3.0)),
        s"expected one 3-event session, got ${out.toSeq}")
    }
  }
}

package graft.streaming

import graft.SparkSuite
import graft.operators.StatsOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import SprtStream.DailyCensus

/** The streaming SPRT twin's contract: replaying the SAME (variant,
  * day) census through transformWithState yields the oracle-green
  * batch operator's rows EXACTLY — same cumulative LLR, same frozen
  * decision, same post_stop marks — regardless of how days are
  * chunked into triggers. Plus the one invariant the batch plan gets
  * for free but streaming state must EARN: a decision made in trigger
  * t is immutable in trigger t+1 even when the LLR wanders back
  * across both boundaries.
  */
class SprtStreamSpec extends SparkSuite {


  private type OutRow = (String, String, Long, Long, Long, Long, String, Int)

  /** Feed the census through sprtStream in the given trigger groups,
    * return the collected output rows. */
  private def runStream(name: String,
      triggers: Seq[Seq[DailyCensus]]): Set[OutRow] = {
    import spark.implicits._
    val stream = MemoryStream[DailyCensus](spark)
    val q = SprtStream.sprtStream(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      triggers.foreach { g =>
        if (g.nonEmpty) stream.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getString(6), r.getInt(7))).toSet
  }

  private lazy val census: Seq[DailyCensus] =
    StatsOps.sprtDailyCensus(graft.core.Tables.events(spark, sf0001))
      .collect()
      .map(r => DailyCensus(r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
      .sortBy(c => (c.day, c.variant))

  private lazy val batchRows: Set[OutRow] =
    StatsOps.statSprt(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6),
        r.getInt(7))).toSet

  test("streamed SPRT equals the batch operator, one day per trigger") {
    withRocksDb {
      assert(batchRows.nonEmpty && census.nonEmpty)
      val byDay = census.groupBy(_.day).toSeq.sortBy(_._1).map(_._2)
      assert(runStream("sprt_stream_daily", byDay) == batchRows)
    }
  }

  test("trigger chunking does not change the output") {
    withRocksDb {
      // everything in one trigger == one day per trigger == batch
      assert(runStream("sprt_stream_onego", Seq(census)) == batchRows)
      // ragged chunks (3 days, then 1, then the rest)
      val days = census.groupBy(_.day).toSeq.sortBy(_._1).map(_._2)
      val ragged = Seq(days.take(3).flatten, days.slice(3, 4).flatten,
        days.drop(4).flatten)
      assert(runStream("sprt_stream_ragged", ragged) == batchRows)
    }
  }

  test("a contract-violating census fails the query loudly") {
    withRocksDb {
      import spark.implicits._
      def violations(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage)).toSeq
      // a late day cannot be folded into a sequential test's prefix —
      // silent acceptance would falsify every later verdict, so the
      // monitor fails fast instead
      val s1 = MemoryStream[DailyCensus](spark)
      val q1 = SprtStream.sprtStream(s1.toDF()).writeStream
        .format("memory").queryName("sprt_ooo").outputMode("append").start()
      try {
        s1.addData(Seq(DailyCensus("X", "2024-01-02", 1, 0)))
        q1.processAllAvailable()
        s1.addData(Seq(DailyCensus("X", "2024-01-01", 1, 0)))
        val e = intercept[Exception](q1.processAllAvailable())
        assert(violations(e).exists(_.contains("contract violation")))
      } finally q1.stop()
      // two census rows for one (variant, day) in a single trigger
      val s2 = MemoryStream[DailyCensus](spark)
      val q2 = SprtStream.sprtStream(s2.toDF()).writeStream
        .format("memory").queryName("sprt_dup").outputMode("append").start()
      try {
        s2.addData(Seq(DailyCensus("X", "2024-01-01", 1, 0),
          DailyCensus("X", "2024-01-01", 2, 1)))
        val e = intercept[Exception](q2.processAllAvailable())
        assert(violations(e).exists(_.contains("ONE closed census row")))
      } finally q2.stop()
    }
  }

  test("a frozen decision survives a checkpoint restart") {
    withRocksDb {
      import spark.implicits._
      // arm X crosses in the first query's lifetime; the query is
      // stopped and a fresh one resumes from the checkpoint — the
      // day-2 verdict depends entirely on recovered state (the frozen
      // crossing AND the cumulative LLR)
      val stream = MemoryStream[DailyCensus](spark)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_sprt_ckpt").toString
      // the memory sink refuses checkpoint recovery (not fault-
      // tolerant); foreachBatch is the recovery-capable sink
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, String, Int)]
      def start() = SprtStream.sprtStream(stream.toDF())
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[SprtStream.SprtOut], _: Long) =>
            val rows = ds.collect()
              .map(o => (o.day, o.llr_e6, o.state, o.post_stop))
            buf.synchronized { buf ++= rows; () }
        }.start()
      val q1 = start()
      try {
        stream.addData(Seq(DailyCensus("X", "2024-01-01", 6, 6)))
        q1.processAllAvailable()
      } finally q1.stop()
      buf.synchronized(buf.clear()) // only the post-restart verdicts
      val q2 = start()
      try {
        stream.addData(Seq(DailyCensus("X", "2024-01-02", 50, 0)))
        q2.processAllAvailable()
      } finally q2.stop()
      val s = StatsOps.SprtLogS
      val f = StatsOps.SprtLogF
      val after = buf.synchronized(buf.toSet)
      // cumulative LLR continues from the recovered 6*s, the decision
      // stays accept_h1, and the post-crossing day is marked
      assert(after == Set(
        ("2024-01-02", 6 * s + 50 * f, "accept_h1", 1)))
    }
  }

  test("a crossing in trigger t is frozen in trigger t+1") {
    withRocksDb {
      // arm X: day 1 crosses the upper boundary (6 successes:
      // 6 * 510826 = 3064956 >= 2944439), day 2 is a disaster that
      // drags the cumulative LLR below the LOWER boundary — the frozen
      // accept_h1 must survive, with post_stop marking day 2. Arm Y
      // never leaves the corridor. Every day its own trigger.
      val x1 = DailyCensus("X", "2024-01-01", 6, 6)
      val x2 = DailyCensus("X", "2024-01-02", 50, 0)
      val y1 = DailyCensus("Y", "2024-01-01", 1, 0)
      val y2 = DailyCensus("Y", "2024-01-02", 1, 0)
      val out = runStream("sprt_stream_freeze",
        Seq(Seq(x1, y1), Seq(x2, y2)))
      val s = StatsOps.SprtLogS
      val f = StatsOps.SprtLogF
      assert(out == Set(
        ("X", "2024-01-01", 6L, 6L, 6 * s, 6 * s, "accept_h1", 0),
        ("X", "2024-01-02", 50L, 0L, 50 * f, 6 * s + 50 * f,
          "accept_h1", 1),
        ("Y", "2024-01-01", 1L, 0L, f, f, "continue", 0),
        ("Y", "2024-01-02", 1L, 0L, f, 2 * f, "continue", 0)))
      // sanity: the day-2 LLR really did leave through the floor —
      // the freeze is doing work, not vacuously holding
      assert(6 * s + 50 * f <= StatsOps.SprtLower)
    }
  }
}

package graft.streaming

import graft.SparkSuite
import graft.sim.SimilarityOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import SemDedupStream.{SemDedupOut, VecIn}

/** The streaming incremental-semdedup twin's contract: replaying the
  * batch operator's own (assigned, snapshot-split) input through
  * transformWithState yields embSemDedupIncr's oracle-green rows
  * EXACTLY — and the state machine honors the recurrence the batch
  * can only assume: survivors of snapshot N are base for snapshot
  * N+1, dropped rows vanish from every later comparison space, and
  * within-snapshot attribution counts dropped smaller ids (the batch
  * delta×delta join has no kept filter).
  */
class SemDedupStreamSpec extends SparkSuite {


  private type OutRow =
    (Long, Long, Option[Long], Option[Long], Option[Long], Boolean)

  private def runStream(name: String,
      triggers: Seq[Seq[VecIn]]): Set[OutRow] = {
    import spark.implicits._
    val stream = MemoryStream[VecIn](spark)
    val q = SemDedupStream.semDedupStream(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      triggers.foreach { g =>
        if (g.nonEmpty) stream.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).collect().map { r =>
      def optLong(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getLong(0), r.getLong(1), optLong(2), optLong(3), optLong(4),
        r.getBoolean(5))
    }.toSet
  }

  private lazy val assignedRows: Seq[VecIn] =
    SimilarityOps.semDedupIncrAssigned(spark, sf0001)
      .select("vec_id", "cluster", "vec", "is_delta")
      .collect()
      .map(r => VecIn(r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getBoolean(3)))
      .sortBy(_.vec_id)

  private lazy val batchRows: Set[OutRow] =
    SimilarityOps.embSemDedupIncr(spark, sf0001).collect().map { r =>
      def optLong(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getLong(0), r.getLong(1), optLong(2), optLong(3), optLong(4),
        r.getBoolean(5))
    }.toSet

  test("streamed semdedup equals the batch operator (base, then delta)") {
    withRocksDb {
      assert(batchRows.nonEmpty)
      val (delta, base) = assignedRows.partition(_.is_delta)
      assert(base.nonEmpty && delta.nonEmpty)
      assert(runStream("semdedup_two_triggers", Seq(base, delta))
        == batchRows)
    }
  }

  test("a bootstrap arriving WITH the delta in one trigger is its base") {
    withRocksDb {
      assert(runStream("semdedup_one_trigger", Seq(assignedRows))
        == batchRows)
    }
  }

  test("a replayed vec_id fails the query loudly") {
    withRocksDb {
      import spark.implicits._
      def violations(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage)).toSeq
      def v(id: Long, delta: Boolean) =
        VecIn(id, 0L, Array(1.0, 0.0), delta)
      // a delta id already in the kept set is a replayed snapshot row;
      // folding it would corrupt every later dup_of attribution
      val s1 = MemoryStream[VecIn](spark)
      val q1 = SemDedupStream.semDedupStream(s1.toDF()).writeStream
        .format("memory").queryName("semdedup_replay")
        .outputMode("append").start()
      try {
        s1.addData(Seq(v(1, delta = false)))
        q1.processAllAvailable()
        s1.addData(Seq(v(1, delta = true)))
        val e = intercept[Exception](q1.processAllAvailable())
        assert(violations(e).exists(_.contains("contract violation")))
      } finally q1.stop()
      // the same id twice inside one trigger
      val s2 = MemoryStream[VecIn](spark)
      val q2 = SemDedupStream.semDedupStream(s2.toDF()).writeStream
        .format("memory").queryName("semdedup_dupid")
        .outputMode("append").start()
      try {
        s2.addData(Seq(v(7, delta = true), v(7, delta = true)))
        val e = intercept[Exception](q2.processAllAvailable())
        assert(violations(e).exists(_.contains("appears twice")))
      } finally q2.stop()
      // the guard is SYMMETRIC (r18 advice #1): a replayed BOOTSTRAP
      // id fails too — in a bootstrap-only trigger...
      val s3 = MemoryStream[VecIn](spark)
      val q3 = SemDedupStream.semDedupStream(s3.toDF()).writeStream
        .format("memory").queryName("semdedup_boot_replay")
        .outputMode("append").start()
      try {
        s3.addData(Seq(v(3, delta = false)))
        q3.processAllAvailable()
        s3.addData(Seq(v(3, delta = false)))
        val e = intercept[Exception](q3.processAllAvailable())
        assert(violations(e).exists(_.contains("contract violation")))
      } finally q3.stop()
      // ...and in a mixed trigger, where the delta path's kept scan
      // carries the check
      val s4 = MemoryStream[VecIn](spark)
      val q4 = SemDedupStream.semDedupStream(s4.toDF()).writeStream
        .format("memory").queryName("semdedup_boot_replay_mixed")
        .outputMode("append").start()
      try {
        s4.addData(Seq(v(5, delta = false)))
        q4.processAllAvailable()
        s4.addData(Seq(v(5, delta = false), v(6, delta = true)))
        val e = intercept[Exception](q4.processAllAvailable())
        assert(violations(e).exists(_.contains("contract violation")))
      } finally q4.stop()
    }
  }

  test("the kept set survives a checkpoint restart") {
    withRocksDb {
      import spark.implicits._
      // the recurrence fixture again, but the query is STOPPED after
      // snapshot 2 and a fresh query resumes from the checkpoint —
      // snapshot 3's verdicts depend entirely on state (who survived
      // t1/t2), so getting them right proves the kept MapState recovered,
      // not merely persisted within one run
      def v(id: Long, x: Double, y: Double, z: Double, delta: Boolean) =
        VecIn(id, 0L, Array(x, y, z), delta)
      val stream = MemoryStream[VecIn](spark)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_semdedup_ckpt").toString
      // the memory sink refuses checkpoint recovery (not fault-
      // tolerant); foreachBatch is the recovery-capable sink
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Option[Long], Option[Long], Option[Long], Boolean)]
      def start() = SemDedupStream.semDedupStream(stream.toDF())
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[SemDedupOut], _: Long) =>
            val rows = ds.collect().map(o =>
              (o.vec_id, o.dup_of_base, o.dup_of_delta, o.dup_of, o.kept))
            buf.synchronized { buf ++= rows; () }
        }.start()
      val q1 = start()
      try {
        stream.addData(Seq(v(1, 1, 0, 0, delta = false)))
        q1.processAllAvailable()
        stream.addData(Seq(v(10, 0, 1, 0, delta = true),
          v(11, 0.6, 0.8, 0, delta = true)))
        q1.processAllAvailable()
      } finally q1.stop()
      buf.synchronized(buf.clear()) // only the post-restart verdicts
      val q2 = start()
      try {
        stream.addData(Seq(v(20, 0, 1, 0, delta = true),
          v(21, 0.6, 0.8, 0, delta = true)))
        q2.processAllAvailable()
      } finally q2.stop()
      val after = buf.synchronized(buf.toSet)
      // 20 must match the RECOVERED survivor 10 (not the dropped 11);
      // 21 must see base {1, 10} across the restart boundary (min id
      // 1) and its same-trigger smaller sibling 20 (cos 0.8)
      assert(after == Set(
        (20L, Some(10L), None, Some(10L), false),
        (21L, Some(1L), Some(20L), Some(1L), false)))
    }
  }

  test("the recurrence: survivors accumulate, dropped rows vanish") {
    withRocksDb {
      // hand-computed three-snapshot history in one cluster, tau 0.3;
      // all cosines land >= 0.02 from the threshold after rounding
      def v(id: Long, x: Double, y: Double, z: Double, delta: Boolean) =
        VecIn(id, 0L, Array(x, y, z), delta)
      val t1 = Seq(v(1, 1, 0, 0, delta = false)) // bootstrap corpus
      val t2 = Seq(
        v(10, 0, 1, 0, delta = true), // cos 0 vs base -> kept
        v(11, 0.6, 0.8, 0, delta = true), // 0.6 vs 1; 0.8 vs 10
        v(12, 0.21, 0.28, 0.936, delta = true)) // only matches 11 (0.35)
      val t3 = Seq(
        v(19, 0.21, 0.28, 0.936, delta = true), // == 12; 11/12 dropped
        v(20, 0, 1, 0, delta = true), // cos 1.0 vs the KEPT 10
        v(21, 0.6, 0.8, 0, delta = true)) // 1 and 10 in base; 19 in-trigger
      val out = runStream("semdedup_recurrence", Seq(t1, t2, t3))
      assert(out == Set[OutRow](
        // snapshot 1 (bootstrap) emits nothing
        // snapshot 2
        (10L, 0L, None, None, None, true),
        (11L, 0L, Some(1L), Some(10L), Some(1L), false),
        // attribution to the DROPPED 11 — delta x delta has no kept
        // filter — while 12 misses the whole base
        (12L, 0L, None, Some(11L), Some(11L), false),
        // snapshot 3
        // 19 repeats the dropped 12 verbatim: dropped rows are NOT in
        // the comparison space, so it is kept
        (19L, 0L, None, None, None, true),
        // 20 matches the snapshot-2 SURVIVOR 10 as base
        (20L, 0L, Some(10L), None, Some(10L), false),
        // 21: base min(1, 10) = 1; in-trigger min(19, 20) = 19;
        // dup_of = least
        (21L, 0L, Some(1L), Some(19L), Some(1L), false)))
    }
  }
}

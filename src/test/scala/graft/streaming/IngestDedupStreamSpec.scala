package graft.streaming

import graft.SparkSuite
import graft.dedup.DedupOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import IngestDedupStream.{DocIn, IngestOut}

/** The streaming ingest-dedup twin's contract: replaying the batch
  * operator's own (fingerprint, corpus/delivery split) input through
  * transformWithState yields dedupBloomIncremental's oracle-green rows
  * EXACTLY — kept docs only, (doc_id, h), regardless of how the corpus
  * is chunked into bootstrap triggers — plus the recurrence the batch
  * can only assume: day N's survivors screen day N+1, dropped docs
  * never block anything (their fingerprint remains represented by
  * whatever they duplicated), and same-h docs within one delivery all
  * survive (the batch anti-join probes only the corpus side).
  */
class IngestDedupStreamSpec extends SparkSuite {


  private def runStream(name: String,
      triggers: Seq[Seq[DocIn]]): Set[(Long, Long)] = {
    import spark.implicits._
    val stream = MemoryStream[DocIn](spark)
    val q = IngestDedupStream.ingestDedupStream(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      triggers.foreach { g =>
        if (g.nonEmpty) stream.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val assignedRows: Seq[DocIn] =
    DedupOps.bloomIncrAssigned(spark, sf0001)
      .collect()
      .map(r => DocIn(r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_.doc_id)

  private lazy val batchRows: Set[(Long, Long)] =
    DedupOps.dedupBloomIncremental(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed screen equals the batch operator (corpus, then delivery)") {
    withRocksDb {
      assert(batchRows.nonEmpty)
      val (delta, corpus) = assignedRows.partition(_.is_delta)
      assert(corpus.nonEmpty && delta.nonEmpty)
      assert(runStream("ingest_two_triggers", Seq(corpus, delta))
        == batchRows)
    }
  }

  test("bootstrap chunking does not change the output") {
    withRocksDb {
      val (delta, corpus) = assignedRows.partition(_.is_delta)
      // the corpus split across two triggers...
      val (c1, c2) = corpus.splitAt(corpus.size / 2)
      assert(runStream("ingest_chunked", Seq(c1, c2, delta)) == batchRows)
      // ...and corpus + delivery sharing ONE trigger (the batch's
      // one-shot world: the corpus half is absorbed first)
      assert(runStream("ingest_one_trigger", Seq(assignedRows))
        == batchRows)
    }
  }

  test("the multi-delivery recurrence: survivors screen, drops do not block") {
    withRocksDb {
      def c(id: Long, h: Long) = DocIn(id, h, is_delta = false)
      def d(id: Long, h: Long) = DocIn(id, h, is_delta = true)
      val out = runStream("ingest_recurrence", Seq(
        Seq(c(1, 100)),
        // delivery 1: 4 is new (kept), 8 duplicates the corpus
        // (dropped), 12 shares h with 4 IN THE SAME delivery — both
        // survive, the batch-parity rule
        Seq(d(4, 200), d(8, 100), d(12, 200)),
        // delivery 2: 16 duplicates delivery 1's SURVIVOR (dropped —
        // the recurrence), 20 is new
        Seq(d(16, 200), d(20, 300))))
      assert(out == Set((4L, 200L), (12L, 200L), (20L, 300L)))
    }
  }

  test("contract violations fail the query loudly") {
    withRocksDb {
      import spark.implicits._
      def violations(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage)).toSeq
      // the same doc_id twice inside one trigger
      val s1 = MemoryStream[DocIn](spark)
      val q1 = IngestDedupStream.ingestDedupStream(s1.toDF()).writeStream
        .format("memory").queryName("ingest_dupid")
        .outputMode("append").start()
      try {
        s1.addData(Seq(DocIn(7, 100, true), DocIn(7, 100, true)))
        val e = intercept[Exception](q1.processAllAvailable())
        assert(violations(e).exists(_.contains("appears twice")))
      } finally q1.stop()
      // a corpus row arriving AFTER its shard screened a delivery —
      // same shard via h ≡ 100 (mod NumShards)
      val s2 = MemoryStream[DocIn](spark)
      val q2 = IngestDedupStream.ingestDedupStream(s2.toDF()).writeStream
        .format("memory").queryName("ingest_lateboot")
        .outputMode("append").start()
      try {
        s2.addData(Seq(DocIn(4, 100, true)))
        q2.processAllAvailable()
        s2.addData(Seq(DocIn(1, 100 + IngestDedupStream.NumShards, false)))
        val e = intercept[Exception](q2.processAllAvailable())
        assert(violations(e)
          .exists(_.contains("before the live feed")))
      } finally q2.stop()
    }
  }

  test("the accumulated corpus survives a checkpoint restart") {
    withRocksDb {
      import spark.implicits._
      // query 1 absorbs the corpus and screens delivery 1; a fresh
      // query resumes from the checkpoint — every delivery-2 verdict
      // depends entirely on recovered MapState (a corpus fingerprint,
      // a delivery-1 survivor's fingerprint, and the screened flag)
      val stream = MemoryStream[DocIn](spark)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_ingest_ckpt").toString
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def start() = IngestDedupStream.ingestDedupStream(stream.toDF())
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[IngestOut], _: Long) =>
            val rows = ds.collect().map(o => (o.doc_id, o.h))
            buf.synchronized { buf ++= rows; () }
        }.start()
      val q1 = start()
      try {
        stream.addData(Seq(DocIn(1, 100, false)))
        q1.processAllAvailable()
        stream.addData(Seq(DocIn(4, 200, true)))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(buf.synchronized(buf.toSet) == Set((4L, 200L)))
      buf.synchronized(buf.clear()) // only the post-restart verdicts
      val q2 = start()
      try {
        stream.addData(Seq(
          DocIn(8, 100, true), // dup of the recovered corpus → dropped
          DocIn(12, 200, true), // dup of the recovered survivor → dropped
          DocIn(16, 300, true))) // genuinely new → kept
        q2.processAllAvailable()
      } finally q2.stop()
      assert(buf.synchronized(buf.toSet) == Set((16L, 300L)))
    }
  }
}

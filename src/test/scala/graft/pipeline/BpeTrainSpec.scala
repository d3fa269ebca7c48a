package graft.pipeline

import graft.SparkSuite

/** Checks for pipe_bpe_train: the distributed merge loop must equal a
  * pure-driver reimplementation (same normalization, same tie-break,
  * same double-pass non-overlapping replace) run on the collected
  * sf0.001 corpus, and the learned top-pair counts must be
  * non-increasing across rounds (any post-merge pair instance maps
  * into at least one pre-merge instance of some pair, so no later top
  * can beat an earlier one).
  */
class BpeTrainSpec extends SparkSuite {

  private def driverBpe(texts: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var corpus = texts
      .map(t => Option(t).getOrElse("").toLowerCase
        .take(PipelineOps.BpePrefixChars).replaceAll("[^a-z]", ""))
      .filter(_.length >= 2)
      .map(_.toCharArray.mkString(" "))
    (1 to rounds).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { s =>
        s.split(" ").sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      // seq the entries BEFORE sorting: a Map-shaped pipeline would
      // collapse duplicate keys (there are none here, but the idiom
      // burned a previous spec)
      val ((l, r), c) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      val pat = s" $l $r "
      val rep = s" $l$r "
      corpus = corpus.map(s => (" " + s + " ")
        .replace(pat, rep).replace(pat, rep).trim)
      (k, l, r, c)
    }
  }

  test("merge table equals the driver replay and tops are monotone") {
    val got = PipelineOps.bpeTrain(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got.size == PipelineOps.BpeRounds)
    val texts = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val want = driverBpe(texts, PipelineOps.BpeRounds)
    assert(got == want)
    got.map(_._4).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, s"top counts not monotone: $a < $b")
      case _ =>
    }
  }

  test("final-round lineage is cut by the snapshot cadence (r13 #1)") {
    // the O(R²) recompute fix: round k must apply at most
    // 2·BpePersistEvery replace layers to the NEWEST persisted
    // snapshot, never k layers to corpus0. Pin it by counting replace
    // nodes in the final corpus's optimized plan and asserting the
    // scan source is an in-memory snapshot, not the parquet relation.
    val t = PipelineOps.bpeTrainLoop(spark, sf0001)
    try {
      val plan = t.finalCorpus.queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"),
        "final round must read a persisted snapshot, not recompute " +
          "from parquet")
      // only the layers ABOVE the snapshot scan count against the
      // bound (InMemoryRelation prints its cached child plan, which
      // legitimately holds the pre-snapshot rounds); \b keeps
      // regexp_replace from round 0's normalization out of the tally
      val above = plan.substring(0, plan.indexOf("InMemoryRelation"))
      val replaces = "\\breplace\\(".r.findAllIn(above).size
      assert(replaces <= 2 * PipelineOps.BpePersistEvery,
        s"$replaces replace layers above the snapshot — lineage " +
          s"not cut (bound: ${2 * PipelineOps.BpePersistEvery})")
      assert(!above.contains("Parquet"),
        "final-round plan still reaches the parquet scan above the " +
          "snapshot — the cadence is not cutting lineage")
      // ⌈R/E⌉ live generations at most: corpus0 plus the newest snap
      assert(t.snapshots.size <= PipelineOps.BpeRounds /
        PipelineOps.BpePersistEvery + 1)
    } finally t.snapshots.foreach(_.unpersist())
  }

  test("sf0.01 learns a multi-char merge — the loop is iterative") {
    // at least one learned merge must touch a multi-char token, or the
    // iteration would be indistinguishable from a one-shot bigram
    // count (sf0.001's 8 rounds stay single-char; sf0.01 merges m+er)
    val got = PipelineOps.bpeTrain(spark, sf001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.exists(m => m._1.length > 1 || m._2.length > 1))
  }
}

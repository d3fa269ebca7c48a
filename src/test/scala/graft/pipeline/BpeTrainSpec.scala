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

  test("sf0.01 learns a multi-char merge — the loop is iterative") {
    // at least one learned merge must touch a multi-char token, or the
    // iteration would be indistinguishable from a one-shot bigram
    // count (sf0.001's 8 rounds stay single-char; sf0.01 merges m+er)
    val got = PipelineOps.bpeTrain(spark, sf001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.exists(m => m._1.length > 1 || m._2.length > 1))
  }
}

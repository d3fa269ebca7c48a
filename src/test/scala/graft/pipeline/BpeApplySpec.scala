package graft.pipeline

import graft.SparkSuite

/** Differential test for [[PipelineOps.bpeApply]]: re-apply the
  * merges [[PipelineOps.bpeTrain]] publishes (already differentially
  * tested) to every document in plain driver-side Scala with the same
  * double-pass padded replace, and compare per-doc token counts.
  */
class BpeApplySpec extends SparkSuite {

  test("pipe_bpe_apply matches a driver re-application of the merges") {
    val merges = PipelineOps.bpeTrain(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("doc_id",
        s"regexp_replace(lower(substring(coalesce(text, ''), 1, " +
          s"${PipelineOps.BpePrefixChars})), '[^a-z]', '') as raw")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.nonEmpty)

    def applyMerges(raw: String): Int = {
      var s = raw.toCharArray.mkString(" ")
      for ((l, r) <- merges) {
        val pat = s" $l $r "
        val rep = s" $l$r "
        s = (" " + s + " ").replace(pat, rep)
        s = s.replace(pat, rep).trim
      }
      s.split(" ").length
    }

    val expected = docs.map { case (id, raw) =>
      val nt = applyMerges(raw).toLong
      val nc = raw.length.toLong
      (id, nc, nt, (nt * 10000L + nc / 2) / nc)
    }.sortBy(_._1).toSeq

    val got = PipelineOps.bpeApply(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    assert(got == expected)
    // merges must actually compress: total tokens strictly below total
    // chars, and no doc gains tokens
    assert(got.map(_._3).sum < got.map(_._2).sum)
    assert(got.forall(t => t._3 <= t._2 && t._3 >= 1))
    // some doc must hit a multi-merge (ratio well below 1 token/char)
    assert(got.exists(_._4 <= 8000), "no doc compressed below 0.8 tok/char")
  }
}

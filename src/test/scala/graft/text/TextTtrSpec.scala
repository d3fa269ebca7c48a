package graft.text

import graft.SparkSuite

/** Differential test for [[TextOps.textTtr]]: recompute the
  * per-source type-token ratio and hapax census on the driver from
  * the raw fixture and compare every column — independent of both the
  * Spark plan and the DuckDB oracle (which replay the same algorithm
  * and so could share a bug).
  */
class TextTtrSpec extends SparkSuite {

  test("text_ttr matches a driver recompute at sf0.001") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val toks = rows.flatMap(_._2.split(" ", -1))
        val counts = toks.groupBy(identity).view.mapValues(_.size)
        val total = toks.size.toLong
        val vocab = counts.size.toLong
        val hapax = counts.count(_._2 == 1).toLong
        (src, total, vocab, hapax,
          (vocab * 1000000L + total / 2) / total,
          (hapax * 1000000L + vocab / 2) / vocab)
    }
    val got = TextOps.textTtr(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // sanity: natural-text fixture sources are lexically non-trivial
    assert(got.forall { case (_, total, vocab, hapax, _, _) =>
      vocab > 1 && hapax <= vocab && vocab <= total })
  }
}

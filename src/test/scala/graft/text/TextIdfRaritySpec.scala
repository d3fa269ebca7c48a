package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Differential test for [[TextOps.textIdfRarity]]: the whole pipeline
  * (corpus token counts, integer floor-log10 IDF, per-doc fold,
  * half-up basis points) is recomputed in plain driver Scala sharing
  * no Spark code, then compared row-for-row.
  */
class TextIdfRaritySpec extends SparkSuite {

  test("token-rarity scores match an independent driver recompute") {
    val docs: Array[(Long, String)] =
      graft.core.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))

    // corpus counts over the same tokenization (lower + split on ' ')
    val allToks = docs.flatMap { case (_, t) => t.toLowerCase.split(" ", -1) }
    val cnt: Map[String, Long] =
      allToks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val total = allToks.length.toLong
    def rare(tok: String): Long = (total / cnt(tok)).toString.length.toLong

    val expected = docs.map { case (id, t) =>
      val toks = t.toLowerCase.split(" ", -1)
      val n = toks.length.toLong
      val rs = toks.map(rare).sum
      (id, n, rs, (rs * 10000L + n / 2) / n)
    }.sortBy(_._1).toSeq

    val got = TextOps.textIdfRarity(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    assert(got == expected)
    // the fixture must spread scores (rare AND common tokens exist)
    assert(expected.map(_._4).distinct.size > 1)
  }
}

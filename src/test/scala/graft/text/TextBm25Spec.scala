package graft.text

import graft.SparkSuite
import graft.core.Tables

/** Differential for the fixed-point BM25 ranker: an independent
  * driver-side Scala recompute of the same integer recipe (plain Long
  * arithmetic, no Catalyst) must produce the identical top-k list.
  * This pins the Spark expression tree — operator precedence, div
  * placement, overflow-free ordering — against a second implementation;
  * the DuckDB oracle then pins it against a third engine.
  */
class TextBm25Spec extends SparkSuite {

  test("BM25 top-k matches an independent driver recompute") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").toSeq)
    val n = docs.length.toLong
    val lens = docs.map { case (id, tk) => id -> tk.length.toLong }.toMap
    val bigL = lens.values.sum
    val terms = TextOps.bm25Terms
    val tf = for {
      (id, tk) <- docs; t <- terms
      f = tk.count(_ == t).toLong if f > 0
    } yield (id, t, f)
    val dfm = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val scores = tf.groupBy(_._1).map { case (id, xs) =>
      val len = lens(id)
      id -> xs.map { case (_, t, f) =>
        val df = dfm(t)
        val idfE6 = ((2 * n - 2 * df + 1) * 1000000L) / (2 * df + 1)
        val rE6 = (len * n * 1000000L) / bigL
        val denomE6 = f * 1000000L + 300000L + (9L * rE6) / 10L
        (f * idfE6 * 110000L) / (5L * denomE6)
      }.sum
    }
    val expected = scores.toSeq
      .sortBy { case (id, s) => (-s, id) }.take(TextOps.bm25K)
    val got = TextOps.textBm25TopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected,
      s"got ${got.take(5)}... expected ${expected.take(5)}...")
    // the fixture must exercise real ranking: distinct positive scores
    assert(expected.map(_._2).distinct.size > 1 && expected.head._2 > 0)
  }
}

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
        (idfE6 * 110000L) / (5L * (denomE6 / f))
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

  test("BM25 top-k plans per-partition heads, not a global sort") {
    val plan = TextOps.textBm25TopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for the k=20 head:\n$plan")
  }

  test("fixed-point recipe never overflows int64 on its documented domain") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // domain from the scaladoc: N <= 10^7 docs, len <= 10^4 tokens,
    // 1 <= tf <= len, 1 <= df <= N, L >= N (every doc has >= 1 token).
    // Long arithmetic == BigInt arithmetic proves no intermediate
    // wrapped; the adversarial corners (df=1 with huge tf·N — where
    // the naive product ordering wraps) are forced, not sampled.
    val gen = for {
      n <- Gen.choose(1L, 10000000L)
      lenAvg <- Gen.choose(1L, 10000L)
      len <- Gen.choose(1L, 10000L)
      tf <- Gen.choose(1L, len)
      df <- Gen.choose(1L, n)
    } yield (n, math.max(n * lenAvg, n), len, tf, df)
    val corners = Seq(
      (10000000L, 10000000L, 10000L, 10000L, 1L), // max N, min df, max tf
      (10000000L, 100000000000L, 10000L, 10000L, 1L), // max L
      (1L, 1L, 1L, 1L, 1L), // degenerate single-doc corpus
      (10000000L, 10000000L, 10000L, 1L, 10000000L)) // max df
    val cases = corners ++ (0 until 2000).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(7L + i)))
    cases.foreach { case (n, l, len, tf, df) =>
      val lg = {
        val idfE6 = ((2 * n - 2 * df + 1) * 1000000L) / (2 * df + 1)
        val rE6 = (len * n * 1000000L) / l
        val denomE6 = tf * 1000000L + 300000L + (9L * rE6) / 10L
        (idfE6 * 110000L) / (5L * (denomE6 / tf))
      }
      val bg = {
        val idfE6 = (BigInt(2 * n - 2 * df + 1) * 1000000) / (2 * df + 1)
        val rE6 = (BigInt(len) * n * 1000000) / l
        val denomE6 = BigInt(tf) * 1000000 + 300000 + (9 * rE6) / 10
        (idfE6 * 110000) / (5 * (denomE6 / tf))
      }
      assert(BigInt(lg) == bg && lg >= 0,
        s"overflow at (N=$n, L=$l, len=$len, tf=$tf, df=$df): long=$lg big=$bg")
    }
  }
}

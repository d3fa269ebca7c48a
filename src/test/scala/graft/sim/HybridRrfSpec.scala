package graft.sim

import graft.SparkSuite
import graft.core.Tables
import graft.text.TextOps

/** Differential for [[SimilarityOps.hybridRrfTopK]]: recompute BOTH
  * retrieval arms independently driver-side — the integer BM25 recipe
  * (as in TextBm25Spec) and brute-force cosine ranks with Spark's
  * HALF_UP 4-decimal rounding — fuse them with the truncating integer
  * RRF, and compare the top-20 row-for-row.
  */
class HybridRrfSpec extends SparkSuite {

  private def rrf(rank: Long): Long =
    if (rank == 0L) 0L else 1000000L / (60L + rank)

  test("hybrid RRF top-20 matches an independent two-arm recompute") {
    // lexical arm: integer BM25 over the fixed terms
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").toSeq)
    val n = docs.length.toLong
    val lens = docs.map { case (id, tk) => id -> tk.length.toLong }.toMap
    val bigL = lens.values.sum
    val tf = for {
      (id, tk) <- docs.toSeq; t <- TextOps.bm25Terms
      f = tk.count(_ == t).toLong if f > 0
    } yield (id, t, f)
    val dfm = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val lexRank: Map[Long, Long] = tf.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, t, f) =>
        val df = dfm(t)
        val idfE6 = ((2 * n - 2 * df + 1) * 1000000L) / (2 * df + 1)
        val rE6 = (lens(id) * n * 1000000L) / bigL
        val denomE6 = f * 1000000L + 300000L + (9L * rE6) / 10L
        (idfE6 * 110000L) / (5L * (denomE6 / f))
      }.sum
    }.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(100).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

    // semantic arm: cosine to doc 0's embedding, HALF_UP 4-decimal
    val embs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
    val qv = embs.find(_._1 == 0L).get._2
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val qn = norm(qv)
    val semRank: Map[Long, Long] = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        val c = v.zip(qv).map { case (a, b) => a * b }.sum / (norm(v) * qn)
        id -> BigDecimal(c)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      .sortBy { case (id, c) => (-c, id) }
      .take(100).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

    val expected = (lexRank.keySet ++ semRank.keySet).toSeq
      .map { id =>
        val (lr, sr) = (lexRank.getOrElse(id, 0L), semRank.getOrElse(id, 0L))
        (id, lr, sr, rrf(lr) + rrf(sr))
      }
      .sortBy { case (id, _, _, s) => (-s, id) }
      .take(20)

    val got = SimilarityOps.hybridRrfTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"got ${got.take(4)}... expected ${expected.take(4)}...")
    // the fixture must exercise real fusion: the top-20 needs docs
    // retrieved by both arms AND docs only one arm found
    assert(got.exists(r => r._2 > 0 && r._3 > 0), "no two-arm doc")
    assert(got.exists(r => r._2 == 0 || r._3 == 0), "no one-arm doc")
  }

  test("each arm's rank window sits above a pushed top-100 head") {
    // LimitPushDownThroughWindow rewrites `row_number <= 100` into a
    // TakeOrderedAndProject(limit=100) BELOW the window (per-partition
    // heads, then rank the 100 survivors) — strictly better than the
    // WindowGroupLimit form, and the justification for this query's
    // exemption from PlanAuditSpec's string heuristic.
    val plan = SimilarityOps.hybridRrfTopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    val armHeads =
      "TakeOrderedAndProject\\(limit=100".r.findAllIn(plan).size
    assert(armHeads == 2,
      s"expected 2 pushed arm heads, got $armHeads:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"fused top-20 should be a TakeOrderedAndProject head:\n$plan")
  }
}

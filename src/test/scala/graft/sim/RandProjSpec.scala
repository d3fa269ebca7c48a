package graft.sim

import graft.SparkSuite

/** Differential test for [[SimilarityOps.embRandProj]]: recompute the
  * LCG-sign projection on the driver and compare, then pin the two
  * properties downstream indexes rely on — exact linearity
  * P(a−b) = Pa − Pb (integer arithmetic, must hold bit-for-bit) and
  * JL distance concentration (projected squared distances within a
  * loose constant band of d_out·original).
  */
class RandProjSpec extends SparkSuite {

  private val D = SimilarityOps.RandProjDims

  private def sign(i: Int, j: Int): Long = {
    val x = 1L + i * D + j
    val h1 = (x * 2654435761L) % 4294967296L
    val h2 = h1 ^ (h1 / 65536)
    val h3 = (h2 * 1597334677L) % 4294967296L
    val h4 = h3 ^ (h3 / 8192)
    if (h4 % 2 == 0) 1L else -1L
  }
  private def project(q: Array[Long]): Array[Long] =
    Array.tabulate(D)(j =>
      (0 until 64).map(i => q(i) * sign(i, j)).sum)

  test("emb_rand_proj matches a driver recompute and preserves geometry") {
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000d + 0.5d) as bigint)) as qv")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

    val expected = vecs.map { case (id, q) => id -> project(q) }.toMap

    val got = SimilarityOps.embRandProj(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        Array.tabulate(D)(j => r.getLong(1 + j))).toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (id, p) =>
      assert(p.sameElements(expected(id)), s"projection mismatch for $id")
    }

    // exact linearity: P(a-b) == Pa - Pb for sampled pairs
    val ids = vecs.map(_._1).sorted.take(20)
    val byId = vecs.toMap
    for (Array(a, b) <- ids.combinations(2).take(50)) {
      val diff = project(byId(a).zip(byId(b)).map { case (x, y) => x - y })
      val sub = got(a).zip(got(b)).map { case (x, y) => x - y }
      assert(diff.sameElements(sub), s"linearity broken for ($a,$b)")
    }

    // JL concentration: ||Pa-Pb||^2 within a loose band of D*||a-b||^2
    val ratios = for (Array(a, b) <- ids.combinations(2).take(100).toSeq)
      yield {
        val d2 = byId(a).zip(byId(b))
          .map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
        val p2 = got(a).zip(got(b))
          .map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
        p2 / (D * d2)
      }
    assert(ratios.forall(r => r > 0.15 && r < 4.0),
      s"JL distortion out of band: min=${ratios.min} max=${ratios.max}")
  }
}

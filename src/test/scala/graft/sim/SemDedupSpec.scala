package graft.sim

import graft.SparkSuite
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Differential test for [[SimilarityOps.embSemDedup]]: recompute the
  * whole pipeline (integer-grid argmin assignment, within-cluster
  * pairwise cosine, greedy lowest-id-wins drop) in plain driver-side
  * Scala and compare row-for-row. The driver recompute shares NO Spark
  * code with the operator, so an error in either the quantized
  * distance, the tiebreak, or the drop rule fails the build.
  */
class SemDedupSpec extends SparkSuite {

  private val K = 16
  private val Tau = 0.3

  private def round4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  test("emb_semdedup matches an independent driver recompute") {
    val vecs: Array[(Long, Array[Double])] =
      graft.core.Tables.embeddings(spark, sf0001)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)

    // assignment: quantized BIGINT squared distance, lowest-cid tiebreak
    def quant(v: Array[Double]): Array[Long] =
      v.map(x => math.floor(x * 10000.0 + 0.5).toLong)
    val cents = vecs.filter(_._1 < K).map { case (id, v) => (id, quant(v)) }
    val cluster: Map[Long, Long] = vecs.map { case (id, v) =>
      val q = quant(v)
      val best = cents.map { case (cid, cv) =>
        var d = 0L; var i = 0
        while (i < q.length) { val t = q(i) - cv(i); d += t * t; i += 1 }
        (d, cid)
      }.min
      id -> best._2
    }.toMap

    // greedy lowest-id-wins within cluster at rounded cos >= Tau
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.toMap
    val expected = vecs.map { case (id, v) =>
      val dominators = vecs.filter { case (oid, _) =>
        oid < id && cluster(oid) == cluster(id)
      }.filter { case (_, ov) => round4(cos(ov, v)) >= Tau }
      val dupOf = dominators.map(_._1).sorted.headOption
      (id, cluster(id), dupOf, dupOf.isEmpty)
    }.toSeq

    val got = SimilarityOps.embSemDedup(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))
    }.toSeq

    assert(got == expected)
    assert(byId.size == got.size)
  }

  test("result is invariant to the oversized-cluster split bound") {
    // the block-pair tiling must only change WHERE pairs are computed,
    // never WHICH pairs: any blockSize — including 1 (every member its
    // own block, maximal tiling) and one larger than any cluster (the
    // un-split single-tile shape) — yields the identical result
    def run(blockSize: Int): Seq[(Long, Long, Option[Long], Boolean)] =
      SimilarityOps.embSemDedup(spark, sf0001, blockSize = blockSize)
        .collect().map { r =>
          (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))
        }.toSeq
    val baseline = run(1 << 20) // no cluster splits: the pre-tiling shape
    for (bs <- Seq(1, 4, 16)) {
      assert(run(bs) == baseline, s"blockSize=$bs diverged from un-split")
    }
    // sf0.001 has ~31 members per cluster, so blockSize 1/4/16 all
    // exercise real multi-tile joins, not the degenerate (0,0) tile
  }

  test("the lowest vec_id of every cluster is always kept") {
    val rows = SimilarityOps.embSemDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    rows.groupBy(_._2).foreach { case (c, members) =>
      val lowest = members.minBy(_._1)
      assert(lowest._3, s"lowest id ${lowest._1} of cluster $c was dropped")
    }
    // the fixture must actually exercise the drop path
    assert(rows.exists(!_._3), "no vector was dropped — threshold too high")
  }
}

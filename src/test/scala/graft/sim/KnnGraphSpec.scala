package graft.sim

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for emb_knn_graph: the block-tiled ranked edges
  * must equal an unblocked driver brute force (the oracle also blocks
  * by label, so a tiling bug needs this sweep to surface).
  */
class KnnGraphSpec extends SparkSuite {

  test("edges equal the unblocked brute-force top-3") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        expr("cast(embedding as array<double>)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val want = vecs.flatMap { case (src, lbl, v) =>
      vecs.filter(o => o._2 == lbl && o._1 != src)
        .map(o => (o._1, cos(v, o._3)))
        .sortBy { case (dst, c) => (-c, dst) }
        .take(3).zipWithIndex
        .map { case ((dst, c), i) => (src, dst, lbl, i + 1, c) }
    }.sortBy(e => (e._1, e._4))

    val got = SimilarityOps.embKnnGraph(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))

    assert(got.length == want.length,
      s"edge count ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"edge $g vs $w")
      assert(math.abs(g._5 - w._5) < 1e-9, s"cos at $g")
    }
  }

  test("ANN graph: exact cosines, valid ranking, pinned global recall") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        expr("cast(embedding as array<double>)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byId = vecs.map(v => v._1 -> v._3).toMap

    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val got = SimilarityOps.embKnnGraphAnn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))

    // every vector emits exactly k=3 edges (each IVF cell holds far
    // more than 4 members on this fixture, so no src starves)
    assert(got.length == vecs.length * 3,
      s"edge count ${got.length} != ${vecs.length * 3}")
    // each emitted edge carries the EXACT brute-force cosine and the
    // src's own label — approximation lives only in WHICH edges exist
    got.foreach { case (src, dst, lbl, _, c) =>
      assert(math.abs(c - cos(byId(src), byId(dst))) < 1e-9,
        s"cos mismatch at ($src, $dst)")
      assert(vecs.find(_._1 == src).get._2 == lbl, s"label at $src")
    }
    // within each src, ranks 1..3 strictly follow (-cos, dst)
    got.groupBy(_._1).foreach { case (src, es) =>
      val sorted = es.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == Seq(1, 2, 3), s"ranks at $src")
      sorted.sliding(2).foreach { case Array(x, y) =>
        assert(x._5 > y._5 || (x._5 == y._5 && x._2 < y._2),
          s"order at $src: $x !>= $y")
      }
    }
    // recall vs the GLOBAL (unblocked) brute-force top-3: the IVF
    // screen is deterministic, so the measured recall is exact and
    // pinned — a quantizer/probing regression shows as a moved number
    val truth = vecs.flatMap { case (src, _, v) =>
      vecs.filter(_._1 != src)
        .map(o => (o._1, cos(v, o._3)))
        .sortBy { case (dst, c) => (-c, dst) }
        .take(3).map { case (dst, _) => (src, dst) }
    }.toSet
    val gotEdges = got.map(e => (e._1, e._2)).toSet
    // Pinned EXACTLY (the AnnSpec convention): 647/1500 at nProbe=2 on
    // the near-uniform sf0.001 fixture — IVF recall is low when true
    // neighbors spread across cells (same reason ann_ivf_topk pins
    // 62/100 at nProbe=4). The number moving is the regression signal;
    // raising it is a probe-count cost knob, not a correctness fix.
    val recall = (truth & gotEdges).size
    info(s"ANN kNN-graph recall = $recall/${truth.size}")
    assert(recall == 647,
      s"ANN graph recall $recall/${truth.size} != pinned 647/1500")
  }
}

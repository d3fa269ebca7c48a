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
}

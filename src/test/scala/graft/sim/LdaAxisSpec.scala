package graft.sim

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for emb_lda_axis: centroids, axis, scores, and
  * side flags re-derived on the driver with the same integer
  * arithmetic — exact equality required.
  */
class LdaAxisSpec extends SparkSuite {

  test("scores and sides match a driver re-derivation exactly") {
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        expr("transform(cast(embedding as array<double>), " +
          "x -> cast(floor(x * 10000d + 0.5d) as bigint))").as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val dim = rows.head._3.length

    // half-up integer mean, the shared centroid rule
    def centroid(label: Int): Array[Long] = {
      val vs = rows.filter(_._2 == label).map(_._3)
      Array.tabulate(dim) { d =>
        val s = vs.map(_(d)).sum
        val n = vs.length.toLong
        val num = s + n / 2
        (num - (((num % n) + n) % n)) / n // floor((s + n/2) / n), sign-safe
      }
    }
    val c0 = centroid(0)
    val c1 = centroid(1)
    val axis = Array.tabulate(dim)(d => c1(d) - c0(d))
    val thr2 = (0 until dim).map(d => (c0(d) + c1(d)) * axis(d)).sum

    val got = SimilarityOps.embLdaAxis(spark, sf0001).collect()
    assert(got.length == rows.length)
    val byId = rows.map(r => r._1 -> r).toMap
    got.foreach { r =>
      val (_, label, q) = byId(r.getLong(0))
      val score = (0 until dim).map(d => q(d) * axis(d)).sum
      assert(r.getInt(1) == label)
      assert(r.getLong(2) == score, s"score for vec ${r.getLong(0)}")
      assert(r.getInt(3) == (if (2 * score > thr2) 1 else 0),
        s"side for vec ${r.getLong(0)}")
    }
    // both labels exist in the fixture, so the axis is real
    assert(rows.exists(_._2 == 0) && rows.exists(_._2 == 1))
  }
}

package graft.sim

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential + invariant checks for emb_pca_project (the catalog's
  * only rows-only entry — the oracle can't replay an iterative eigen
  * solve, so this spec carries the correctness burden).
  */
class PcaSpec extends SparkSuite {

  private def collectQ(sf: String): Map[Long, Array[Long]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(cast(embedding as array<double>), " +
          "x -> cast(floor(x * 10000 + 0.5d) as bigint))").as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  test("projections equal a driver re-derivation, exactly") {
    val (qc1, qc2, off1, off2) = PcaOps.solveComponents(spark, sf0001)
    val qvecs = collectQ(sf0001)
    val got = PcaOps.pcaProject(spark, sf0001).collect()
    assert(got.length == qvecs.size)
    got.foreach { r =>
      val q = qvecs(r.getLong(0))
      val s1 = q.indices.foldLeft(0L)((a, i) => a + q(i) * qc1(i)) - off1
      val s2 = q.indices.foldLeft(0L)((a, i) => a + q(i) * qc2(i)) - off2
      assert(r.getLong(2) == s1 && r.getLong(3) == s2,
        s"vec ${r.getLong(0)}")
    }
  }

  test("components are orthonormal and variance-ordered") {
    val (qc1, qc2, _, _) = PcaOps.solveComponents(spark, sf0001)
    val c1 = qc1.map(_ / 1e6)
    val c2 = qc2.map(_ / 1e6)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    assert(math.abs(dot(c1, c1) - 1.0) < 1e-3, "c1 not unit")
    assert(math.abs(dot(c2, c2) - 1.0) < 1e-3, "c2 not unit")
    assert(math.abs(dot(c1, c2)) < 1e-3, "c1/c2 not orthogonal")

    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val qvecs = collectQ(sf0001).values.toSeq
    val dim = qvecs.head.length
    val v1 = variance(qvecs.map(q => dot(q.map(_.toDouble), c1)))
    val v2 = variance(qvecs.map(q => dot(q.map(_.toDouble), c2)))
    val bestAxis = (0 until dim)
      .map(d => variance(qvecs.map(_(d).toDouble))).max
    assert(v1 >= v2 * 0.999, "PC1 variance below PC2")
    // PC1 must capture at least as much variance as any raw axis
    assert(v1 >= bestAxis * 0.999, "PC1 variance below best axis")
  }

  test("invariant panel: all ok, exact rows match a driver recompute") {
    val got = PcaOps.pcaInvariants(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.size == 13)
    got.foreach { case (name, (_, ok)) => assert(ok, s"invariant $name") }
    // DuckDB-twin recompute of the exact integer rows
    val qvecs = collectQ(sf0001).values.toSeq
    val n = BigInt(qvecs.size)
    val dim = qvecs.head.length
    val varQ = (0 until dim).map { i =>
      val s = qvecs.map(q => BigInt(q(i))).sum
      val ss = qvecs.map(q => BigInt(q(i)) * BigInt(q(i))).sum
      (n * ss - s * s) / (n * n)
    }
    assert(got("n_rows")._1 == qvecs.size.toLong)
    assert(got("dim")._1 == dim.toLong)
    assert(got("total_var_q")._1 == varQ.sum.toLong)
    assert(got("max_axis_var_q")._1 == varQ.max.toLong)
  }

  test("rerun is bit-identical (deterministic solve)") {
    val a = PcaOps.pcaProject(spark, sf0001).collect().toSeq
    val b = PcaOps.pcaProject(spark, sf0001).collect().toSeq
    assert(a == b)
  }
}

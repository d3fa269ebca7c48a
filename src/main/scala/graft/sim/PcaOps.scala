package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** PCA projection of the embeddings table onto its top-2 principal
  * components — the dimensionality-reduction step visualization and
  * coarse-clustering pipelines run over embedding corpora.
  *
  * Scale shape: the ONLY distributed work is one `treeAggregate` pass
  * accumulating exact integer second moments (n, Σx, Σxxᵀ) — dim +
  * dim² longs per partition, combined associatively, so the reduction
  * is map-side-combining and order-insensitive (long addition is
  * exact, so the result is bit-identical on any cluster layout). The
  * 64×64 eigenproblem is solved on the driver by deterministic power
  * iteration; the quantized components broadcast back as literals and
  * the projection is ONE codegen'd integer-dot-product scan — no
  * shuffle beyond the presentation sort.
  *
  * Cross-engine note: no DuckDB oracle — the catalog entry is
  * rows-only, because the eigenvectors come from an iterative driver
  * solve that static SQL cannot replay. PcaSpec closes the gap by
  * re-deriving every projection on the driver (exact integer
  * equality), pinning component orthonormality, the PC1 ≥ PC2 ≥
  * best-axis variance ordering, and rerun determinism.
  *
  * Integer overflow headroom: |q| ≤ Quant (unit-ish embeddings), so
  * each cross-moment term is ≤ 1e8 and the Σxxᵀ accumulator holds
  * ~9e18/1e8 ≈ 9e10 rows before overflow; a 100 TB corpus beyond that
  * shards the treeAggregate and combines per-shard moments on the
  * driver (the moments are mergeable by construction).
  */
object PcaOps {

  /** Input quantization grid (matches [[KMeansOps.Quant]]): embeddings
    * land on an integer grid so every moment is an exact long.
    */
  private val Quant = 10000.0
  /** Component quantization: eigenvector coordinates as ppm ints. */
  private val CompQuant = 1000000.0

  private def quantizedVec: org.apache.spark.sql.Column =
    expr(s"transform(cast(embedding as array<double>), " +
      s"x -> cast(floor(x * $Quant + 0.5d) as bigint))")

  /** One pass of exact integer moments: (n, Σq, upper-triangle Σqqᵀ). */
  private[sim] def moments(q: DataFrame, dim: Int)
      : (Long, Array[Long], Array[Array[Long]]) = {
    val zero = (0L, new Array[Long](dim), Array.ofDim[Long](dim, dim))
    q.select("qvec").rdd
      .map(_.getSeq[Long](0).toArray)
      .treeAggregate(zero)(
        seqOp = { case ((n, s, c), v) =>
          var i = 0
          while (i < dim) {
            s(i) += v(i)
            var j = i
            while (j < dim) { c(i)(j) += v(i) * v(j); j += 1 }
            i += 1
          }
          (n + 1L, s, c)
        },
        combOp = { case ((n1, s1, c1), (n2, s2, c2)) =>
          var i = 0
          while (i < dim) {
            s1(i) += s2(i)
            var j = i
            while (j < dim) { c1(i)(j) += c2(i)(j); j += 1 }
            i += 1
          }
          (n1 + n2, s1, c1)
        })
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))

  /** Deterministic power iteration for the leading eigenvector of
    * `cov`, re-orthogonalized against `deflate` every step (keeps
    * float error from re-contaminating lower components). Sign is
    * fixed so the largest-|coordinate| entry is positive.
    */
  private def topEigen(cov: Array[Array[Double]],
      deflate: Seq[Array[Double]], iters: Int = 300): Array[Double] = {
    val dim = cov.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i => dot(cov(i), v))
      deflate.foreach { u =>
        val d = dot(w, u)
        var i = 0; while (i < dim) { w(i) -= d * u(i); i += 1 }
      }
      val n = math.sqrt(dot(w, w))
      v = w.map(_ / n)
    }
    val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0) v.map(-_) else v
  }

  /** Driver-side component solve shared by the operator and PcaSpec:
    * returns (qc1, qc2, off1, off2) — ppm-quantized components and the
    * integer centering offsets `Σ round(mean)·qc`.
    */
  private[sim] def solveComponents(spark: SparkSession, sfDir: String)
      : (Array[Long], Array[Long], Long, Long) = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), quantizedVec.as("qvec"))
    val dim = emb.select(size(col("qvec"))).head().getInt(0)
    val (n, s, cUpper) = moments(emb, dim)
    val mean = s.map(_.toDouble / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val cij = if (i <= j) cUpper(i)(j) else cUpper(j)(i)
      cij.toDouble / n - mean(i) * mean(j)
    }
    val c1 = topEigen(cov, Nil)
    val c2 = topEigen(cov, Seq(c1))
    val qc1 = c1.map(x => math.round(x * CompQuant))
    val qc2 = c2.map(x => math.round(x * CompQuant))
    val qMean = s.map(x => math.round(x.toDouble / n))
    val off1 = qMean.indices.foldLeft(0L)((a, i) => a + qMean(i) * qc1(i))
    val off2 = qMean.indices.foldLeft(0L)((a, i) => a + qMean(i) * qc2(i))
    (qc1, qc2, off1, off2)
  }

  /** Project every embedding onto the top-2 PCs: exact integer dot
    * products against the ppm-quantized components, centered by the
    * integer offsets. Output scores are in (input-grid × ppm) units.
    */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    val (qc1, qc2, off1, off2) = solveComponents(spark, sfDir)
    def score(qc: Array[Long], off: Long) = {
      val cl = array(qc.toIndexedSeq.map(lit(_)): _*)
      aggregate(zip_with(col("qvec"), cl, (x, y) => x * y),
        lit(0L), (acc, v) => acc + v) - lit(off)
    }
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), quantizedVec.as("qvec"))
      .select(col("vec_id"), col("label"),
        score(qc1, off1).as("s1"), score(qc2, off2).as("s2"))
      .orderBy("vec_id")
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(("emb_pca_project", pcaProject _, "")) // rows-only: see Scaladoc
}

package graft.sim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
import graft.core.Tables

/** PCA of the embeddings table — the dimensionality-reduction step
  * visualization and coarse-clustering pipelines run over embedding
  * corpora.
  *
  * Scale shape: the ONLY distributed work is one `treeAggregate` pass
  * accumulating exact integer second moments (n, Σx, Σxxᵀ) — dim +
  * dim² longs per partition, combined associatively, so the reduction
  * is map-side-combining and order-insensitive (long addition is
  * exact, so the result is bit-identical on any cluster layout). The
  * 64×64 eigenproblem is solved on the driver by deterministic power
  * iteration; the quantized components broadcast back as literals and
  * the per-row projection ([[pcaProject]]) is ONE codegen'd
  * integer-dot-product scan — no shuffle beyond the presentation sort.
  *
  * Cross-engine strategy (r11, closing the catalog's last `no_oracle`
  * row): static SQL cannot replay an iterative driver eigen-solve, so
  * the catalog entry `emb_pca_project` emits an INVARIANT PANEL in the
  * `stat_hll_union` style — rows `(invariant, exact_q, ok)` where
  * every `exact_q` is an exact integer DuckDB recomputes from the
  * parquet (row count, dimensionality, per-axis variance totals from
  * integer moments with integer division — bit-identical by
  * construction), and every `ok` is a Spark-verified mathematical
  * property of the solved components (orthonormality, eigen residual,
  * Rayleigh ordering, PC1 ≥ best raw axis, captured ≤ total variance,
  * centering) that the oracle pins as literal TRUE. The per-row
  * projection stays covered by PcaSpec's exact driver re-derivation
  * (integer equality over every row) and determinism rerun.
  *
  * Integer overflow headroom: |q| ≤ Quant (unit-ish embeddings), so
  * each cross-moment term is ≤ 1e8 and the Σxxᵀ accumulator holds
  * ~9e18/1e8 ≈ 9e10 rows before overflow; a 100 TB corpus beyond that
  * shards the treeAggregate and combines per-shard moments on the
  * driver (the moments are mergeable by construction). All
  * driver-side invariant arithmetic is BigInt, so it is exact at any
  * corpus size.
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

  /** Full driver-side solve state shared by the projection operator,
    * the invariant panel, and PcaSpec.
    */
  private[sim] final case class Solve(
      n: Long, dim: Int,
      s: Array[Long], cUpper: Array[Array[Long]],
      cov: Array[Array[Double]],
      qc1: Array[Long], qc2: Array[Long],
      off1: Long, off2: Long)

  private[sim] def solve(spark: SparkSession, sfDir: String): Solve =
    solveDf(spark, Tables.embeddings(spark, sfDir))

  /** DataFrame-injectable solve — PcaPropertySpec feeds generated
    * corpora (flat spectra, duplicate directions) through the same
    * path the catalog entry uses. */
  private[sim] def solveDf(spark: SparkSession, embeddings: DataFrame)
      : Solve = {
    val emb = embeddings
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
    var qc1 = c1.map(x => math.round(x * CompQuant))
    var qc2 = c2.map(x => math.round(x * CompQuant))
    // ORDER the two solved directions by their exact Rayleigh
    // quotients (BigInt cross-multiplied quadratic forms): on a
    // near-flat spectrum (sf0.1's synthetic embeddings) 300 power
    // iterations can leave the deflated second direction with a
    // marginally HIGHER variance than the first — both are valid
    // near-eigenvectors, so PC1 is defined as the higher-variance one
    // (this is what made the pc1_ge_pc2 invariant engine-visible).
    def quad(qc: Array[Long]): BigInt = {
      val nB = BigInt(n)
      val sB = s.map(BigInt(_))
      def cF(i: Int, j: Int): BigInt =
        BigInt(if (i <= j) cUpper(i)(j) else cUpper(j)(i))
      var acc = BigInt(0)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          acc += BigInt(qc(i)) * BigInt(qc(j)) * (nB * cF(i, j) - sB(i) * sB(j))
          j += 1
        }
        i += 1
      }
      acc
    }
    def norm2(qc: Array[Long]): BigInt =
      qc.map(x => BigInt(x) * BigInt(x)).reduce(_ + _)
    if (quad(qc2) * norm2(qc1) > quad(qc1) * norm2(qc2)) {
      val t = qc1; qc1 = qc2; qc2 = t
    }
    val qMean = s.map(x => math.round(x.toDouble / n))
    val off1 = qMean.indices.foldLeft(0L)((a, i) => a + qMean(i) * qc1(i))
    val off2 = qMean.indices.foldLeft(0L)((a, i) => a + qMean(i) * qc2(i))
    Solve(n, dim, s, cUpper, cov, qc1, qc2, off1, off2)
  }

  /** Driver-side component solve shared by the operator and PcaSpec:
    * returns (qc1, qc2, off1, off2) — ppm-quantized components and the
    * integer centering offsets `Σ round(mean)·qc`.
    */
  private[sim] def solveComponents(spark: SparkSession, sfDir: String)
      : (Array[Long], Array[Long], Long, Long) = {
    val sv = solve(spark, sfDir)
    (sv.qc1, sv.qc2, sv.off1, sv.off2)
  }

  /** Project every embedding onto the top-2 PCs: exact integer dot
    * products against the ppm-quantized components, centered by the
    * integer offsets. Output scores are in (input-grid × ppm) units.
    * Spec-covered (exact per-row driver re-derivation in PcaSpec); the
    * catalog's oracle row is [[pcaInvariants]].
    */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    val sv = solve(spark, sfDir)
    def score(qc: Array[Long], off: Long) = {
      val cl = array(qc.toIndexedSeq.map(lit(_)): _*)
      aggregate(zip_with(col("qvec"), cl, (x, y) => x * y),
        lit(0L), (acc, v) => acc + v) - lit(off)
    }
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), quantizedVec.as("qvec"))
      .select(col("vec_id"), col("label"),
        score(sv.qc1, sv.off1).as("s1"), score(sv.qc2, sv.off2).as("s2"))
      .orderBy("vec_id")
  }

  /** The oracle-checkable invariant panel (see object Scaladoc).
    *
    * Exact rows (DuckDB recomputes bit-identically via integer moments
    * + integer division): `n_rows`, `dim`, `total_var_q`,
    * `max_axis_var_q` where `var_q(i) = (n·Σq_i² − (Σq_i)²) div n²`.
    * Boolean rows (Spark-verified, oracle pins TRUE):
    *  - `c1_unit_norm` / `c2_unit_norm`: |‖qc‖²/ppm² − 1| < 1e-3
    *  - `c1_c2_orthogonal`: |qc1·qc2|/ppm² < 1e-3
    *  - `c1_eigen_residual` / `c2_eigen_residual`:
    *    ‖Cov·c − λc‖ < 1e-2·λ₁ (power iteration converged to a true
    *    eigenvector, not merely a high-variance direction)
    *  - `pc1_ge_pc2`, `pc1_ge_best_axis`: Rayleigh-quotient ordering
    *    λ₁ ≥ λ₂ and λ₁ ≥ max per-axis variance (PC1 optimality lower
    *    bound), from EXACT BigInt quadratic forms vᵀ(nC − ssᵀ)v
    *  - `captured_le_total`: λ₁ + λ₂ ≤ trace(Cov) (from the same
    *    exact forms)
    *  - `projection_centered`: |Σ_rows s1| ≤ (n/2)·Σ|qc1_i| — the
    *    exact integer bound implied by mean-rounding, checked in
    *    BigInt from the moments alone (no second data pass).
    */
  def pcaInvariants(spark: SparkSession, sfDir: String): DataFrame =
    pcaInvariantsDf(spark, Tables.embeddings(spark, sfDir))

  /** DataFrame-injectable twin of [[pcaInvariants]] (see [[solveDf]]). */
  private[sim] def pcaInvariantsDf(spark: SparkSession,
      embeddings: DataFrame): DataFrame = {
    val sv = solveDf(spark, embeddings)
    val n = BigInt(sv.n)
    def cFull(i: Int, j: Int): BigInt =
      BigInt(if (i <= j) sv.cUpper(i)(j) else sv.cUpper(j)(i))
    val sB = sv.s.map(BigInt(_))

    // per-axis centered second moments, scaled by n²: n·c_ii − s_i²
    val axisVarN2 = (0 until sv.dim).map(i => n * cFull(i, i) - sB(i) * sB(i))
    val varQ = axisVarN2.map(_ / (n * n))
    val totalVarQ = varQ.sum
    val maxAxisVarQ = varQ.max

    // exact quadratic forms vᵀ(n·C − s·sᵀ)v for v ∈ {qc1, qc2}
    def quadForm(qc: Array[Long]): BigInt = {
      var acc = BigInt(0)
      var i = 0
      while (i < sv.dim) {
        var j = 0
        while (j < sv.dim) {
          acc += BigInt(qc(i)) * BigInt(qc(j)) *
            (n * cFull(i, j) - sB(i) * sB(j))
          j += 1
        }
        i += 1
      }
      acc
    }
    val u1 = sv.qc1.map(x => BigInt(x) * BigInt(x)).reduce(_ + _)
    val u2 = sv.qc2.map(x => BigInt(x) * BigInt(x)).reduce(_ + _)
    val d12 = sv.qc1.indices
      .map(i => BigInt(sv.qc1(i)) * BigInt(sv.qc2(i))).reduce(_ + _)
    val v1n2 = quadForm(sv.qc1) // units: n²·Quant²·ppm²·‖qc1‖²-ish
    val v2n2 = quadForm(sv.qc2)
    val ppm2 = BigInt(1000000L) * BigInt(1000000L)

    // Rayleigh quotients normalized by the actual ‖qc‖²; compare via
    // exact cross-multiplication (no float in the ordering checks).
    // The 1e-9 slack absorbs the O(ε²)≈1e-12 Rayleigh perturbation
    // from ppm component quantization at degenerate-spectrum edges.
    val tolNum = BigInt(999999999L)
    val tolDen = BigInt(1000000000L)
    val pc1GePc2 = v1n2 * u2 * tolDen >= v2n2 * u1 * tolNum
    val pc1GeBestAxis = v1n2 * tolDen >= axisVarN2.max * u1 * tolNum
    val capturedLeTotal =
      (v1n2 * u2 + v2n2 * u1) * tolNum <= axisVarN2.sum * u1 * u2 * tolDen

    // float-tolerance checks (tolerances far above double rounding)
    def toD(b: BigInt): Double = b.toDouble
    val c1UnitOk = math.abs(toD(u1) / toD(ppm2) - 1.0) < 1e-3
    val c2UnitOk = math.abs(toD(u2) / toD(ppm2) - 1.0) < 1e-3
    val orthoOk = math.abs(toD(d12) / toD(ppm2)) < 1e-3
    def eigenResidual(qc: Array[Long]): (Double, Double) = {
      val c = qc.map(_ / CompQuant)
      val lam = (0 until sv.dim)
        .map(i => c(i) * dot(sv.cov(i), c)).sum / dot(c, c)
      val res = math.sqrt((0 until sv.dim).map { i =>
        val r = dot(sv.cov(i), c) - lam * c(i)
        r * r
      }.sum) / math.sqrt(dot(c, c))
      (res, lam)
    }
    val (res1, lam1) = eigenResidual(sv.qc1)
    val (res2, _) = eigenResidual(sv.qc2)
    val eig1Ok = res1 < 1e-2 * lam1
    val eig2Ok = res2 < 1e-2 * lam1

    // exact centering bound: Σ s1 = s·qc1 − n·off1 and each rounded
    // mean is within n/2 of the true sum, so |Σ s1| ≤ (n/2)·Σ|qc1|
    val sumS1 = sv.s.indices
      .map(i => sB(i) * BigInt(sv.qc1(i))).reduce(_ + _) - n * BigInt(sv.off1)
    val centerBound =
      n * sv.qc1.map(x => BigInt(math.abs(x))).reduce(_ + _) / 2
    val centeredOk = sumS1.abs <= centerBound

    val rows = Seq(
      ("c1_c2_orthogonal", 0L, orthoOk),
      ("c1_eigen_residual", 0L, eig1Ok),
      ("c1_unit_norm", 0L, c1UnitOk),
      ("c2_eigen_residual", 0L, eig2Ok),
      ("c2_unit_norm", 0L, c2UnitOk),
      ("captured_le_total", 0L, capturedLeTotal),
      ("dim", sv.dim.toLong, true),
      ("max_axis_var_q", maxAxisVarQ.toLong, true),
      ("n_rows", sv.n, true),
      ("pc1_ge_best_axis", 0L, pc1GeBestAxis),
      ("pc1_ge_pc2", 0L, pc1GePc2),
      ("projection_centered", 0L, centeredOk),
      ("total_var_q", totalVarQ.toLong, true))
    val schema = StructType(Seq(
      StructField("invariant", StringType, nullable = false),
      StructField("exact_q", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 1),
      schema).orderBy("invariant")
  }

  /** DuckDB twin of [[pcaInvariants]]: the exact rows recompute the
    * integer-moment variances with the same `div n²` quantization; the
    * boolean rows are literal TRUE (Spark carries the proof).
    */
  val pcaInvariantsSql: String =
    """WITH q AS (
      |  SELECT t.i AS i,
      |    CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 10000 + 0.5)
      |      AS BIGINT) AS qx
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
      |m AS (SELECT i, count(*) AS n, sum(qx) AS s, sum(qx * qx) AS ss
      |      FROM q GROUP BY i),
      |v AS (SELECT i, CAST((n * ss - s * s) // (n * n) AS BIGINT) AS var_q
      |      FROM m)
      |SELECT 'c1_c2_orthogonal' AS invariant, CAST(0 AS BIGINT) AS exact_q,
      |       TRUE AS ok
      |UNION ALL SELECT 'c1_eigen_residual', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'c1_unit_norm', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'c2_eigen_residual', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'c2_unit_norm', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'captured_le_total', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'dim',
      |  (SELECT CAST(count(*) AS BIGINT) FROM v), TRUE
      |UNION ALL SELECT 'max_axis_var_q',
      |  (SELECT CAST(max(var_q) AS BIGINT) FROM v), TRUE
      |UNION ALL SELECT 'n_rows',
      |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings), TRUE
      |UNION ALL SELECT 'pc1_ge_best_axis', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'pc1_ge_pc2', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'projection_centered', CAST(0 AS BIGINT), TRUE
      |UNION ALL SELECT 'total_var_q',
      |  (SELECT CAST(sum(var_q) AS BIGINT) FROM v), TRUE
      |ORDER BY invariant""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(("emb_pca_project", pcaInvariants _, pcaInvariantsSql))
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding
  * float[64], label).
  *
  * Three tiers, by scale:
  *  - annBruteTopK: exact top-k for a small query set — the query side
  *    is broadcast, the corpus streams once; correctness baseline.
  *  - embeddingNearDup: pairwise cosine within label blocks — blocking
  *    turns the O(n²) cartesian into per-block quadratic work.
  *  - annLshTopK: random-hyperplane LSH — signatures via one projection,
  *    candidates via bucket-equality join; the 100 TB path (no oracle,
  *    recall is asserted against brute force in AnnSpec).
  *
  * All cosines are computed in double precision over the float inputs
  * (cast first), so Spark and the DuckDB oracle agree to ~1e-15.
  */
object SimilarityOps {

  /** embedding as double[] plus its L2 norm. Repartitions first: the
    * small single-file embeddings scan arrives as one partition and the
    * vector math is CPU-bound (no-op at real scale, where the scan
    * already splits).
    */
  private def withVec(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(vec, cast(0 as double), (acc, x) -> acc + x * x))"))

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (p, q) -> p * q), " +
      "cast(0 as double), (acc, v) -> acc + v)")

  /** Cosine via the native fused-loop expression
    * ([[graft.functions.CosineSimilarity]]): one pass, no intermediate
    * zipped array, fully inside whole-stage codegen. Numerically
    * identical to dot/(norm·norm) — both accumulate left-to-right in
    * double.
    */
  private def cosine(a: String, b: String): Column =
    graft.functions.CosineSimilarity.cosineSim(col(a), col(b))

  /** Exact brute-force top-5 cosine neighbors for query vectors
    * (vec_id < 20). Queries are broadcast; ranking uses the rounded
    * cosine with vec_id tiebreak so result sets are deterministic
    * across engines.
    */
  def annBruteTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = withVec(Tables.embeddings(spark, sfDir))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("norm").as("qnorm"))
    val c = e.select(col("vec_id").as("nid"), col("vec").as("nvec"),
      col("norm").as("nnorm"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", round(cosine("qvec", "nvec"), 4))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "nid", "rank", "cos")
      .orderBy("qid", "rank")
  }

  val annBruteTopKSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec,
      |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
      |      AS norm
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |    round(list_dot_product(q.vec, c.vec) / (q.norm * c.norm), 4) AS cos
      |  FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id != q.vec_id)
      |SELECT qid, nid, rank, cos FROM (
      |  SELECT qid, nid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC)
      |      AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  /** Near-duplicate embedding pairs: cosine >= 0.3 within the same
    * label block. Label blocking is the poor man's IVF — at 100 TB the
    * block key is a coarse quantizer cell id, same plan shape.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = withVec(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("label"), col("vec"), col("norm"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(cosine("a.vec", "b.vec"), 4))
      .filter(col("cos") >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        col("a.label").as("label"), col("cos"))
      .orderBy("va", "vb")
  }

  val embeddingNearDupSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS vec,
      |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
      |      AS norm
      |  FROM embeddings)
      |SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label,
      |  round(list_dot_product(a.vec, b.vec) / (a.norm * b.norm), 4) AS cos
      |FROM e a JOIN e b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.vec, b.vec) / (a.norm * b.norm), 4)
      |  >= 0.3
      |ORDER BY va, vb""".stripMargin

  /** Random-hyperplane LSH top-k with `nTables` independent hash tables
    * of `nBits` bits each. Hyperplanes are DATA, not code: a broadcast
    * (table, bit, plane[dim]) dim table joined against the vectors, so
    * the signature pass is a broadcast join over 32 tiny rows per
    * vector aggregated into (vec, table) -> bucket. (A literal-sum
    * expression formulation was tried first and produced pathological
    * codegen: 2048-term expressions; the join formulation is faster
    * and is the shape a real cluster wants.)
    *
    * A candidate is any vector sharing a bucket -- or a 1-bit flip of
    * it (multi-probe) -- with the query in ANY table; candidates are
    * then scored exactly. Approximate -- AnnSpec asserts recall against
    * annBruteTopK. No DuckDB oracle: rows-only check.
    */
  def annLshTopK(spark: SparkSession, sfDir: String, nBits: Int = 8,
      nTables: Int = 4, k: Int = 5): DataFrame = {
    import spark.implicits._
    val dim = 64
    // Deterministic pseudo-random hyperplanes: h(t, b, d) in [-1, 1).
    def coef(t: Int, b: Int, d: Int): Double = {
      val x = (t.toLong * 104729L + b.toLong * 1000003L + d.toLong * 7919L
        + 12345L)
      val m = (x * 6364136223846793005L + 1442695040888963407L)
      (m >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val planes = (for {
      t <- 0 until nTables
      b <- 0 until nBits
    } yield (t, b, (0 until dim).map(d => coef(t, b, d)).toArray))
      .toDF("t", "b", "plane")
    val e = withVec(Tables.embeddings(spark, sfDir)).localCheckpoint()
    // bucket id per (vector, table): sign bits of the nBits projections
    val buckets = e.crossJoin(broadcast(planes))
      .withColumn("bit", when(dot("vec", "plane") >= 0,
        expr("shiftleft(1L, b)")).otherwise(lit(0L)))
      .groupBy(col("vec_id"), col("t"))
      .agg(sum("bit").as("bucket"))
      .localCheckpoint() // reused as probe and build sides
    val probeArr = (Seq("bucket") ++
      (0 until nBits).map(b => s"bucket ^ ${1L << b}"))
      .mkString("array(", ", ", ")")
    val qProbes = buckets.filter(col("vec_id") < 20)
      .withColumn("probe", explode(expr(probeArr)))
      .select(col("vec_id").as("qid"), col("t").as("qt"), col("probe"))
    val cand = buckets.join(broadcast(qProbes),
        col("probe") === col("bucket") && col("qt") === col("t") &&
          col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"))
      .distinct()
    // exact scoring of candidates only
    val qv = e.select(col("vec_id").as("qid"), col("vec").as("qvec"),
      col("norm").as("qnorm"))
    val nv = e.select(col("vec_id").as("nid"), col("vec").as("nvec"),
      col("norm").as("nnorm"))
    val scored = cand.join(broadcast(qv.filter(col("qid") < 20)), Seq("qid"))
      .join(nv, Seq("nid"))
      .select(col("qid"), col("nid"),
        round(cosine("qvec", "nvec"), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
      .orderBy("qid", "rank")
  }

  /** IVF-style ANN top-k: an MLlib k-means coarse quantizer partitions
    * the corpus into `nCells` cells; each query probes only its
    * `nProbe` nearest cells and scores those candidates exactly. The
    * canonical big-corpus trade-off (recall vs fraction of corpus
    * touched); AnnSpec asserts recall against brute force. Rows-only
    * check (iterative training is not SQL-expressible).
    *
    * Scale shape: training samples the corpus; assignment is one
    * broadcast-join projection; the search join keys on cell id, so
    * per-query work is |corpus| * nProbe / nCells.
    */
  def annIvfTopK(spark: SparkSession, sfDir: String, nCells: Int = 16,
      nProbe: Int = 4, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = withVec(Tables.embeddings(spark, sfDir)).localCheckpoint()
    // Quantizer training is a DRIVER-side Lloyd's loop over a bounded
    // sample (faiss-style): 4096 x 64 doubles is ~2 MB, and centroid
    // quality saturates long before the full corpus is seen — at
    // 100 TB a distributed fit would spend its time on job scheduling,
    // not math. Sample order is made deterministic by vec_id.
    val sample: Array[Array[Double]] = e.orderBy("vec_id").limit(4096)
      .select("vec").collect().map(_.getSeq[Double](0).toArray)
    val dim = sample.head.length
    val stride = math.max(1, sample.length / nCells)
    var cents: Array[Array[Double]] = Array.tabulate(nCells)(i =>
      sample((i * stride) % sample.length).clone())
    def nearest(cs: Array[Array[Double]], v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < dim) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until 5) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val cnts = new Array[Long](nCells)
      sample.foreach { v =>
        val b = nearest(cents, v)
        cnts(b) += 1
        val s = sums(b); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(nCells)(c =>
        if (cnts(c) == 0) cents(c) else sums(c).map(_ / cnts(c)))
    }
    // corpus assignment: one map stage over broadcast centroids — no
    // shuffle, no per-row ML pipeline machinery
    val bcCents = spark.sparkContext.broadcast(cents)
    val bestCell = udf { (v: Seq[Double]) =>
      nearest(bcCents.value, v.toArray)
    }
    val assigned = e
      .select(col("vec_id"), col("vec"), col("norm"),
        bestCell(col("vec")).as("cell"))
      .localCheckpoint()
    // query -> nProbe nearest cells (distance to centroids, driver-side
    // constant table of nCells centroids)
    val centroids = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    val q = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("norm").as("qnorm"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("dist", expr(
        "aggregate(zip_with(qvec, centroid, (p, c) -> (p - c) * (p - c)), " +
          "cast(0 as double), (acc, v) -> acc + v)"))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("qid").orderBy(asc("dist"), asc("cell"))))
      .filter(col("cell_rank") <= nProbe)
      .select("qid", "qvec", "qnorm", "cell")
    val scored = assigned.join(broadcast(probed),
        probed("cell") === assigned("cell") &&
          col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine("qvec", "vec"), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
      .orderBy("qid", "rank")
  }

  /** Symmetric int8 quantization per vector — the standard compression
    * step before shipping embeddings to an ANN index or training job
    * (4x smaller than float32, 8x than the double staging form). Scale
    * = 127/max|x| per vector; codes via floor(v + 0.5) — written out
    * explicitly because Spark's round() and DuckDB's differ on
    * negative .5 ties, while floor(+0.5) is bit-identical everywhere.
    * max|x| is an associative fold (exact in fp regardless of order),
    * so unlike sums, the per-vector scale is oracle-safe.
    */
  def embInt8Quant(spark: SparkSession, sfDir: String): DataFrame =
    withVec(Tables.embeddings(spark, sfDir))
      .withColumn("maxabs", expr(
        "aggregate(vec, cast(0 as double), (acc, x) -> greatest(acc, abs(x)))"))
      .filter(col("maxabs") > 0)
      .withColumn("qv", expr(
        "transform(vec, x -> cast(floor(x * 127.0 / maxabs + 0.5) as int))"))
      .select(
        col("vec_id"),
        round(col("maxabs"), 4).as("maxabs_r"),
        expr("element_at(qv, 1)").as("q1"),
        expr("element_at(qv, 2)").as("q2"),
        expr("element_at(qv, 3)").as("q3"),
        expr("element_at(qv, 4)").as("q4"),
        expr("aggregate(qv, 0L, (acc, x) -> acc + abs(x))").as("l1_q"))
      .orderBy("vec_id")

  val embInt8QuantSql: String =
    """SELECT vec_id, round(maxabs, 4) AS maxabs_r,
      |  qv[1] AS q1, qv[2] AS q2, qv[3] AS q3, qv[4] AS q4,
      |  list_sum(list_transform(qv, x -> abs(x)))::BIGINT AS l1_q
      |FROM (
      |  SELECT vec_id, maxabs,
      |    list_transform(vec, x -> floor(x * 127.0 / maxabs + 0.5)::INT)
      |      AS qv
      |  FROM (
      |    SELECT vec_id, embedding::DOUBLE[] AS vec,
      |      list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
      |        AS maxabs
      |    FROM embeddings)
      |  WHERE maxabs > 0)
      |ORDER BY vec_id""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("ann_brute_topk", annBruteTopK _, annBruteTopKSql),
    ("emb_int8_quant", embInt8Quant _, embInt8QuantSql),
    ("embedding_neardup", embeddingNearDup _, embeddingNearDupSql),
    ("ann_lsh_topk", (s: SparkSession, d: String) => annLshTopK(s, d), ""),
    ("ann_ivf_topk", (s: SparkSession, d: String) => annIvfTopK(s, d), ""))
}

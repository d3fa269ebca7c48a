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

  /** embedding as double[] plus its L2 norm. */
  private def withVec(df: DataFrame): DataFrame =
    df.withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(vec, cast(0 as double), (acc, x) -> acc + x * x))"))

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (p, q) -> p * q), " +
      "cast(0 as double), (acc, v) -> acc + v)")

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
      .withColumn("cos",
        round(dot("qvec", "nvec") / (col("qnorm") * col("nnorm")), 4))
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
      .withColumn("cos",
        round(dot("a.vec", "b.vec") / (col("a.norm") * col("b.norm")), 4))
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
    * of `nBits` bits each (hyperplanes deterministic per (table, bit,
    * dim)). A candidate is any vector sharing a bucket — or a 1-bit
    * flip of it (multi-probe) — with the query in ANY table; candidates
    * are then scored exactly. Approximate — AnnSpec asserts recall
    * against annBruteTopK. No DuckDB oracle: rows-only check.
    *
    * Scale shape: signatures are one projection pass; the candidate
    * join keys on (table, bucket) equality, so work is proportional to
    * bucket collisions, never |corpus| × |queries|.
    */
  def annLshTopK(spark: SparkSession, sfDir: String, nBits: Int = 8,
      nTables: Int = 4, k: Int = 5): DataFrame = {
    val dim = 64
    // Deterministic pseudo-random hyperplanes: h(t, b, d) in [-1, 1).
    def coef(t: Int, b: Int, d: Int): Double = {
      val x = (t.toLong * 104729L + b.toLong * 1000003L + d.toLong * 7919L
        + 12345L)
      val m = (x * 6364136223846793005L + 1442695040888963407L)
      (m >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    def sigExpr(t: Int): String = (0 until nBits).map { b =>
      val terms = (0 until dim)
        .map(d => s"element_at(vec, ${d + 1}) * (${coef(t, b, d)})")
        .mkString(" + ")
      s"(case when ($terms) >= 0 then ${1L << b} else 0 end)"
    }.mkString(" + ")
    val e = withVec(Tables.embeddings(spark, sfDir))
    val sig = (0 until nTables).foldLeft(e) { (df, t) =>
      df.withColumn(s"sig$t", expr(sigExpr(t)))
    }
    // corpus: one (table, bucket) row per table
    val bucketStructs = (0 until nTables)
      .map(t => s"struct($t as t, sig$t as bucket)").mkString(", ")
    val c = sig.select(col("vec_id").as("nid"), col("vec").as("nvec"),
        col("norm").as("nnorm"),
        explode(expr(s"array($bucketStructs)")).as("tb"))
      .select(col("nid"), col("nvec"), col("nnorm"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    // queries: bucket plus 1-bit-flip probes per table
    val probeStructs = (0 until nTables).flatMap { t =>
      Seq(s"struct($t as t, sig$t as bucket)") ++
        (0 until nBits).map(b => s"struct($t as t, sig$t ^ ${1L << b} as bucket)")
    }.mkString(", ")
    val q = sig.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("norm").as("qnorm"),
        explode(expr(s"array($probeStructs)")).as("tb"))
      .select(col("qid"), col("qvec"), col("qnorm"),
        col("tb.t").as("qt"), col("tb.bucket").as("qbucket"))
    val scored = c.join(broadcast(q),
        col("qt") === col("t") && col("qbucket") === col("bucket") &&
          col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot("qvec", "nvec") / (col("qnorm") * col("nnorm")), 4).as("cos"))
      .distinct()
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
      .orderBy("qid", "rank")
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("ann_brute_topk", annBruteTopK _, annBruteTopKSql),
    ("embedding_neardup", embeddingNearDup _, embeddingNearDupSql),
    ("ann_lsh_topk", (s: SparkSession, d: String) => annLshTopK(s, d), ""))
}

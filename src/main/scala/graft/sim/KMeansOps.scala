package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** K-means topic clustering over the embeddings table — the corpus
  * bucketing step LLM pipelines run before per-topic sampling.
  *
  * The catalog entry is the ASSIGNMENT step with fixed seed centroids:
  * embeddings are quantized onto a shared integer grid
  * (`floor(x·10⁴ + 0.5)`, same op both engines), so squared distances
  * are exact BIGINT sums and the argmin is bit-identical across
  * engines — no float-order divergence possible. The iterative Lloyd's
  * refinement (float means, engine-specific reduction order) is
  * differentially tested in KMeansSpec instead of oracle-hashed.
  *
  * Scale shape: centroids are a K-row broadcast; assignment is one
  * codegen'd projection over the corpus (no shuffle); the update step
  * is a groupBy(cluster, dim) with map-side partial aggregation of
  * the per-dimension sums — O(K·dim) state per task, one pass per
  * iteration, identical on 1000 executors.
  */
object KMeansOps {

  private val Quant = 10000.0

  private def quantized(df: DataFrame, vecCol: String): org.apache.spark.sql.Column =
    expr(s"transform(cast($vecCol as array<double>), " +
      s"x -> cast(floor(x * $Quant + 0.5d) as bigint))")

  /** Assign every vector to the nearest of K=4 seed centroids
    * (vec_id 0..3) by exact integer squared distance; ties break to
    * the lowest centroid id.
    *
    * The K centroid rows are collected to the driver (K×dim longs — a
    * few KB) and inlined as literals, so assignment is ONE codegen'd
    * projection over the corpus: per row, an array of (dist_q, cid)
    * structs whose `array_min` IS the argmin (struct ordering = dist
    * first, centroid id tiebreak). No crossJoin, no K×corpus Exchange,
    * no window — the only shuffle left is the final presentation sort.
    */
  def kmeansAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cents: Array[(Long, Array[Long])] = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), quantized(emb, "embedding").as("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val candidates = cents.map { case (cid, cvec) =>
      val cv = array(cvec.map(lit(_)): _*)
      struct(
        aggregate(zip_with(col("qvec"), cv, (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("dist_q"),
        lit(cid).as("cid"))
    }
    emb.select(col("vec_id"), quantized(emb, "embedding").as("qvec"))
      .withColumn("best", array_min(array(candidates.toIndexedSeq: _*)))
      .select(col("vec_id"), col("best.cid").as("cluster"),
        col("best.dist_q").as("dist_q"))
      .orderBy("vec_id")
  }

  val kmeansAssignSql: String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[],
       |      x -> floor(x * $Quant + 0.5)::BIGINT) AS qvec
       |  FROM embeddings),
       |c AS (SELECT vec_id AS cid, qvec AS cvec FROM q WHERE vec_id < 4),
       |d AS (
       |  SELECT q.vec_id, c.cid,
       |    list_sum(list_transform(range(1, len(q.qvec) + 1),
       |      i -> (q.qvec[i] - c.cvec[i]) * (q.qvec[i] - c.cvec[i])))::BIGINT
       |      AS dist_q,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_sum(list_transform(range(1, len(q.qvec) + 1),
       |        i -> (q.qvec[i] - c.cvec[i]) * (q.qvec[i] - c.cvec[i]))),
       |        c.cid) AS rk
       |  FROM q CROSS JOIN c)
       |SELECT vec_id, cid AS cluster, dist_q
       |FROM d WHERE rk = 1 ORDER BY vec_id""".stripMargin

  /** One Lloyd's update: assign to nearest centroid (double-precision
    * L2), then recompute each centroid as the mean of its members.
    * Returns (cluster, size, centroid). Distributed shape: broadcast
    * centroids in; the update is posexplode → groupBy(cluster, pos)
    * partial sums, so the shuffle payload is K·dim doubles per map
    * task, not the corpus.
    */
  def lloydStep(spark: SparkSession, points: DataFrame,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    // centroids are already a driver-side K×dim matrix: inline them as
    // literals and pick the argmin in one projection (same shape as
    // kmeansAssign) — no crossJoin, no per-iteration window Exchange
    val candidates = centroids.sortBy(_._1).map { case (cid, cvec) =>
      val cv = array(cvec.toIndexedSeq.map(lit(_)): _*)
      struct(
        aggregate(zip_with(col("v"), cv, (x, y) => (x - y) * (x - y)),
          lit(0d), (acc, d) => acc + d).as("dist"),
        lit(cid).as("cid"))
    }
    val assigned = points
      .select(col("vec_id"), expr("cast(embedding as array<double>)").as("v"))
      .withColumn("best", array_min(array(candidates: _*)))
      .select(col("vec_id"), col("v"), col("best.cid").as("cid"))
    val sizes = assigned.groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("size"))
    val dimSums = assigned
      .select(col("cid").as("cluster"), posexplode(col("v")))
      .groupBy("cluster", "pos")
      .agg(sum("col").as("dim_sum"))
      .groupBy("cluster")
      .agg(expr("transform(array_sort(collect_list(struct(pos, dim_sum)))," +
        " s -> s.dim_sum)").as("vsum"))
    sizes.join(dimSums, "cluster")
      .withColumn("centroid", expr("transform(vsum, s -> s / size)"))
      .select("cluster", "size", "centroid")
  }

  /** Full Lloyd's: `iters` rounds from the first K vectors. Driver
    * holds only the K×dim centroid matrix between rounds (a few KB) —
    * the corpus never leaves the executors.
    */
  def lloyd(spark: SparkSession, points: DataFrame, k: Int,
      iters: Int): Seq[(Int, Long, Array[Double])] = {
    import org.apache.spark.sql.Row
    var cents: Seq[(Int, Array[Double])] = points
      .orderBy("vec_id").limit(k)
      .select(expr("cast(embedding as array<double>)")).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }.toSeq
    var sizes = Map.empty[Int, Long]
    for (_ <- 1 to iters) {
      val updated = lloydStep(spark, points, cents).collect().map {
        case Row(c: Int, n: Long, v: scala.collection.Seq[_]) =>
          (c, n, v.asInstanceOf[scala.collection.Seq[Double]].toArray)
      }
      // empty clusters keep their previous centroid
      val byId = updated.map(u => u._1 -> u).toMap
      cents = cents.map { case (id, old) =>
        id -> byId.get(id).map(_._3).getOrElse(old)
      }
      sizes = cents.map(_._1).map(id =>
        id -> byId.get(id).map(_._2).getOrElse(0L)).toMap
    }
    cents.map { case (id, v) => (id, sizes.getOrElse(id, 0L), v) }
  }

  /** D4-style DIVERSITY pruning (Tirumala et al. 2023): within each
    * k-means cluster, keep only the 50% of vectors FARTHEST from their
    * centroid — semantic dedup removes near-duplicates, this removes
    * the prototypical core that adds little gradient signal, and the
    * two together are the D4 recipe. Complements [[graft.sim
    * .SimilarityOps.embSemDedup]] (which keeps near-centroid docs and
    * drops redundant far pairs) with the opposite half of the
    * curation toolbox.
    *
    * Exactness: assignment and distance reuse [[kmeansAssign]]'s
    * integer grid, the keep threshold is a per-cluster rank over
    * (dist_q DESC, vec_id), and the keep count is ⌈n/2⌉ in integer
    * arithmetic — every step replays bit-identically in the oracle.
    *
    * Scale shape: one assignment projection (no shuffle), one
    * window partitioned by cluster (K partitions of corpus/K rows),
    * one presentation sort. The per-cluster count rides the same
    * window as the rank (count over the unbounded frame), so no
    * second aggregation pass.
    */
  def diversityPrune(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = kmeansAssign(spark, sfDir)
    val w = Window.partitionBy("cluster")
    val ranked = assigned
      .withColumn("rk", row_number().over(
        w.orderBy(col("dist_q").desc, col("vec_id"))))
      .withColumn("n_cluster", count(lit(1)).over(w))
    ranked
      .filter(col("rk") * 2 <= col("n_cluster") + 1) // keep ceil(n/2)
      .select(col("vec_id"), col("cluster"), col("dist_q"),
        col("rk").as("div_rank"), col("n_cluster"))
      .orderBy("vec_id")
  }

  val diversityPruneSql: String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[],
       |      x -> floor(x * $Quant + 0.5)::BIGINT) AS qvec
       |  FROM embeddings),
       |c AS (SELECT vec_id AS cid, qvec AS cvec FROM q WHERE vec_id < 4),
       |d AS (
       |  SELECT q.vec_id, c.cid,
       |    list_sum(list_transform(range(1, len(q.qvec) + 1),
       |      i -> (q.qvec[i] - c.cvec[i]) * (q.qvec[i] - c.cvec[i])))::BIGINT
       |      AS dist_q,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_sum(list_transform(range(1, len(q.qvec) + 1),
       |        i -> (q.qvec[i] - c.cvec[i]) * (q.qvec[i] - c.cvec[i]))),
       |        c.cid) AS rk
       |  FROM q CROSS JOIN c),
       |assigned AS (
       |  SELECT vec_id, cid AS cluster, dist_q FROM d WHERE rk = 1),
       |ranked AS (
       |  SELECT vec_id, cluster, dist_q,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY dist_q DESC, vec_id) AS div_rank,
       |    count(*) OVER (PARTITION BY cluster) AS n_cluster
       |  FROM assigned)
       |SELECT vec_id, cluster, dist_q, div_rank, n_cluster
       |FROM ranked
       |WHERE div_rank * 2 <= n_cluster + 1
       |ORDER BY vec_id""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(("emb_kmeans_assign", kmeansAssign _, kmeansAssignSql),
      ("emb_diversity_prune", diversityPrune _, diversityPruneSql))
}

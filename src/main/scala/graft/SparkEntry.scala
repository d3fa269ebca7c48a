package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dedup.DedupOps
import graft.graph.GraphOps
import graft.multimodal.MultimodalOps
import graft.operators.{AnalyticsOps, BucketedOps, PartitionedOps, RelationalOps, SkewOps, StatsOps}
import graft.sim.SimilarityOps
import graft.streaming.EventWindows
import graft.text.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to Spark
  * implementations; `oracleSql` carries the DuckDB-equivalent SQL with
  * matching column aliases (the driver hash-compares by sorted column
  * name). Modules contribute (name, impl, sql) triples via their
  * `catalog` member.
  */
object SparkEntry {

  private def modules
      : Seq[(String, (SparkSession, String) => DataFrame, String)] =
    RelationalOps.catalog ++ AnalyticsOps.catalog ++
      graft.operators.SqlSurfaceOps.catalog ++
      graft.operators.TypedOps.catalog ++
      StatsOps.catalog ++ BucketedOps.catalog ++
      SkewOps.catalog ++ PartitionedOps.catalog ++
      graft.plans.IntervalJoinQueries.catalog ++
      graft.sources.DatSourceQueries.catalog ++
      TextOps.catalog ++ DedupOps.catalog ++
      SimilarityOps.catalog ++ graft.sim.KMeansOps.catalog ++
      graft.sim.PcaOps.catalog ++
      MultimodalOps.catalog ++
      graft.pipeline.PipelineOps.catalog ++
      EventWindows.catalog ++ GraphOps.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.collect { case (n, _, sql) if sql.nonEmpty => n -> sql }.toMap
}

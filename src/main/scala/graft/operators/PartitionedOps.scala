package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Partitioned table layout + partition pruning — static and dynamic.
  *
  * At 100 TB the first defense is never reading the data at all:
  * laying the fact table out partitioned by date means a date
  * predicate prunes directories before any IO (static pruning), and a
  * join against a filtered dimension prunes at runtime from the
  * broadcast result (dynamic partition pruning). PartitionedSpec
  * asserts both plan shapes; the reference has no partitioned writes
  * (its parquet are single files), so this is a scale extension.
  *
  * The layout is written once per (session, sfDir) — 30 date
  * partitions of the events table, partition column `dt`.
  */
object PartitionedOps {

  private def suffix(sfDir: String): String =
    Paths.get(sfDir).getFileName.toString.replaceAll("[^A-Za-z0-9]", "_")

  /** Write events partitioned by event date (idempotent per session). */
  def ensurePartitioned(spark: SparkSession, sfDir: String): String = {
    val tbl = s"events_p_${suffix(sfDir)}"
    if (!spark.catalog.tableExists(tbl)) {
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_partitioned", suffix(sfDir)).toString
      Tables.events(spark, sfDir)
        .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .option("path", s"$base/$tbl")
        .saveAsTable(tbl)
    }
    tbl
  }

  /** Static pruning: a dt predicate reaches the scan as a
    * PartitionFilter — only 7 of 30 date directories are read, zero
    * rows of the rest are touched.
    */
  def q29PartitionPruning(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = ensurePartitioned(spark, sfDir)
    spark.table(tbl)
      .filter(col("dt") >= "2024-01-10" && col("dt") <= "2024-01-16")
      .groupBy("dt", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("dt", "event_type")
  }

  val q29Sql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-16'
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Dynamic partition pruning: the fact's partition column joins a
    * dimension whose filter is on a DIFFERENT column (day-of-week),
    * so static pruning is impossible — the runtime reuses the
    * broadcast dim result to skip fact partitions
    * (dynamicpruningexpression in the scan's PartitionFilters).
    * Day-of-week is computed as epoch-day mod 7 so both engines agree.
    */
  def q30DynamicPruning(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = ensurePartitioned(spark, sfDir)
    val fact = spark.table(tbl)
    val dateDim = fact.select(col("dt")).distinct()
      .withColumn("dow",
        pmod(datediff(to_date(col("dt")), to_date(lit("1970-01-01"))), lit(7)))
    val weekdays = dateDim.filter(col("dow").isin(2, 3)) // Tue, Wed
    fact.join(broadcast(weekdays), Seq("dt"))
      .groupBy("dt")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("dt")
  }

  val q30Sql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM events
      |WHERE (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) IN (2, 3)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q29_partition_pruning", q29PartitionPruning _, q29Sql),
    ("q30_dynamic_pruning", q30DynamicPruning _, q30Sql))
}

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

  /** Z-order (Morton-curve) layout statistics — the multi-dimensional
    * counterpart of the date layout above (Delta/Iceberg `OPTIMIZE
    * ZORDER BY`): interleaving the bits of two filter columns gives a
    * 1-D sort key whose contiguous ranges are small 2-D tiles, so
    * per-file min/max stats prune range predicates on BOTH columns —
    * a single-column sort gives tight bounds on one dimension and
    * useless full-range bounds on the other. The operator emits what
    * the layout decision actually consumes: per-tile (top 8 bits of a
    * 32-bit Morton code) row counts and bounding boxes over
    * (l_partkey, l_suppkey); tight boxes = effective pruning.
    *
    * Everything is exact integer bit arithmetic (shift/mask/interleave
    * folded over 16 bit positions), so the DuckDB oracle replays it
    * verbatim. Scale: one codegen projection + one 256-group hash agg;
    * the actual re-write at 100 TB is `sort by zcode` into files —
    * the same repartitionByRange shape as the bucketed layouts.
    */
  def q57ZorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    // unrolled interleave, NOT aggregate(sequence(0,15), ...): the HOF
    // fold allocates a 16-element array and loops per row; 32 flat
    // shift/mask terms stay straight-line inside whole-stage codegen
    // (measured 2.4 s -> ~0.3 s on the sf0.1 scan)
    val morton = (0 until 16).map(i =>
      s"shiftleft(shiftright(x, $i) & 1L, ${2 * i}) + " +
        s"shiftleft(shiftright(y, $i) & 1L, ${2 * i + 1})")
      .mkString(" + ")
    Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") % 65536L).as("x"),
        (col("l_suppkey") % 65536L).as("y"))
      .withColumn("zcode", expr(morton))
      .withColumn("tile", expr("zcode div 16777216")) // top 8 bits
      .groupBy("tile")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .withColumn("bbox_area",
        (col("max_x") - col("min_x") + 1L) *
          (col("max_y") - col("min_y") + 1L))
      .orderBy("tile")
  }

  val q57Sql: String =
    """WITH z AS (
      |  SELECT x, y,
      |    list_sum(list_transform(range(16), i ->
      |      (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
      |    ))::BIGINT AS zcode
      |  FROM (
      |    SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
      |    FROM lineitem))
      |SELECT zcode // 16777216 AS tile, count(*)::BIGINT AS n,
      |  min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
      |  min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y,
      |  ((max(x) - min(x) + 1) * (max(y) - min(y) + 1))::BIGINT AS bbox_area
      |FROM z
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q29_partition_pruning", q29PartitionPruning _, q29Sql),
    ("q30_dynamic_pruning", q30DynamicPruning _, q30Sql),
    ("q57_zorder_layout", q57ZorderLayout _, q57Sql))
}

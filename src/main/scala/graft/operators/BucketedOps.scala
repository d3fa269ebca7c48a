package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Bucketed-table co-located join — the shuffle-elimination pattern for
  * repeated large-x-large joins at 100 TB.
  *
  * Writing both fact and dim bucketed (and sorted) by the join key means
  * every subsequent join on that key is exchange-free: each task zips
  * bucket i of one table with bucket i of the other. At cluster scale
  * this turns the dominant cost of a fact-fact join (shuffling both
  * sides) into a local merge. The reference joins ratings x users x
  * movies on every notebook run (`Explorativa1_pyspark.ipynb` cell 8) —
  * bucketing those tables by key is how that pipeline survives 100 TB.
  *
  * Bucket layout is written once per (session, sfDir) into tmp-backed
  * tables; BucketedSpec asserts the join plan has no ShuffleExchange.
  */
object BucketedOps {

  private val BucketCount = 8

  /** Stable table suffix per scale factor so sf0.001/sf0.01 coexist. */
  private def suffix(sfDir: String): String =
    Paths.get(sfDir).getFileName.toString.replaceAll("[^A-Za-z0-9]", "_")

  /** Write orders + customer bucketed by custkey (idempotent per session). */
  def ensureBucketed(spark: SparkSession, sfDir: String): (String, String) = {
    val sfx = suffix(sfDir)
    val (ordersTbl, custTbl) = (s"orders_b_$sfx", s"customer_b_$sfx")
    val base = Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_buckets", sfx).toString
    if (!spark.catalog.tableExists(ordersTbl)) {
      Tables.orders(spark, sfDir).write.mode("overwrite")
        .bucketBy(BucketCount, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/$ordersTbl").saveAsTable(ordersTbl)
    }
    if (!spark.catalog.tableExists(custTbl)) {
      Tables.customer(spark, sfDir).write.mode("overwrite")
        .bucketBy(BucketCount, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/$custTbl").saveAsTable(custTbl)
    }
    (ordersTbl, custTbl)
  }

  /** Revenue by market segment over the bucketed join. Joining the two
    * bucketed tables is exchange-free (bucket i ⋈ bucket i); only the
    * 5-row segment aggregate shuffles. Same result as the raw-parquet
    * join, which is what the DuckDB oracle runs.
    */
  def q26BucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (ordersTbl, custTbl) = ensureBucketed(spark, sfDir)
    spark.table(ordersTbl)
      .join(spark.table(custTbl).hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  val q26Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q26_bucketed_join", q26BucketedJoin _, q26Sql))
}

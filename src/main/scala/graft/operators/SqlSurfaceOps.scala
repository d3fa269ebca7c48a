package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.core.Tables

/** Modern-SQL surface of the engine: XML source, LATERAL joins,
  * recursive CTEs, VARIANT semi-structured access, and the built-in
  * count-min sketch. None of these appear verbatim in the reference
  * (its SQL entry point is plain SELECT/GROUP BY, SURVEY §2.1 S15) —
  * they widen the same `spark.sql` surface the reference exposes to
  * the operations a 100 TB curation pipeline actually issues.
  */
object SqlSurfaceOps {

  /** XML roundtrip — third self-describing format after JSON (q48) and
    * ORC (q49), using Spark 4's built-in XML source (SURVEY §2.1 source
    * breadth). Write a subset as XML, read it back with an EXPLICIT
    * schema (XML schema inference is an extra full scan — never in a
    * production path), aggregate. The oracle computes the same
    * aggregate from parquet, so a hash match proves the XML
    * write→parse cycle is lossless, doubles included (shortest
    * round-trip printing both ways).
    */
  def q50XmlRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_rt")
      .resolve("orders_xml").toString
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") < 5000)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").option("rowTag", "order").format("xml")
      .save(dir)
    spark.read.format("xml").option("rowTag", "order")
      .schema("o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE")
      .load(dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("sum_price"),
        max("o_orderkey").as("max_key"))
      .orderBy("o_orderpriority")
  }

  val q50Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS sum_price,
      |  max(o_orderkey) AS max_key
      |FROM orders
      |WHERE o_orderkey < 5000
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** LATERAL join — top-2 nations by customer count per region via a
    * correlated lateral subquery with its own aggregate + ORDER BY +
    * LIMIT. Catalyst decorrelates this into a join + partitioned
    * window-limit (InferWindowGroupLimit), so at 100 TB it runs as one
    * shuffled agg + per-group top-k, NOT one subquery execution per
    * outer row — the plan is identical to hand-written w2-style
    * top-k-per-group (SURVEY §2.5 W2) but arrives via standard SQL.
    */
  def q51LateralTopn(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.region(spark, sfDir).createOrReplaceTempView("region_v51")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation_v51")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v51")
    spark.sql(
      """SELECT r_name, t.n_name, t.n_cust
        |FROM region_v51 r, LATERAL (
        |  SELECT n.n_name AS n_name, count(c.c_custkey) AS n_cust
        |  FROM nation_v51 n JOIN customer_v51 c
        |    ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_cust DESC, n_name
        |  LIMIT 2) t
        |ORDER BY r_name, n_cust DESC, n_name""".stripMargin)
  }

  val q51Sql: String =
    """SELECT r_name, t.n_name, t.n_cust
      |FROM region r, LATERAL (
      |  SELECT n.n_name AS n_name, count(c.c_custkey) AS n_cust
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_cust DESC, n_name
      |  LIMIT 2) t
      |ORDER BY r_name, n_cust DESC, n_name""".stripMargin

  /** Recursive CTE (Spark 4 WITH RECURSIVE → UnionLoop) — build a
    * monthly calendar spine from the data's own min/max order month,
    * then left-join monthly order aggregates onto it so gap months
    * surface as explicit zero rows.
    *
    * Recursion shape matters: every UnionLoop iteration is a separate
    * Spark job (a global barrier), so a month-at-a-time spine costs 80
    * scheduler round-trips (~12s of pure latency at ANY data size).
    * Instead the recursion strides by 12 months (~7 iterations, bounded
    * by the date RANGE in years) and each stride expands to its 12
    * months flat via explode(sequence(0,11)). The real data work stays
    * one hash aggregate over orders regardless of spine shape — at
    * 100 TB this query is one scan + one 80-row broadcast join.
    */
  def q52RecursiveCalendar(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    orders.createOrReplaceTempView("orders_v52")
    // The recursion bound is a 2-value scalar. It must NOT stay a CTE:
    // Spark inlines (not materializes) WITH clauses, so a `bounds` CTE
    // referenced inside the recursive member re-runs the min/max scan
    // of orders in EVERY UnionLoop iteration — ~8 redundant scans and
    // aggregate jobs at any data size. One driver-side head() makes the
    // spine a pure literal recursion; the orders table is then scanned
    // exactly twice (this bound + the real monthly aggregate).
    val b = orders.selectExpr(
      "cast(cast(date_trunc('month', min(o_orderdate)) as date) as string)",
      "cast(cast(date_trunc('month', max(o_orderdate)) as date) as string)")
      .head()
    val (lo, hi) = (b.getString(0), b.getString(1))
    spark.sql(
      s"""WITH RECURSIVE strides(y) AS (
        |  SELECT DATE'$lo'
        |  UNION ALL
        |  SELECT add_months(y, 12) FROM strides
        |  WHERE add_months(y, 12) <= DATE'$hi'
        |),
        |months AS (
        |  SELECT add_months(y, off) AS m
        |  FROM strides, (SELECT explode(sequence(0, 11)) AS off)
        |  WHERE add_months(y, off) <= DATE'$hi'
        |)
        |SELECT date_format(m, 'yyyy-MM') AS month,
        |  coalesce(mo.n, 0) AS n_orders,
        |  coalesce(mo.total, CAST(0.0 AS DOUBLE)) AS total_price
        |FROM months LEFT JOIN (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mm,
        |         count(*) AS n, round(sum(o_totalprice), 2) AS total
        |  FROM orders_v52 GROUP BY 1) mo ON mo.mm = m
        |ORDER BY month""".stripMargin)
  }

  val q52Sql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
      |         CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
      |  FROM orders),
      |strides(y) AS (
      |  SELECT lo FROM bounds
      |  UNION ALL
      |  SELECT CAST(y + INTERVAL '12 months' AS DATE) FROM strides, bounds
      |  WHERE CAST(y + INTERVAL '12 months' AS DATE) <= hi
      |),
      |months AS (
      |  SELECT CAST(y + off * INTERVAL '1 month' AS DATE) AS m
      |  FROM strides, (SELECT unnest(generate_series(0, 11)) AS off), bounds
      |  WHERE CAST(y + off * INTERVAL '1 month' AS DATE) <= hi
      |)
      |SELECT strftime(m, '%Y-%m') AS month,
      |  coalesce(mo.n, 0) AS n_orders,
      |  coalesce(mo.total, 0.0) AS total_price
      |FROM months LEFT JOIN (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mm,
      |         count(*) AS n, round(sum(o_totalprice), 2) AS total
      |  FROM orders GROUP BY 1) mo ON mo.mm = m
      |ORDER BY month""".stripMargin

  /** VARIANT ingestion — parse the events JSON props into Spark 4's
    * VARIANT type once, then extract typed fields with variant_get.
    * Unlike per-field get_json_object (q24: one parse per extraction),
    * VARIANT parses each document once into a binary form that any
    * number of downstream extractions share — the right shape for
    * wide semi-structured scans at 100 TB. Oracle extracts the same
    * field with DuckDB's JSON reader.
    */
  def q53VariantExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg("k"), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  val q53Sql: String =
    """SELECT event_type, count(*) AS n,
      |  round(avg(k), 4) AS avg_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |        json_extract_string(props, '$.k')::INT AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Count-min sketch — distributed frequency estimation (SURVEY §2.4
    * "not present: sketches" extension, companion to the native
    * Misra-Gries FreqItemsSketch). The sketch is built by Spark's
    * count_min_sketch aggregate (partial sketches merged on the
    * reducer — one 20000×10 counter array crosses the shuffle, not
    * rows), then probed driver-side for each observed key. With
    * eps=1e-4 the width (2/eps) dwarfs the distinct-key count, so no
    * bucket collides and estimates equal exact counts — the oracle
    * pins that exact regime; estimate >= truth always holds by
    * construction and is spec'd in SqlSurfaceSpec.
    */
  def q54CmsFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bytes = Tables.events(spark, sfDir)
      .select(count_min_sketch(col("event_type"), lit(0.0001d), lit(0.999d),
        lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    val keys = Tables.events(spark, sfDir)
      .select("event_type").distinct().as[String].collect().sorted
    keys.toSeq.map(k => (k, cms.estimateCount(k)))
      .toDF("event_type", "est_n")
      .orderBy("event_type")
  }

  val q54Sql: String =
    """SELECT event_type, count(*) AS est_n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** SQL-defined scalar function (Spark 4 `CREATE TEMPORARY FUNCTION
    * ... RETURN expr`): the charge formula packaged as a catalog
    * function instead of a copy-pasted expression. A SQL UDF is pure
    * Catalyst — the body INLINES into the plan at analysis, so the
    * aggregate below whole-stage-codegens exactly like the literal
    * expression (no ScalaUDF/BatchEvalPython island; SqlUdfSpec pins
    * that). Charge rounds per item to integer cents, so the oracle,
    * which inlines the same formula, hash-matches.
    */
  def q63SqlUdf(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_udf")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION charge_c(
        |  p DOUBLE, d DOUBLE, t DOUBLE) RETURNS BIGINT
        |RETURN cast(round(p * (1 - d) * (1 + t) * 100) as bigint)"""
        .stripMargin)
    spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  sum(charge_c(l_extendedprice, l_discount, l_tax)) AS sum_charge_c
        |FROM lineitem_udf
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  val q63Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
      |    * 100) AS BIGINT))::BIGINT AS sum_charge_c
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Named-parameter SQL (`spark.sql(text, args)`): the injection-safe
    * templating surface — parameter markers bind as literals at parse
    * time, so the plan is identical to inlined constants (filters still
    * push to the scan) with no string splicing. The oracle inlines the
    * same values.
    */
  def q64ParamSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_param")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(cast(round(o_totalprice * 100) as bigint)) AS sum_price_c
        |FROM orders_param
        |WHERE o_totalprice > :minp AND o_orderstatus = :status
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      Map("minp" -> Int.box(150000), "status" -> "F"))
  }

  val q64Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
      |    AS sum_price_c
      |FROM orders
      |WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Error-safe ANSI arithmetic surface: `try_divide` / `try_cast`
    * return NULL instead of raising, so a single malformed row cannot
    * kill a 100 TB job mid-shuffle — and the null COUNTS become the
    * data-quality metric. The unit price sums per-row rounded cents
    * (a float sum would re-associate differently per engine).
    */
  def q65TryFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_try")
    spark.sql(
      """SELECT l_linestatus, count(*) AS n,
        |  sum(case when try_divide(l_extendedprice,
        |    nullif(l_quantity, 0.0d)) is null then 1 else 0 end)
        |    AS n_div_null,
        |  sum(cast(round(try_divide(l_extendedprice,
        |    nullif(l_quantity, 0.0d)) * 100) as bigint)) AS sum_unit_c,
        |  sum(case when try_cast(l_returnflag as int) is null
        |    then 1 else 0 end) AS n_badcast
        |FROM lineitem_try
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin)
  }

  val q65Sql: String =
    """SELECT l_linestatus, count(*) AS n,
      |  sum(CASE WHEN l_extendedprice / nullif(l_quantity, 0) IS NULL
      |    THEN 1 ELSE 0 END)::BIGINT AS n_div_null,
      |  sum(CAST(round(l_extendedprice / nullif(l_quantity, 0) * 100)
      |    AS BIGINT))::BIGINT AS sum_unit_c,
      |  sum(CASE WHEN TRY_CAST(l_returnflag AS INT) IS NULL
      |    THEN 1 ELSE 0 END)::BIGINT AS n_badcast
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(
      ("q63_sql_udf", q63SqlUdf _, q63Sql),
      ("q65_try_funcs", q65TryFuncs _, q65Sql),
      ("q64_param_sql", q64ParamSql _, q64Sql),
      ("q50_xml_roundtrip", q50XmlRoundtrip _, q50Sql),
      ("q51_lateral_topn", q51LateralTopn _, q51Sql),
      ("q52_recursive_calendar", q52RecursiveCalendar _, q52Sql),
      ("q53_variant_extract", q53VariantExtract _, q53Sql),
      ("q54_cms_freq", q54CmsFreq _, q54Sql))
}

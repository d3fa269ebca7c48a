package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Analytic-SQL surface beyond the reference (SURVEY §2.5/§2.7/§2.8
  * list these absent): ranking/distribution window functions, bounded
  * frames, CUBE, full-outer joins, correlated and scalar subqueries,
  * array/date/string function suites, and exact percentiles.
  *
  * Scale notes baked into each query: window partitions are keyed (no
  * global single-partition windows, SURVEY C12); CUBE expands in ONE
  * scan via Expand; subqueries lower to broadcast semi-joins or a
  * one-row broadcast scalar; everything stays inside whole-stage
  * codegen except the Expand/Window boundaries Spark defines.
  */
object AnalyticsOps {

  /** Ranking + distribution window functions over per-customer order
    * history: lead, ntile, percent_rank, cume_dist. One hash-partition
    * shuffle on the window key, then a partition-local sort — the same
    * plan shape at any scale because the key (custkey) is
    * high-cardinality.
    */
  def q33WindowAnalytics(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"), col("o_custkey"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q33Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Bounded sliding frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
    * per-supplier moving average over ship history. The frame is what
    * makes this cheap at scale — state per partition is 3 rows, not
    * the whole partition.
    */
  def q34WindowFrames(spark: SparkSession, sfDir: String): DataFrame = {
    // the synthetic lineitem contains exact duplicate (orderkey,
    // linenumber) rows, so the ordering also includes the two columns
    // the frame aggregates — any remaining ties are value-identical
    // and frame contents are engine-independent
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .rowsBetween(-2, Window.currentRow)
    // avg over l_quantity (integer-valued doubles): the 3-element sum
    // is EXACT, so avg = exact/3 rounds identically in both engines.
    // Averaging l_extendedprice here would diverge — DuckDB's window
    // aggregation associates the sum differently, and a 1-ulp
    // difference flips round(x, 2) at .005 boundaries. Price gets
    // min/max instead (no arithmetic, always exact).
    Tables.lineitem(spark, sfDir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        round(avg("l_quantity").over(w), 2).as("mov_avg_qty"),
        round(sum("l_quantity").over(w), 2).as("mov_sum_qty"),
        max("l_extendedprice").over(w).as("mov_max_price"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  val q34Sql: String =
    """SELECT l_orderkey, l_linenumber, l_suppkey,
      |  round(avg(l_quantity) OVER w, 2) AS mov_avg_qty,
      |  round(sum(l_quantity) OVER w, 2) AS mov_sum_qty,
      |  max(l_extendedprice) OVER w AS mov_max_price
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber,
      |    l_quantity, l_extendedprice
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** CUBE: all four aggregation grains of (priority × status) in one
    * scan — Catalyst plans a single Expand feeding one hash aggregate,
    * not four scans. grouping() distinguishes real NULLs from
    * rolled-up ones (completes the rollup/grouping-sets/cube trio with
    * q16/q32).
    */
  def q35Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube("o_orderpriority", "o_orderstatus")
      .agg(
        grouping("o_orderpriority").as("g_prio"),
        grouping("o_orderstatus").as("g_status"),
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy(col("g_prio"), col("g_status"),
        asc_nulls_first("o_orderpriority"), asc_nulls_first("o_orderstatus"))

  val q35Sql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  grouping(o_orderpriority) AS g_prio,
      |  grouping(o_orderstatus) AS g_status,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY g_prio, g_status,
      |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** FULL OUTER join with rows unique to each side: per-nation
    * customer stats (nations 0-24) against a literal watch-list of
    * nation keys 20-29 — keys 25-29 exist only on the right, 0-19
    * only on the left, so both null-extension directions execute.
    */
  def q36FullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val left = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("int").as("nkey"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum("c_acctbal"), 2).as("sum_bal"))
    val right = spark.range(20, 30)
      .select(col("id").cast("int").as("wkey"), lit(true).as("watched"))
    // coalesce every null-extended column: null booleans/longs surface
    // differently per engine's parquet/pandas path (None vs NaN)
    left.join(right, left("nkey") === right("wkey"), "full_outer")
      .select(
        coalesce(col("nkey"), col("wkey")).as("key"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("sum_bal"), lit(0.0)).as("sum_bal"),
        coalesce(col("watched"), lit(false)).as("watched"))
      .orderBy("key")
  }

  val q36Sql: String =
    """SELECT coalesce(nkey, wkey) AS key,
      |  coalesce(n_cust, 0) AS n_cust,
      |  coalesce(sum_bal, 0.0) AS sum_bal,
      |  coalesce(watched, false) AS watched
      |FROM (SELECT c_nationkey::INT AS nkey, count(*) AS n_cust,
      |        round(sum(c_acctbal), 2) AS sum_bal
      |      FROM customer GROUP BY 1) l
      |FULL OUTER JOIN (SELECT i::INT AS wkey, true AS watched
      |      FROM generate_series(20, 29) AS t(i)) r
      |  ON nkey = wkey
      |ORDER BY key""".stripMargin

  /** Correlated EXISTS / NOT EXISTS subqueries — Catalyst decorrelates
    * both into semi/anti joins (no per-row subquery execution; the
    * oracle's planner does the same), so the 100 TB plan is one join,
    * not |customer| probes.
    */
  def q37ExistsSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_ex")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_ex")
    spark.sql(
      """SELECT c_mktsegment, 'has_big_order' AS which, count(*) AS n
        |FROM customer_ex c
        |WHERE EXISTS (SELECT 1 FROM orders_ex o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'no_order_at_all' AS which, count(*) AS n
        |FROM customer_ex c
        |WHERE NOT EXISTS (SELECT 1 FROM orders_ex o
        |  WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY which, c_mktsegment""".stripMargin)
  }

  val q37Sql: String =
    """SELECT c_mktsegment, 'has_big_order' AS which, count(*) AS n
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, 'no_order_at_all' AS which, count(*) AS n
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY which, c_mktsegment""".stripMargin

  /** Scalar subquery as a filter threshold: parts above the global
    * mean retail price. The subquery runs once and broadcasts one row.
    * The mean is rounded to 2 decimals BEFORE the comparison so both
    * engines compare against bit-identical thresholds (raw fp sums
    * can differ in the last ulp across reduction orders).
    */
  def q38ScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("part_sc")
    spark.sql(
      """SELECT p_brand, count(*) AS n_above,
        |  round(avg(p_retailprice), 2) AS avg_above
        |FROM part_sc
        |WHERE p_retailprice > (SELECT round(avg(p_retailprice), 2)
        |                       FROM part_sc)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  val q38Sql: String =
    """SELECT p_brand, count(*) AS n_above,
      |  round(avg(p_retailprice), 2) AS avg_above
      |FROM part
      |WHERE p_retailprice > (SELECT round(avg(p_retailprice), 2) FROM part)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Array function suite over document token arrays: size, distinct,
    * sort, slice, join. All codegen'd array expressions over the split —
    * no explode, so no row explosion at scale. `first3` is emitted as a
    * space-joined STRING (not an array column) so every downstream
    * comparator — including pandas-based harnesses that cannot sort
    * ndarray cells — handles the result.
    */
  def q39ArrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        array_join(slice(array_sort(array_distinct(col("toks"))), 1, 3), " ")
          .as("first3"))
      .orderBy("doc_id")

  val q39Sql: String =
    """SELECT doc_id, len(toks) AS n_tokens,
      |  len(list_distinct(toks)) AS n_distinct,
      |  array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS first3
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Date arithmetic suite: month truncation, day offsets from an
    * epoch, add_months, last_day. Date outputs are formatted to
    * strings (the engine's cross-system convention — SURVEY §1.2 keeps
    * reference dates as strings too).
    */
  def q40DateArith(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("month_start", date_trunc("month", col("o_orderdate")))
      .groupBy(date_format(col("month_start"), "yyyy-MM-dd").as("month"))
      .agg(
        count(lit(1)).as("n"),
        max(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
          .as("max_day_off"),
        date_format(add_months(min(col("o_orderdate")), 1), "yyyy-MM-dd")
          .as("next_month_anchor"),
        date_format(last_day(max(col("o_orderdate"))), "yyyy-MM-dd")
          .as("month_last_day"))
      .orderBy("month")

  val q40Sql: String =
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
      |  count(*) AS n,
      |  max(date_diff('day', DATE '1995-01-01', o_orderdate)) AS max_day_off,
      |  strftime(min(o_orderdate) + INTERVAL 1 MONTH, '%Y-%m-%d')
      |    AS next_month_anchor,
      |  strftime(last_day(max(o_orderdate)::DATE), '%Y-%m-%d')
      |    AS month_last_day
      |FROM orders
      |GROUP BY 1
      |ORDER BY month""".stripMargin

  /** String function suite: levenshtein distance, translate, substr,
    * concat_ws — grouped so the output stays small at any SF.
    */
  def q41StringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(
        levenshtein(col("p_brand"), lit("Brand#33")).as("lev"),
        upper(substring(col("p_type"), 1, 4)).as("t4"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tname"),
        concat_ws("/", col("p_brand"), col("p_type")).as("bt"))
      .groupBy("lev", "t4")
      .agg(count(lit(1)).as("n"), min("tname").as("min_tname"),
        max("bt").as("max_bt"))
      .orderBy("lev", "t4")

  val q41Sql: String =
    """SELECT levenshtein(p_brand, 'Brand#33') AS lev,
      |  upper(substr(p_type, 1, 4)) AS t4, count(*) AS n,
      |  min(translate(p_name, 'aeiou', 'AEIOU')) AS min_tname,
      |  max(concat_ws('/', p_brand, p_type)) AS max_bt
      |FROM part
      |GROUP BY 1, 2
      |ORDER BY lev, t4""".stripMargin

  /** Exact percentiles (percentile_cont WITHIN GROUP + median) — the
    * exact counterpart of stat_approx_quantiles: interpolation is
    * deterministic, so unlike the sketches this is oracle-checkable.
    * At 100 TB exact percentiles need a full sort per group — that is
    * the point of keeping BOTH this and the KLL/GK approx path.
    */
  def q42ExactPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_pc")
    spark.sql(
      """SELECT l_returnflag,
        |  round(median(l_quantity), 2) AS med_qty,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 2)
        |    AS q1_qty,
        |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 2)
        |    AS q3_qty,
        |  round(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 2)
        |    AS p95_price
        |FROM lineitem_pc
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  val q42Sql: String =
    """SELECT l_returnflag,
      |  round(median(l_quantity), 2) AS med_qty,
      |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 2)
      |    AS q1_qty,
      |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 2)
      |    AS q3_qty,
      |  round(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 2)
      |    AS p95_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** PIVOT with an explicit value list: per-priority counts spread
    * into one column per order status. The explicit `Seq("F","O","P")`
    * matters at scale — without it Spark runs an extra distinct-values
    * job over the full table before it can even plan. Empty cells are
    * coalesced to 0 (Spark pivots them to null; SQL FILTER counts 0).
    */
  def q43Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  val q43Sql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (o_orderstatus = 'P') AS n_p
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** MULTI-aggregate pivot: each pivoted status carries BOTH a count
    * and a cents-exact spend sum (q43 pivots one aggregate; the
    * multi-agg form exercises Spark's `statusval_aggname` column
    * naming and doubles the Expand width, still ONE scan). The oracle
    * is the FILTER formulation, one filtered aggregate per output
    * cell.
    */
  def q66PivotMultiAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("price_c",
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O"))
      .agg(count(lit(1)).as("n"), sum("price_c").as("spend_c"))
      .select(
        col("o_orderpriority"),
        coalesce(col("F_n"), lit(0L)).as("n_f"),
        coalesce(col("F_spend_c"), lit(0L)).as("spend_f_c"),
        coalesce(col("O_n"), lit(0L)).as("n_o"),
        coalesce(col("O_spend_c"), lit(0L)).as("spend_o_c"))
      .orderBy("o_orderpriority")

  val q66Sql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
      |  coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |    FILTER (o_orderstatus = 'F'), 0)::BIGINT AS spend_f_c,
      |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
      |  coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |    FILTER (o_orderstatus = 'O'), 0)::BIGINT AS spend_o_c
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** UNPIVOT (melt): the wide per-status counts fold back into tall
    * (priority, status, n) rows — the inverse of q43, exercising
    * Spark's unpivot/melt operator. Oracle is the UNION ALL
    * formulation every engine agrees on.
    */
  def q44Unpivot(spark: SparkSession, sfDir: String): DataFrame =
    q43Pivot(spark, sfDir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o"), col("n_p")),
        "status_col", "n")
      .orderBy("o_orderpriority", "status_col")

  val q44Sql: String =
    """WITH wide AS (
      |  SELECT o_orderpriority,
      |    count(*) FILTER (o_orderstatus = 'F') AS n_f,
      |    count(*) FILTER (o_orderstatus = 'O') AS n_o,
      |    count(*) FILTER (o_orderstatus = 'P') AS n_p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n FROM wide
      |UNION ALL
      |SELECT o_orderpriority, 'n_o' AS status_col, n_o AS n FROM wide
      |UNION ALL
      |SELECT o_orderpriority, 'n_p' AS status_col, n_p AS n FROM wide
      |ORDER BY o_orderpriority, status_col""".stripMargin

  /** posexplode — generator with ordinality (SURVEY §2.8 F5 covers
    * plain explode; this adds the position). Bounded to the first 5
    * tokens so output is O(docs), not O(corpus tokens).
    */
  def q45Posexplode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 5))
          .as(Seq("pos", "token")))
      .orderBy("doc_id", "pos")

  val q45Sql: String =
    """SELECT doc_id,
      |  unnest(generate_series(1, least(len(tk), 5))) - 1 AS pos,
      |  unnest(tk[1:least(len(tk), 5)]) AS token
      |FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      |ORDER BY doc_id, pos""".stripMargin

  /** JSON-lines roundtrip (SURVEY §2.1 source breadth + §2.8 F8's
    * batch counterpart): write a subset as JSON, read back with an
    * EXPLICIT schema (schema inference over JSON is a full extra scan
    * at 100 TB — never infer in production paths), aggregate. The
    * oracle computes the same aggregate from the parquet table, so
    * the check proves the JSON write→read cycle is lossless.
    */
  def q48JsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_rt")
      .resolve("orders_json").toString
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") < 5000)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").json(dir)
    spark.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .json(dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("sum_price"),
        min("o_orderkey").as("min_key"))
      .orderBy("o_orderstatus")
  }

  val q48Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS sum_price,
      |  min(o_orderkey) AS min_key
      |FROM orders
      |WHERE o_orderkey < 5000
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** ORC roundtrip — the second columnar format Spark ships natively.
    * Same lossless-cycle proof as q22/q48; ORC keeps vectorized reads
    * and predicate pushdown, so a lakehouse mixing parquet and ORC
    * behaves identically through this engine.
    */
  def q49OrcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_rt")
      .resolve("lineitem_orc").toString
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 5000)
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
      .filter(col("l_quantity") >= 10) // pushed into the ORC scan
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        max("l_extendedprice").as("max_price"))
      .orderBy("l_returnflag")
  }

  val q49Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem
      |WHERE l_orderkey < 5000 AND l_quantity >= 10
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Column profiling — SURVEY §2.4 A10 (`describe(include="all")`
    * null/min/max/freq checks) as a catalog query instead of only a
    * test. One aggregation PER COLUMN unioned (each is a single
    * hash-agg pass; at 100 TB you profile the columns you need, not
    * the table). All outputs exact: counts, exact distinct, min/max
    * stringified. Doubles here stay < 1e7 so Spark's cast-to-string
    * never switches to scientific notation (which DuckDB's never
    * does).
    */
  def q47Profile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val cols = Seq("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
    cols.map { c =>
      li.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .withColumn("col", lit(c))
    }.reduce(_ unionByName _)
      .select("col", "n", "n_null", "n_distinct", "min_s", "max_s")
      .orderBy("col")
  }

  val q47Sql: String = {
    val per = Seq("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .map { c =>
        s"""SELECT '$c' AS col, count(*) AS n,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min($c)::VARCHAR AS min_s, max($c)::VARCHAR AS max_s
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"$per\nORDER BY col"
  }

  /** Exact correlation / covariance / stddev per return flag, computed
    * from co-moment sums rather than the built-in `corr`/`covar_samp`
    * aggregates. The inputs are fixed-point (2-decimal) doubles, so
    * casting to DECIMAL(18,2) first makes every sum EXACT — the final
    * double combination is then bit-identical across engines (same
    * IEEE ops on identical inputs), which the streaming-style
    * one-pass `corr` implementations (Welford co-moments, whose
    * accumulation order is engine- and partition-count-dependent)
    * cannot guarantee. Scale: one hash-agg pass, 6 decimal
    * accumulators per group — the same shuffle cost as a plain sum;
    * nothing here is O(n) on the driver.
    */
  def q58CorrStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val q = col("l_quantity").cast("decimal(18,2)")
    val p = col("l_extendedprice").cast("decimal(18,2)")
    val m = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(q).as("sq"), sum(p).as("sp"),
      sum(q * p).as("sqp"), sum(q * q).as("sqq"), sum(p * p).as("spp"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val covQQ = nD * d("sqq") - d("sq") * d("sq")
    val covPP = nD * d("spp") - d("sp") * d("sp")
    val covQP = nD * d("sqp") - d("sq") * d("sp")
    m.select(col("l_returnflag"), col("n"),
        round(covQP / sqrt(covQQ * covPP), 4).as("corr_qty_price_e4"),
        round((d("sqp") - d("sq") * d("sp") / col("n")) / (col("n") - 1), 2)
          .as("covar_qty_price"),
        round(sqrt(covQQ / (nD * (col("n") - 1))), 4).as("stddev_qty"),
        round(sqrt(covPP / (nD * (col("n") - 1))), 4).as("stddev_price"))
      .orderBy("l_returnflag")
  }

  val q58Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)) *
      |        CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)) *
      |        CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        CAST(l_extendedprice AS DECIMAL(18,2))) AS spp
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
      |      - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) /
      |    sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
      |        - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
      |      (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
      |        - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 4)
      |    AS corr_qty_price_e4,
      |  round((CAST(sqp AS DOUBLE)
      |      - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / n) / (n - 1), 2)
      |    AS covar_qty_price,
      |  round(sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
      |      - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (n - 1))), 4) AS stddev_qty,
      |  round(sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
      |      - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (n - 1))), 4) AS stddev_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Explicit GROUPING SETS with per-column `grouping()` flags — the
    * one grouping-analytics shape q16 (ROLLUP) and q35 (CUBE) don't
    * cover: an arbitrary, non-hierarchical set list. Uses the
    * Dataset.groupingSets API (Spark 4.0+) rather than SQL text, so
    * the set list is first-class in the plan; Catalyst lowers it to
    * the same single-scan Expand as CUBE. `o_orderstatus` and
    * `o_orderpriority` are non-null by construction, so the
    * `coalesce` sentinel is unambiguous. total_price sums exactly in
    * DECIMAL and converts to double once at the end (identical
    * nearest-double on both engines).
    */
  def q59GroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val s = col("o_orderstatus")
    val p = col("o_orderpriority")
    o.groupingSets(Seq(Seq(s, p), Seq(s), Seq(p), Seq()), s, p)
      .agg(
        grouping(s).cast("int").as("g_status"),
        grouping(p).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .select(
        coalesce(s, lit("<all>")).as("status"),
        coalesce(p, lit("<all>")).as("priority"),
        col("g_status"), col("g_priority"), col("n_orders"),
        col("total_price"))
      .orderBy("g_status", "g_priority", "status", "priority")
  }

  val q59Sql: String =
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      |  coalesce(o_orderpriority, '<all>') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |  (o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  /** Fuzzy entity matching: pairs of distinct part names within
    * Levenshtein distance 2, with each name's row count — the
    * edit-distance blocking step of entity resolution / record linkage.
    *
    * Scale shape: the quadratic candidate space is cut by LENGTH-BAND
    * BLOCKING turned into an equi-join — `levenshtein(a,b) >= |len(a) -
    * len(b)|`, so one side joins on its own length while the other
    * explodes its length ±2 into probe keys. Every surviving candidate
    * pair shares a band key, making the pairing a hash join on the
    * DISTINCT-name aggregate (|names| rows, not |rows|) instead of an
    * all-pairs cross. Each unordered pair arrives exactly once
    * (`name_a < name_b` keeps the single left=a orientation).
    * `levenshtein` runs only on banded candidates, inside codegen.
    */
  def q60FuzzyMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val names = Tables.part(spark, sfDir)
      .groupBy("p_name").agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("p_name")))
    val probes = names.select(col("p_name").as("name_b"),
      col("cnt").as("cnt_b"),
      explode(expr("sequence(len - 2, len + 2)")).as("lk"))
    names.select(col("p_name").as("name_a"), col("cnt").as("cnt_a"),
        col("len").as("lk"))
      .join(probes, "lk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 2)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("cnt_a"), col("cnt_b"))
      .orderBy("name_a", "name_b")
  }

  val q60Sql: String =
    """WITH n AS (
      |  SELECT p_name, count(*) AS cnt, length(p_name) AS len
      |  FROM part GROUP BY 1)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  levenshtein(a.p_name, b.p_name) AS dist,
      |  a.cnt AS cnt_a, b.cnt AS cnt_b
      |FROM n a JOIN n b
      |  ON a.p_name < b.p_name AND abs(a.len - b.len) <= 2
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY name_a, name_b""".stripMargin

  /** Time-based rolling window: per customer, the trailing-7-day order
    * count and spend at every order — a RANGE frame over event TIME
    * (peers with the same date share one frame), not a ROWS frame over
    * positions like q18/q34. The idiom behind rolling-retention and
    * spend-velocity features.
    *
    * Cross-engine exactness: spend is summed in integer cents (frame
    * sums of raw doubles re-associate differently per engine — the
    * round-2 trap); the timestamp is emitted as epoch micros. One
    * hash-partition shuffle on the window key at any scale.
    */
  def q61Rolling7d(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_r7")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |  unix_micros(cast(o_orderdate as timestamp)) AS day_us,
        |  count(*) OVER w AS n_7d,
        |  sum(cast(round(o_totalprice * 100) as bigint)) OVER w AS sum_7d_c
        |FROM orders_r7
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day_us, o_orderkey""".stripMargin)
  }

  val q61Sql: String =
    """SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS day_us,
      |  count(*) OVER w AS n_7d,
      |  (sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w)::BIGINT
      |    AS sum_7d_c
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, day_us, o_orderkey""".stripMargin

  /** TPC-H Q5-shaped six-table star join: per-nation revenue from
    * line items where the customer and supplier share a nation, the
    * nation sits in one region — the canonical join-order/broadcast
    * showcase. Revenue rounds each item to integer cents BEFORE the
    * sum (IEEE multiply then half-up round is engine-identical; a
    * float SUM is not), so the oracle hash-matches.
    *
    * Scale plan (asserted by explain inspection, and why the joins are
    * written smallest-out): region(5)→nation(25) prunes to a handful
    * of rows and BROADCASTS into supplier; supplier(broadcastable) and
    * customer join the surviving nation keys as broadcasts too, so the
    * only shuffles left are the two FACT joins — orders⋈customer on
    * custkey and lineitem⋈orders on orderkey — exactly the exchanges a
    * 100 TB run must pay, with AQE free to pick its own order. The
    * c_nationkey = s_nationkey constraint rides the broadcast join
    * output as a cheap post-filter, never a shuffle key.
    */
  def q62LocalSupply(spark: SparkSession, sfDir: String): DataFrame = {
    val nationsInRegion = Tables.nation(spark, sfDir).as("n")
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nationsInRegion),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nationsInRegion),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) " +
          "as bigint)").as("rev_c"))
      .join(Tables.orders(spark, sfDir)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_items"), sum("rev_c").as("revenue_c"))
      .orderBy("n_name")
  }

  val q62Sql: String =
    """SELECT n_name, count(*) AS n_items,
      |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |    AS BIGINT))::BIGINT AS revenue_c
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(
      ("q60_fuzzy_match", q60FuzzyMatch _, q60Sql),
      ("q61_rolling_7d", q61Rolling7d _, q61Sql),
      ("q62_local_supply", q62LocalSupply _, q62Sql),
      ("q66_pivot_multi_agg", q66PivotMultiAgg _, q66Sql),
      ("q33_window_analytics", q33WindowAnalytics _, q33Sql),
      ("q34_window_frames", q34WindowFrames _, q34Sql),
      ("q35_cube", q35Cube _, q35Sql),
      ("q36_full_outer", q36FullOuter _, q36Sql),
      ("q37_exists_subquery", q37ExistsSubquery _, q37Sql),
      ("q38_scalar_subquery", q38ScalarSubquery _, q38Sql),
      ("q39_array_funcs", q39ArrayFuncs _, q39Sql),
      ("q40_date_arith", q40DateArith _, q40Sql),
      ("q41_string_funcs", q41StringFuncs _, q41Sql),
      ("q42_exact_percentiles", q42ExactPercentiles _, q42Sql),
      ("q43_pivot", q43Pivot _, q43Sql),
      ("q44_unpivot", q44Unpivot _, q44Sql),
      ("q45_posexplode", q45Posexplode _, q45Sql),
      ("q47_profile", q47Profile _, q47Sql),
      ("q48_json_roundtrip", q48JsonRoundtrip _, q48Sql),
      ("q49_orc_roundtrip", q49OrcRoundtrip _, q49Sql),
      ("q58_corr_stats", q58CorrStats _, q58Sql),
      ("q59_grouping_sets", q59GroupingSets _, q59Sql))
}

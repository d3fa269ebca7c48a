package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Approximate / sketch-based aggregates — the scale substitutes for the
  * exact aggregates in [[RelationalOps]] (q17's exact countDistinct is a
  * two-phase shuffle of every distinct key; at 100 TB you want a
  * constant-size sketch instead).
  *
  * Reference analog: the reference only ever computes exact counts
  * (`Explorativa2.ipynb:136-138` ratings-per-film) at MovieLens-1M scale.
  * These operators keep the same query shapes answerable when the input
  * is 5 orders of magnitude larger.
  *
  * None of these are cross-engine deterministic (HLL++/GK/DataSketches
  * implementations differ between Spark and DuckDB), so the catalog
  * entries are rows-only checks; StatsSpec asserts the error bounds that
  * make them trustworthy (HLL rel-err ~1/sqrt(2^lgK), percentile rank
  * error ≤ 1/accuracy).
  */
object StatsOps {

  /** Per-nation distinct-customer cardinality, exact vs HLL++.
    * approx_count_distinct carries a fixed ~few-KB sketch per group
    * through the partial agg, so the shuffle is O(groups), not
    * O(distinct keys) — the q17 scale fix promised in its Scaladoc.
    */
  def statApproxDistinctRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    o.join(broadcast(c.select("c_custkey", "c_nationkey")),
        o("o_custkey") === c("c_custkey"))
      .groupBy("c_nationkey")
      .agg(
        countDistinct(col("o_custkey")).as("exact_cust"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_nationkey")
  }

  /** Catalog variant: the sketch estimate itself is engine-specific
    * (HLL++ internals differ between Spark and any oracle), so the
    * estimate is exported as an in-band BOOLEAN — |approx-exact|/exact
    * within 4×rsd — which the oracle asserts as constant TRUE while the
    * exact columns hash-compare as usual. StatsSpec keeps the tighter
    * quantitative band on [[statApproxDistinctRaw]].
    */
  def statApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    statApproxDistinctRaw(spark, sfDir)
      .select(col("c_nationkey"), col("exact_cust"), col("n_orders"),
        (col("approx_cust") >= col("exact_cust") * 0.92 &&
          col("approx_cust") <= col("exact_cust") * 1.08)
          .as("approx_in_band"))

  val statApproxDistinctSql: String =
    """SELECT c_nationkey, count(DISTINCT o_custkey) AS exact_cust,
      |  count(*) AS n_orders, TRUE AS approx_in_band
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** Approximate quantiles of order value per priority bucket.
    * percentile_approx (GK sketch) is single-pass and mergeable; exact
    * percentile needs a full sort per group. accuracy=10000 bounds rank
    * error at 0.01% of rows.
    */
  def statApproxQuantilesRaw(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(
        round(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)), 2)
          .as("p50"),
        round(percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)), 2)
          .as("p95"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Catalog variant (same in-band pattern as [[statApproxDistinct]]):
    * the GK estimate itself is engine-specific, so the hash-compared
    * columns are the EXACT interpolated quantiles (Spark `percentile`
    * and DuckDB `quantile_cont` share the rank = p*(n-1) linear
    * interpolation) plus booleans asserting each approx value lands
    * between the exact quantiles at p ± 5/accuracy — implied TRUE by
    * the GK guarantee (rank error ≤ 1/accuracy), asserted as constant
    * TRUE by the oracle. [[statApproxQuantilesRaw]] keeps the raw
    * estimates for StatsSpec's quantitative rank-window assertion.
    */
  def statApproxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val eps = 5.0 / 10000.0
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50_exact"),
        round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95_exact"),
        count(lit(1)).as("n"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("p50_a"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
          .as("p95_a"),
        expr(s"percentile(o_totalprice, ${0.5 - eps})").as("p50_lo"),
        expr(s"percentile(o_totalprice, ${0.5 + eps})").as("p50_hi"),
        expr(s"percentile(o_totalprice, ${0.95 - eps})").as("p95_lo"),
        expr(s"percentile(o_totalprice, ${0.95 + eps})").as("p95_hi"))
      .select(col("o_orderpriority"), col("p50_exact"), col("p95_exact"),
        col("n"),
        (col("p50_a") >= col("p50_lo") && col("p50_a") <= col("p50_hi"))
          .as("p50_in_band"),
        (col("p95_a") >= col("p95_lo") && col("p95_a") <= col("p95_hi"))
          .as("p95_in_band"))
      .orderBy("o_orderpriority")
  }

  val statApproxQuantilesSql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
      |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95_exact,
      |  count(*) AS n, TRUE AS p50_in_band, TRUE AS p95_in_band
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Mergeable-sketch rollup: build one DataSketches HLL sketch per
    * nation, then union the binary sketches up to region level WITHOUT
    * rescanning the fact table. This is the pattern that matters at
    * 100 TB: per-shard sketches are tiny, re-aggregation at any coarser
    * grain is a merge of sketches, not a second scan.
    */
  def statHllUnionRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val perNation = o
      .join(broadcast(c.select("c_custkey", "c_nationkey")),
        o("o_custkey") === c("c_custkey"))
      .groupBy("c_nationkey")
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sketch"))
    perNation
      .join(broadcast(n.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_region_cust"))
      .orderBy("n_regionkey")
  }

  /** Catalog variant: the union estimate rides next to an exact twin
    * column, and what the oracle asserts is (a) the exact distinct
    * hash-matches and (b) the estimate lands inside lgK=14's ±3%
    * (≈3.7×rsd) band — TRUE on both engines. The sketch is exact in the
    * coupon regime (verify scale) and ~0.8% rsd beyond it (sf0.1
    * showed 0.4-1.0%), so the band holds at every SF; the exact twin
    * is verify-only scaffolding a production rollup would drop.
    */
  def statHllUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val exact = o
      .join(broadcast(c.select("c_custkey", "c_nationkey")),
        o("o_custkey") === c("c_custkey"))
      .join(broadcast(n.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(countDistinct(col("o_custkey")).as("exact_region_cust"))
    statHllUnionRaw(spark, sfDir)
      .join(exact, Seq("n_regionkey"))
      .select(col("n_regionkey"), col("exact_region_cust"),
        (col("approx_region_cust") >= col("exact_region_cust") * 0.97 &&
          col("approx_region_cust") <= col("exact_region_cust") * 1.03)
          .as("approx_in_band"))
      .orderBy("n_regionkey")
  }

  val statHllUnionSql: String =
    """SELECT n_regionkey, count(DISTINCT o_custkey) AS exact_region_cust,
      |  TRUE AS approx_in_band
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin

  /** Per-nation top-3 customers by account balance via the native
    * [[graft.functions.TopKByScore]] aggregate. Unlike the window
    * formulation (q05/q06), the shuffle carries k ids per
    * (partition, nation) — not every customer row. Ids are emitted as
    * a comma-joined string for a type-robust cross-engine compare.
    */
  def statTopkAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy("c_nationkey")
      .agg(array_join(
        graft.functions.TopKByScore.topkIds(
          col("c_acctbal"), col("c_custkey").cast("long"), 3), ",")
        .as("top_cust"))
      .orderBy("c_nationkey")

  val statTopkSql: String =
    """SELECT c_nationkey,
      |  array_to_string((list(c_custkey ORDER BY c_acctbal DESC, c_custkey ASC))[:3], ',') AS top_cust
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** Per-day heavy hitters via the native DataSketches frequencies
    * aggregate ([[graft.functions.FreqItemsSketch]], Misra-Gries).
    * The partial state crossing the shuffle is a fixed 64-entry map
    * per (partition, day) no matter how many events — the 100 TB
    * substitute for an exact terms groupBy. With 5 distinct event
    * types ≪ 64 map slots the sketch is provably EXACT, so unlike the
    * other sketches this one oracle-checks against plain counts.
    */
  def statFreqItems(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("day")
      .agg(graft.functions.FreqItemsSketch.freqItems(col("event_type"), 64)
        .as("fi"))
      .select(col("day"), posexplode(col("fi")).as(Seq("pos", "f")))
      .filter(col("pos") < 3)
      .select(col("day"), (col("pos") + 1).cast("int").as("rank"),
        col("f.item").as("item"), col("f.est").as("n"))
      .orderBy("day", "rank")

  val statFreqItemsSql: String =
    """SELECT day, rank, item, n FROM (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS item,
      |    count(*) AS n,
      |    row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d')
      |      ORDER BY count(*) DESC, event_type) AS rank
      |  FROM events GROUP BY 1, 2)
      |WHERE rank <= 3
      |ORDER BY day, rank""".stripMargin

  /** Audience overlap via theta-sketch set algebra
    * ([[graft.functions.ThetaSketch]]): ONE scan builds a sketch per
    * event_type, then every pairwise |users(A) ∩ users(B)| is
    * answered from the 5 sketches alone. At 100 TB this is the
    * difference between 10 self-joins of the fact table and 10
    * intersections of kilobyte sketches. Distinct users per type
    * (1.5k at sf0.1) sit far below the 2^14 nominal entries, so the
    * estimates are exact and the oracle checks true intersection
    * counts.
    */
  def statThetaOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.ThetaSketch
    val sk = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(ThetaSketch.thetaSketch(col("user_id").cast("string")).as("sk"))
      .localCheckpoint() // both join sides reuse it; 5 rows
    sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(
        col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        ThetaSketch.thetaIntersectEst(col("a.sk"), col("b.sk"))
          .as("overlap"))
      .orderBy("type_a", "type_b")
  }

  val statThetaOverlapSql: String =
    """SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  (SELECT count(DISTINCT e1.user_id) FROM events e1
      |   WHERE e1.event_type = a.event_type
      |     AND e1.user_id IN (SELECT e2.user_id FROM events e2
      |                        WHERE e2.event_type = b.event_type))
      |    AS overlap
      |FROM (SELECT DISTINCT event_type FROM events) a
      |JOIN (SELECT DISTINCT event_type FROM events) b
      |  ON a.event_type < b.event_type
      |ORDER BY type_a, type_b""".stripMargin

  /** Poisson-bootstrap distribution of mean(`n_chars`) over documents —
    * the cluster-friendly bootstrap (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google 2012): instead of
    * resampling n rows WITH replacement per replicate (which needs a
    * global index and random access — impossible at 100 TB), each row
    * draws an independent pseudo-Poisson(1) weight per replicate. One
    * scan, R weighted partial sums, map-side combine; the explode is a
    * constant R× blowup that the combiner collapses to partitions×R
    * rows before the single shuffle.
    *
    * Determinism: the weight is a pure integer hash of (doc_id, r) —
    * h mod 1000 thresholded at the Poisson(1) pmf (368/368/184/80‰ for
    * w=0,1,2,3+) — so the oracle replays the identical arithmetic and
    * the result hashes exactly. The doc_id operand is bounded with
    * `pmod(doc_id, 1e9)` BEFORE the Knuth multiply so the product
    * provably fits int64 at any corpus size (r10 advice: the unbounded
    * `doc_id * 2654435761` wraps silently in Spark past doc_id ≈
    * 3.5e9 while DuckDB raises on BIGINT overflow — the engines would
    * diverge exactly at the scale the exactness claim targets). Means are emitted in half-up integer
    * basis points ([[graft.text.TextOps.textQuality]] rationale). The
    * R output rows ARE the bootstrap distribution; any CI is a
    * percentile read over them.
    */
  def statBootstrapCi(spark: SparkSession, sfDir: String,
      replicates: Int = 100): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .select(col("doc_id"), col("n_chars"),
        // long like the oracle's generate_series (DuckDB yields BIGINT)
        explode(expr(s"sequence(0L, ${replicates - 1}L)")).as("r"))
      .select(col("r"), col("n_chars"),
        expr("(pmod(doc_id, 1000000000) * 2654435761 + r * 40503) % 1000")
          .as("h"))
      .select(col("r"), col("n_chars"),
        expr("case when h < 368 then 0 when h < 736 then 1 " +
          "when h < 920 then 2 else 3 end").cast("long").as("w"))
      .groupBy("r")
      .agg(sum("w").as("n_eff"),
        expr("(sum(w * n_chars) * 10000 + sum(w) div 2) div sum(w)")
          .as("mean_e4"))
      .orderBy("r")

  def statBootstrapCiSql(replicates: Int = 100): String =
    s"""SELECT r, sum(w)::BIGINT AS n_eff,
       |  ((sum(w * n_chars)::BIGINT) * 10000 + (sum(w)::BIGINT) // 2)
       |    // (sum(w)::BIGINT) AS mean_e4
       |FROM (
       |  SELECT r, n_chars,
       |    CASE WHEN (((doc_id % 1000000000 + 1000000000) % 1000000000)
       |           * 2654435761 + r * 40503) % 1000 < 368 THEN 0
       |         WHEN (((doc_id % 1000000000 + 1000000000) % 1000000000)
       |           * 2654435761 + r * 40503) % 1000 < 736 THEN 1
       |         WHEN (((doc_id % 1000000000 + 1000000000) % 1000000000)
       |           * 2654435761 + r * 40503) % 1000 < 920 THEN 2
       |         ELSE 3 END::BIGINT AS w
       |  FROM (
       |    SELECT doc_id, n_chars,
       |      unnest(generate_series(0, ${replicates - 1})) AS r
       |    FROM documents))
       |GROUP BY r
       |ORDER BY r""".stripMargin

  /** Winsorized per-segment account-balance statistics: clamp each
    * balance into its segment's [p05, p95] band, then report the band
    * edges, clamp counts, and the exact winsorized sum — the outlier
    * treatment robust pipelines apply before averaging skewed monetary
    * columns.
    *
    * Cross-engine exactness: balances become integer cents first, and
    * the band edges use `percentile_disc` (SQL-standard: the smallest
    * actual value whose cume_dist ≥ p) — discrete percentiles pick real
    * data values, so there is NO float interpolation to diverge between
    * engines, and the winsorized sum stays a pure bigint.
    *
    * Scale shape: pass 1 is a per-segment percentile aggregate whose
    * output is one row per segment (broadcast); pass 2 re-scans with a
    * broadcast join and clamps in codegen. Two scans, one tiny shuffle
    * each — the sort inside percentile_disc is per-group and Spark
    * evaluates it as an aggregate, not a global sort.
    */
  def statWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("bal_c"))
      .createOrReplaceTempView("cust_wins")
    spark.sql(
      """WITH p AS (
        |  SELECT c_mktsegment,
        |    -- Spark's percentile_disc returns DOUBLE even over bigints;
        |    -- the value is an actual data point, so the cast is exact
        |    cast(percentile_disc(0.05) WITHIN GROUP (ORDER BY bal_c)
        |      AS BIGINT) AS p05_c,
        |    cast(percentile_disc(0.95) WITHIN GROUP (ORDER BY bal_c)
        |      AS BIGINT) AS p95_c
        |  FROM cust_wins GROUP BY c_mktsegment)
        |SELECT c.c_mktsegment, p05_c, p95_c, count(*) AS n,
        |  sum(cast(bal_c < p05_c AS INT)) AS n_lo,
        |  sum(cast(bal_c > p95_c AS INT)) AS n_hi,
        |  sum(CASE WHEN bal_c < p05_c THEN p05_c
        |           WHEN bal_c > p95_c THEN p95_c
        |           ELSE bal_c END) AS sum_wins_c
        |FROM cust_wins c JOIN p USING (c_mktsegment)
        |GROUP BY c.c_mktsegment, p05_c, p95_c
        |ORDER BY c_mktsegment""".stripMargin)
  }

  val statWinsorizeSql: String =
    """WITH c AS (
      |  SELECT c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
      |p AS (
      |  SELECT c_mktsegment,
      |    percentile_disc(0.05) WITHIN GROUP (ORDER BY bal_c) AS p05_c,
      |    percentile_disc(0.95) WITHIN GROUP (ORDER BY bal_c) AS p95_c
      |  FROM c GROUP BY c_mktsegment)
      |SELECT c.c_mktsegment, p05_c::BIGINT AS p05_c,
      |  p95_c::BIGINT AS p95_c, count(*) AS n,
      |  sum((bal_c < p05_c)::INT)::BIGINT AS n_lo,
      |  sum((bal_c > p95_c)::INT)::BIGINT AS n_hi,
      |  sum(CASE WHEN bal_c < p05_c THEN p05_c
      |           WHEN bal_c > p95_c THEN p95_c
      |           ELSE bal_c END)::BIGINT AS sum_wins_c
      |FROM c JOIN p USING (c_mktsegment)
      |GROUP BY c.c_mktsegment, p05_c, p95_c
      |ORDER BY c_mktsegment""".stripMargin

  /** Join-key skew audit on `lineitem.l_partkey`: the heavy-hitter
    * diagnostic run before choosing a join strategy — top-10 keys with
    * their ppm share of all rows, plus global total/distinct/max-count
    * columns on every row. A key above ~1/partitions of the total is
    * the signal to salt (q28) or let AQE split it.
    *
    * Scale shape: one map-side-combining groupBy on the key; the global
    * stats are a second tiny aggregate over the per-key counts (|keys|
    * rows, not |rows|); the top-10 is TakeOrdered over the same — no
    * global sort, no second scan of the fact table. All arithmetic is
    * integer (ppm via bigint div), so the oracle matches exactly.
    */
  def statSkewAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("n_total"),
      count(lit(1)).as("n_distinct"), max("cnt").as("max_cnt"))
    counts.orderBy(col("cnt").desc, col("l_partkey")).limit(10)
      .crossJoin(broadcast(totals))
      .select(col("l_partkey"), col("cnt"),
        expr("cnt * 1000000 div n_total").as("share_ppm"),
        col("n_total"), col("n_distinct"), col("max_cnt"))
      .orderBy(col("cnt").desc, col("l_partkey"))
  }

  val statSkewAuditSql: String =
    """WITH k AS (
      |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
      |t AS (
      |  SELECT sum(cnt)::BIGINT AS n_total, count(*) AS n_distinct,
      |    max(cnt) AS max_cnt FROM k)
      |SELECT l_partkey, cnt, cnt * 1000000 // n_total AS share_ppm,
      |  n_total, n_distinct, max_cnt
      |FROM k CROSS JOIN t
      |ORDER BY cnt DESC, l_partkey LIMIT 10""".stripMargin

  /** CUPED variance reduction (Deng et al. 2013): adjust each user's
    * experiment-period metric by their pre-period baseline — the
    * standard trick that shrinks A/B test variance by the squared
    * pre/post correlation, letting the same experiment detect a
    * smaller effect. Here the timeline midpoint splits events into
    * pre/post, per-user sums are the metric, and
    * `adj = post − θ·(pre − mean_pre)` with the OLS
    * `θ = cov(pre, post) / var(pre)`.
    *
    * Cross-engine exactness, the q58 pattern: per-user sums and all
    * co-moments accumulate in DECIMAL (exact, order-free); θ and the
    * adjustment are IEEE double ops over identical exact operands, so
    * both engines produce the same bits, rounded 2 dp for the hash.
    *
    * Scale shape: one scalar min/max agg (broadcast midpoint), one
    * user-keyed conditional aggregation, one 5-value co-moment
    * aggregate (broadcast), one projection — two data-sized passes,
    * both map-side combining.
    */
  def statCuped(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("value").cast("decimal(18,2)").as("v"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val zero = lit(0).cast("decimal(18,2)")
    val per = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(
        sum(when(col("us") < col("mid_us"), col("v")).otherwise(zero))
          .cast("decimal(18,2)").as("pre"),
        sum(when(col("us") >= col("mid_us"), col("v")).otherwise(zero))
          .cast("decimal(18,2)").as("post"))
    val m = per.agg(count(lit(1)).as("n"),
      sum("pre").as("s1"), sum("post").as("s2"),
      sum(col("pre") * col("pre")).as("s11"),
      sum(col("pre") * col("post")).as("s12"))
    def d(c: String) = col(c).cast("double")
    val theta = (d("n") * d("s12") - d("s1") * d("s2")) /
      (d("n") * d("s11") - d("s1") * d("s1"))
    val meanPre = d("s1") / d("n")
    per.crossJoin(broadcast(m))
      .select(col("user_id"),
        (col("pre") * 100).cast("bigint").as("pre_c"),
        (col("post") * 100).cast("bigint").as("post_c"),
        round(d("post") - theta * (d("pre") - meanPre), 2).as("adj"))
      .orderBy("user_id")
  }

  val statCupedSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CAST(value AS DECIMAL(18,2)) AS v FROM events),
      |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM ev),
      |per AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN us < mid_us THEN v
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS pre,
      |    CAST(sum(CASE WHEN us >= mid_us THEN v
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS post
      |  FROM ev CROSS JOIN mid GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n, sum(pre) AS s1, sum(post) AS s2,
      |    sum(pre * pre) AS s11, sum(pre * post) AS s12
      |  FROM per)
      |SELECT user_id,
      |  CAST(pre * 100 AS BIGINT) AS pre_c,
      |  CAST(post * 100 AS BIGINT) AS post_c,
      |  round(CAST(post AS DOUBLE)
      |    - ((CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
      |      * (CAST(pre AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
      |    2) AS adj
      |FROM per CROSS JOIN m
      |ORDER BY user_id""".stripMargin

  /** Welch's two-sample t: purchase vs click `value` populations —
    * the unequal-variance test an experimentation platform runs on
    * every metric, with the Welch-Satterthwaite degrees of freedom.
    * All moments accumulate in exact DECIMAL (the q58/stat_cuped
    * pattern), so the final t and df are IEEE doubles over identical
    * operands in both engines, rounded 4 dp.
    *
    * Scale shape: ONE conditional-aggregation pass produces all six
    * moments; everything after is scalar arithmetic on a single row.
    */
  def statTtest(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        col("value").cast("decimal(18,2)").as("v"))
    val isA = col("event_type") === "purchase"
    val m = ev.agg(
      count(when(isA, 1)).as("na"), count(when(!isA, 1)).as("nb"),
      sum(when(isA, col("v"))).as("sa"), sum(when(!isA, col("v"))).as("sb"),
      sum(when(isA, col("v") * col("v"))).as("saa"),
      sum(when(!isA, col("v") * col("v"))).as("sbb"))
    def d(c: String) = col(c).cast("double")
    // unbiased per-group variance of the mean: s²/n with
    // s² = (n·Σv² − (Σv)²) / (n·(n−1))
    val va = (d("na") * d("saa") - d("sa") * d("sa")) /
      (d("na") * (d("na") - 1)) / d("na")
    val vb = (d("nb") * d("sbb") - d("sb") * d("sb")) /
      (d("nb") * (d("nb") - 1)) / d("nb")
    val t = (d("sa") / d("na") - d("sb") / d("nb")) / sqrt(va + vb)
    val df = (va + vb) * (va + vb) /
      (va * va / (d("na") - 1) + vb * vb / (d("nb") - 1))
    m.select(col("na"), col("nb"),
      round(d("sa") / d("na"), 4).as("mean_a"),
      round(d("sb") / d("nb"), 4).as("mean_b"),
      round(t, 4).as("t_welch"),
      round(df, 2).as("df_welch"))
  }

  val statTtestSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
      |  WHERE event_type IN ('purchase', 'click')),
      |m AS (
      |  SELECT
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS na,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS nb,
      |    sum(CASE WHEN event_type = 'purchase' THEN v END) AS sa,
      |    sum(CASE WHEN event_type = 'click' THEN v END) AS sb,
      |    sum(CASE WHEN event_type = 'purchase' THEN v * v END) AS saa,
      |    sum(CASE WHEN event_type = 'click' THEN v * v END) AS sbb
      |  FROM ev),
      |x AS (
      |  SELECT na, nb,
      |    CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
      |    (CAST(na AS DOUBLE) * CAST(saa AS DOUBLE)
      |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
      |      / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1))
      |      / CAST(na AS DOUBLE) AS va,
      |    (CAST(nb AS DOUBLE) * CAST(sbb AS DOUBLE)
      |      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
      |      / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1))
      |      / CAST(nb AS DOUBLE) AS vb
      |  FROM m)
      |SELECT na::BIGINT AS na, nb::BIGINT AS nb,
      |  round(sad / na, 4) AS mean_a,
      |  round(sbd / nb, 4) AS mean_b,
      |  round((sad / na - sbd / nb) / sqrt(va + vb), 4) AS t_welch,
      |  round((va + vb) * (va + vb) /
      |    (va * va / (na - 1) + vb * vb / (nb - 1)), 2) AS df_welch
      |FROM x""".stripMargin

  /** Pearson chi-square independence scan over the (lang, source)
    * contingency of the document corpus — the categorical drift/bias
    * detector next to [[graft.text.TextOps.textDriftPsi]]'s numeric
    * PSI: is language composition independent of the ingest source,
    * or does some source skew? Emits the full PER-CELL decomposition
    * (observed, marginals, expected, cell chi-square) rather than one
    * opaque statistic, so the offending cells are directly readable.
    *
    * Cross-engine exactness: every aggregate is an integer COUNT; the
    * double math happens per cell AFTER aggregation from explicit
    * BIGINT→DOUBLE casts mirrored verbatim in the oracle, so there is
    * no float-accumulation order anywhere (the statTtest rule).
    *
    * Scale shape: ONE corpus-sized aggregation to the cell table
    * (|langs| × |sources| rows); marginals are re-aggregations of
    * that tiny table and come back via broadcast joins — no windows,
    * no second corpus scan, no single-partition stage.
    */
  def statChi2Independence(spark: SparkSession, sfDir: String): DataFrame = {
    // null categories would vanish from the equi-joined cell table
    // while still counting toward n, biasing every expected count —
    // coalesce them to a sentinel so they survive as a real category
    // (mirrored verbatim in the oracle's observed CTE)
    val observed = Tables.documents(spark, sfDir)
      .select(coalesce(col("lang"), lit("__null__")).as("lang"),
        coalesce(col("source"), lit("__null__")).as("source"))
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rt = observed.groupBy("lang").agg(sum("o").as("r"))
    val ct = observed.groupBy("source").agg(sum("o").as("c"))
    val nt = observed.agg(sum("o").as("n"))
    // densify to the FULL contingency: a (lang, source) cell never
    // observed still contributes its expected count to the statistic
    // — without the zero cells the chi-square is silently understated
    // (caught by the spec's sum(expected)==n invariant)
    val cells = rt.select("lang").crossJoin(broadcast(ct.select("source")))
      .join(observed, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("o"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val exp = d(col("r")) * d(col("c")) / d(col("n"))
    cells
      .join(broadcast(rt), "lang")
      .join(broadcast(ct), "source")
      .crossJoin(broadcast(nt))
      .select(col("lang"), col("source"), col("o"),
        col("r"), col("c"),
        round(exp, 4).as("expected"),
        round((d(col("o")) - exp) * (d(col("o")) - exp) / exp, 4)
          .as("chi2_cell"))
      .orderBy("lang", "source")
  }

  val statChi2IndependenceSql: String =
    """WITH observed AS (
      |  SELECT coalesce(lang, '__null__') AS lang,
      |         coalesce(source, '__null__') AS source,
      |         count(*)::BIGINT AS o
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, sum(o)::BIGINT AS r FROM observed GROUP BY 1),
      |ct AS (SELECT source, sum(o)::BIGINT AS c FROM observed GROUP BY 1),
      |nt AS (SELECT sum(o)::BIGINT AS n FROM observed),
      |cells AS (
      |  SELECT rt.lang, ct.source, coalesce(observed.o, 0)::BIGINT AS o
      |  FROM (SELECT lang FROM rt) rt
      |  CROSS JOIN (SELECT source FROM ct) ct
      |  LEFT JOIN observed
      |    ON observed.lang = rt.lang AND observed.source = ct.source)
      |SELECT cells.lang, cells.source, o, r, c,
      |  round(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE),
      |    4) AS expected,
      |  round((CAST(o AS DOUBLE)
      |      - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      |    * (CAST(o AS DOUBLE)
      |      - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)),
      |    4) AS chi2_cell
      |FROM cells
      |JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN nt
      |ORDER BY lang, source""".stripMargin

  /** Mutual information of the (lang, source) contingency — the
    * information-theoretic companion to [[statChi2Independence]]: how
    * many nats does knowing the ingest source reveal about language
    * composition? Emits one row with the three entropies, MI and the
    * normalized MI (MI / √(H_lang·H_source)), the redundancy score a
    * curation pipeline thresholds before dropping a correlated
    * metadata column.
    *
    * Every entropy uses the ln(n) − Σo·ln(o)/n identity, so ZERO cells
    * never enter (0·ln 0 = 0 by continuity) and no densified
    * contingency is needed — the chi-square's zero-cell hazard simply
    * does not exist for entropy. All counts are exact BIGINTs; the
    * only doubles are per-cell o·ln(o) terms computed from identical
    * integers in both engines and summed over a contingency-sized
    * (not corpus-sized) table, then round(6) — the statTtest rule.
    *
    * Scale shape: ONE corpus scan to the |langs|×|sources| cell table;
    * the joint and both marginal entropies are re-aggregations of that
    * tiny table (the chi2 shape), joined back as single-row broadcasts.
    */
  def statMutualInfo(spark: SparkSession, sfDir: String): DataFrame = {
    val observed = Tables.documents(spark, sfDir)
      .select(coalesce(col("lang"), lit("__null__")).as("lang"),
        coalesce(col("source"), lit("__null__")).as("source"))
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def plogp(c: String) = sum(d(col(c)) * log(d(col(c))))
    val j = observed.agg(sum("o").as("n"), plogp("o").as("sj"))
    val l = observed.groupBy("lang").agg(sum("o").as("r"))
      .agg(plogp("r").as("sl"))
    val s = observed.groupBy("source").agg(sum("o").as("c"))
      .agg(plogp("c").as("sc"))
    val nd = d(col("n"))
    val (hj, hl, hs) = (log(nd) - col("sj") / nd,
      log(nd) - col("sl") / nd, log(nd) - col("sc") / nd)
    j.crossJoin(broadcast(l)).crossJoin(broadcast(s))
      .select(col("n"),
        round(hl, 6).as("h_lang"),
        round(hs, 6).as("h_source"),
        round(hj, 6).as("h_joint"),
        round(hl + hs - hj, 6).as("mi"),
        round(when(hl * hs > 0, (hl + hs - hj) / sqrt(hl * hs))
          .otherwise(lit(0.0)), 6).as("nmi"))
  }

  val statMutualInfoSql: String =
    """WITH observed AS (
      |  SELECT coalesce(lang, '__null__') AS lang,
      |         coalesce(source, '__null__') AS source,
      |         count(*)::BIGINT AS o
      |  FROM documents GROUP BY 1, 2),
      |j AS (
      |  SELECT sum(o)::BIGINT AS n,
      |    sum(CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE))) AS sj
      |  FROM observed),
      |l AS (
      |  SELECT sum(CAST(r AS DOUBLE) * ln(CAST(r AS DOUBLE))) AS sl
      |  FROM (SELECT sum(o)::BIGINT AS r FROM observed GROUP BY lang)),
      |s AS (
      |  SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sc
      |  FROM (SELECT sum(o)::BIGINT AS c FROM observed GROUP BY source)),
      |x AS (
      |  SELECT n,
      |    ln(CAST(n AS DOUBLE)) - sj / CAST(n AS DOUBLE) AS hj,
      |    ln(CAST(n AS DOUBLE)) - sl / CAST(n AS DOUBLE) AS hl,
      |    ln(CAST(n AS DOUBLE)) - sc / CAST(n AS DOUBLE) AS hs
      |  FROM j CROSS JOIN l CROSS JOIN s)
      |SELECT n, round(hl, 6) AS h_lang, round(hs, 6) AS h_source,
      |  round(hj, 6) AS h_joint, round(hl + hs - hj, 6) AS mi,
      |  round(CASE WHEN hl * hs > 0
      |    THEN (hl + hs - hj) / sqrt(hl * hs) ELSE 0 END, 6) AS nmi
      |FROM x""".stripMargin

  /** The shared rank backbone for [[statKsTest]] and
    * [[statMannWhitney]]: purchase-vs-click `value` populations
    * reduced to ONE corpus-sized aggregation over the 2-dp cents grid
    * — per distinct cents value, how many purchases (`ca`) and clicks
    * (`cb`). Everything downstream (ECDFs, ranks, tie terms) is
    * arithmetic over this cell table, whose cardinality is bounded by
    * the PRICE DOMAIN (≤ max_cents+1 rows — ~56 K for this corpus's
    * 0..560.21 range), not by the corpus size, the same bounded-domain
    * argument as `ev_ewma_hourly`'s 3600-hour clock.
    *
    * Cents quantization uses `floor(value·100 + 0.5)`: a double can
    * never be EXACTLY k+0.5 after ·100 (that would need (2k+1)/200 to
    * be binary-representable; 200 has a factor 5³), so the floor is
    * rounding-mode-proof and both engines agree bit-for-bit — the same
    * idiom the IVF centroid oracles use for e4 quantization.
    */
  private def rankCells(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy("cents")
      .agg(
        count(when(col("event_type") === "purchase", 1)).as("ca"),
        count(when(col("event_type") === "click", 1)).as("cb"))

  /** Expected Benford mass of leading digit d in e6 fixed point —
    * computed ONCE in Scala and inlined as an identical literal into
    * both engines, so no engine evaluates log10 at query time.
    */
  private def benfordE6(d: Int): Long =
    math.round(math.log10(1.0 + 1.0 / d) * 1e6)

  /** Benford first-digit audit of the event `value` column — the
    * classic fabricated-/degenerate-data screen: naturally occurring
    * multiplicative amounts follow P(d) = log10(1+1/d); synthetic or
    * truncated feeds don't, and the per-digit chi-square cells point
    * at which digit mass is off. The leading digit comes from the
    * CENTS integer's decimal string (leading significant digit is
    * invariant under ×100, and BIGINT→string never goes scientific in
    * either engine), so no float log touches the bucketing; expected
    * masses are Scala-side literals mirrored verbatim.
    *
    * Scale shape: one corpus scan to a 9-row census; the digit spine
    * is densified (a digit that never occurs still shows its expected
    * mass — the chi2 zero-cell lesson); everything after the census
    * is arithmetic over 9 rows.
    */
  def statBenford(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .filter(col("value") > 0)
      .select(expr("cast(substring(cast(cast(floor(value * 100 + 0.5)" +
        " as bigint) as string), 1, 1) as int)").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = spark.range(1, 10).select(col("id").cast("int").as("digit"))
    val expCase = (1 to 9).map(d =>
      s"when digit = $d then ${benfordE6(d)}L").mkString(
      "case ", " ", " else 0L end")
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    spine.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(counts.agg(sum("n").as("tot"))))
      .withColumn("exp_e6", expr(expCase))
      .select(col("digit"), col("n"),
        expr("(n * 1000000L + tot div 2) div tot").as("obs_e6"),
        col("exp_e6"),
        round((dbl(col("n")) - dbl(col("tot")) * dbl(col("exp_e6"))
          / lit(1e6))
          * (dbl(col("n")) - dbl(col("tot")) * dbl(col("exp_e6"))
            / lit(1e6))
          / (dbl(col("tot")) * dbl(col("exp_e6")) / lit(1e6)), 4)
          .as("chi2_cell"))
      .orderBy("digit")
  }

  val statBenfordSql: String = {
    def expCase(ref: String) = (1 to 9).map(d =>
      s"WHEN $ref = $d THEN ${benfordE6(d)}").mkString(
      "CASE ", " ", " ELSE 0 END")
    val dev = s"(CAST(coalesce(c.n, 0) AS DOUBLE)" +
      s" - CAST(tot AS DOUBLE) * (${expCase("s.digit")}) / 1e6)"
    s"""WITH counts AS (
       |  SELECT digit, count(*)::BIGINT AS n FROM (
       |    SELECT substring(floor(value * 100 + 0.5)::BIGINT::VARCHAR,
       |      1, 1)::INT AS digit
       |    FROM events WHERE value > 0)
       |  WHERE digit >= 1
       |  GROUP BY 1),
       |tot AS (SELECT sum(n)::BIGINT AS tot FROM counts),
       |spine AS (SELECT unnest(generate_series(1, 9))::INT AS digit)
       |SELECT s.digit, coalesce(c.n, 0)::BIGINT AS n,
       |  (coalesce(c.n, 0) * 1000000 + tot // 2) // tot AS obs_e6,
       |  (${expCase("s.digit")})::BIGINT AS exp_e6,
       |  round($dev * $dev
       |    / (CAST(tot AS DOUBLE) * (${expCase("s.digit")}) / 1e6), 4)
       |    AS chi2_cell
       |FROM spine s
       |LEFT JOIN counts c ON c.digit = s.digit
       |CROSS JOIN tot
       |ORDER BY s.digit""".stripMargin
  }

  /** Exact Gini concentration coefficient of the purchase and click
    * `value` distributions — the inequality audit that tells a
    * pipeline whether its value (or token-count, or sample-weight)
    * mass is spread out or piled on a few rows, the precursor to
    * salting / repartition decisions. Uses the tied-rank identity
    * G = Σᵢ xᵢ(2fᵢ·prevᵢ + fᵢ² + fᵢ) / (n·Σfx) − (n+1)/n over the
    * [[rankCells]] cents grid, which is EXACT under ties (equal x
    * makes any within-tie rank assignment contribute identically).
    *
    * Cross-engine exactness: every accumulator is an exact integer —
    * DECIMAL(38,0) in Spark, HUGEINT in DuckDB (both exact to ~10³⁸,
    * enough for x·n² at 10¹² rows) — and the two final doubles divide
    * identical operands, then round(6/4) — the statTtest rule.
    *
    * Scale shape: same as [[statKsTest]] — one corpus aggregation to
    * the domain-bounded cell table, one ordered prefix window over
    * ≤56 K cells (bounded-domain SinglePartition exemption), one
    * constant-width global agg, two literal output rows.
    */
  def statGini(spark: SparkSession, sfDir: String): DataFrame = {
    val wPrev = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def big(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val cum = rankCells(spark, sfDir)
      .select(col("cents"), col("ca"), col("cb"),
        coalesce(sum("ca").over(wPrev), lit(0L)).as("pa"),
        coalesce(sum("cb").over(wPrev), lit(0L)).as("pb"))
    def rankMass(f: String, prev: String) =
      big(col("cents")) * (dec(col(f)) * dec(col(prev)) * lit(2) +
        dec(col(f)) * dec(col(f)) + dec(col(f)).cast("decimal(38,0)"))
    val agg = cum.agg(
      sum("ca").as("n_a"),
      sum(big(col("cents")) * dec(col("ca"))).as("s_a"),
      sum(rankMass("ca", "pa")).as("r_a"),
      sum("cb").as("n_b"),
      sum(big(col("cents")) * dec(col("cb"))).as("s_b"),
      sum(rankMass("cb", "pb")).as("r_b"))
    def out(tag: String, n: String, s: String, r: String) =
      struct(lit(tag).as("event_type"), col(n).as("n"),
        round(d(col(s)) / d(col(n)) / lit(100.0), 4).as("mean_value"),
        round(d(col(r)) / (d(col(n)) * d(col(s)))
          - (d(col(n)) + lit(1.0)) / d(col(n)), 6).as("gini"))
    agg.select(explode(array(
      out("click", "n_b", "s_b", "r_b"),
      out("purchase", "n_a", "s_a", "r_a"))).as("kv"))
      .select(col("kv.event_type"), col("kv.n"), col("kv.mean_value"),
        col("kv.gini"))
      .orderBy("event_type")
  }

  val statGiniSql: String =
    """WITH ev AS (
      |  SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS cents
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |cells AS (
      |  SELECT cents,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS ca,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS cb
      |  FROM ev GROUP BY cents),
      |cum AS (
      |  SELECT cents, ca, cb,
      |    coalesce(sum(ca) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pa,
      |    coalesce(sum(cb) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pb
      |  FROM cells),
      |agg AS (
      |  SELECT
      |    sum(ca)::BIGINT AS n_a,
      |    sum(cents::HUGEINT * ca) AS s_a,
      |    sum(cents::HUGEINT
      |      * (2 * ca::HUGEINT * pa + ca::HUGEINT * ca + ca)) AS r_a,
      |    sum(cb)::BIGINT AS n_b,
      |    sum(cents::HUGEINT * cb) AS s_b,
      |    sum(cents::HUGEINT
      |      * (2 * cb::HUGEINT * pb + cb::HUGEINT * cb + cb)) AS r_b
      |  FROM cum)
      |SELECT 'click' AS event_type, n_b AS n,
      |  round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100, 4)
      |    AS mean_value,
      |  round(CAST(r_b AS DOUBLE)
      |      / (CAST(n_b AS DOUBLE) * CAST(s_b AS DOUBLE))
      |    - (CAST(n_b AS DOUBLE) + 1) / CAST(n_b AS DOUBLE), 6) AS gini
      |FROM agg
      |UNION ALL
      |SELECT 'purchase' AS event_type, n_a AS n,
      |  round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100, 4)
      |    AS mean_value,
      |  round(CAST(r_a AS DOUBLE)
      |      / (CAST(n_a AS DOUBLE) * CAST(s_a AS DOUBLE))
      |    - (CAST(n_a AS DOUBLE) + 1) / CAST(n_a AS DOUBLE), 6) AS gini
      |FROM agg
      |ORDER BY event_type""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov scan: the purchase and click
    * `value` ECDFs compared at EVERY observed threshold; the 10
    * largest gaps emitted (row 1's `ks_gap` IS the KS D statistic,
    * the rest localize where the distributions diverge — a drift
    * report, not just a number). The distribution-shape companion to
    * [[statTtest]]'s mean test: KS sees a variance or tail shift the
    * t-test is blind to.
    *
    * Cross-engine exactness: cumulative counts are integer window
    * sums; the gap ORDERING uses the exact integer cross-product
    * |cum_a·nb − cum_b·na| in DECIMAL(38,0) (products of (19,0)
    * operands — exact to n ≈ 10¹⁹, no float enters the top-10
    * selection), and the displayed `ks_gap` double divides identical
    * integer operands in both engines.
    *
    * Scale shape: one corpus aggregation to the domain-bounded cell
    * table ([[rankCells]]); the ordered window and the top-10 rank run
    * over those ≤56 K rows (SinglePartition is safe BECAUSE the table
    * is domain-bounded — PlanAuditSpec carries the exemption note);
    * na/nb come from unbounded-frame window totals over the same
    * table, so the corpus is scanned exactly once.
    */
  def statKsTest(spark: SparkSession, sfDir: String): DataFrame = {
    val wCum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    rankCells(spark, sfDir)
      .select(col("cents"),
        sum("ca").over(wCum).as("cum_a"),
        sum("cb").over(wCum).as("cum_b"),
        sum("ca").over(wAll).as("na"),
        sum("cb").over(wAll).as("nb"))
      .withColumn("gap_num", abs(dec(col("cum_a")) * dec(col("nb")) -
        dec(col("cum_b")) * dec(col("na"))))
      .orderBy(desc("gap_num"), asc("cents"))
      .limit(10)
      .select(
        (col("cents") / lit(100.0)).as("threshold"),
        col("cum_a"), col("cum_b"),
        round(d(col("gap_num")) / (d(col("na")) * d(col("nb"))), 6)
          .as("ks_gap"))
  }

  val statKsTestSql: String =
    """WITH ev AS (
      |  SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS cents
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |cells AS (
      |  SELECT cents,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS ca,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS cb
      |  FROM ev GROUP BY cents),
      |cum AS (
      |  SELECT cents,
      |    sum(ca) OVER (ORDER BY cents) AS cum_a,
      |    sum(cb) OVER (ORDER BY cents) AS cum_b,
      |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
      |  FROM cells),
      |gaps AS (
      |  SELECT cents, cum_a::BIGINT AS cum_a, cum_b::BIGINT AS cum_b,
      |    na, nb,
      |    abs(CAST(cum_a AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0))
      |      - CAST(cum_b AS DECIMAL(19,0)) * CAST(na AS DECIMAL(19,0)))
      |      AS gap_num
      |  FROM cum)
      |SELECT CAST(cents AS DOUBLE) / 100 AS threshold, cum_a, cum_b,
      |  round(CAST(gap_num AS DOUBLE)
      |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks_gap
      |FROM gaps
      |ORDER BY gap_num DESC, cents
      |LIMIT 10""".stripMargin

  /** Exact tie-corrected Mann–Whitney U: the nonparametric
    * location test over the same purchase-vs-click populations —
    * robust to the heavy right tail where [[statTtest]]'s normality
    * assumption is weakest, and `auc` (= U/(na·nb)) is the
    * probability a random purchase outranks a random click, the
    * effect size a metrics platform actually reports.
    *
    * Rank math in DOUBLED integer units so ties never produce a
    * fraction: with `prev` pooled observations strictly below a cell
    * of `t` tied values, each tied element's average rank is
    * prev + (t+1)/2, so 2·Ra = Σ ca·(2·prev + t + 1) — an exact
    * DECIMAL(38,0) sum of (19,0)-operand products. The tie-correction
    * term Σ(t³−t) cubes through DECIMAL(12,0) operands ((12,0)³ =
    * (36..38,0) in both engines' widening rules — exact while every
    * per-cell tie count stays below 10¹², i.e. corpora to ~5·10¹³
    * rows at this cell occupancy). z then divides identical exact
    * operands as doubles: z = (2U − na·nb)/√(na·nb·((n+1) −
    * T/(n(n−1)))/3), the doubled-units form of the classic
    * tie-corrected normal approximation.
    *
    * Scale shape: identical to [[statKsTest]] — one corpus
    * aggregation, one window pass over the domain-bounded cell table,
    * then a scalar aggregation; single corpus scan, no collect.
    */
  def statMannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val wCum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    def d12(c: org.apache.spark.sql.Column) = c.cast("decimal(12,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val cum = rankCells(spark, sfDir)
      .withColumn("t", col("ca") + col("cb"))
      .withColumn("prev",
        sum(col("t")).over(wCum) - col("t"))
    val agg = cum.agg(
      sum("ca").as("na"), sum("cb").as("nb"),
      sum(dec(col("ca")) *
        dec(lit(2L) * col("prev") + col("t") + lit(1L))).as("r2a"),
      sum(d12(col("t")) * d12(col("t")) * d12(col("t")) - d12(col("t")))
        .as("tie3"))
    val n = d(col("na")) + d(col("nb"))
    val u2 = d(col("r2a")) - d(col("na")) * (d(col("na")) + lit(1.0))
    val mu2 = d(col("na")) * d(col("nb"))
    val var2 = d(col("na")) * d(col("nb")) / lit(3.0) *
      ((n + lit(1.0)) - d(col("tie3")) / (n * (n - lit(1.0))))
    agg.select(col("na"), col("nb"),
      (u2 / lit(2.0)).as("u_a"),
      round(u2 / lit(2.0) / (d(col("na")) * d(col("nb"))), 6).as("auc"),
      round((u2 - mu2) / sqrt(var2), 4).as("z_mw"))
  }

  val statMannWhitneySql: String =
    """WITH ev AS (
      |  SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS cents
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |cells AS (
      |  SELECT cents,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS ca,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS cb
      |  FROM ev GROUP BY cents),
      |cum AS (
      |  SELECT cents, ca, cb, ca + cb AS t,
      |    sum(ca + cb) OVER (ORDER BY cents) - (ca + cb) AS prev
      |  FROM cells),
      |agg AS (
      |  SELECT
      |    sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
      |    sum(CAST(ca AS DECIMAL(19,0))
      |      * CAST(2 * prev + t + 1 AS DECIMAL(19,0))) AS r2a,
      |    sum(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
      |      * CAST(t AS DECIMAL(12,0)) - CAST(t AS DECIMAL(12,0))) AS tie3
      |  FROM cum),
      |x AS (
      |  SELECT na, nb,
      |    CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) AS n,
      |    CAST(r2a AS DOUBLE)
      |      - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1) AS u2,
      |    CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) AS mu2,
      |    CAST(tie3 AS DOUBLE) AS tie3d
      |  FROM agg)
      |SELECT na, nb, u2 / 2 AS u_a,
      |  round(u2 / 2 / mu2, 6) AS auc,
      |  round((u2 - mu2)
      |    / sqrt(mu2 / 3 * ((n + 1) - tie3d / (n * (n - 1)))), 4) AS z_mw
      |FROM x""".stripMargin

  /** The four lineitem measures whose pairwise second moments
    * [[statCovMatrix]] reports, alphabetical so the emitted pair order
    * and the oracle's UNION order can never diverge.
    */
  private val CovCols = Seq("l_discount", "l_extendedprice",
    "l_quantity", "l_tax")

  /** One-pass exact covariance / correlation matrix over the four
    * lineitem measures — the feature-redundancy screen a training
    * pipeline runs before fitting anything. Emits the 10 upper-
    * triangle pairs (diagonal included) as
    * `(var_x, var_y, n, cov, corr)`.
    *
    * Exactness across engines: every measure is quantized to the e4
    * grid with `floor(x·10⁴ + 0.5)` (a double can never be exactly
    * k+0.5 after ·10⁴ — (2k+1)/2·10⁴ has a 5⁴ factor, not binary-
    * representable — so the floor is rounding-mode-proof, the same
    * idiom as [[rankCells]]); all sums and cross-products accumulate
    * in DECIMAL(38,0) ((19,0)² operands — exact to ~10³⁸, i.e.
    * corpora far past 100 TB), so the single agg row is bit-identical
    * in both engines and the final double arithmetic divides
    * identical operands. `cov` converts back to value units (/10⁸).
    *
    * Scale shape: ONE full scan feeding a single partial-aggregable
    * global agg (14 decimal sums — a constant-width accumulator, the
    * same map-side-combine shape as `q17_global_stats`); the 10
    * output rows are a driver-free `explode` of literals over that
    * one agg row. Adding columns grows the accumulator O(k²) but
    * never adds a scan or a shuffle.
    */
  def statCovMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    def q(c: String) =
      floor(col(c) * lit(10000.0) + lit(0.5)).cast("decimal(19,0)")
    val sums =
      CovCols.map(c => sum(q(c)).cast("decimal(38,0)").as(s"s_$c")) ++
        (for {
          i <- CovCols.indices; j <- i until CovCols.size
        } yield sum(q(CovCols(i)) * q(CovCols(j)))
          .as(s"p_${CovCols(i)}_${CovCols(j)}"))
    // r19: the 14 DECIMAL(38,0) sums are the hottest per-row aggregate
    // in the catalog (BigDecimal products), and the single-row-group
    // scan pinned the partial agg to one core — spread the projected
    // measures by a key first (agg fragment at sf0.1: 0.90 s → 0.43 s;
    // no-op on any multi-file table, see graft.core.Spread)
    val agg = Tables.lineitem(spark, sfDir)
      .select((col("l_orderkey") +: CovCols.map(col)): _*)
      .transform(graft.core.Spread.byKey(_, col("l_orderkey")))
      .agg(count(lit(1)).as("n"), sums: _*)
    def d(n: String) = col(n).cast("double")
    val nd = d("n")
    def sxy(i: Int, j: Int) = d(s"p_${CovCols(i)}_${CovCols(j)}")
    def mom(i: Int, j: Int) =
      nd * sxy(i, j) - d(s"s_${CovCols(i)}") * d(s"s_${CovCols(j)}")
    val pairs = for {
      i <- CovCols.indices; j <- i until CovCols.size
    } yield struct(
      lit(CovCols(i)).as("var_x"), lit(CovCols(j)).as("var_y"),
      col("n").as("n"),
      round(mom(i, j) / (nd * (nd - lit(1.0))) / lit(1e8), 6).as("cov"),
      round(mom(i, j) / sqrt(mom(i, i) * mom(j, j)), 6).as("corr"))
    agg.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.var_x"), col("kv.var_y"), col("kv.n"),
        col("kv.cov"), col("kv.corr"))
      .orderBy("var_x", "var_y")
  }

  /** Mirrors [[statCovMatrix]]'s quantize → DECIMAL sums → double
    * arithmetic stage for stage; one UNION arm per pair.
    */
  def statCovMatrixSql: String = {
    def qc(c: String) =
      s"CAST(floor($c * 10000 + 0.5) AS DECIMAL(19,0))"
    val sums =
      CovCols.map(c => s"CAST(sum(${qc(c)}) AS DECIMAL(38,0)) AS s_$c") ++
        (for {
          i <- CovCols.indices; j <- i until CovCols.size
        } yield s"sum(${qc(CovCols(i))} * ${qc(CovCols(j))})" +
          s" AS p_${CovCols(i)}_${CovCols(j)}")
    def mom(i: Int, j: Int) =
      s"(CAST(n AS DOUBLE) * CAST(p_${CovCols(i)}_${CovCols(j)} AS DOUBLE)" +
        s" - CAST(s_${CovCols(i)} AS DOUBLE)" +
        s" * CAST(s_${CovCols(j)} AS DOUBLE))"
    val arms = for {
      i <- CovCols.indices; j <- i until CovCols.size
    } yield s"""SELECT '${CovCols(i)}' AS var_x, '${CovCols(j)}' AS var_y,
      |  n,
      |  round(${mom(i, j)}
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) / 1e8, 6) AS cov,
      |  round(${mom(i, j)}
      |    / sqrt(${mom(i, i)} * ${mom(j, j)}), 6) AS corr
      |FROM agg""".stripMargin
    s"""WITH agg AS (
       |  SELECT count(*)::BIGINT AS n, ${sums.mkString(",\n    ")}
       |  FROM lineitem)
       |${arms.mkString("\nUNION ALL\n")}
       |ORDER BY var_x, var_y""".stripMargin
  }

  /** Exact one-vs-rest ROC-AUC per embedding class — the classifier
    * eval primitive a training pipeline runs after every model push:
    * treating the first embedding coordinate as a score, for each
    * label ℓ report P(score(pos) > score(neg)) with ties at half
    * credit, i.e. the tie-corrected U statistic normalized by
    * n_pos·n_neg (the same doubled-integer rank algebra as
    * [[statMannWhitney]], generalized to a per-group one-vs-rest
    * sweep).
    *
    * Scale shape: ONE corpus aggregation to a (score-bucket × label)
    * census whose cardinality is bounded by the SCORE DOMAIN (e4
    * quantization of a [−1, 1]-ish coordinate → ≤ ~20 K buckets) times
    * the label domain — never corpus rows. The grid is densified
    * per-label (every label must see every bucket's totals for the
    * exclusive prefix sums), the cumulative windows partition BY LABEL
    * over that bounded grid, and U2 accumulates in DECIMAL(38,0) —
    * exact to n ≈ 10¹⁹ corpus rows. Quantization uses the
    * floor(x·10⁴ + 0.5) idiom ([[rankCells]]' proof of
    * rounding-mode-proofness applies verbatim); float→double widening
    * of the stored FLOAT coordinate is exact in both engines.
    */
  def statAuc(spark: SparkSession, sfDir: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val cells = Tables.embeddings(spark, sfDir)
      .select(expr("cast(floor(element_at(embedding, 1) * 10000d + 0.5d)" +
        " as bigint)").as("q"), col("label"))
      .groupBy("q", "label").agg(count(lit(1)).as("n"))
    val btot = cells.groupBy("q").agg(sum("n").as("tot"))
    val labels = cells.select("label").distinct()
    val grid = btot.crossJoin(broadcast(labels))
      .join(cells, Seq("q", "label"), "left")
      .na.fill(0L, Seq("n"))
    val wExcl = Window.partitionBy("label").orderBy("q")
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = grid
      .withColumn("cum_pos", coalesce(sum("n").over(wExcl), lit(0L)))
      .withColumn("cum_tot", coalesce(sum("tot").over(wExcl), lit(0L)))
    scored.groupBy("label").agg(
      sum("n").as("n_pos"),
      sum("tot").as("n_all"),
      // each positive in bucket q beats the negatives strictly below
      // (×2) and half-ties the negatives sharing its bucket (×1)
      sum(dec(col("n")) *
        dec(lit(2L) * (col("cum_tot") - col("cum_pos")) +
          (col("tot") - col("n")))).as("u2"))
      .withColumn("n_neg", col("n_all") - col("n_pos"))
      .withColumn("auc_e6", expr(
        "cast((u2 * 500000 + cast(n_pos as decimal(38,0)) * n_neg div 2)" +
          " div (cast(n_pos as decimal(38,0)) * n_neg) as bigint)"))
      .select("label", "n_pos", "n_neg", "auc_e6")
      .orderBy("label")
  }

  val statAucSql: String =
    """WITH cells AS (
      |  SELECT floor(embedding[1]::DOUBLE * 10000 + 0.5)::BIGINT AS q,
      |    label, count(*)::BIGINT AS n
      |  FROM embeddings GROUP BY 1, 2),
      |btot AS (SELECT q, sum(n)::BIGINT AS tot FROM cells GROUP BY 1),
      |grid AS (
      |  SELECT b.q, l.label, b.tot, coalesce(c.n, 0)::BIGINT AS n
      |  FROM btot b
      |  CROSS JOIN (SELECT DISTINCT label FROM cells) l
      |  LEFT JOIN cells c ON c.q = b.q AND c.label = l.label),
      |cum AS (
      |  SELECT label, n, tot,
      |    coalesce(sum(n) OVER (PARTITION BY label ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_pos,
      |    coalesce(sum(tot) OVER (PARTITION BY label ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_tot
      |  FROM grid),
      |agg AS (
      |  SELECT label, sum(n)::BIGINT AS n_pos,
      |    (sum(tot) - sum(n))::BIGINT AS n_neg,
      |    -- DECIMAL(19,0) products for exactness, then BIGINT for the
      |    -- final // (DuckDB's // on DECIMAL degrades to double; on
      |    -- BIGINT both engines truncate toward zero identically)
      |    sum(n::DECIMAL(19,0) *
      |      (2 * (cum_tot - cum_pos) + (tot - n)))::BIGINT AS u2
      |  FROM cum GROUP BY label)
      |SELECT label, n_pos, n_neg,
      |  (u2 * 500000 + n_pos * n_neg // 2) // (n_pos * n_neg) AS auc_e6
      |FROM agg ORDER BY label""".stripMargin

  /** Per-event-type OLS trend of daily revenue — the "is this segment
    * growing" monitoring regression: y = total cents per observed day,
    * x = day index relative to the corpus's first day, slope and fit
    * reported per type. The census shape again: one corpus scan to a
    * (type × day) table bounded by the TIME domain, then closed-form
    * least squares over those few hundred rows — no iterative solver,
    * no collect.
    *
    * Exactness: Σx, Σy, Σxy, Σx² accumulate in DECIMAL(38,0) (x is
    * day-scale, y is exact cents — products stay far inside 38
    * digits); slope_e6 = (nΣxy − ΣxΣy)·10⁶ div (nΣx² − (Σx)²) is
    * exact integer division with half-up on the positive axis handled
    * by both engines' identical `div`/`//`; r² alone divides the same
    * exact integer operands as doubles (the [[statKsTest]] display
    * rule).
    */
  def statOlsTrend(spark: SparkSession, sfDir: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val dayUs = 86400L * 1000000L
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div $dayUs").as("day"),
        expr("cast(floor(value * 100 + 0.5) as long)").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("y"))
      .crossJoin(broadcast(Tables.events(spark, sfDir)
        .agg(expr(s"min(unix_micros(ts)) div $dayUs").as("day0"))))
      .select(col("event_type"), (col("day") - col("day0")).as("x"),
        col("y"))
    daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum("y").as("sum_cents"),
      sum(dec(col("x"))).as("sx"),
      sum(dec(col("y"))).as("sy"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .withColumn("cov_n", expr("n_days * sxy - sx * sy"))
      .withColumn("var_x", expr("n_days * sxx - sx * sx"))
      .withColumn("var_y", expr("n_days * syy - sy * sy"))
      .select(col("event_type"), col("n_days"), col("sum_cents"),
        // a type observed on a single day (or with constant day index)
        // has var_x = 0: no trend is defined, so emit null explicitly
        // in BOTH engines instead of Spark-null vs DuckDB
        // division-by-zero (r14 advice)
        expr("case when n_days < 2 or var_x = 0 then cast(null as bigint) " +
          "else cast((cov_n * 1000000) div var_x as bigint) end")
          .as("slope_cents_per_day_e6"),
        when(col("n_days") < 2 || col("var_x") === 0 ||
            col("var_y") === 0, lit(null).cast("double"))
          .otherwise(round(d(col("cov_n")) * d(col("cov_n")) /
            (d(col("var_x")) * d(col("var_y"))), 6)).as("r2"))
      .orderBy("event_type")
  }

  val statOlsTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS y
      |  FROM events GROUP BY 1, 2),
      |rel AS (
      |  SELECT event_type,
      |    day - (SELECT min(epoch_us(ts)) // 86400000000 FROM events)
      |      AS x,
      |    y
      |  FROM daily),
      |agg AS (
      |  SELECT event_type, count(*)::BIGINT AS n_days,
      |    sum(y)::BIGINT AS sum_cents,
      |    sum(x::DECIMAL(38,0)) AS sx, sum(y::DECIMAL(38,0)) AS sy,
      |    sum(x::DECIMAL(38,0) * y) AS sxy,
      |    sum(x::DECIMAL(38,0) * x) AS sxx,
      |    sum(y::DECIMAL(38,0) * y) AS syy
      |  FROM rel GROUP BY 1),
      |terms AS (
      |  -- BIGINT for the final // (exact at oracle scale; the Spark
      |  -- side keeps DECIMAL div for the 100 TB headroom)
      |  SELECT event_type, n_days, sum_cents,
      |    (n_days * sxy - sx * sy)::BIGINT AS cov_n,
      |    (n_days * sxx - sx * sx)::BIGINT AS var_x,
      |    (n_days * syy - sy * sy) AS var_y
      |  FROM agg)
      |SELECT event_type, n_days, sum_cents,
      |  CASE WHEN n_days < 2 OR var_x = 0 THEN NULL
      |    ELSE (cov_n * 1000000) // var_x
      |  END AS slope_cents_per_day_e6,
      |  CASE WHEN n_days < 2 OR var_x = 0 OR var_y = 0 THEN NULL
      |    ELSE round(cov_n::DOUBLE * cov_n::DOUBLE
      |      / (var_x::DOUBLE * var_y::DOUBLE), 6)
      |  END AS r2
      |FROM terms ORDER BY event_type""".stripMargin

  /** Reliability diagram + expected calibration error — the companion
    * eval to [[statAuc]] a training pipeline publishes after every
    * model push (Guo et al. 2017, "On Calibration of Modern Neural
    * Networks"): treating the min-max-normalized first embedding
    * coordinate as the model's confidence p̂ and label 0 one-vs-rest
    * as the outcome, bucket rows into 10 equal-width confidence bins
    * and report per bin the count, positives, mean confidence,
    * observed positive rate, and |confidence − accuracy| gap; ECE =
    * Σ n_b·gap_b / n rides along as a constant column so the scalar
    * and the curve ship in one table.
    *
    * Exact integers end to end: the score is e4-quantized exactly as
    * [[statAuc]] (floor(x·10⁴+0.5) — identical IEEE doubles both
    * engines), normalization and every mean use truncating division
    * on NON-NEGATIVE operands (floor ≡ trunc, so Spark `div` and
    * DuckDB `//` agree), positive-rate uses half-up. Bin id =
    * min(p̂_e6·10 div 10⁶, 9) so p̂ = 1 lands in the top bin.
    *
    * Scale shape: one scan for the (min, max) bounds (1-row
    * broadcast), one scan to the 10-row bin census with map-side
    * combine; the ECE window runs over ≤10 rows. No shuffle keyed on
    * anything that grows with the corpus.
    */
  // ONE bin-count constant feeding BOTH the Spark plan and the SQL
  // oracle below (r16 advice: the former nBins parameter let a caller
  // silently diverge from the published oracle, which hardcoded 10)
  private val CalibrationBins = 10

  def statCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val nBins = CalibrationBins
    val e = Tables.embeddings(spark, sfDir)
      .select(expr("cast(floor(element_at(embedding, 1) * 10000d + 0.5d)" +
        " as bigint)").as("q"),
        (col("label") === 0).cast("long").as("y"))
    val bounds = e.agg(min("q").as("qmin"), max("q").as("qmax"))
    val curve = e.crossJoin(broadcast(bounds))
      .withColumn("p_e6",
        expr("(q - qmin) * 1000000L div greatest(qmax - qmin, 1L)"))
      .withColumn("bin", expr(
        s"cast(least(p_e6 * $nBins div 1000000, ${nBins - 1}) as int)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("p_e6").as("sum_p"))
      .withColumn("conf_e6", expr("sum_p div n"))
      .withColumn("acc_e6", expr("(n_pos * 1000000L + n div 2) div n"))
      .withColumn("gap_e6", abs(col("conf_e6") - col("acc_e6")))
      .localCheckpoint() // read twice: ECE scalar + the curve rows
    // ECE as a 1-row broadcast, not a global window — the ≤nBins-row
    // input makes a window harmless HERE, but an unpartitioned window
    // is the exact anti-pattern PlanAuditSpec screens every catalog
    // query for, and the audit can't know the input is bounded
    val ece = curve.agg(
      expr("sum(gap_e6 * n) div sum(n)").as("ece_e6"))
    curve.crossJoin(broadcast(ece))
      .select("bin", "n", "n_pos", "conf_e6", "acc_e6", "gap_e6",
        "ece_e6")
      .orderBy("bin")
  }

  val statCalibrationSql: String =
    s"""WITH e AS (
      |  SELECT floor(embedding[1]::DOUBLE * 10000 + 0.5)::BIGINT AS q,
      |    (label = 0)::BIGINT AS y
      |  FROM embeddings),
      |b AS (SELECT min(q) AS qmin, max(q) AS qmax FROM e),
      |p AS (
      |  SELECT ((q - qmin) * 1000000) // greatest(qmax - qmin, 1)
      |    AS p_e6, y
      |  FROM e, b),
      |census AS (
      |  SELECT least((p_e6 * $CalibrationBins) // 1000000,
      |      ${CalibrationBins - 1})::INT AS bin,
      |    count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
      |    sum(p_e6)::BIGINT AS sum_p
      |  FROM p GROUP BY 1),
      |curve AS (
      |  SELECT bin, n, n_pos,
      |    (sum_p // n)::BIGINT AS conf_e6,
      |    ((n_pos * 1000000 + n // 2) // n)::BIGINT AS acc_e6,
      |    abs((sum_p // n) - ((n_pos * 1000000 + n // 2) // n))::BIGINT
      |      AS gap_e6
      |  FROM census),
      |tot AS (
      |  SELECT (sum(gap_e6 * n) // sum(n))::BIGINT AS ece_e6 FROM curve)
      |SELECT bin, n, n_pos, conf_e6, acc_e6, gap_e6, ece_e6
      |FROM curve, tot
      |ORDER BY bin""".stripMargin

  // Wald SPRT design constants — ONE set of Scala vals feeding BOTH
  // the Spark plan and the SQL oracle (the statCalibration lesson,
  // r16 advice, applied from the start: the two sides share literals,
  // so they cannot drift). e6-quantized log-likelihood increments;
  // H0: p = 0.15 vs H1: p = 0.25, alpha = beta = 0.05. math.log on
  // double literals is the same IEEE value at class-init on every JVM,
  // and only the ROUNDED longs ever reach either engine.
  // private[graft]: the transformWithState streaming twin
  // (graft.streaming.SprtStream) accumulates the SAME increments
  // against the SAME boundaries — three engines, one set of constants
  private[graft] val SprtLogS =
    math.round(math.log(0.25 / 0.15) * 1e6) // +510826 per success
  private[graft] val SprtLogF =
    math.round(math.log(0.75 / 0.85) * 1e6) // -125163 per failure
  private[graft] val SprtUpper =
    math.round(math.log(0.95 / 0.05) * 1e6) // accept H1 at +2944439
  private[graft] val SprtLower = -SprtUpper // accept H0 (Wald's B)

  /** Wald sequential probability ratio test over a hash-split A/B
    * experiment (Wald 1945) — the sequential STOPPING companion to
    * [[graft.streaming.EventWindows]]'s `ev_cusum` drift detector and
    * the fixed-horizon [[statTtest]]/[[statCuped]] evals: each arm's
    * daily purchase conversions accumulate a log-likelihood ratio for
    * H1: p = 0.25 against H0: p = 0.15, and the arm STOPS the day the
    * LLR leaves (log B, log A); observations after that day are marked
    * `post_stop` — the sample a sequential design would never have
    * collected (the whole point of SPRT: Wald's proof that it needs
    * ~half the samples of the fixed-horizon test at equal error).
    *
    * The variant split reuses the catalog's md5 split-rule family
    * (`pipe_train_split`'s "split42:" construction, here "ab42:" on
    * user_id, first hex char < '8' → arm A — lowercase fixed-width hex
    * compares identically in both engines).
    *
    * Exact integers end to end, the `ev_cusum` discipline: the LLR is
    * a PLAIN cumulative sum of per-day integer increments (no clamp,
    * no division anywhere), so int64 window sums replay bit-equal in
    * Spark and DuckDB. Decision logic is two bounded CASE lookups over
    * the variant-partitioned cumulative curve.
    *
    * Scale shape: one events scan to a (variant, day) census with
    * map-side combine; every window is partitioned by variant over
    * calendar-bounded rows (arms × days), so only the census scan
    * scales with the corpus — a crawler user adds trials, never state.
    */
  /** The (variant, day) conversion census statSprt accumulates over —
    * extracted so the batch operator and the transformWithState
    * streaming twin ([[graft.streaming.SprtStream]]) derive variants
    * and increments from ONE definition (the clusterAssigned /
    * SprtLog* sharing discipline). One events scan, map-side combine;
    * output is calendar-bounded (arms × days). */
  private[graft] def sprtDailyCensus(events: DataFrame): DataFrame =
    events
      .select(
        expr("if(substring(md5(concat('ab42:', cast(user_id as string)" +
          ")), 1, 1) < '8', 'A', 'B')").as("variant"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        (col("event_type") === "purchase").cast("long").as("s"))
      .groupBy("variant", "day")
      .agg(count(lit(1)).as("n"), sum("s").as("conv"))
      .withColumn("llr_day_e6",
        expr(s"conv * ${SprtLogS}L + (n - conv) * ${SprtLogF}L"))

  def statSprt(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = sprtDailyCensus(Tables.events(spark, sfDir))
    val wCum = Window.partitionBy("variant").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wArm = Window.partitionBy("variant")
    val cum = daily.withColumn("llr_e6", sum("llr_day_e6").over(wCum))
    // first boundary crossing per arm (days are yyyy-MM-dd strings:
    // lexicographic min IS chronological), then the LLR value THAT day
    // — the decision is frozen at the crossing, later wandering can't
    // rewrite it
    cum
      .withColumn("cross_day", min(when(
        col("llr_e6") >= SprtUpper || col("llr_e6") <= SprtLower,
        col("day"))).over(wArm))
      .withColumn("llr_at_cross", max(when(
        col("day") === col("cross_day"), col("llr_e6"))).over(wArm))
      .withColumn("state", when(
          col("cross_day").isNull || col("day") < col("cross_day"),
          lit("continue"))
        .when(col("llr_at_cross") >= SprtUpper, lit("accept_h1"))
        .otherwise(lit("accept_h0")))
      .withColumn("post_stop",
        (col("cross_day").isNotNull && col("day") > col("cross_day"))
          .cast("int"))
      .select("variant", "day", "n", "conv", "llr_day_e6", "llr_e6",
        "state", "post_stop")
      .orderBy("variant", "day")
  }

  val statSprtSql: String =
    s"""WITH e AS (
      |  SELECT CASE WHEN substr(md5('ab42:' || user_id::VARCHAR), 1, 1)
      |      < '8' THEN 'A' ELSE 'B' END AS variant,
      |    strftime(ts, '%Y-%m-%d') AS day,
      |    (event_type = 'purchase')::BIGINT AS s
      |  FROM events),
      |daily AS (
      |  SELECT variant, day, count(*)::BIGINT AS n, sum(s)::BIGINT AS conv
      |  FROM e GROUP BY 1, 2),
      |cum AS (
      |  SELECT variant, day, n, conv,
      |    conv * $SprtLogS + (n - conv) * ($SprtLogF) AS llr_day_e6,
      |    sum(conv * $SprtLogS + (n - conv) * ($SprtLogF))
      |      OVER (PARTITION BY variant ORDER BY day
      |        ROWS UNBOUNDED PRECEDING)::BIGINT AS llr_e6
      |  FROM daily),
      |crossed AS (
      |  SELECT *, min(CASE WHEN llr_e6 >= $SprtUpper
      |      OR llr_e6 <= $SprtLower THEN day END)
      |    OVER (PARTITION BY variant) AS cross_day
      |  FROM cum),
      |froze AS (
      |  SELECT *, max(CASE WHEN day = cross_day THEN llr_e6 END)
      |    OVER (PARTITION BY variant) AS llr_at_cross
      |  FROM crossed)
      |SELECT variant, day, n, conv, llr_day_e6, llr_e6,
      |  CASE WHEN cross_day IS NULL OR day < cross_day THEN 'continue'
      |    WHEN llr_at_cross >= $SprtUpper THEN 'accept_h1'
      |    ELSE 'accept_h0' END AS state,
      |  (cross_day IS NOT NULL AND day > cross_day)::INT AS post_stop
      |FROM froze
      |ORDER BY variant, day""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("stat_sprt", statSprt _, statSprtSql),
    ("stat_calibration", statCalibration _, statCalibrationSql),
    ("stat_auc", statAuc _, statAucSql),
    ("stat_ols_trend", statOlsTrend _, statOlsTrendSql),
    ("stat_cov_matrix", statCovMatrix _, statCovMatrixSql),
    ("stat_ks_test", statKsTest _, statKsTestSql),
    ("stat_mannwhitney", statMannWhitney _, statMannWhitneySql),
    ("stat_chi2_independence",
      statChi2Independence _, statChi2IndependenceSql),
    ("stat_mutual_info", statMutualInfo _, statMutualInfoSql),
    ("stat_gini", statGini _, statGiniSql),
    ("stat_benford", statBenford _, statBenfordSql),
    ("stat_ttest", statTtest _, statTtestSql),
    ("stat_cuped", statCuped _, statCupedSql),
    ("stat_winsorize", statWinsorize _, statWinsorizeSql),
    ("stat_skew_audit", statSkewAudit _, statSkewAuditSql),
    ("stat_bootstrap_ci",
      (s: SparkSession, d: String) => statBootstrapCi(s, d),
      statBootstrapCiSql()),
    ("stat_approx_distinct", statApproxDistinct _, statApproxDistinctSql),
    ("stat_approx_quantiles", statApproxQuantiles _, statApproxQuantilesSql),
    ("stat_hll_union", statHllUnion _, statHllUnionSql),
    ("stat_topk_agg", statTopkAgg _, statTopkSql),
    ("stat_freq_items", statFreqItems _, statFreqItemsSql),
    ("stat_theta_overlap", statThetaOverlap _, statThetaOverlapSql))
}

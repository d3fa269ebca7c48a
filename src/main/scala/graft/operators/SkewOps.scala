package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Skew-mitigation operator patterns (the builder prompt's "salting for
  * skew" bullet). AQE's skew-join splitting (enabled in
  * [[graft.core.GraftSession]]) handles most runtime join skew
  * automatically; these are the static rewrites for the cases AQE
  * cannot touch — reducer-skewed aggregations, and joins whose skew is
  * known up front. Both produce salt-invariant results, so the DuckDB
  * oracle runs the plain formulation.
  */
object SkewOps {

  /** Exact distinct-count per low-cardinality group via the two-phase
    * rewrite: pre-aggregate on (group, key) — spreading each group's
    * keys across every partition — then count per group. The naive
    * count(DISTINCT) funnels all of a group's rows through one reducer:
    * with 5 event types and 1000 executors, 995 sit idle. The rewrite
    * keeps every partition busy in phase 1 and ships one row per
    * (partition-local group, key) into a 5-row final agg.
    */
  def q27SaltedDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("_n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("_n").as("n_events"))
      .orderBy("event_type")

  val q27Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Hot-key-only salted join — the production form of salting. A
    * frequency pass finds keys above `hotThreshold`; ONLY those fact
    * rows get a deterministic salt in [0, nSalts) and only those dim
    * rows are replicated nSalts times (everything else joins with
    * salt 0, i.e. exactly the plain join). Hot-key rows spread over
    * nSalts reducers; cold keys pay nothing — so when no key is hot
    * this degenerates to the plain join plus one map-combined
    * frequency aggregation. The salt is a function of non-join
    * columns, which keeps the query deterministic and the result
    * identical to the unsalted join (SkewSpec asserts this). Prefer
    * AQE skew-join when hot keys are unknowable; this static form
    * wins when they are stable (power-law ids at 100 TB) or when the
    * skewed exchange feeds a non-join operator AQE will not rewrite.
    *
    * TPC-H-shaped lineitem caps at 7 rows per order — genuinely no
    * skew — so the default threshold correctly salts NOTHING and the
    * query costs one frequency pass over the plain join. SkewSpec
    * forces every key hot (threshold 1) to exercise the salted path.
    */
  def q28SaltedJoin(spark: SparkSession, sfDir: String,
      nSalts: Int = 8, hotThreshold: Long = 64): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    // hot keys are few BY DEFINITION (they are the heavy hitters), so
    // the set broadcasts; the agg map-combines to one row per key
    val hot = li.groupBy("l_orderkey").agg(count(lit(1)).as("key_n"))
      .filter(col("key_n") >= hotThreshold)
      .select(col("l_orderkey").as("hot_key"))
    val ordsPlain = Tables.orders(spark, sfDir)
    // adaptive branch: when the frequency pass finds no heavy hitter,
    // run the plain join — salting machinery should cost nothing on
    // unskewed data beyond the detection pass itself
    if (hot.isEmpty) {
      return li.join(ordsPlain, li("l_orderkey") === ordsPlain("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("o_orderpriority")
    }
    val liSalted = li
      .join(broadcast(hot), li("l_orderkey") === col("hot_key"), "left")
      .withColumn("salt", when(col("hot_key").isNotNull,
        pmod(hash(col("l_linenumber"), col("l_partkey")), lit(nSalts)))
        .otherwise(lit(0)))
      .drop("hot_key")
    val ordsSalted = ordsPlain
      .join(broadcast(hot), ordsPlain("o_orderkey") === col("hot_key"), "left")
      .withColumn("salt", explode(when(col("hot_key").isNotNull,
        sequence(lit(0), lit(nSalts - 1))).otherwise(array(lit(0)))))
      .drop("hot_key")
    liSalted.join(ordsSalted,
        liSalted("l_orderkey") === ordsSalted("o_orderkey") &&
          liSalted("salt") === ordsSalted("salt"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  val q28Sql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q27_salted_distinct", q27SaltedDistinct _, q27Sql),
    ("q28_salted_join", (s: SparkSession, d: String) => q28SaltedJoin(s, d),
      q28Sql))
}

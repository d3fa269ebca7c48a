package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bipartite user↔item graph analytics on GraphX (SURVEY §2.12; the
  * reference uses GraphFrames, whose jar is not in this environment —
  * GraphX ships with Spark and has matching semantics for everything
  * the reference runs: degrees, fixed-iteration PageRank, connected
  * components).
  *
  * G1 id-collision caveat: the reference's user and movie id spaces
  * overlap (both start at 1) and it silently merges them. GraphX needs
  * unique VertexIds, so item ids are offset by [[ItemOffset]] — a
  * documented deviation that makes the graph genuinely bipartite.
  */
object BipartiteGraph {

  val ItemOffset: Long = 10000000L

  /** vertices (id, tipo) = users ∪ items; edges (src=user, dst=item,
    * weight=rating) — `GraphFrames_prueba/Explorativa3.ipynb:86-102`.
    * Input: (userCol, itemCol, weightCol) columns.
    */
  def build(ratings: DataFrame, userCol: String, itemCol: String,
      weightCol: String): Graph[String, Int] = {
    val edges = ratings
      .select(col(userCol).cast("long"), col(itemCol).cast("long"),
        col(weightCol).cast("int"))
      .rdd
      .map(r => Edge(r.getLong(0), r.getLong(1) + ItemOffset, r.getInt(2)))
    // vertex attr = tipo tag ("user" | "item")
    Graph.fromEdges[String, Int](edges, defaultValue = "")
      .mapVertices((id, _) => if (id >= ItemOffset) "item" else "user")
  }

  /** Item popularity = in-degrees; user activity = out-degrees
    * (G2, `Explorativa3.ipynb` cells 7-11). Returned as DataFrames with
    * original (un-offset) ids.
    */
  def itemInDegrees(spark: SparkSession, g: Graph[String, Int]): DataFrame = {
    import spark.implicits._
    g.inDegrees
      .map { case (vid, d) => (vid - ItemOffset, d) }
      .toDF("id", "in_degree")
  }

  def userOutDegrees(spark: SparkSession, g: Graph[String, Int]): DataFrame = {
    import spark.implicits._
    g.outDegrees.map { case (vid, d) => (vid, d) }.toDF("id", "out_degree")
  }

  /** Fixed-iteration PageRank (G3): `staticPageRank(10, 0.15)` — same
    * semantics as GraphFrames' maxIter mode used by the reference
    * (`Explorativa3.ipynb:370-375`: resetProbability 0.15, maxIter 10).
    * Returns item ranks (un-offset), descending.
    *
    * P6 use-site: the reference keeps only movie vertices with a
    * SQL-STRING predicate — `.filter("tipo='movie'")`,
    * `Explorativa3.ipynb:374` (cell 12) — rather than a Column
    * expression. Same here: the ranked vertices carry their `tipo` tag
    * and the item side is selected by the parsed string predicate.
    */
  def itemPageRank(spark: SparkSession, g: Graph[String, Int],
      iters: Int = 10, reset: Double = 0.15): DataFrame = {
    import spark.implicits._
    g.staticPageRank(iters, reset)
      .vertices
      .map { case (vid, rank) =>
        (vid, if (vid >= ItemOffset) "item" else "user", rank) }
      .toDF("vid", "tipo", "pagerank")
      .filter("tipo = 'item'")
      .select((col("vid") - ItemOffset).as("id"), col("pagerank"))
      .orderBy(desc("pagerank"), asc("id"))
  }

  /** Connected components (G4): component sizes descending, with the
    * per-(component, tipo) breakdown the reference prints
    * (`Explorativa3.ipynb` cells 15-17).
    */
  def componentSizes(spark: SparkSession, g: Graph[String, Int]): DataFrame = {
    import spark.implicits._
    g.connectedComponents()
      .vertices
      .map { case (_, comp) => comp }
      .toDF("component")
      .groupBy("component")
      .agg(count(lit(1)).as("size"))
      .orderBy(desc("size"), asc("component"))
  }

  def componentsByTipo(spark: SparkSession, g: Graph[String, Int])
      : DataFrame = {
    import spark.implicits._
    val cc = g.connectedComponents().vertices
    val tipo = g.vertices
    cc.join(tipo)
      .map { case (_, (comp, t)) => (comp, t) }
      .toDF("component", "tipo")
      .groupBy("component", "tipo")
      .agg(count(lit(1)).as("n"))
      .orderBy(asc("component"), asc("tipo"))
  }
}

/** Graph queries over the driver's testdata (rows-only checks for the
  * iterative algorithms; degrees are oracle-checkable as plain counts).
  */
object GraphOps {
  import graft.core.Tables

  /** Event-type popularity via GraphX in-degrees on the bipartite
    * user→event_type graph. Semantically identical to
    * `SELECT event_type, count(*)` — which is exactly the oracle —
    * proving the GraphX bridge agrees with the relational engine.
    */
  def graphEventDegrees(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      // map event types to stable small ids for vertex encoding
      .withColumn("type_id",
        when(col("event_type") === "click", 1)
          .when(col("event_type") === "view", 2)
          .when(col("event_type") === "purchase", 3)
          .when(col("event_type") === "signup", 4)
          .when(col("event_type") === "error", 5)
          .otherwise(0))
    val g = BipartiteGraph.build(ev, "user_id", "type_id", "type_id")
    val deg = BipartiteGraph.itemInDegrees(spark, g)
    val names = Seq((1, "click"), (2, "view"), (3, "purchase"),
      (4, "signup"), (5, "error"))
    import spark.implicits._
    val dim = names.toDF("id", "event_type")
    deg.join(dim, Seq("id"))
      .select(col("event_type"), col("in_degree").cast("long").as("n"))
      .orderBy("event_type")
  }

  val graphEventDegreesSql: String =
    """SELECT event_type, count(*) AS n FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** PageRank over the user↔event_type graph, run through GraphX's
    * `staticPageRank(10, 0.15)` like the reference (`Explorativa3
    * .ipynb:361` — which also thins edges first; here the half-corpus
    * cut is `user_id % 2 = 0` so the oracle can reproduce it exactly,
    * and the seeded `sample` variant stays covered by GraphSpec P13).
    *
    * Oracle-izable because the graph is strictly bipartite user→type:
    * users have no in-edges, so their rank is exactly `reset` from
    * iteration 1 on, and every item rank is CLOSED-FORM after
    * iteration 2 — reset + (1-reset)·Σ_edges(reset/outDeg(u)) —
    * followed by the SPARK-18847 rescale (sum of ranks = |V|). The
    * oracle SQL evaluates that closed form; ranks are quantized to
    * 1e-6 on both sides so last-ulp float-order differences between
    * engines can't flip the hash.
    */
  def graphEventPageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id") % 2 === 0)
      .withColumn("type_id",
        when(col("event_type") === "click", 1)
          .when(col("event_type") === "view", 2)
          .when(col("event_type") === "purchase", 3)
          .when(col("event_type") === "signup", 4)
          .when(col("event_type") === "error", 5)
          .otherwise(0))
    val g = BipartiteGraph.build(ev, "user_id", "type_id", "type_id")
    BipartiteGraph.itemPageRank(spark, g)
      .select(col("id"),
        expr("cast(floor(pagerank * 1000000 + 0.5d) as bigint)")
          .as("pagerank_q"))
      .orderBy(desc("pagerank_q"), asc("id"))
  }

  val graphEventPageRankSql: String =
    """WITH e AS (
      |  SELECT user_id,
      |    CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
      |      WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
      |      WHEN 'error' THEN 5 ELSE 0 END AS type_id
      |  FROM events WHERE user_id % 2 = 0),
      |deg AS (SELECT user_id, count(*) AS d FROM e GROUP BY user_id),
      |item AS (
      |  SELECT type_id AS id,
      |    0.15::DOUBLE + 0.85::DOUBLE * sum(0.15::DOUBLE / d) AS r
      |  FROM e JOIN deg USING (user_id) GROUP BY type_id),
      |norm AS (
      |  SELECT
      |    (SELECT count(*) FROM deg) + (SELECT count(*) FROM item) AS nv,
      |    0.15::DOUBLE * (SELECT count(*) FROM deg)
      |      + (SELECT sum(r) FROM item) AS rs)
      |SELECT id::BIGINT AS id,
      |  floor(r * nv / rs * 1000000 + 0.5)::BIGINT AS pagerank_q
      |FROM item, norm
      |ORDER BY pagerank_q DESC, id""".stripMargin

  // ---- shared item-graph prelude (r13 verdict #8) -------------------
  // cooccur / triangle / label-prop / k-core all build the same
  // cap-bounded item interaction graph. ONE definition each for the
  // Spark prelude and its SQL twin, so a cap or shape change cannot
  // drift between the four operators and their oracles.

  /** Per-user degree cap of the item-graph family: each user
    * contributes at most this many items (deterministic keep-smallest
    * truncation), so per-user pair fan-out is bounded by cap²/2 and
    * edge generation is LINEAR in users — one crawler account that
    * touched every item would otherwise generate |items|² pairs and a
    * single hot partition.
    */
  val ItemGraphCap = 32

  /** Distinct (user, item) interactions from the event props,
    * truncated to the `cap` smallest items per user via a per-user
    * rank window (map-side WindowGroupLimit).
    */
  private def cappedInteractions(spark: SparkSession, sfDir: String,
      cap: Int): DataFrame = {
    // r15 shape: ONE user-keyed exchange via the native cap-at-insert
    // aggregate [[graft.functions.BottomKDistinct]] — the former
    // `distinct() + row_number window` planned two exchanges (one
    // clustered on (user, item), one on user) and measured 1.84 s
    // end-to-end for degree_hist at sf0.1 vs 1.13 s for the
    // one-exchange aggregate form. collect_set would also be one
    // exchange but buffers EVERY distinct item of a crawler user;
    // the aggregate's update/merge/shuffled state are all O(cap).
    // Result is bit-identical to the window form (k smallest distinct
    // items per user, ascending) — the SQL oracles keep replaying the
    // window formulation and still hash-match.
    // item parses as LONG for the O(cap) aggregate, then casts back to
    // int; the int-range filter keeps out-of-range ids behaving exactly
    // like the previous string→int cast (null → dropped) and like the
    // oracle's window formulation, instead of surviving the bottom-k
    // and wrapping in the final long→int cast (r15 advice)
    // r19, two measured fixes on the family's hottest stage (the JSON
    // extraction — see graft.core.Spread for both mechanisms):
    //  - evalOnce pins get_json_object to ONE evaluation per row; the
    //    pushed-down range filter was re-evaluating it per conjunct
    //    (capped fragment at sf0.1: 1.00 s → 0.39 s, identical rows);
    //  - byKey(user_id) moves the user-keyed exchange BEFORE the parse
    //    so the single-row-group scan's one-partition stage carries
    //    only the scan, and the parse + O(cap) aggregate run on all
    //    cores (0.39 s → 0.20 s); no-op on any multi-file table, and
    //    the groupBy below reuses the exchange, so no shuffle is added
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("props"))
      .transform(graft.core.Spread.byKey(_, col("user_id")))
      .select(col("user_id"), graft.core.Spread.evalOnce(
        get_json_object(col("props"), "$.k").cast("long")).as("item"))
      .filter(col("item").isNotNull &&
        col("item").between(Int.MinValue.toLong, Int.MaxValue.toLong))
      .groupBy("user_id")
      .agg(graft.functions.BottomKDistinct
        .bottomkDistinct(col("item"), cap).as("items"))
      .select(col("user_id"), explode(col("items")).as("item_l"))
      .select(col("user_id"), col("item_l").cast("int").as("item"))
  }

  /** Per-user item pairs (a < b), NOT deduplicated — cooccur counts
    * multiplicity across users, the others `.distinct()` this.
    */
  private def userItemPairs(capped: DataFrame): DataFrame =
    capped.as("x")
      .join(capped.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.item") < col("y.item"))
      .select(col("x.item").as("a"), col("y.item").as("b"))

  /** Both directions of an (a, b, …) edge list: the swapped copy
    * keeps every other column.
    */
  private def symmetrized(pairs: DataFrame): DataFrame =
    pairs.unionByName(pairs
      .withColumnRenamed("a", "__swap")
      .withColumnRenamed("b", "a")
      .withColumnRenamed("__swap", "b"))

  /** SQL twin of [[cappedInteractions]] — the `inter` + `capped` CTEs
    * every item-graph oracle starts with.
    */
  private def interCappedSql(cap: Int): String =
    s"""inter AS (
       |  SELECT DISTINCT user_id,
       |    json_extract_string(props, '$$.k')::INT AS item
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
       |capped AS (
       |  SELECT user_id, item FROM (
       |    SELECT user_id, item,
       |      row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
       |    FROM inter)
       |  WHERE rn <= $cap)""".stripMargin

  /** SQL twin of `userItemPairs(capped).distinct()` under the given
    * CTE alias.
    */
  private def distinctPairsSql(alias: String): String =
    s"""$alias AS (
       |  SELECT DISTINCT x.item AS a, y.item AS b
       |  FROM capped x
       |  JOIN capped y ON x.user_id = y.user_id AND x.item < y.item)"""
      .stripMargin

  /** Item-item co-occurrence neighborhood (the "users who touched X
    * also touched Y" item2item primitive every co-visitation
    * recommender starts from): distinct (user, item) interactions →
    * per-user item pairs → co-counts → Jaccard over capped degrees →
    * top-k neighbors per item in integer fixed point.
    *
    * The scale trick is the DEGREE CAP: each user contributes at most
    * `cap` items (deterministic keep-smallest truncation via a
    * per-user window), so the per-user pair fan-out is bounded by
    * cap²/2 and the self-join is LINEAR in users — without it one
    * crawler account that touched every item generates |items|² pairs
    * and a single hot partition (the same hot-key degeneration the
    * dedup prefix filter guards against). Jaccard uses the capped
    * degrees for internal consistency. Top-k per item is a
    * rank-window with the map-side WindowGroupLimit pushdown.
    */
  def graphItemCooccur(spark: SparkSession, sfDir: String,
      cap: Int = ItemGraphCap, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val capped = cappedInteractions(spark, sfDir, cap)
    val deg = capped.groupBy("item").agg(count(lit(1)).as("d"))
    val pairs = userItemPairs(capped)
      .groupBy("a", "b")
      .agg(count(lit(1)).as("co"))
    val sym = symmetrized(pairs)
    // no broadcast hint on deg: it has one row per distinct item — an
    // UNBOUNDED cardinality when items are open-ended (URLs, doc ids)
    // at 100 TB. AQE still broadcasts it while it measures small; past
    // that the join shuffles on the item key, which `sym` is keyed by
    // anyway.
    sym
      .join(deg.select(col("item").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("item").as("b"), col("d").as("db")), "b")
      .withColumn("jac_e6", expr("co * 1000000L div (da + db - co)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("a")
          .orderBy(col("jac_e6").desc, col("b"))))
      .filter(col("rnk") <= k)
      .select("a", "b", "co", "jac_e6", "rnk")
      .orderBy("a", "rnk")
  }

  val graphItemCooccurSql: String =
    s"""WITH ${interCappedSql(ItemGraphCap)},
      |deg AS (SELECT item, count(*)::BIGINT AS d FROM capped GROUP BY 1),
      |pairs AS (
      |  SELECT x.item AS a, y.item AS b, count(*)::BIGINT AS co
      |  FROM capped x
      |  JOIN capped y
      |    ON x.user_id = y.user_id AND x.item < y.item
      |  GROUP BY 1, 2),
      |sym AS (
      |  SELECT a, b, co FROM pairs
      |  UNION ALL
      |  SELECT b, a, co FROM pairs),
      |scored AS (
      |  SELECT a, b, co,
      |    (co * 1000000) // (da.d + db.d - co) AS jac_e6
      |  FROM sym
      |  JOIN deg da ON da.item = a
      |  JOIN deg db ON db.item = b),
      |r AS (
      |  SELECT a, b, co, jac_e6,
      |    row_number() OVER (PARTITION BY a
      |      ORDER BY jac_e6 DESC, b) AS rnk
      |  FROM scored)
      |SELECT a, b, co, jac_e6, rnk::INT AS rnk
      |FROM r WHERE rnk <= 5
      |ORDER BY a, rnk""".stripMargin

  /** Exact triangle census + global clustering coefficient of the
    * item co-occurrence graph (nodes = items, an edge when ≥1 user
    * touched both) — the cohesion statistic that separates a
    * community-structured interaction graph from a star-shaped
    * crawler artifact.
    *
    * Scale design is the classic DEGREE-ORDERED ORIENTATION
    * (node-iterator++ / Cohen's MapReduce scheme): orient every
    * undirected edge from its lower-(degree, id) endpoint to the
    * higher one — a total order, so the oriented graph is acyclic and
    * every triangle is counted exactly once as a wedge u→v, u→w
    * (rank v < rank w) closed by the oriented edge v→w. Out-degree
    * after orientation is O(√m) regardless of how skewed the raw
    * degree distribution is, so the wedge self-join is O(m^1.5)
    * worst-case instead of Σd² — the difference between a plan that
    * survives a crawler hot node and one that melts. Upstream, the
    * same per-user `cap` as [[graphItemCooccur]] bounds pair fan-out,
    * so edge generation is linear in users. Every join is an
    * equi-join on node keys (shuffle-partitionable); the one global
    * agg is a constant-width accumulator.
    */
  def graphTriangleCount(spark: SparkSession, sfDir: String,
      cap: Int = ItemGraphCap): DataFrame = {
    // r20: TWO localCheckpoints truncate the repeated subtrees (r19
    // verdict item 2 — the uncheckpointed plan re-ran the capped
    // prelude under 69 FileScans / 218 Exchanges, ReusedExchange
    // covered only 18): `edges` feeds deg (twice via withDeg, once via
    // totals) and the orientation, and `oriented` is read THREE times
    // by the wedge/closure joins. Both relations are 2-3 int columns —
    // the narrow shape localCheckpoint wants. label_prop/kcore
    // established the same pattern for their `sym` relation.
    val edges = userItemPairs(cappedInteractions(spark, sfDir, cap))
      .distinct()
      .localCheckpoint()
    val deg = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // attach degrees, then orient low-(d, id) → high-(d, id)
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("s"), col("b").as("t"),
          col("db").as("dt")))
        .otherwise(struct(col("b").as("s"), col("a").as("t"),
          col("da").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint()
    // wedges u→v, u→w with rank(v) < rank(w); close with oriented v→w
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") &&
              col("e1.t") < col("e2.t"))))
      .select(col("e1.t").as("v"), col("e2.t").as("w"))
    val triangles = wedges
      .join(oriented.select(col("s").as("v"), col("t").as("w")),
        Seq("v", "w"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val totals = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(d) div 2").as("n_edges"),
      expr("sum(d * (d - 1) div 2)").as("n_wedges"))
    totals.crossJoin(broadcast(triangles))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("3 * n_triangles * 1000000L div n_wedges").as("gcc_e6"))
  }

  val graphTriangleCountSql: String =
    s"""WITH ${interCappedSql(ItemGraphCap)},
      |${distinctPairsSql("edges")},
      |deg AS (
      |  SELECT v, count(*)::BIGINT AS d FROM (
      |    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
      |  GROUP BY 1),
      |oriented AS (
      |  SELECT
      |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
      |      THEN a ELSE b END AS s,
      |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
      |      THEN b ELSE a END AS t,
      |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
      |      THEN db.d ELSE da.d END AS dt
      |  FROM edges
      |  JOIN deg da ON da.v = a
      |  JOIN deg db ON db.v = b),
      |wedges AS (
      |  SELECT e1.t AS v, e2.t AS w
      |  FROM oriented e1
      |  JOIN oriented e2 ON e1.s = e2.s
      |    AND (e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t))),
      |tri AS (
      |  SELECT count(*)::BIGINT AS n_triangles
      |  FROM wedges
      |  WHERE EXISTS (SELECT 1 FROM oriented o
      |    WHERE o.s = wedges.v AND o.t = wedges.w)),
      |totals AS (
      |  SELECT count(*)::BIGINT AS n_nodes,
      |    (sum(d) // 2)::BIGINT AS n_edges,
      |    sum(d * (d - 1) // 2)::BIGINT AS n_wedges
      |  FROM deg)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |  (3 * n_triangles * 1000000) // n_wedges AS gcc_e6
      |FROM totals CROSS JOIN tri""".stripMargin

  /** Rounds of synchronous label propagation [[graphLabelProp]] runs —
    * interpolated into the unrolled oracle so both engines always run
    * the same number.
    */
  val LpRounds = 3

  /** Semi-supervised label propagation over the item co-occurrence
    * graph: a deterministic 1-in-7 subset of items carries a seed
    * class (item mod 4 — the stand-in for a human-labeled taxonomy
    * sample), and [[LpRounds]] SYNCHRONOUS rounds spread labels to
    * unlabeled neighbors by majority vote (count desc, label asc
    * tie-break; seeds are clamped; a node with no labeled neighbor
    * keeps its previous label). The classic cheap way to extend a tiny
    * labeled set over a billion-node interaction graph.
    *
    * Determinism is the whole design: synchronous rounds (every round
    * reads only the previous round's labels), a total-order majority
    * tie-break, and clamped seeds make the fixpoint path identical in
    * any engine — so the DuckDB oracle just unrolls the same
    * [[LpRounds]] rounds as CTEs.
    *
    * Scale shape: per round, ONE equi-join of the (cap-bounded) edge
    * list against the label table on the neighbor key and ONE
    * (item, label) aggregation — both shuffle-partitioned on node
    * keys; the majority pick is a rank-1 window (WindowGroupLimit).
    * State between rounds is one row per node. The edge list is
    * localCheckpointed once, so the [[LpRounds]]-branch plan reads the
    * corpus ONCE (reliable checkpoint at real cluster scale — see
    * [[graft.pipeline.PipelineOps]]).
    */
  def graphLabelProp(spark: SparkSession, sfDir: String,
      cap: Int = ItemGraphCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = userItemPairs(cappedInteractions(spark, sfDir, cap))
      .distinct()
    val sym = symmetrized(pairs).localCheckpoint()
    val nodes = sym.select(col("a").as("item")).distinct()
    val seeded = nodes.withColumn("lab",
      when(col("item") % 7 === 0, col("item") % 4).otherwise(lit(-1)))
    val labels = (1 to LpRounds).foldLeft(seeded) { case (prev, _) =>
      val votes = sym
        .join(prev.filter(col("lab") >= 0)
          .select(col("item").as("b"), col("lab")), "b")
        .groupBy(col("a").as("item"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val majority = votes
        .withColumn("rn", row_number().over(
          Window.partitionBy("item")
            .orderBy(col("c").desc, col("lab"))))
        .filter(col("rn") === 1)
        .select(col("item"), col("lab").as("mlab"))
      // r20 note: a per-round localCheckpoint of this table (the
      // triangle-count fix) was A/B-measured a WASH here (1.55 -> 1.51
      // s at sf0.1) and reverted: unlike triangle, the doubled
      // per-round subtrees only re-join the already-checkpointed sym
      // relation and tiny label tables, so the recompute the barrier
      // removes is nearly free while the extra materialization jobs
      // are not.
      prev.join(majority, Seq("item"), "left")
        .select(col("item"),
          when(col("item") % 7 === 0, col("item") % 4)
            .otherwise(coalesce(col("mlab"), col("lab"))).as("lab"))
    }
    labels.orderBy("item")
  }

  val graphLabelPropSql: String = {
    def round(k: Int): String =
      s"""m$k AS (
         |  SELECT s.a AS item, l.lab, count(*)::BIGINT AS c
         |  FROM sym s JOIN l${k - 1} l ON l.item = s.b
         |  WHERE l.lab >= 0
         |  GROUP BY 1, 2),
         |b$k AS (
         |  SELECT item, lab,
         |    row_number() OVER (PARTITION BY item
         |      ORDER BY c DESC, lab) AS rn
         |  FROM m$k),
         |l$k AS (
         |  SELECT n.item,
         |    CASE WHEN n.item % 7 = 0 THEN n.item % 4
         |      ELSE coalesce(b.lab, p.lab) END AS lab
         |  FROM nodes n
         |  JOIN l${k - 1} p ON p.item = n.item
         |  LEFT JOIN (SELECT item, lab FROM b$k WHERE rn = 1) b
         |    ON b.item = n.item)""".stripMargin
    s"""WITH ${interCappedSql(ItemGraphCap)},
       |${distinctPairsSql("pairs")},
       |sym AS (
       |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS item FROM sym),
       |l0 AS (
       |  SELECT item,
       |    CASE WHEN item % 7 = 0 THEN item % 4 ELSE -1 END AS lab
       |  FROM nodes),
       |${(1 to LpRounds).map(round).mkString(",\n")}
       |SELECT item, lab FROM l$LpRounds ORDER BY item""".stripMargin
  }

  /** Peeling rounds and the core threshold of [[graphKcore]] — shared
    * with the unrolled oracle and the spec.
    */
  val KcoreRounds = 3

  /** The user-capped co-occurrence graph is NEAR-COMPLETE on this
    * corpus (the item domain is small and users touch many items:
    * min degree 31, median 67 at sf0.001), so the classic k=3 core
    * peels nothing; 60 sits inside the degree distribution and the
    * peel cascades for three full rounds at sf0.001 (74→65→61→44) —
    * the behavior the op exists to exercise.
    */
  val KcoreK = 60

  /** Iterative k-core peeling ([[KcoreRounds]] synchronous rounds of
    * "drop every node with fewer than [[KcoreK]] surviving
    * neighbors") over the item co-occurrence graph — the standard
    * dense-subgraph extraction that separates a catalog's connected
    * backbone from long-tail leaf items before community or embedding
    * work. Full k-core runs to fixpoint; the bounded-round form is
    * the distributed production variant (each extra round is one more
    * pass, and peeling converges geometrically on power-law graphs) —
    * and bounded rounds are what make the DuckDB oracle an exact
    * unrolled replay rather than a recursive approximation.
    *
    * Emits the surviving nodes with their round-[[KcoreRounds]]
    * degree (the degree that qualified them). Scale shape: per round,
    * two semi-shaped equi-joins of the (cap-bounded, checkpointed)
    * edge list against the shrinking alive set and one count agg —
    * all keyed on node ids; the alive set only ever shrinks, so later
    * rounds get cheaper, and no stage depends on the raw degree skew
    * (the per-user cap bounds edge generation exactly as in
    * [[graphItemCooccur]]).
    */
  def graphKcore(spark: SparkSession, sfDir: String,
      cap: Int = ItemGraphCap): DataFrame = {
    val pairs = userItemPairs(cappedInteractions(spark, sfDir, cap))
      .distinct()
    val sym = symmetrized(pairs).localCheckpoint()
    var alive = sym.select(col("a").as("item")).distinct()
    var deg: DataFrame = null
    for (_ <- 1 to KcoreRounds) {
      deg = sym
        .join(alive.select(col("item").as("a")), "a")
        .join(alive.select(col("item").as("b")), "b")
        .groupBy(col("a").as("item")).agg(count(lit(1)).as("d"))
      // r20 note: a per-round localCheckpoint of the alive set was
      // A/B-measured flat (1.17 s both sides at sf0.1) and reverted —
      // same rationale as graphLabelProp above.
      alive = deg.filter(col("d") >= KcoreK).select("item")
    }
    deg.filter(col("d") >= KcoreK)
      .select(col("item"), col("d"))
      .orderBy("item")
  }

  val graphKcoreSql: String = {
    def round(r: Int): String =
      s"""deg$r AS (
         |  SELECT s.a AS item, count(*)::BIGINT AS d
         |  FROM sym s
         |  JOIN alive${r - 1} x ON x.item = s.a
         |  JOIN alive${r - 1} y ON y.item = s.b
         |  GROUP BY 1),
         |alive$r AS (SELECT item FROM deg$r WHERE d >= $KcoreK)"""
        .stripMargin
    s"""WITH ${interCappedSql(ItemGraphCap)},
       |${distinctPairsSql("pairs")},
       |sym AS (
       |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |alive0 AS (SELECT DISTINCT a AS item FROM sym),
       |${(1 to KcoreRounds).map(round).mkString(",\n")}
       |SELECT item, d FROM deg$KcoreRounds WHERE d >= $KcoreK
       |ORDER BY item""".stripMargin
  }

  /** Log₂-bucketed degree distribution of the item co-occurrence
    * graph — the first plot anyone draws before believing a graph is
    * power-law (and the skew audit that says whether a hot-node guard
    * is needed at all): per bucket ⌊log₂ d⌋+1, the node count, degree
    * range, and total incident-edge mass. The bucket comes from
    * `length(bin(d))` — the same exact bit-length idiom as ev_rfm's
    * monetary census, so the histogram is ≤64 rows under ANY degree
    * distribution and no float log touches the bucketing.
    *
    * Scale shape: the shared cap-bounded prelude, one node-keyed
    * degree aggregation, one ≤64-row census. Reuses
    * [[cappedInteractions]]/[[userItemPairs]]/[[symmetrized]] and the
    * SQL prelude verbatim.
    */
  def graphDegreeHist(spark: SparkSession, sfDir: String,
      cap: Int = ItemGraphCap): DataFrame = {
    val sym = symmetrized(
      userItemPairs(cappedInteractions(spark, sfDir, cap)).distinct())
    sym.groupBy("a").agg(count(lit(1)).as("d"))
      .groupBy(expr(graft.functions.LogBuckets.bitLenExpr("d")).as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min("d").as("min_degree"), max("d").as("max_degree"),
        sum("d").as("degree_mass"))
      .orderBy("bucket")
  }

  val graphDegreeHistSql: String =
    s"""WITH ${interCappedSql(ItemGraphCap)},
       |${distinctPairsSql("pairs")},
       |sym AS (
       |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |deg AS (SELECT a, count(*)::BIGINT AS d FROM sym GROUP BY a)
       |SELECT ${graft.functions.LogBuckets.bitLenSql("d")} AS bucket,
       |  count(*)::BIGINT AS n_nodes,
       |  min(d) AS min_degree, max(d) AS max_degree,
       |  sum(d)::BIGINT AS degree_mass
       |FROM deg
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  /** Degree assortativity of the item co-occurrence graph — Pearson
    * correlation of endpoint degrees over all directed edges, the
    * single number that says whether hubs attach to hubs (assortative,
    * r > 0: social-graph-like) or to leaves (disassortative, r < 0:
    * web/interaction-like). The sign decides which skew mitigations
    * matter: a disassortative graph concentrates wedge work on
    * hub-leaf stars — exactly what the family's degree cap and
    * triangle orientation defend against — so this is the audit that
    * justifies them.
    *
    * Exactness: the moment sums (Σx, Σxy, Σx², … over directed edges,
    * x = source degree, y = target degree) accumulate in
    * DECIMAL(19,0) products like [[graft.operators.StatsOps]]'
    * statOlsTrend; only the final r divides the identical exact
    * operands as doubles (round 6). By edge symmetry sx = sy and
    * sxx = syy — the spec asserts both identities instead of trusting
    * them.
    *
    * Scale shape: the shared capped prelude, one degree agg, two
    * node-keyed joins to attach endpoint degrees, one constant-width
    * scalar aggregation. No window, no collect.
    */
  def graphAssortativity(spark: SparkSession, sfDir: String,
      cap: Int = ItemGraphCap): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val sym = symmetrized(
      userItemPairs(cappedInteractions(spark, sfDir, cap)).distinct())
    val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
    val edges = sym
      .join(deg.select(col("a"), col("d").as("dx")), "a")
      .join(deg.select(col("a").as("b"), col("d").as("dy")), "b")
    edges.agg(
      count(lit(1)).as("n_directed"),
      sum(dec(col("dx"))).as("sx"), sum(dec(col("dy"))).as("sy"),
      sum(dec(col("dx")) * dec(col("dy"))).as("sxy"),
      sum(dec(col("dx")) * dec(col("dx"))).as("sxx"),
      sum(dec(col("dy")) * dec(col("dy"))).as("syy"))
      .select(expr("n_directed div 2").as("n_edges"),
        expr("cast((sx * 1000000) div n_directed as bigint)")
          .as("endpoint_mean_degree_e6"),
        round((d(col("n_directed")) * d(col("sxy")) -
          d(col("sx")) * d(col("sy"))) /
          sqrt((d(col("n_directed")) * d(col("sxx")) -
            d(col("sx")) * d(col("sx"))) *
            (d(col("n_directed")) * d(col("syy")) -
              d(col("sy")) * d(col("sy")))), 6)
          .as("assortativity"))
  }

  val graphAssortativitySql: String =
    s"""WITH ${interCappedSql(ItemGraphCap)},
       |${distinctPairsSql("pairs")},
       |sym AS (
       |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |deg AS (SELECT a, count(*)::BIGINT AS d FROM sym GROUP BY a),
       |edges AS (
       |  SELECT dx.d AS dx, dy.d AS dy
       |  FROM sym s JOIN deg dx ON dx.a = s.a JOIN deg dy ON dy.a = s.b),
       |agg AS (
       |  SELECT count(*)::BIGINT AS n_directed,
       |    sum(dx::DECIMAL(19,0))::BIGINT AS sx,
       |    sum(dy::DECIMAL(19,0))::BIGINT AS sy,
       |    sum(dx::DECIMAL(19,0) * dy)::BIGINT AS sxy,
       |    sum(dx::DECIMAL(19,0) * dx)::BIGINT AS sxx,
       |    sum(dy::DECIMAL(19,0) * dy)::BIGINT AS syy
       |  FROM edges)
       |SELECT n_directed // 2 AS n_edges,
       |  (sx * 1000000) // n_directed AS endpoint_mean_degree_e6,
       |  round((n_directed::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |    / sqrt((n_directed::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
       |      * (n_directed::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
       |    6) AS assortativity
       |FROM agg""".stripMargin

  /** Per-direction neighbor cap of [[graphLinkPred]]'s pruned
    * adjacency (see there for why BOTH directions must be capped). */
  val LinkPredNbrCap = 16

  /** Common-neighbor Jaccard link prediction over the item graph
    * (Liben-Nowell & Kleinberg 2003) — the "items that SHOULD be
    * connected but aren't yet" primitive a recommender mines for
    * candidate generation: for every non-adjacent item pair at
    * distance 2, score = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|, report each
    * node's top-k predicted NEW neighbors. Complements
    * [[graphItemCooccur]] (which ranks EXISTING co-occurrence edges):
    * the anti-join against the edge list is what makes this
    * prediction rather than description.
    *
    * Scale design — the MUTUAL-CAP pruned graph: capping only each
    * node's out-list (keep-smallest `nbrCap`, the one-exchange
    * [[graft.functions.BottomKDistinct]] aggregate) still leaves hub
    * IN-degree unbounded, and the common-neighbor expansion through a
    * hub x is Σ_x deg(x)² — a crawler-magnet item would melt it. So
    * the graph is pruned to MUTUAL capped edges (v↔n kept iff n is in
    * v's capped list AND v is in n's: one self-semi-join), which
    * bounds degree at `nbrCap` in BOTH directions; the hub expansion
    * is then ≤ |nodes|·nbrCap² — linear in nodes — and the pruned
    * adjacency is symmetric, so shared-hub counts equal
    * |N(a) ∩ N(b)| exactly and cn ≤ min(d_a, d_b) keeps the union
    * denominator positive.
    *
    * The cap keeps the nbrCap neighbors SMALLEST BY EDGE HASH (the
    * [[graft.functions.TopKByScore]] one-exchange aggregate over
    * score = −hash, id tiebreak; hash = first 13 hex chars of
    * md5("a:b") → a 52-bit int, chosen to be EXACT in the
    * aggregate's double-score heap AND in the oracle's BIGINT sort
    * key), NOT smallest-by-id: a deterministic hash order is an
    * unbiased reservoir over each neighborhood, where keep-smallest-
    * by-id makes every node keep the same low-id items — the pruned
    * graph collapses to a near-clique whose distance-2 closure is
    * empty (measured: zero predictions at sf0.01 under id order, a
    * healthy candidate set under hash order). Every join is an
    * equi-join on node keys; the top-k window gets the map-side
    * WindowGroupLimit like every rank window here. The oracle replays
    * the identical pruned graph via the window formulation of the
    * hash-ordered cap.
    */
  /** The mutual-capped pruned adjacency of [[graphLinkPred]] — named
    * (rather than inlined there) so LinkPredPropertySpec can drive the
    * PRODUCTION construction with random graphs and pin the three
    * invariants the Jaccard denominator's positivity proof rests on:
    * symmetry, per-node degree ≤ nbrCap in both directions, and (via
    * [[linkPredCandidates]]) cn ≤ min(d_a, d_b).
    * Input: distinct undirected edges as (a, b) int columns. */
  def linkPredAdjacency(edges: DataFrame,
      nbrCap: Int = LinkPredNbrCap): DataFrame = {
    val sym = symmetrized(edges)
    // 52-bit edge hash: exact in the aggregate's double heap AND in
    // the oracle's BIGINT sort key (see graphLinkPred's scaladoc)
    val edgeHash = expr(
      "cast(conv(substring(md5(concat(cast(a as string), ':', " +
        "cast(b as string))), 1, 13), 16, 10) as double)")
    val capped = sym
      .groupBy(col("a").as("v"))
      .agg(graft.functions.TopKByScore
        .topkIds(-edgeHash, col("b").cast("long"), nbrCap).as("nbrs"))
      .select(col("v"), explode(col("nbrs")).as("nbr_l"))
      .select(col("v"), col("nbr_l").cast("int").as("nbr"))
    capped.join(
      capped.select(col("nbr").as("v"), col("v").as("nbr")),
      Seq("v", "nbr"), "left_semi")
  }

  /** Common-neighbor counts over a [[linkPredAdjacency]] output:
    * (a, b, cn) for every distance-2 pair, a < b. */
  def linkPredCandidates(mutual: DataFrame): DataFrame =
    mutual.as("p").join(mutual.as("q"),
        col("p.v") === col("q.v") && col("p.nbr") < col("q.nbr"))
      .groupBy(col("p.nbr").as("a"), col("q.nbr").as("b"))
      .agg(count(lit(1)).as("cn"))

  def graphLinkPred(spark: SparkSession, sfDir: String,
      cap: Int = ItemGraphCap, nbrCap: Int = LinkPredNbrCap,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = userItemPairs(cappedInteractions(spark, sfDir, cap))
      .distinct()
      .localCheckpoint() // read twice: adjacency build + anti-join
    val mutual = linkPredAdjacency(edges, nbrCap)
      .localCheckpoint() // read thrice: degrees + both hub-join sides
    val deg = mutual.groupBy("v").agg(count(lit(1)).as("d"))
    val cand = linkPredCandidates(mutual)
    val newPairs = cand.join(edges, Seq("a", "b"), "left_anti")
    val scored = newPairs
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .withColumn("jac_e6", expr("cn * 1000000L div (da + db - cn)"))
      .select("a", "b", "cn", "jac_e6")
    val symScored = scored.unionByName(scored.select(
      col("b").as("a"), col("a").as("b"), col("cn"), col("jac_e6")))
    val w = Window.partitionBy("a").orderBy(desc("jac_e6"), asc("b"))
    symScored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("a"), col("b"), col("cn"), col("jac_e6"),
        col("rnk").cast("int").as("rnk"))
      .orderBy("a", "rnk")
  }

  val graphLinkPredSql: String =
    s"""WITH ${interCappedSql(ItemGraphCap)},
       |${distinctPairsSql("edges")},
       |sym AS (
       |  SELECT a, b FROM edges
       |  UNION ALL
       |  SELECT b AS a, a AS b FROM edges),
       |adjc AS (
       |  SELECT v, nbr FROM (
       |    SELECT a AS v, b AS nbr,
       |      row_number() OVER (PARTITION BY a ORDER BY
       |        ('0x' || substr(md5(a::VARCHAR || ':' || b::VARCHAR),
       |          1, 13))::BIGINT, b) AS rn
       |    FROM sym)
       |  WHERE rn <= $LinkPredNbrCap),
       |mutual AS (
       |  SELECT c.v, c.nbr FROM adjc c
       |  JOIN adjc t ON t.v = c.nbr AND t.nbr = c.v),
       |deg AS (SELECT v, count(*)::BIGINT AS d FROM mutual GROUP BY 1),
       |cand AS (
       |  SELECT p.nbr AS a, q.nbr AS b, count(*)::BIGINT AS cn
       |  FROM mutual p JOIN mutual q
       |    ON p.v = q.v AND p.nbr < q.nbr
       |  GROUP BY 1, 2),
       |newp AS (
       |  SELECT c.a, c.b, c.cn FROM cand c
       |  LEFT JOIN edges e ON e.a = c.a AND e.b = c.b
       |  WHERE e.a IS NULL),
       |scored AS (
       |  SELECT n.a, n.b, n.cn,
       |    (n.cn * 1000000) // (da.d + db.d - n.cn) AS jac_e6
       |  FROM newp n
       |  JOIN deg da ON da.v = n.a
       |  JOIN deg db ON db.v = n.b),
       |symsc AS (
       |  SELECT a, b, cn, jac_e6 FROM scored
       |  UNION ALL
       |  SELECT b AS a, a AS b, cn, jac_e6 FROM scored),
       |ranked AS (
       |  SELECT a, b, cn, jac_e6,
       |    row_number() OVER (PARTITION BY a
       |      ORDER BY jac_e6 DESC, b) AS rnk
       |  FROM symsc)
       |SELECT a, b, cn, jac_e6, rnk::INT AS rnk
       |FROM ranked WHERE rnk <= 5
       |ORDER BY a, rnk""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(
      ("graph_linkpred", graphLinkPred(_, _), graphLinkPredSql),
      ("graph_assortativity",
        graphAssortativity(_, _), graphAssortativitySql),
      ("graph_degree_hist", graphDegreeHist(_, _), graphDegreeHistSql),
      ("graph_event_degrees", graphEventDegrees _, graphEventDegreesSql),
      ("graph_event_pagerank", graphEventPageRank _, graphEventPageRankSql),
      ("graph_item_cooccur", graphItemCooccur(_, _), graphItemCooccurSql),
      ("graph_triangle_count",
        graphTriangleCount(_, _), graphTriangleCountSql),
      ("graph_label_prop",
        graphLabelProp(_, _), graphLabelPropSql),
      ("graph_kcore", graphKcore(_, _), graphKcoreSql))
}

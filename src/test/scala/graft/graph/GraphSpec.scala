package graft.graph

import graft.SparkSuite

class GraphSpec extends SparkSuite {
  import spark.implicits._

  // two users rating two films + an isolated pair (second component),
  // mirroring the reference's 2-vertex smoke (Explorativa3.ipynb cell 2)
  private lazy val ratings = Seq(
    (1, 1, 5), (1, 2, 3), (2, 1, 4), // component A: u1,u2,f1,f2
    (3, 9, 2)) // component B: u3,f9
    .toDF("userId", "filmId", "rating")

  private lazy val g =
    BipartiteGraph.build(ratings, "userId", "filmId", "rating")

  test("bipartite build: tipo tags and id-space separation (G1)") {
    val byTipo = g.vertices.map(_._2).countByValue()
    assert(byTipo("user") == 3 && byTipo("item") == 3)
    // user id 1 and film id 1 coexist (the reference collides them)
    assert(g.vertices.filter(_._1 == 1L).count() == 1)
    assert(g.vertices.filter(_._1 == BipartiteGraph.ItemOffset + 1).count() == 1)
  }

  test("degrees: item popularity and user activity (G2)") {
    val in = BipartiteGraph.itemInDegrees(spark, g).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(in == Map(1L -> 2, 2L -> 1, 9L -> 1))
    val out = BipartiteGraph.userOutDegrees(spark, g).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 1, 3L -> 1))
  }

  test("static PageRank: most-linked film ranks first (G3)") {
    val pr = BipartiteGraph.itemPageRank(spark, g).collect()
    assert(pr.head.getLong(0) == 1L) // film 1 has two raters
    assert(pr.map(_.getDouble(1)).forall(_ > 0))
  }

  test("connected components: sizes and tipo breakdown (G4)") {
    val sizes = BipartiteGraph.componentSizes(spark, g).collect()
      .map(_.getLong(1))
    assert(sizes.toSeq == Seq(4, 2))
    val byTipo = BipartiteGraph.componentsByTipo(spark, g).collect()
    // giant component: 2 users + 2 items; dust pair: 1 user + 1 item
    val m = byTipo.map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m.values.sum == 6)
    assert(m.count { case ((_, t), n) => t == "user" && n == 2 } == 1)
  }

  test("graph degrees on testdata agree with relational counts") {
    val viaGraph = GraphOps.graphEventDegrees(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSql = graft.core.Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaGraph == viaSql)
  }
}

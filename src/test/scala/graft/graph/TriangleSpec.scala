package graft.graph

import graft.SparkSuite

/** Differential test for [[GraphOps.graphTriangleCount]]: recompute
  * the triangle census by brute-force enumeration over the same
  * capped co-occurrence edge set and compare, plus pin that the
  * degree-ordered orientation counts each triangle exactly once
  * (brute force iterates unordered node triples directly).
  */
class TriangleSpec extends SparkSuite {

  private val Cap = 32

  test("graph_triangle_count matches a brute-force driver recompute") {
    val inter: Seq[(Long, Int)] = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "cast(get_json_object(props, '$.k') as int) as item")
      .collect().filterNot(_.isNullAt(1))
      .map(r => (r.getLong(0), r.getInt(1))).distinct.toSeq

    val capped: Seq[(Long, Int)] = inter.groupBy(_._1).toSeq.flatMap {
      case (u, its) => its.map(_._2).sorted.take(Cap).map(u -> _)
    }
    val edges: Set[(Int, Int)] = capped.groupBy(_._1).toSeq
      .flatMap { case (_, its) =>
        val s = its.map(_._2).sorted
        for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
      }.toSet
    val deg: Map[Int, Long] = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val nodes = deg.keys.toSeq.sorted
    val nEdges = edges.size.toLong
    val nWedges = deg.values.map(d => d * (d - 1) / 2).sum
    // brute force: iterate unordered triples restricted to adjacency
    val adj: Map[Int, Set[Int]] = edges.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val nTri = (for {
      (a, b) <- edges.toSeq
      c <- (adj(a) intersect adj(b)) if c > b
    } yield (a, b, c)).size.toLong

    val row = GraphOps.graphTriangleCount(spark, sf0001).collect().head
    assert(row.getLong(0) == nodes.size.toLong, "n_nodes")
    assert(row.getLong(1) == nEdges, "n_edges")
    assert(row.getLong(2) == nWedges, "n_wedges")
    assert(row.getLong(3) == nTri, "n_triangles")
    assert(row.getLong(4) == 3 * nTri * 1000000L / nWedges, "gcc_e6")
    // the fixture must actually contain triangles and open wedges
    assert(nTri > 0, "fixture has no triangles")
    assert(nWedges > 3 * nTri, "fixture has no open wedges")
  }
}

package graft.graph

import graft.SparkSuite

/** Differential test for [[GraphOps.graphKcore]]: simulate the
  * bounded-round peel in plain driver-side Scala over the same capped
  * edge set and compare (item, qualifying degree) rows, plus pin that
  * peeling actually removes something and that the surviving set is
  * consistent (every survivor keeps ≥ K surviving neighbors at the
  * last recount).
  */
class KcoreSpec extends SparkSuite {

  private val Cap = 32

  test("graph_kcore matches a driver peel simulation") {
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
    val sym = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }

    var alive: Set[Int] = sym.map(_._1).toSet
    var deg: Map[Int, Long] = Map.empty
    for (_ <- 1 to GraphOps.KcoreRounds) {
      deg = sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (v, xs) => v -> xs.size.toLong }
      alive = deg.filter(_._2 >= GraphOps.KcoreK).keySet
    }
    val expected = alive.toSeq.sorted.map(v => (v, deg(v)))

    val got = GraphOps.graphKcore(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq

    assert(got == expected)
    assert(got.nonEmpty, "peel emptied the fixture graph")
    // the fixture must exercise peeling: some node dropped, and the
    // drops must cascade (round 2+ removed more than round 1 alone)
    val all = sym.map(_._1).toSet
    assert(alive.size < all.size, "no node was peeled")
    val deg1 = sym.groupBy(_._1).map { case (v, xs) => v -> xs.size }
    val afterRound1 = deg1.filter(_._2 >= GraphOps.KcoreK).keySet
    assert(alive.size < afterRound1.size,
      "peeling never cascaded past round 1")
  }
}

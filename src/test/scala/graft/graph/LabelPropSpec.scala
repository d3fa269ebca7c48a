package graft.graph

import graft.SparkSuite

/** Differential test for [[GraphOps.graphLabelProp]]: simulate the
  * synchronous seed-clamped majority propagation in plain driver-side
  * Scala over the same capped edge set and compare per-node labels.
  */
class LabelPropSpec extends SparkSuite {

  private val Cap = 32

  test("graph_label_prop matches a driver simulation") {
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
    val adj: Map[Int, Seq[Int]] = edges.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    val nodes = adj.keys.toSeq.sorted

    var labels: Map[Int, Int] =
      nodes.map(v => v -> (if (v % 7 == 0) v % 4 else -1)).toMap
    for (_ <- 1 to GraphOps.LpRounds) {
      val next = nodes.map { v =>
        if (v % 7 == 0) v -> (v % 4)
        else {
          val votes = adj(v).map(labels).filter(_ >= 0)
          if (votes.isEmpty) v -> labels(v)
          else {
            val m = votes.groupBy(identity).toSeq
              .map { case (l, xs) => (l, xs.size) }
              .minBy { case (l, c) => (-c, l) }
            v -> m._1
          }
        }
      }.toMap
      labels = next
    }
    val expected = nodes.map(v => (v, labels(v)))

    val got = GraphOps.graphLabelProp(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq

    assert(got == expected)
    // the fixture must exercise real propagation: some non-seed node
    // ends labeled, and some node stays unlabeled after LpRounds
    assert(expected.exists(t => t._1 % 7 != 0 && t._2 >= 0))
    assert(expected.count(_._2 >= 0) > expected.count(t => t._1 % 7 == 0))
  }
}

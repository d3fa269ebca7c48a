package graft.graph

import graft.SparkSuite

/** Differential test for [[GraphOps.graphItemCooccur]]: recompute the
  * capped item2item Jaccard neighborhood in plain driver-side Scala —
  * distinct interactions, keep-smallest degree cap, pair co-counts,
  * fixed-point Jaccard, top-k with the (jac desc, b asc) tie-break —
  * and compare row-for-row.
  */
class ItemCooccurSpec extends SparkSuite {

  private val Cap = 32
  private val K = 5

  test("graph_item_cooccur matches a driver recompute") {
    val inter: Seq[(Long, Int)] = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "cast(get_json_object(props, '$.k') as int) as item")
      .collect().filterNot(_.isNullAt(1))
      .map(r => (r.getLong(0), r.getInt(1))).distinct.toSeq

    val capped: Seq[(Long, Int)] = inter.groupBy(_._1).toSeq.flatMap {
      case (u, its) => its.map(_._2).sorted.take(Cap).map(u -> _)
    }
    val deg: Map[Int, Long] =
      capped.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
    val co: Map[(Int, Int), Long] = capped.groupBy(_._1).toSeq
      .flatMap { case (_, its) =>
        val s = its.map(_._2).sorted
        for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val sym = co.toSeq.flatMap { case ((a, b), n) =>
      Seq((a, b, n), (b, a, n))
    }
    val expected = sym.groupBy(_._1).toSeq.flatMap { case (a, ns) =>
      ns.map { case (_, b, n) =>
        (a, b, n, n * 1000000L / (deg(a) + deg(b) - n))
      }.sortBy { case (_, b, _, j) => (-j, b) }
        .take(K).zipWithIndex
        .map { case ((aa, b, n, j), i) => (aa, b, n, j, i + 1) }
    }.sortBy(t => (t._1, t._5))

    val got = GraphOps.graphItemCooccur(spark, sf0001).collect().map { r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))
    }.toSeq

    assert(got == expected)
    // the fixture must exercise the degree cap (some user over Cap items)
    assert(inter.groupBy(_._1).exists(_._2.size > Cap),
      "no user exceeds the degree cap in the fixture")
    assert(got.nonEmpty && got.forall(t => t._4 >= 0 && t._4 <= 1000000L))
  }
}

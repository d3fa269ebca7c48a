package graft.graph

import graft.SparkSuite

/** Differential test for [[GraphOps.graphLinkPred]]: recompute the
  * mutual-cap pruned graph and the common-neighbor Jaccard prediction
  * in plain driver-side Scala — distinct interactions, per-user cap,
  * distinct item pairs, per-node keep-smallest neighbor cap, MUTUAL
  * pruning, shared-hub counts, anti-join against existing edges,
  * Jaccard with the (desc, id) tie-break, top-5 — and compare
  * row-for-row.
  */
class LinkPredSpec extends SparkSuite {

  private val Cap = 32
  private val NbrCap = 16
  private val K = 5

  private val md = java.security.MessageDigest.getInstance("MD5")
  private def edgeHash(a: Int, b: Int): Long = md.synchronized {
    md.reset()
    val hex = md.digest(s"$a:$b".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  test("graph_linkpred matches a driver recompute at sf0.001") {
    val inter: Seq[(Long, Int)] = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id",
        "cast(get_json_object(props, '$.k') as int) as item")
      .collect().filterNot(_.isNullAt(1))
      .map(r => (r.getLong(0), r.getInt(1))).distinct.toSeq
    val capped: Seq[(Long, Int)] = inter.groupBy(_._1).toSeq.flatMap {
      case (u, its) => its.map(_._2).sorted.take(Cap).map(u -> _)
    }
    val edges: Set[(Int, Int)] = capped.groupBy(_._1).toSeq.flatMap {
      case (_, its) =>
        val s = its.map(_._2).sorted
        for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
    }.toSet
    val adj: Map[Int, Set[Int]] = edges.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1)
      .map { case (v, ns) =>
        // hash-ordered cap: smallest 52-bit edge hash, id tiebreak
        v -> ns.map(_._2).distinct
          .sortBy(n => (edgeHash(v, n), n)).take(NbrCap).toSet
      }
    val mutual: Map[Int, Set[Int]] = adj.map { case (v, ns) =>
      v -> ns.filter(n => adj.getOrElse(n, Set.empty).contains(v))
    }
    val nodes = mutual.keys.toSeq.sorted
    val candScores = (for {
      x <- nodes
      ns = mutual(x).toSeq.sorted
      i <- ns.indices; j <- i + 1 until ns.size
    } yield (ns(i), ns(j)))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filterNot { case ((a, b), _) => edges.contains((a, b)) }
      .map { case ((a, b), cn) =>
        val da = mutual(a).size.toLong
        val db = mutual(b).size.toLong
        (a, b, cn, cn * 1000000L / (da + db - cn))
      }.toSeq
    val expected = candScores
      .flatMap { case (a, b, cn, j) => Seq((a, b, cn, j), (b, a, cn, j)) }
      .groupBy(_._1).toSeq.flatMap { case (a, ns) =>
        ns.sortBy { case (_, b, _, j) => (-j, b) }.take(K).zipWithIndex
          .map { case ((aa, b, cn, j), i) => (aa, b, cn, j, i + 1) }
      }.sortBy(t => (t._1, t._5))

    val got = GraphOps.graphLinkPred(spark, sf0001).collect().map { r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))
    }.toSeq

    assert(got == expected)
    assert(got.nonEmpty, "fixture must produce predicted edges")
    // every prediction must be a genuinely NEW edge
    assert(got.forall { case (a, b, _, _, _) =>
      !edges.contains(if (a < b) (a, b) else (b, a))
    })
  }
}

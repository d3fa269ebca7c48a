package graft.graph

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Generative property spec for [[GraphOps.linkPredAdjacency]]
  * (r16 verdict #7): the operator doc records the hash-cap reservoir's
  * unbiasedness as a measurement, but the three invariants the Jaccard
  * denominator's positivity proof rests on were only end-to-end
  * differential-pinned (LinkPredSpec). Over random graphs, the
  * PRODUCTION mutual-capped adjacency must satisfy:
  *
  *   1. symmetry — (v, n) present iff (n, v) present (this is what
  *      makes shared-hub counts equal |N(a) ∩ N(b)| exactly);
  *   2. per-node degree ≤ nbrCap in BOTH directions (the crawler-proof
  *      bound: candidates ≤ |nodes|·nbrCap²);
  *   3. cn ≤ min(d_a, d_b) for every candidate pair (so the union
  *      denominator d_a + d_b − cn ≥ max(d_a, d_b) > 0).
  *
  * Seeds are fixed — same graphs every run; "random" buys shape
  * diversity (sparse, dense-hub, near-clique), not flakiness.
  */
class LinkPredPropertySpec extends SparkSuite {
  import spark.implicits._

  /** Random distinct undirected (a, b) edge list, a != b, with a
    * designated hub node drawing extra edges — the shape the mutual
    * cap exists to tame. */
  private def randomEdges(seed: Long, nNodes: Int, nEdges: Int,
      hubBias: Double): Seq[(Int, Int)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nEdges).flatMap { _ =>
      val a = if (rnd.nextDouble() < hubBias) 0 else rnd.nextInt(nNodes)
      val b = rnd.nextInt(nNodes)
      if (a == b) None
      else Some((math.min(a, b), math.max(a, b)))
    }.distinct
  }

  test("mutual-capped adjacency: symmetric, degree <= nbrCap both ways") {
    val shapes = Seq(
      (1L, 40, 120, 0.0),  // sparse uniform
      (2L, 30, 250, 0.5),  // half the edges touch the hub
      (3L, 12, 66, 0.0),   // dense, near-complete
      (4L, 60, 60, 0.9))   // extreme crawler-magnet hub
    for ((seed, n, e, bias) <- shapes; nbrCap <- Seq(3, 16)) {
      val edges = randomEdges(seed, n, e, bias).toDF("a", "b")
      val mutual = GraphOps.linkPredAdjacency(edges, nbrCap)
        .localCheckpoint()
      val adj = mutual.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val label = s"seed=$seed nbrCap=$nbrCap"
      // 1. symmetry
      assert(adj.forall { case (v, nb) => adj.contains((nb, v)) },
        s"$label: asymmetric pair in mutual adjacency")
      // no self-loops ever survive
      assert(adj.forall { case (v, nb) => v != nb }, s"$label: self-loop")
      // 2. both-direction degree bound (symmetry makes out = in, but
      // assert both independently — that IS the claim under test)
      val outDeg = adj.groupBy(_._1).map(_._2.size)
      val inDeg = adj.groupBy(_._2).map(_._2.size)
      assert(outDeg.forall(_ <= nbrCap), s"$label: out-degree > $nbrCap")
      assert(inDeg.forall(_ <= nbrCap), s"$label: in-degree > $nbrCap")
      // the prune only removes edges, never invents them
      val orig = edges.collect()
        .flatMap(r => Seq((r.getInt(0), r.getInt(1)),
          (r.getInt(1), r.getInt(0)))).toSet
      assert(adj.subsetOf(orig), s"$label: invented edge")
    }
  }

  test("candidates: cn <= min(d_a, d_b) keeps the denominator positive") {
    for ((seed, n, e, bias) <- Seq((5L, 40, 200, 0.3), (6L, 25, 150, 0.0));
         nbrCap <- Seq(4, 16)) {
      val edges = randomEdges(seed, n, e, bias).toDF("a", "b")
      val mutual = GraphOps.linkPredAdjacency(edges, nbrCap)
        .localCheckpoint()
      val deg = mutual.collect().map(_.getInt(0))
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val cand = GraphOps.linkPredCandidates(mutual).collect()
      assert(cand.nonEmpty, s"seed=$seed: degenerate trial, no candidates")
      for (r <- cand) {
        val (a, b, cn) = (r.getInt(0), r.getInt(1), r.getLong(2))
        val (da, db) = (deg(a), deg(b))
        assert(cn <= math.min(da, db),
          s"seed=$seed nbrCap=$nbrCap: cn=$cn > min($da, $db) at ($a, $b)")
        assert(da + db - cn > 0)
      }
    }
  }
}

package graft.sim

import graft.SparkSuite

/** Invariant checks for emb_diversity_prune against its own
  * assignment: exact keep quota per cluster, and kept vectors
  * dominate dropped ones by distance.
  */
class DiversityPruneSpec extends SparkSuite {

  test("keeps exactly the farthest ceil(n/2) per cluster") {
    val assigned = KMeansOps.kmeansAssign(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kept = KMeansOps.diversityPrune(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))

    val byCluster = assigned.groupBy(_._2)
    // quota: ceil(n/2) rows per cluster, n_cluster echoed correctly
    byCluster.foreach { case (c, members) =>
      val k = kept.filter(_._2 == c)
      assert(k.length == (members.length + 1) / 2, s"quota in cluster $c")
      k.foreach(r => assert(r._5 == members.length.toLong))
    }
    // dominance: every kept (dist, id) sorts before every dropped one
    // under the (dist desc, id asc) rank order
    val keptIds = kept.map(_._1).toSet
    byCluster.foreach { case (c, members) =>
      val ordered = members.sortBy { case (id, _, d) => (-d, id) }
      val splitAt = (members.length + 1) / 2
      assert(ordered.take(splitAt).forall(m => keptIds(m._1)),
        s"cluster $c kept set is not the rank prefix")
      assert(ordered.drop(splitAt).forall(m => !keptIds(m._1)),
        s"cluster $c dropped a rank-prefix member")
    }
    // assignment consistency with the shared kmeans op
    val distOf = assigned.map(a => a._1 -> (a._2, a._3)).toMap
    kept.foreach { r =>
      assert(distOf(r._1) == ((r._2, r._3)), s"assignment for ${r._1}")
    }
  }
}

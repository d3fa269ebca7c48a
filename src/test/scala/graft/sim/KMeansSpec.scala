package graft.sim

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential tests for the Lloyd's iteration (float means are not
  * oracle-hashable, so the distributed update is checked against an
  * independent driver-side implementation on the same data).
  */
class KMeansSpec extends SparkSuite {

  private lazy val vecs: Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr("cast(embedding as array<double>)"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Plain Scala Lloyd's with the same tie rule (lowest centroid id). */
  private def driverLloyd(k: Int, iters: Int): Seq[(Int, Long, Array[Double])] = {
    var cents = vecs.take(k).zipWithIndex.map { case ((_, v), i) => (i, v) }
    var counts = Map.empty[Int, Long]
    for (_ <- 1 to iters) {
      val assigned = vecs.map { case (_, v) =>
        (cents.minBy { case (cid, c) => (l2sq(v, c), cid) }._1, v)
      }
      val grouped = assigned.groupBy(_._1)
      cents = cents.map { case (cid, old) =>
        grouped.get(cid) match {
          case Some(members) =>
            val dim = old.length
            val sums = new Array[Double](dim)
            members.foreach { case (_, v) =>
              var i = 0; while (i < dim) { sums(i) += v(i); i += 1 }
            }
            (cid, sums.map(_ / members.length))
          case None => (cid, old)
        }
      }
      counts = cents.map(_._1).map(cid =>
        cid -> grouped.get(cid).map(_.length.toLong).getOrElse(0L)).toMap
    }
    cents.map { case (cid, c) => (cid, counts.getOrElse(cid, 0L), c) }
  }

  test("distributed Lloyd's matches a driver implementation to 1e-9") {
    val points = Tables.embeddings(spark, sf0001)
    val dist = KMeansOps.lloyd(spark, points, k = 4, iters = 3)
      .sortBy(_._1)
    val ref = driverLloyd(k = 4, iters = 3)

    assert(dist.map(_._1) == ref.map(_._1))
    assert(dist.map(_._2) == ref.map(_._2), "cluster sizes diverge")
    dist.zip(ref).foreach { case ((_, _, dv), (_, _, rv)) =>
      dv.zip(rv).foreach { case (d, r) =>
        // distributed sums reduce in a different order: tolerance, not
        // equality — 1e-9 on unit-scale coordinates is ~1000 ulps
        assert(math.abs(d - r) < 1e-9, s"centroid coord $d vs $r")
      }
    }
  }

  test("iterating strictly decreases (or holds) total within-cluster cost") {
    val points = Tables.embeddings(spark, sf0001)
    def cost(cents: Seq[(Int, Long, Array[Double])]): Double =
      vecs.map { case (_, v) =>
        cents.map { case (_, _, c) => l2sq(v, c) }.min
      }.sum
    val c1 = KMeansOps.lloyd(spark, points, k = 4, iters = 1)
    val c3 = KMeansOps.lloyd(spark, points, k = 4, iters = 3)
    assert(cost(c3) <= cost(c1) + 1e-9)
  }

  test("kmeans assignment covers every vector exactly once") {
    val out = KMeansOps.kmeansAssign(spark, sf0001).collect()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(out.length == n)
    assert(out.map(_.getLong(0)).distinct.length == n)
    // seed vectors are their own nearest centroid at distance 0
    out.filter(_.getLong(0) < 4).foreach { r =>
      assert(r.getLong(1) == r.getLong(0) && r.getLong(2) == 0L)
    }
  }
}

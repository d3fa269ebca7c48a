package graft.sim

import graft.SparkSuite
import graft.core.Tables

/** Differential check for emb_medoid: the whole selection re-derived on
  * the driver (grid snap, half-up centroid, int64 distances, (dist,
  * vec_id) argmin) — exact equality, no float tolerance.
  */
class MedoidSpec extends SparkSuite {

  private def fdiv(a: BigInt, n: BigInt): BigInt = (a - a.mod(n)) / n

  test("medoids match a driver-side recomputation exactly") {
    val rows = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "cast(embedding as array<double>)")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).map(x => math.floor(x * 10000d + 0.5d).toLong)
          .toArray))

    val byLabel = rows.groupBy(_._2)
    val expect = byLabel.map { case (label, vs) =>
      val n = vs.length
      val dims = vs.head._3.length
      val cent = (0 until dims).map { d =>
        val s = vs.map(v => BigInt(v._3(d))).sum
        fdiv(s + n / 2, n).toLong
      }.toArray
      val dists = vs.map { case (id, _, q) =>
        (id, q.zip(cent).map { case (x, c) =>
          val dlt = x - c; dlt * dlt
        }.sum)
      }
      val (mid, mdist) = dists.minBy { case (id, dist) => (dist, id) }
      val sum = dists.map(d => BigInt(d._2)).sum
      label -> (mid, mdist, n.toLong, fdiv(sum, n).toLong)
    }

    val got = SimilarityOps.embMedoid(spark, sf0001).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (l, v) => assert(v == expect(l), s"label $l") }

    // structural: the medoid is a member of its label, and no less
    // central than the cluster average
    got.foreach { case (l, (mid, mdist, _, meanDist)) =>
      assert(byLabel(l).exists(_._1 == mid))
      assert(mdist <= meanDist)
    }
  }
}

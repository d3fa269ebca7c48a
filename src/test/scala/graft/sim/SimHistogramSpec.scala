package graft.sim

import graft.SparkSuite

/** Differential test for [[SimilarityOps.embSimHistogram]]: recompute
  * every pair's e4-quantized dot/norms and the IEEE bucket formula on
  * the driver (same mul/sqrt/div order), and pin the histogram
  * invariants (counts sum to panel·(panel−1)/2; ppm sums to ~1e6).
  */
class SimHistogramSpec extends SparkSuite {

  test("emb_sim_histogram matches a driver pair recompute") {
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .filter(s"vec_id < ${SimilarityOps.SimHistPanel}")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 10000d + 0.5d).toLong).toArray))
      .map { case (id, q) => (id, q, q.map(x => x * x).sum) }
      .filter(_._3 > 0)
      .sortBy(_._1)
    val buckets = for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
    } yield {
      val dot = vecs(i)._2.zip(vecs(j)._2).map { case (a, b) => a * b }.sum
      val b = math.floor(
        dot.toDouble * 10.0 /
          math.sqrt(vecs(i)._3.toDouble * vecs(j)._3.toDouble)).toLong + 10
      math.max(0L, math.min(19L, b))
    }
    val hist = buckets.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = buckets.size.toLong
    val expected = (0L until 20L).map(b =>
      (b, hist.getOrElse(b, 0L),
        hist.getOrElse(b, 0L) * 1000000L / tot)).toSeq
    val got = SimilarityOps.embSimHistogram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == tot)
    val ppm = got.map(_._3).sum
    assert(ppm > 999900 && ppm <= 1000000, s"ppm sum $ppm")
  }
}

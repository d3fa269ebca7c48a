package graft.multimodal

import graft.SparkSuite

/** Differential test for [[MultimodalOps.mmPhashDedup]]: recompute the
  * aHash from the variant-raster ARITHMETIC (no codec) and the banded
  * candidate screen + hamming verify in driver-side Scala, and compare
  * pair-for-pair — pinning that the real PNG encode→decode roundtrip
  * is lossless AND the LSH screen matches its contract (every pair
  * within hamming 3 is guaranteed recalled by pigeonhole).
  */
class PhashSpec extends SparkSuite {

  private def ahash(id: Long): (Int, Int, Long, Long) = {
    val (w, h) = MultimodalOps.synthDims(id / MultimodalOps.PhashGroup)
    val cellSum = new Array[Long](64)
    val cellPx = new Array[Long](64)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val c = (y * 8 / h) * 8 + x * 8 / w
      val v = MultimodalOps.synthVariantPixel(id, x, y).toLong
      cellSum(c) += v; cellPx(c) += 1; total += v
    }
    var hi = 0L; var lo = 0L
    for (c <- 0 until 64)
      if (cellSum(c) * (w.toLong * h) > total * cellPx(c)) {
        if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
      }
    (w, h, hi, lo)
  }

  test("mm_phash_dedup matches a codec-free driver recompute") {
    val ids = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val hs = ids.map(id => id -> ahash(id)).toMap
    def bands(hi: Long, lo: Long): Set[(Int, Long)] = Set(
      0 -> lo % 65536L, 1 -> lo / 65536L,
      2 -> hi % 65536L, 3 -> hi / 65536L)
    def hamming(a: (Int, Int, Long, Long), b: (Int, Int, Long, Long)) =
      java.lang.Long.bitCount(a._3 ^ b._3) +
        java.lang.Long.bitCount(a._4 ^ b._4)

    val expected = (for {
      i <- ids.indices; j <- i + 1 until ids.length
      a = hs(ids(i)); b = hs(ids(j))
      if a._1 == b._1 && a._2 == b._2
      if (bands(a._3, a._4) intersect bands(b._3, b._4)).nonEmpty
      hd = hamming(a, b) if hd <= MultimodalOps.PhashHamMax
    } yield (ids(i), ids(j), hd)).sorted

    val got = MultimodalOps.mmPhashDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no near-dup pairs")
    // pigeonhole recall: every same-dims pair within hamming 3 is found
    val guaranteed = for {
      i <- ids.indices; j <- i + 1 until ids.length
      a = hs(ids(i)); b = hs(ids(j))
      if a._1 == b._1 && a._2 == b._2 && hamming(a, b) <= 3
    } yield (ids(i), ids(j))
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    assert(guaranteed.forall(gotPairs.contains), "pigeonhole recall broken")
    // brightness variants of one base raster must dominate the pairs
    assert(got.count(t =>
      t._1 / MultimodalOps.PhashGroup == t._2 / MultimodalOps.PhashGroup)
      >= got.length / 2)
  }
}

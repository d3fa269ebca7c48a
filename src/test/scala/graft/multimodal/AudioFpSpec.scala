package graft.multimodal

import graft.SparkSuite

/** Differential test for [[MultimodalOps.mmAudioFingerprint]]:
  * recompute the fingerprint from the gain-variant sample ARITHMETIC
  * (no codec) and an exact all-pairs hamming scan in driver-side
  * Scala, and compare pair-for-pair — pinning that the WAV roundtrip
  * is lossless AND that the double-sided 1-bit probe join equals the
  * exact hamming ≤ 2 join (its multi-index-hashing guarantee).
  */
class AudioFpSpec extends SparkSuite {

  private def fingerprint(id: Long): (Int, Long) = {
    val samples = MultimodalOps.audioFpVariant(id)
    val n = samples.length
    val e = new Array[Long](MultimodalOps.AudioFpWindows)
    for (i <- 0 until n) {
      val v = samples(i).toLong
      e(i * MultimodalOps.AudioFpWindows / n) += v * v
    }
    var fp = 0L
    for (w <- 0 until MultimodalOps.AudioFpWindows)
      if (e(w) > e((w + 1) % MultimodalOps.AudioFpWindows)) fp |= 1L << w
    (n, fp)
  }

  test("mm_audio_fingerprint equals the exact hamming<=2 pair join") {
    val ids = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val fps = ids.map(id => id -> fingerprint(id)).toMap

    // EXACT all-pairs scan — no probe screen; the op must equal this
    val expected = (for {
      i <- ids.indices; j <- i + 1 until ids.length
      (na, fa) = fps(ids(i)); (nb, fb) = fps(ids(j))
      if na == nb
      hd = java.lang.Long.bitCount(fa ^ fb)
      if hd <= MultimodalOps.AudioFpHamMax
    } yield (ids(i), ids(j), hd)).sorted

    val got = MultimodalOps.mmAudioFingerprint(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no near-dup pairs")
    // gain variants of one base track must be what the op finds
    assert(got.forall(t =>
      t._1 / MultimodalOps.PhashGroup == t._2 / MultimodalOps.PhashGroup))
    // hamming 0 (pure gain, no clip divergence) and >0 (clipping)
    // must both occur, or the gain-invariance story is untested
    assert(got.exists(_._3 == 0) && got.exists(_._3 > 0))
  }
}

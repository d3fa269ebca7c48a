package graft.text

import graft.SparkSuite

/** Checks for text_ppl_bucket: the decile census re-derived on the
  * driver from the (already oracle-verified) textBigramLm scores, plus
  * the structural invariants of a rank bucketing.
  */
class TextPplBucketSpec extends SparkSuite {

  test("decile census matches a driver recompute from the LM scores") {
    val scores = TextOps.textBigramLm(spark, sf0001).collect()
      .map(r => (r.getLong(2), r.getLong(1))) // (nll_e4, n_bigrams)
    val n = scores.length.toLong
    val cntByScore = scores.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum)
    }.toMap
    val sorted = cntByScore.toSeq.sortBy(_._1)
    val expect = sorted.scanLeft((0L, 0L, (0L, 0L))) {
      case ((cum, _, _), (score, (c, tok))) => (cum + c, score, (c, tok))
    }.drop(1).map { case (cumIncl, score, (c, tok)) =>
      val decile = (cumIncl - c) * 10 / n + 1
      (decile, score, c, tok)
    }.groupBy(_._1).view.mapValues { g =>
      (g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max, g.map(_._4).sum)
    }.toMap

    val got = TextOps.textPplBucket(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect, s"got $got\nexpect $expect")

    // structural invariants: deciles are 1..10 (every band non-empty on
    // this corpus), bands tile the score axis in order without overlap,
    // and the censuses sum back to the corpus totals
    assert(got.keySet == (1L to 10L).toSet)
    (1L to 9L).foreach { d =>
      assert(got(d)._3 < got(d + 1)._2, s"bands $d/${d + 1} overlap")
    }
    assert(got.values.map(_._1).sum == n)
    assert(got.values.map(_._4).sum == scores.map(_._2).sum)
  }
}

package graft.sim

import graft.SparkSuite

/** Invariants for [[SimilarityOps.annNprobeCurve]]: recall and cost
  * are monotone in probe depth, and the curve's nprobe=4 point equals
  * the pooled recall of [[SimilarityOps.annRecallAudit]] (which
  * audits exactly the nProbe=4 index) — the two artifacts can never
  * tell different stories about the same index.
  */
class NprobeCurveSpec extends SparkSuite {

  test("curve is monotone and agrees with the recall audit at p=4") {
    val curve = SimilarityOps.annNprobeCurve(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(curve.map(_._1) == Seq(1L, 2L, 4L, 8L))
    // recall and candidate cost both non-decreasing in probe depth
    assert(curve.map(_._3) == curve.map(_._3).sorted, s"hits: $curve")
    assert(curve.map(_._5) == curve.map(_._5).sorted, s"cost: $curve")
    assert(curve.forall { case (_, nTrue, nHit, recallE4, cand, spq) =>
      nHit <= nTrue && recallE4 == (nHit * 10000L + nTrue / 2) / nTrue &&
        spq == cand / 20
    })
    val audit = SimilarityOps.annRecallAudit(spark, sf001).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val pooled = audit.map(_._2).sum
    val p4 = curve.find(_._1 == 4L).get
    assert(p4._3 == pooled,
      s"curve p=4 hits ${p4._3} != audit pooled $pooled")
  }
}

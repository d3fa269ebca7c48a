package graft.sim

import graft.SparkSuite

/** Differential test for [[SimilarityOps.annRecallAudit]]: recompute
  * per-query recall on the driver from the two constituent ops' own
  * outputs, and pin the audit invariants (recall ∈ [0,1], every brute
  * query audited, the IVF index actually recovers most neighbors on
  * the fixture).
  */
class RecallAuditSpec extends SparkSuite {

  test("ann_recall_audit matches a driver recompute of recall@k") {
    val truth = SimilarityOps.annBruteTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val approx = SimilarityOps.annIvfTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = truth.groupBy(_._1).toSeq.map { case (qid, ns) =>
      val hit = ns.count(approx.contains)
      (qid, ns.length.toLong, hit.toLong,
        (hit * 10000L + ns.length / 2) / ns.length)
    }.sortBy(_._1)

    val got = SimilarityOps.annRecallAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    assert(got == expected)
    assert(got.nonEmpty && got.forall(t => t._4 >= 0 && t._4 <= 10000))
    // the probe fixture should recover most true neighbors on average
    val mean = got.map(_._4).sum.toDouble / got.length
    assert(mean >= 5000.0, s"mean recall@5 ${mean / 10000} suspiciously low")
  }
}

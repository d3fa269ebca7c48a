package graft.text

import graft.SparkSuite

/** Checks for text_quality_ensemble: the combiner re-derived on the
  * driver from the three (independently oracle-verified) member
  * queries, plus the gate's structural invariants.
  */
class TextEnsembleSpec extends SparkSuite {

  test("ensemble equals the weighted combination of its member queries") {
    val q = TextOps.textQuality(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap // quality_e4
    val e = TextOps.textEntropy(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // entropy_e4
    val rep = TextOps.textRepetition(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // dup2_e4

    val got = TextOps.textQualityEnsemble(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))
      .toMap
    assert(got.keySet == q.keySet.intersect(e.keySet) && got.nonEmpty)
    got.foreach { case (id, (qv, ev, dv, ens, keep)) =>
      assert(qv == q(id) && ev == e(id) && dv == rep.getOrElse(id, 0L),
        s"member drift at doc $id")
      val expect = (4 * qv + 3 * (math.min(ev, 20000L) / 2) +
        3 * (10000L - math.min(dv, 10000L))) / 10
      assert(ens == expect, s"combiner at doc $id")
      assert(ens >= 0L && ens <= 10000L, s"range at doc $id")
      assert(keep == (ens >= 7000L))
    }
    // the gate must actually separate: some kept, some dropped
    val kept = got.values.count(_._5)
    assert(kept > 0 && kept < got.size, s"degenerate gate: $kept/${got.size}")
  }
}

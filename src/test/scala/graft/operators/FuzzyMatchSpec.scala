package graft.operators

import graft.SparkSuite
import graft.core.Tables

/** Differential check for q60_fuzzy_match: the length-band blocking
  * must lose NO pair — compare against an unblocked all-pairs
  * Levenshtein sweep on the driver. (The oracle can't catch a blocking
  * bug because its SQL also bands; this sweep doesn't.)
  */
class FuzzyMatchSpec extends SparkSuite {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("banded join finds exactly the all-pairs result") {
    val names = Tables.part(spark, sf001)
      .select("p_name").collect().map(_.getString(0))
    val cnt = names.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val distinct = cnt.keys.toSeq.sorted
    val want = (for {
      a <- distinct; b <- distinct if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).sorted

    val got = AnalyticsOps.q60FuzzyMatch(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))

    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want,
      "pair set differs from unblocked all-pairs sweep")
    got.foreach { case (a, b, _, ca, cb) =>
      assert(ca == cnt(a) && cb == cnt(b), s"counts for ($a,$b)")
    }
    assert(want.nonEmpty, "degenerate fixture: no fuzzy pairs")
  }
}

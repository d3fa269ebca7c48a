package graft.operators

import graft.SparkSuite
import graft.core.Tables

/** Differential check for stat_skew_audit: top-10 heavy hitters, ppm
  * shares, and the global columns against a driver-side recount.
  */
class SkewAuditSpec extends SparkSuite {

  test("top-10 keys, shares, and globals match a brute recount") {
    val keys = Tables.lineitem(spark, sf001)
      .select("l_partkey").collect().map(_.getLong(0))
    val counts = keys.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val total = keys.length.toLong
    val top10 = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)

    val got = StatsOps.statSkewAudit(spark, sf001).collect()
    assert(got.length == 10)
    got.zip(top10).foreach { case (r, (k, c)) =>
      assert(r.getLong(0) == k && r.getLong(1) == c,
        s"rank mismatch at key $k")
      assert(r.getLong(2) == c * 1000000L / total, s"ppm at key $k")
      assert(r.getLong(3) == total && r.getLong(4) == counts.size.toLong &&
        r.getLong(5) == counts.values.max, s"globals at key $k")
    }
  }
}

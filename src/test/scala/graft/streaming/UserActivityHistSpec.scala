package graft.streaming

import graft.SparkSuite

/** Differential test for [[EventWindows.userActivityHist]]: recompute
  * the per-user counts and bit-length buckets on the driver, and pin
  * the census identities (users sum to the distinct-user count, event
  * mass sums to the corpus row count, bucket ranges are powers of
  * two).
  */
class UserActivityHistSpec extends SparkSuite {

  test("ev_user_activity_hist matches a driver recompute") {
    val users = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id").collect().map(_.getLong(0))
    val counts = users.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.values
      .groupBy(n => (64 - java.lang.Long.numberOfLeadingZeros(n)).toInt)
      .toSeq
      .map { case (b, ns) => (b, ns.size.toLong, ns.min, ns.max, ns.sum) }
      .sortBy(_._1)
    val got = EventWindows.userActivityHist(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == counts.size.toLong)
    assert(got.map(_._5).sum == users.length.toLong)
    got.foreach { case (b, _, lo, hi, _) =>
      assert(lo >= (1L << (b - 1)) && hi < (1L << b))
    }
  }
}

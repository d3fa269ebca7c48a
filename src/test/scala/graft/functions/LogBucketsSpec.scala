package graft.functions

import graft.SparkSuite

/** Unit pins for the shared log-bucket census idiom (r14 verdict #5 /
  * advice #1): the clamp makes negatives land in bucket 0 instead of
  * engine-divergent two's-complement buckets, the money bucket is
  * strictly monotone, and the census stays inside its documented
  * <1,920-bucket bound over the full non-negative int64 range.
  */
class LogBucketsSpec extends SparkSuite {

  private def buckets(xs: Seq[Long]): Seq[Long] = {
    import spark.implicits._
    xs.toDF("x")
      .selectExpr(LogBuckets.moneyExpr("x") + " as b")
      .collect().map(_.getLong(0)).toSeq
  }

  test("negative and zero totals clamp to bucket 0 (refund-heavy user)") {
    assert(buckets(Seq(-1L, Long.MinValue, -123456789L, 0L))
      .forall(_ == 0L))
  }

  test("money bucket is monotone and within the <1,920 bound") {
    val xs = Seq(0L, 1L, 2L, 31L, 32L, 33L, 63L, 64L, 1000L, 99999L,
      123456789L, Long.MaxValue / 2, Long.MaxValue)
    val bs = buckets(xs)
    assert(bs == bs.sorted, s"not monotone: ${xs.zip(bs)}")
    // values below 32 are their own bucket (exact small-spender cents)
    assert(buckets(Seq(17L)).head == 17L)
    assert(bs.last < 1920L)
  }

  test("bit-length bucket matches floor(log2)+1 for positive counts") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, Long.MaxValue)
    val got = xs.toDF("n")
      .selectExpr(LogBuckets.bitLenExpr("n") + " as b")
      .collect().map(_.getInt(0)).toSeq
    val want = xs.map(n => 64 - java.lang.Long.numberOfLeadingZeros(n))
    assert(got == want)
  }
}

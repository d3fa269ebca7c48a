package graft.streaming

import graft.SparkSuite

/** Differential test for [[EventWindows.rfm]]: recompute the per-user
  * RFM values, the census-derived quartile thresholds, the 1-4
  * scores, and the segment rollup in plain driver-side Scala and
  * compare, plus pin the segmentation invariants (segment user counts
  * sum to the purchasing-user population; each score dimension
  * actually spreads across ≥2 distinct values on the fixture).
  */
class RfmSpec extends SparkSuite {

  test("ev_rfm matches a driver recompute") {
    val dayUs = 86400L * 1000000L
    val ev = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_type", "user_id", "unix_micros(ts) as us",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nowUs = ev.map(_._3).max
    // log-scale monetary bucket (r13 #2): MSB position × 32 + top-5-bit
    // mantissa — strictly monotone, ≤ 32·59+31 buckets for ANY spend
    def mBucket(m: Long): Long = {
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(m)
      val shift = math.max(bits - 5, 0)
      shift.toLong * 32 + (m >> shift)
    }
    val users = ev.filter(_._1 == "purchase").groupBy(_._2).map {
      case (u, xs) =>
        val f = xs.length.toLong
        val m = xs.map(_._4).sum
        val r = (nowUs - xs.map(_._3).max) / dayUs
        (u, f, m, mBucket(m), r)
    }.toSeq
    // domain-boundedness: the census cap holds at the adversarial max
    assert(mBucket(Long.MaxValue) < 1920)
    // strict monotonicity of the bucketing across octave boundaries
    val probes = Seq(0L, 1L, 15L, 31L, 32L, 33L, 63L, 64L, 1L << 20,
      (1L << 20) + 1, Long.MaxValue - 1, Long.MaxValue)
    probes.sliding(2).foreach { case Seq(a, b) =>
      assert(mBucket(a) <= mBucket(b), s"bucket not monotone at $a,$b")
    }
    val n = users.length.toLong
    def ths(vals: Seq[Long]): Seq[Long] = {
      val census = vals.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      (1 to 3).map { k =>
        val need = (k * n + 3) / 4
        var cum = 0L
        census.find { case (_, c) => cum += c; cum >= need }.get._1
      }
    }
    val (rt, ft, mt) =
      (ths(users.map(_._5)), ths(users.map(_._2)), ths(users.map(_._4)))
    def up(v: Long, t: Seq[Long]) = 1 + t.count(v >= _)
    val segments = users.map { case (_, f, m, mb, r) =>
      ((4 - rt.count(r >= _), up(f, ft), up(mb, mt)), m)
    }
    val expected = segments.groupBy(_._1).toSeq.map {
      case ((rs, fs, ms), xs) =>
        (rs, fs, ms, xs.length.toLong, xs.map(_._2).sum)
    }.sortBy(t => (t._1, t._2, t._3))

    val got = EventWindows.rfm(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4))).toSeq

    assert(got == expected)
    assert(got.map(_._4).sum == n)
    for (i <- 0 until 3)
      assert(got.map(t => t.productElement(i)).distinct.size >= 2,
        s"score dim $i never varies on the fixture")
  }
}

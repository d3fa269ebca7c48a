package graft.operators

import graft.SparkSuite

/** Differential + invariant tests for [[StatsOps.statSprt]]: recompute
  * the whole SPRT — md5 arm split, daily Bernoulli census, integer LLR
  * accumulation, first-crossing freeze — in plain driver-side Scala
  * from the raw fixture and compare row-for-row; then pin the
  * sequential-design invariants the output schema promises (sticky
  * decisions, prefix-sum consistency, post_stop monotonicity).
  */
class SprtSpec extends SparkSuite {

  private val LogS = math.round(math.log(0.25 / 0.15) * 1e6)
  private val LogF = math.round(math.log(0.75 / 0.85) * 1e6)
  private val Upper = math.round(math.log(0.95 / 0.05) * 1e6)
  private val Lower = -Upper

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def collectSprt(sfDir: String) =
    StatsOps.statSprt(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getInt(7))).toSeq

  test("stat_sprt matches a driver recompute at sf0.001") {
    val raw = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_type",
        "date_format(ts, 'yyyy-MM-dd') as day")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val daily = raw
      .map { case (uid, et, day) =>
        val variant = if (md5Hex(s"ab42:$uid").head < '8') "A" else "B"
        ((variant, day), if (et == "purchase") 1L else 0L)
      }
      .groupBy(_._1).toSeq.map { case ((v, d), xs) =>
        val n = xs.size.toLong
        val conv = xs.map(_._2).sum
        (v, d, n, conv, conv * LogS + (n - conv) * LogF)
      }.sortBy(t => (t._1, t._2))
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, arm0) =>
        val arm = arm0.sortBy(_._2)
        val cums = arm.scanLeft(0L)(_ + _._5).tail
        val crossIdx = cums.indexWhere(c => c >= Upper || c <= Lower)
        arm.zip(cums).zipWithIndex.map { case (((v, d, n, conv, llrD), cum), i) =>
          val state =
            if (crossIdx < 0 || i < crossIdx) "continue"
            else if (cums(crossIdx) >= Upper) "accept_h1"
            else "accept_h0"
          (v, d, n, conv, llrD, cum, state,
            if (crossIdx >= 0 && i > crossIdx) 1 else 0)
        }
    }
    assert(collectSprt(sf0001) == expected)
  }

  test("sequential invariants hold at sf0.01 and a decision is reached") {
    val got = collectSprt(sf001)
    assert(got.nonEmpty)
    for ((variant, rows0) <- got.groupBy(_._1)) {
      val rows = rows0.sortBy(_._2)
      // llr_e6 is exactly the prefix sum of llr_day_e6
      assert(rows.scanLeft(0L)(_ + _._5).tail == rows.map(_._6),
        s"$variant: cumulative LLR is not the prefix sum")
      // decisions are sticky: continue* then a single accept_* forever
      val states = rows.map(_._7)
      val decided = states.dropWhile(_ == "continue")
      assert(decided.distinct.size <= 1 &&
        decided.forall(s => s == "accept_h1" || s == "accept_h0"),
        s"$variant: non-sticky state sequence $states")
      // post_stop is 0 through the crossing day, 1 strictly after
      val ps = rows.map(_._8)
      assert(ps == ps.sorted, s"$variant: post_stop not monotone")
      if (decided.nonEmpty) {
        assert(ps.last == 1 || decided.size == 1,
          s"$variant: crossing day not followed by post_stop rows")
        // the frozen decision agrees with the boundary the LLR hit
        val crossRow = rows(states.indexWhere(_ != "continue"))
        if (decided.head == "accept_h1") assert(crossRow._6 >= Upper)
        else assert(crossRow._6 <= Lower)
      }
    }
    // at sf0.01 the true conversion (~0.20) sits above the H0/H1
    // midpoint in LLR drift (+0.002/trial), so with ~150 trials per
    // arm-day both arms must decide within the 30-day window — the
    // fixture exercises the freeze path, not just 'continue'
    assert(got.exists(_._7 != "continue"),
      "fixture never crossed a boundary; stop logic untested")
  }
}

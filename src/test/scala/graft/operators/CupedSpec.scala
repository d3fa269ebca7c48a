package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential + effectiveness checks for stat_cuped. */
class CupedSpec extends SparkSuite {

  test("adjustment matches a driver re-derivation and reduces variance") {
    val evs = Tables.events(spark, sf001)
      .selectExpr("user_id", "unix_micros(ts) as us",
        "cast(value as decimal(18,2)) as v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val per = evs.groupBy(_._1).map { case (u, es) =>
      val pre = es.filter(_._2 < mid).map(e => BigDecimal(e._3)).sum
      val post = es.filter(_._2 >= mid).map(e => BigDecimal(e._3)).sum
      u -> (pre, post)
    }
    val n = per.size.toDouble
    val s1 = per.values.map(_._1).sum
    val s2 = per.values.map(_._2).sum
    val s11 = per.values.map(p => p._1 * p._1).sum
    val s12 = per.values.map(p => p._1 * p._2).sum
    val theta = (n * s12.toDouble - s1.toDouble * s2.toDouble) /
      (n * s11.toDouble - s1.toDouble * s1.toDouble)
    val meanPre = s1.toDouble / n

    val got = StatsOps.statCuped(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.size == per.size)
    per.foreach { case (u, (pre, post)) =>
      val (preC, postC, adj) = got(u)
      assert(preC == (pre * 100).toLongExact &&
        postC == (post * 100).toLongExact, s"sums for user $u")
      val want = BigDecimal(post.toDouble - theta * (pre.toDouble - meanPre))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(adj - want) < 1e-9, s"adj for user $u")
    }

    // the point of CUPED: adjusted variance <= raw post variance
    def variance(xs: Iterable[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val varPost = variance(per.values.map(_._2.toDouble))
    val varAdj = variance(got.values.map(_._3))
    assert(varAdj <= varPost * 1.0001,
      s"CUPED failed to reduce variance: $varAdj vs $varPost")
    // pre/post correlate in this fixture, so the reduction is real
    assert(varAdj < varPost * 0.999,
      s"vacuous reduction on the fixture: $varAdj vs $varPost")
  }
}

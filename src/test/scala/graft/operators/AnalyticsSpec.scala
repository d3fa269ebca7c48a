package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Structural sanity for the analytic-SQL suite (the DuckDB oracle is
  * the value-level gate; these pin the invariants the oracle can't
  * express, plus plan shapes).
  */
class AnalyticsSpec extends SparkSuite {

  test("q33: ntile buckets balanced within 1; pct_rank/cdist in [0,1]") {
    val rows = AnalyticsOps.q33WindowAnalytics(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 4)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
    val byCust = rows.groupBy(_.getLong(1))
    byCust.values.filter(_.length >= 4).foreach { g =>
      val sizes = g.groupBy(_.getInt(3)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"unbalanced ntile: $sizes")
    }
  }

  test("q35 cube: finest grain sums to each rollup grain and the total") {
    val rows = AnalyticsOps.q35Cube(spark, sf0001).collect()
      .map(r => ((r.getByte(2).toInt, r.getByte(3).toInt), r.getLong(4)))
    val byGrain = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // (0,0)=cell, (0,1)=by priority, (1,0)=by status, (1,1)=grand total
    assert(byGrain.keySet == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(byGrain((0, 0)) == byGrain((1, 1)))
    assert(byGrain((0, 1)) == byGrain((1, 1)))
    assert(byGrain((1, 0)) == byGrain((1, 1)))
  }

  test("q58: co-moment corr/covar/stddev match the builtin aggregates") {
    // the catalog computes these from exact decimal co-moment sums (for
    // cross-engine determinism); Spark's builtin corr/covar_samp/stddev
    // are the independent reference — agreement within 1e-6 on every
    // group proves the algebra, not just the plumbing
    val mine = AnalyticsOps.q58CorrStats(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val ref = graft.core.Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("c"),
        covar_samp("l_quantity", "l_extendedprice").as("cv"),
        stddev_samp("l_quantity").as("sq"),
        stddev_samp("l_extendedprice").as("sp"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(mine.keySet == ref.keySet && mine.nonEmpty)
    mine.foreach { case (k, (c, cv, sq, sp)) =>
      val (rc, rcv, rsq, rsp) = ref(k)
      assert(math.abs(c - rc) < 1e-4 + 1e-6 * math.abs(rc), s"corr $k")
      assert(math.abs(cv - rcv) < 5e-3 + 1e-6 * math.abs(rcv), s"covar $k")
      assert(math.abs(sq - rsq) < 1e-4 + 1e-6 * math.abs(rsq), s"stddev_q $k")
      assert(math.abs(sp - rsp) < 1e-4 + 1e-6 * math.abs(rsp), s"stddev_p $k")
    }
  }

  test("q59 grouping sets: every grain's counts sum to the grand total") {
    val rows = AnalyticsOps.q59GroupingSets(spark, sf0001).collect()
      .map(r => ((r.getInt(2), r.getInt(3)), r.getLong(4)))
    val byGrain = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // the four requested sets, nothing else: (s,p), (s), (p), ()
    assert(byGrain.keySet == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    val total = byGrain((1, 1))
    assert(total > 0)
    assert(byGrain((0, 0)) == total && byGrain((0, 1)) == total &&
      byGrain((1, 0)) == total)
    // grouping-set lowering must stay a single-scan Expand, like CUBE
    val plan = AnalyticsOps.q59GroupingSets(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand in plan:\n$plan")
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"grouping sets re-scanned the table:\n$plan")
  }

  test("q36 full outer: both null-extension directions materialize") {
    val rows = AnalyticsOps.q36FullOuter(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(3)))
    val rightOnly = rows.filter { case (k, n, _) => n == 0L }
    assert(rightOnly.nonEmpty && rightOnly.forall(_._3), // watched, no custs
      s"expected watch-list-only keys: ${rows.mkString(",")}")
    val leftOnly = rows.filter { case (k, _, w) => k < 20 && !w }
    assert(leftOnly.nonEmpty)
  }

  test("q42: quartiles are ordered q1 <= median <= q3") {
    AnalyticsOps.q42ExactPercentiles(spark, sf0001).collect().foreach { r =>
      val (med, q1, q3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(q1 <= med && med <= q3, s"disordered quartiles: $q1 $med $q3")
    }
  }

  test("windows partition by key: no single-partition exchange in plans") {
    Seq(AnalyticsOps.q33WindowAnalytics(spark, sf0001),
      AnalyticsOps.q34WindowFrames(spark, sf0001)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // SinglePartition only appears for the final presentation sort's
      // range exchange — the Window itself must hash-partition
      assert(plan.contains("hashpartitioning"),
        s"window not hash-partitioned:\n$plan")
    }
  }
}

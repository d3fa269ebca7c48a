package graft.pipeline

import graft.SparkSuite

/** Differential test for [[PipelineOps.mixOptimizer]]: replay the
  * water-filling allocation on the driver from the raw fixture and
  * assert the invariants the algorithm promises — allocations sum to
  * EXACTLY the budget, capped sources all sit at λ or λ+1, uncapped
  * sources are kept whole.
  */
class MixOptimizerSpec extends SparkSuite {

  test("pipe_mix_optimizer matches a driver water-fill at sf0.001") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("source", "size(split(text, ' ')) as t").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
    val census = docs.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val budget = census.values.map(_._2).sum * 3 / 10
    val byVol = census.toSeq.sortBy { case (s, (_, t)) => (t, s) }
    val n = byVol.size
    // find the break row: first source whose even split of the
    // remainder falls below its own volume
    var prefix = 0L
    var brk = -1
    var pfx = 0L
    byVol.zipWithIndex.foreach { case ((_, (_, t)), i) =>
      if (brk < 0 && t * (n - i) > budget - prefix) { brk = i; pfx = prefix }
      prefix += t
    }
    val lam = (budget - pfx) / (n - brk)
    val rem = (budget - pfx) % (n - brk)
    val cappedNames = byVol.drop(brk).map(_._1).sorted
    val bonus = cappedNames.take(rem.toInt).toSet
    val expected = census.toSeq.sortBy(_._1).map { case (s, (nd, t)) =>
      val capped = byVol.indexWhere(_._1 == s) >= brk
      val alloc = (if (capped) lam else t) + (if (bonus(s)) 1L else 0L)
      (s, nd, t, alloc, capped, alloc * 1000000L / t)
    }
    val got = PipelineOps.mixOptimizer(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(got.map(_._4).sum == budget, "allocations must sum to budget")
    assert(got.filter(!_._5).forall(r => r._4 == r._3),
      "uncapped sources kept whole")
  }
}

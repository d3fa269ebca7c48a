package graft.pipeline

import graft.SparkSuite

/** Differential test for [[PipelineOps.tokenBudget]]: re-derive the
  * bucket-greedy selection on the driver from the same q_e4 scores
  * (via the shared textQuality catalog output, so the two scores
  * cannot drift) and compare the summary row; plus the greedy
  * invariants (the cutoff bucket STARTS inside the budget; dropping
  * it lands under budget).
  */
class TokenBudgetSpec extends SparkSuite {

  test("pipe_token_budget matches a driver greedy re-derivation") {
    val scored = graft.text.TextOps.textQuality(spark, sf0001)
      .selectExpr("quality_e4 as q_e4", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val census = scored.groupBy(_._1).toSeq
      .map { case (q, xs) => (q, xs.length.toLong, xs.map(_._2).sum) }
      .sortBy(-_._1)
    val budget = census.map(_._3).sum / 10
    var cum = 0L
    val admitted = census.takeWhile { case (_, _, t) =>
      val starts = cum < budget; cum += t; starts
    }
    val expected = (budget, admitted.map(_._1).min,
      admitted.map(_._2).sum, admitted.map(_._3).sum,
      admitted.map(_._3).sum * 1000000L / budget)

    val got = PipelineOps.tokenBudget(spark, sf0001).collect()
    assert(got.length == 1)
    val g = (got(0).getLong(0), got(0).getLong(1), got(0).getLong(2),
      got(0).getLong(3), got(0).getLong(4))
    assert(g == expected)
    // greedy invariants
    val selTokens = g._4
    val cutoffBucketTokens = census.find(_._1 == g._2).get._3
    assert(selTokens - cutoffBucketTokens < g._1,
      "cutoff bucket must START inside the budget")
  }
}

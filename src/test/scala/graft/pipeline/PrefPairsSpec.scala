package graft.pipeline

import graft.SparkSuite
import graft.text.TextOps

/** Differential test for [[PipelineOps.prefPairs]]: recompute the
  * per-stratum best/worst pairing in driver-side Scala from
  * [[TextOps.textQuality]]'s own published scores — pinning both the
  * pairing logic AND that the miner's internal score is exactly the
  * textQuality score (the shared-expression contract).
  */
class PrefPairsSpec extends SparkSuite {

  test("pipe_pref_pairs pairs argmax/argmin of the textQuality score") {
    val quality: Map[Long, Long] = TextOps.textQuality(spark, sf0001)
      .select("doc_id", "quality_e4").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse("__null__"),
        Option(r.getString(2)).getOrElse("__null__")))

    val expected = docs.groupBy(d => (d._2, d._3)).toSeq
      .filter(_._2.length >= 2)
      .map { case ((lang, source), ds) =>
        val ids = ds.map(_._1)
        // total order (q desc, id asc); rejected is its exact reverse
        val best = ids.minBy(id => (-quality(id), id))
        val worst = ids.maxBy(id => (-quality(id), id))
        (lang, source, ids.length.toLong, best, quality(best),
          worst, quality(worst), quality(best) - quality(worst))
      }.sortBy(t => (t._1, t._2))

    val got = PipelineOps.prefPairs(spark, sf0001).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toSeq

    assert(got == expected)
    assert(got.nonEmpty)
    // chosen ≠ rejected and margin ≥ 0 in every stratum
    assert(got.forall(t => t._4 != t._6 && t._8 >= 0))
    // the fixture must contain at least one tied-score stratum if all
    // margins are 0 there — sanity: some stratum has a positive margin
    assert(got.exists(_._8 > 0), "no stratum separates quality scores")
  }
}

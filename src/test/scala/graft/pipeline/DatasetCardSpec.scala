package graft.pipeline

import graft.SparkSuite

/** Differential for [[PipelineOps.datasetCard]]: rebuild the card from
  * raw strings driver-side — the integer quality recipe, token counts,
  * language mode with lexicographic tiebreak, half-up means — and
  * compare per-source rows exactly.
  */
class DatasetCardSpec extends SparkSuite {

  private val stopwords =
    Set("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  test("dataset card matches an independent driver recompute") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))

    def quality(text: String): (Long, Long) = {
      val tk = text.split(" ", -1)
      val n = tk.length.toLong
      val tl = tk.map(_.length.toLong).sum
      val sh = tk.count(stopwords).toLong
      val q = ((100 * math.min(n, 100) * n + 6000 * sh +
        (if (tl <= 10 * n) 400 * tl else 4000 * n))
        * 10000L + (20000 * n) / 2) / (20000 * n)
      (n, q)
    }

    val expected = docs.groupBy(_._2).toSeq.map { case (src, xs) =>
      val qs = xs.map(d => quality(d._4))
      val nDocs = xs.length.toLong
      val topLang = xs.groupBy(_._3).toSeq
        .map { case (l, ys) => (l, ys.length) }
        .sortBy { case (l, c) => (-c, l) }.head._1
      (src, nDocs, qs.map(_._1).sum, xs.map(_._3).distinct.length.toLong,
        topLang, (qs.map(_._2).sum + nDocs / 2) / nDocs)
    }.sortBy(_._1)

    val got = PipelineOps.datasetCard(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSeq

    assert(got == expected)
    // fixture sanity: several sources, multilingual spread
    assert(got.size >= 3 && got.forall(_._4 > 1))
  }
}

package graft.text

import graft.SparkSuite

/** Differential test for [[TextOps.textBigramLm]]: refit the corpus
  * 2-gram model driver-side (c(w1 w2), prefix totals c(w1 ·), per-value
  * µnat rounding) and compare each document's mean surprisal exactly.
  */
class TextBigramLmSpec extends SparkSuite {

  test("bigram surprisal matches an independent driver recompute") {
    val docs: Seq[(Long, Array[String])] =
      graft.core.Tables.documents(spark, sf0001)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1).split(" ", -1))).toSeq

    val bigrams: Seq[(Long, (String, String))] = docs.flatMap {
      case (id, tk) => tk.toSeq.sliding(2).collect {
        case Seq(a, b) => (id, (a, b))
      }
    }
    val c2 = bigrams.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w, xs) => w -> xs.values.sum }
    def lnE6(c: Long): Long = math.round(math.log(c.toDouble) * 1e6)

    val expected = bigrams.groupBy(_._1).map { case (id, xs) =>
      val n = xs.size.toLong
      val s = xs.map { case (_, b) => lnE6(c1(b._1)) - lnE6(c2(b)) }.sum
      (id, n, ((s + n / 2) / n) / 100)
    }.toSeq.sortBy(_._1)

    val got = TextOps.textBigramLm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    assert(got == expected)
    // surprisal is nonnegative and the fixture must spread
    assert(got.forall(_._3 >= 0))
    assert(got.map(_._3).distinct.size > 1, "degenerate fixture: all equal")
  }
}

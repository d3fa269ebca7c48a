package graft.text

import graft.SparkSuite

/** Differential test for [[TextOps.textVocabGrowth]]: re-derive the
  * decile curve on the driver from token first occurrences, and pin
  * the Heaps invariants (cumulative vocab is strictly increasing
  * while new tokens appear; the final cumulative equals the corpus's
  * total distinct token count).
  */
class TextVocabGrowthSpec extends SparkSuite {

  test("text_vocab_growth matches a driver re-derivation") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.map(_._1).max + 1
    val firsts = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, text) =>
      val tk = text.split(" ")
      if (tk.length >= 2) tk.sliding(2).foreach { bg =>
        val t = bg.mkString(" ")
        if (!firsts.contains(t)) firsts(t) = id
      }
    }
    val census = firsts.values
      .groupBy(fd => math.min(9L, fd * 10 / nDocs)).toSeq
      .map { case (d, xs) => (d, xs.size.toLong) }
      .sortBy(_._1)
    val expected = census.zip(census.scanLeft(0L)(_ + _._2).tail)
      .map { case ((d, nt), cum) => (d, nt, cum) }
    val got = TextOps.textVocabGrowth(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.last._3 == firsts.size.toLong,
      "final cumulative vocab must equal total distinct bigrams")
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 > a._3)
      case _ =>
    }
  }
}

package graft.text

import graft.SparkSuite
import graft.core.Tables

/** Differential + plan checks for text_ngram_topk. */
class TextNgramSpec extends SparkSuite {

  test("top-k bigram doc frequencies match a driver-side recomputation") {
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val df = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text) =>
      val tk = text.split(" ", -1) // keep empties: matches split/string_split
      tk.iterator.zip(tk.iterator.drop(1))
        .map { case (a, b) => s"$a $b" }.toSet[String]
        .foreach(bg => df(bg) = df.getOrElse(bg, 0L) + 1)
    }
    val expect = df.toSeq.sortBy { case (bg, n) => (-n, bg) }.take(20)
    val got = TextOps.textNgramTopK(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("the top-k lowers to TakeOrdered, not a global sort") {
    val plan = TextOps.textNgramTopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
    // a rangepartitioning Exchange would mean the whole bigram
    // vocabulary is globally sorted just to keep 20 rows
    assert(!plan.contains("rangepartitioning"),
      s"global sort crept in:\n$plan")
  }
}

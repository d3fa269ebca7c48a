package graft.text

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for text_repetition: an independent driver-side
  * recompute of the top-/duplicate-n-gram fractions (plain Scala
  * collections, no Spark expressions shared with the operator).
  */
class TextRepetitionSpec extends SparkSuite {

  private def e4(num: Long, den: Long): Long = (num * 10000L + den / 2) / den

  test("repetition fractions match a driver recompute exactly") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    def stats(text: String, n: Int): Option[(Long, Long, Long)] = {
      val tk = text.split(" ", -1)
      if (tk.length < 3 || tk.length < n) None
      else {
        val grams = tk.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).map(_._2.size.toLong)
        Some((grams.size.toLong, counts.max,
          counts.filter(_ > 1).sum))
      }
    }

    val out = TextOps.textRepetition(spark, sf0001).collect()
    val expectedDocs = docs.filter(_._2.split(" ", -1).length >= 3)
    assert(out.length == expectedDocs.size, "row count")
    out.foreach { r =>
      val id = r.getLong(0)
      val Some((n2, top2, dup2)) = stats(docs(id), 2)
      val Some((n3, top3, dup3)) = stats(docs(id), 3)
      assert(r.getLong(1) == n2, s"doc $id n2grams")
      assert(r.getLong(2) == e4(top2, n2), s"doc $id top2_e4")
      assert(r.getLong(3) == e4(dup2, n2), s"doc $id dup2_e4")
      assert(r.getLong(4) == n3, s"doc $id n3grams")
      assert(r.getLong(5) == e4(top3, n3), s"doc $id top3_e4")
      assert(r.getLong(6) == e4(dup3, n3), s"doc $id dup3_e4")
    }
    // signals are discriminative on this corpus, not all-zero/all-equal
    assert(out.map(_.getLong(2)).distinct.length > 1, "top2_e4 degenerate")
  }
}

package graft.text

import graft.SparkSuite

/** Checks for text_gopher_rules: flag domain, conjunction consistency,
  * and a driver-side re-derivation of the word-count and mean-length
  * rules from the raw text.
  */
class TextGopherSpec extends SparkSuite {

  test("flags are 0/1, gopher_pass is their conjunction, rules separate") {
    val rows = TextOps.textGopherRules(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (2 to 6).map(r.getInt)
      flags.foreach(f => assert(f == 0 || f == 1, s"flag out of domain: $r"))
      assert(r.getInt(7) == flags.product, s"gopher_pass mismatch: $r")
    }
    val passed = rows.count(_.getInt(7) == 1)
    assert(passed > 0 && passed < rows.length,
      s"degenerate rule bundle: $passed/${rows.length} pass")
  }

  test("word-count and mean-length flags match a driver re-derivation") {
    val texts = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    TextOps.textGopherRules(spark, sf0001).collect().foreach { r =>
      val tk = texts(r.getLong(0)).split(" ", -1)
      val n = tk.length.toLong
      val tl = tk.map(_.length.toLong).sum
      assert(r.getLong(1) == n, s"n_words at doc ${r.getLong(0)}")
      assert(r.getInt(2) == (if (n >= 50 && n <= 100000) 1 else 0),
        s"ok_nwords at doc ${r.getLong(0)}")
      assert(r.getInt(3) == (if (tl >= 3 * n && tl <= 10 * n) 1 else 0),
        s"ok_wordlen at doc ${r.getLong(0)}")
    }
  }
}

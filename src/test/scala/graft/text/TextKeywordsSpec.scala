package graft.text

import graft.SparkSuite

/** Differential test for [[TextOps.textKeywordsTopK]]: recompute the
  * integer tf-idf top-3 driver-side (doc frequency, digit-count idf,
  * (score desc, term asc) total order) and compare row-for-row.
  */
class TextKeywordsSpec extends SparkSuite {

  test("keyword top-3 matches an independent driver recompute") {
    val docs: Seq[(Long, Seq[String])] =
      graft.core.Tables.documents(spark, sf0001)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0),
          r.getString(1).toLowerCase.split(" ", -1).toSeq.filter(_.nonEmpty)))
        .toSeq

    val nDocs = docs.size.toLong
    val df: Map[String, Long] = docs.flatMap { case (_, tk) => tk.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def idfDigits(t: String): Long = (nDocs / df(t)).toString.length.toLong

    val expected = docs.flatMap { case (id, tk) =>
      val tf = tk.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      tf.toSeq
        .map { case (t, f) => (t, f, f * idfDigits(t)) }
        .sortBy { case (t, _, s) => (-s, t) }
        .take(3).zipWithIndex
        .map { case ((t, f, s), i) => (id, (i + 1).toLong, t, f, s) }
    }.sortBy(r => (r._1, r._2))

    val got = TextOps.textKeywordsTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq

    assert(got == expected)
    // fixture must exercise rarity: score > tf means idf_digits > 1 fired
    assert(got.exists(r => r._5 > r._4), "no rare term in any top-3")
  }

  test("the rank filter rewrites to a map-side WindowGroupLimit") {
    val plan = TextOps.textKeywordsTopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit.*Partial".r.findAllIn(plan).nonEmpty,
      s"no partial group limit before the window Exchange:\n$plan")
  }
}

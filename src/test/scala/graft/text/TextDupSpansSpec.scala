package graft.text

import graft.SparkSuite

/** Differential test for [[TextOps.textDupSpans]]: recompute the
  * duplicate-span profile in plain driver-side Scala (token 8-gram
  * windows, md5 hash, cross-document occurrence, half-up basis
  * points) and compare row-for-row against the Spark plan.
  */
class TextDupSpansSpec extends SparkSuite {

  private val K = 8

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("text_dup_spans matches an independent driver recompute") {
    val docs: Array[(Long, Array[String])] =
      graft.core.Tables.documents(spark, sf0001)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))

    val windows: Seq[(Long, Int, String)] = docs.toSeq.flatMap {
      case (id, tk) =>
        if (tk.length < K) Seq.empty
        else (0 to tk.length - K).map(i =>
          (id, i, md5hex(tk.slice(i, i + K).mkString(" "))))
    }
    val docsPerHash: Map[String, Set[Long]] =
      windows.groupBy(_._3).map { case (h, ws) => h -> ws.map(_._1).toSet }
    val expected = windows.groupBy(_._1).map { case (id, ws) =>
      val dups = ws.filter(w => docsPerHash(w._3).size > 1)
      val n = ws.size.toLong
      val nd = dups.size.toLong
      (id, n, nd,
        if (dups.isEmpty) None else Some(dups.map(_._2.toLong).min),
        (nd * 10000L + n / 2) / n)
    }.toSeq.sortBy(_._1)

    val got = TextOps.textDupSpans(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))
    }.toSeq

    assert(got == expected)
    // the fixture must exercise both sides of the dup predicate
    assert(got.exists(_._3 > 0), "no duplicated window in fixture")
    assert(got.exists(_._3 == 0), "every window duplicated in fixture")
  }

  test("profile invariants hold") {
    val rows = TextOps.textDupSpans(spark, sf0001).collect()
    rows.foreach { r =>
      val (n, nd, e4) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(nd <= n)
      assert(e4 >= 0L && e4 <= 10000L)
      assert(r.isNullAt(3) == (nd == 0L),
        s"first_dup_pos nullability disagrees with n_dup_windows for $r")
    }
  }
}

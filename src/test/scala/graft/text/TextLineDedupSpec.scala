package graft.text

import graft.SparkSuite

/** Differential test for [[TextOps.textLineDedup]]: recompute the
  * CCNet-style line (10-token segment) boilerplate removal in plain
  * driver-side Scala — segmentation, per-source document frequency,
  * df >= 2 removal, cleaned-text re-assembly and md5 fingerprint —
  * and compare row-for-row against the Spark plan.
  */
class TextLineDedupSpec extends SparkSuite {

  private val L = 10
  private val Cap = 2

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("text_line_dedup matches an independent driver recompute") {
    val docs: Array[(Long, String, Array[String])] =
      graft.core.Tables.documents(spark, sf0001)
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getString(2).split(" ", -1)))
        .filter(_._3.nonEmpty)

    // (doc, source, seg_idx, segment text)
    val segs: Seq[(Long, String, Int, String)] = docs.toSeq.flatMap {
      case (id, src, tk) =>
        tk.grouped(L).zipWithIndex.map { case (g, i) =>
          (id, src, i, g.mkString(" "))
        }
    }
    // NOTE: built with filter+keySet, not `.collect { ... => (src, seg) }`
    // — collect on a Map that yields pairs re-assembles a Map keyed by
    // src, silently collapsing every hot segment of a source to one.
    val hot: Set[(String, String)] = segs
      .groupBy(s => (s._2, s._4))
      .filter { case (_, ss) => ss.map(_._1).distinct.size >= Cap }
      .keySet

    val expected = segs.groupBy(_._1).map { case (id, ss) =>
      val kept = ss.filterNot(s => hot((s._2, s._4))).sortBy(_._3)
      val clean = kept.map(_._4).mkString(" ")
      (id, ss.size.toLong, (ss.size - kept.size).toLong,
        clean.length.toLong, md5hex(clean))
    }.toSeq.sortBy(_._1)

    val got = TextOps.textLineDedup(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))
    }.toSeq

    assert(got == expected)
    // the fixture must exercise both sides of the removal predicate
    assert(got.exists(_._3 > 0), "no hot segment removed in fixture")
    assert(got.exists(_._3 == 0), "every doc lost a segment in fixture")
    // a doc that lost segments must fingerprint differently from its raw
    val touched = got.filter(_._3 > 0).map(_._1).toSet
    val raw = docs.filter(d => touched(d._1))
      .map(d => md5hex(d._3.mkString(" "))).toSet
    assert(got.filter(g => touched(g._1)).map(_._5).toSet
      .intersect(raw).isEmpty)
  }
}

package graft.text

import graft.SparkSuite

/** Differential test for [[TextOps.textSubstringDedup]]: recompute the
  * exact-substring removal pass in plain driver-side Scala — k-gram
  * windows, cross-document duplicate hashes, span-union coverage, and
  * the md5 of the rebuilt kept text — and compare row-for-row.
  */
class TextSubstringDedupSpec extends SparkSuite {

  private val K = 8

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("substring dedup matches an independent driver recompute") {
    val docs: Seq[(Long, Array[String])] =
      graft.core.Tables.documents(spark, sf0001)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1).split(" ", -1))).toSeq

    val windows: Seq[(Long, Int, String)] = docs.flatMap { case (id, tk) =>
      (0 to tk.length - K).map(i =>
        (id, i, md5hex(tk.slice(i, i + K).mkString(" "))))
    }
    val dupHashes: Set[String] = windows.groupBy(_._3)
      .collect { case (h, ws) if ws.map(_._1).distinct.size > 1 => h }.toSet

    val expected = docs.map { case (id, tk) =>
      val dupStarts = (0 to tk.length - K)
        .filter(i => dupHashes(md5hex(tk.slice(i, i + K).mkString(" "))))
        .toSet
      val covered = tk.indices.map(i =>
        (math.max(0, i - K + 1) to i).exists(dupStarts))
      val kept = tk.indices.filterNot(covered).map(tk)
      (id, tk.length.toLong, covered.count(identity).toLong,
        md5hex(kept.mkString(" ")))
    }.sortBy(_._1)

    val got = TextOps.textSubstringDedup(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    }.toSeq

    assert(got == expected)
    // the fixture must exercise removal, full-keep, and partial-keep
    assert(got.exists(_._3 > 0), "nothing removed anywhere in fixture")
    assert(got.exists(_._3 == 0), "everything removed in fixture")
    assert(got.exists(r => r._3 > 0 && r._3 < r._2),
      "no partially-deduplicated document in fixture")
  }

  test("detector and remover agree on which docs contain duplication") {
    val spans = TextOps.textDupSpans(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) > 0)).toMap
    TextOps.textSubstringDedup(spark, sf0001).collect().foreach { r =>
      val (id, removed) = (r.getLong(0), r.getLong(2))
      spans.get(id).foreach { hasDup =>
        assert((removed > 0) == hasDup,
          s"doc $id: dup_spans=$hasDup but n_removed=$removed")
      }
    }
  }
}

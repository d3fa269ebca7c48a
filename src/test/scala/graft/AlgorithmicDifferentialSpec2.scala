package graft

/** Second batch of independent driver re-derivations (see
  * [[AlgorithmicDifferentialSpec]]): token counting, canonical and
  * rolling fingerprints, and the exact/fingerprint dedup groupings.
  */
class AlgorithmicDifferentialSpec2 extends SparkSuite {

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  private def md5hex(s: String): String = md5hex(s.getBytes("UTF-8"))

  private lazy val docs: Seq[(Long, String)] =
    graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  // Spark's array_sort on strings orders by UTF-8 BYTES (UTF8String
  // binary order), as does DuckDB — mirror that, not Java's UTF-16
  // compareTo
  private def byteLt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def canonicalTokens(text: String): Seq[String] =
    text.toLowerCase.split(" ", -1).toSeq.distinct.sortWith(byteLt)

  test("text_tokens equals driver regex + split counts") {
    val re = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]".r
    val want = docs.map { case (id, text) =>
      id -> ((text.split(" ", -1).length, re.findAllIn(text).size))
    }.toMap
    val got = graft.text.TextOps.textTokens(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(got == want)
  }

  test("text_fingerprint equals driver md5 over byte-sorted token set") {
    val want = docs.map { case (id, text) =>
      val toks = canonicalTokens(text)
      id -> ((md5hex(toks.mkString(" ")), toks.size))
    }.toMap
    val got = graft.text.TextOps.textFingerprint(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got == want)
  }

  test("text_rolling_fp equals a driver Karp-Rabin over code points") {
    def rh(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h
    }
    val want = docs.map { case (id, text) =>
      val prefix = text.split(" ", -1).take(16).mkString(" ")
      id -> ((rh(text), rh(prefix)))
    }.toMap
    val got = graft.text.TextOps.textRollingFp(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("dedup_exact equals a driver md5 grouping") {
    val want = docs.groupBy { case (_, text) => md5hex(text) }
      .map { case (h, ds) => h -> ((ds.map(_._1).min, ds.size.toLong)) }
    val got = graft.dedup.DedupOps.dedupExact(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("dedup_fingerprint equals a driver canonical-set grouping") {
    val want = docs
      .groupBy { case (_, text) => md5hex(canonicalTokens(text).mkString(" ")) }
      .collect { case (h, ds) if ds.size > 1 =>
        h -> ((ds.map(_._1).min, ds.size.toLong))
      }.toMap
    val got = graft.dedup.DedupOps.dedupFingerprint(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(want.nonEmpty, "degenerate fixture: no duplicate groups")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Independent driver-side re-derivations for catalog entries whose
  * DuckDB oracle REPLICATES the engine's algorithm (so an algorithmic
  * bug would pass both sides — the DedupSpec lesson): language ID,
  * stratified sampling, decontamination, label-blocked near-dup,
  * deterministic global shuffle, and the quality-filter census are
  * each recomputed here from the raw rows in plain Scala and compared
  * exactly.
  */
class AlgorithmicDifferentialSpec extends SparkSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // Spark split(text, " ") keeps trailing empty strings (limit -1)
  private def tokens(text: String): Array[String] = text.split(" ", -1)

  private lazy val docs: Seq[(Long, String, String)] =
    graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("text_langid equals a driver argmax over the stopword sets") {
    val sets = Seq(
      "en" -> Set("the", "and", "is", "of"),
      "es" -> Set("el", "que", "los", "las"),
      "de" -> Set("der", "und", "das", "ist"),
      "fr" -> Set("les", "des", "une", "dans"))
    val want = docs.map { case (id, text, _) =>
      val tk = tokens(text)
      val hits = sets.map { case (l, ws) => l -> tk.count(ws) }.toMap
      val lang =
        if (hits("en") >= hits("es") && hits("en") >= hits("de") &&
          hits("en") >= hits("fr")) "en"
        else if (hits("es") >= hits("de") && hits("es") >= hits("fr")) "es"
        else if (hits("de") >= hits("fr")) "de"
        else "fr"
      id -> ((hits("en"), hits("es"), hits("de"), hits("fr"), lang))
    }.toMap
    val got = graft.text.TextOps.textLangId(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    assert(got == want)
  }

  test("text_stratified_sample equals a driver md5-order top-20 per lang") {
    val want = docs.groupBy(_._3).flatMap { case (lang, ds) =>
      ds.map(_._1).sortBy(id => (md5hex(s"salt42:$id"), id))
        .take(20).zipWithIndex
        .map { case (id, i) => (id, lang, i + 1) }
    }.toSet
    val got = graft.text.TextOps.textStratifiedSample(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("text_decontaminate equals a driver 5-gram set intersection") {
    val grams = docs.collect { case (id, text, _)
        if tokens(text).length >= 5 =>
      val tk = tokens(text)
      id -> (0 to tk.length - 5)
        .map(i => tk.slice(i, i + 5).mkString(" ")).toSet
    }
    val bench = grams.collect { case (id, g) if id % 7 == 0 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    val want = grams.collect {
      case (id, g) if id % 7 != 0 && (g & bench).nonEmpty =>
        id -> (g & bench).size.toLong
    }.toMap
    val got = graft.text.TextOps.textDecontaminate(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("embedding_neardup equals brute-force within-label cosine") {
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val want = (for {
      a <- vecs; b <- vecs
      if a._3 == b._3 && a._1 < b._1
      c = r4(cos(a._2, b._2)) if c >= 0.3
    } yield (a._1, b._1, a._3, c)).toSet
    val got = graft.sim.SimilarityOps.embeddingNearDup(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(got == want,
      s"missing ${(want -- got).take(3)}; spurious ${(got -- want).take(3)}")
  }

  test("pipe_global_shuffle equals a driver md5 permutation") {
    val ids = docs.map(_._1)
    val want = ids.sortBy(id => (md5hex(s"shuf42:$id"), id)).zipWithIndex
      .map { case (id, i) => (id, i.toLong, (i % 8).toLong) }.toSet
    val got = graft.pipeline.PipelineOps.globalShuffle(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("text_quality_filter census equals a driver rule replay") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on",
      "for", "with")
    def reason(text: String): String = {
      val tk = tokens(text)
      val n = tk.length.toLong
      val tl = tk.map(_.length.toLong).sum
      val sh = tk.count(stop).toLong
      val stopE4 = (sh * 10000L + n / 2) / n
      val qualityE4 = ((100L * math.min(n, 100L) * n + 6000L * sh +
        (if (tl <= 10 * n) 400L * tl else 4000L * n)) * 10000L +
        (20000L * n) / 2) / (20000L * n)
      if (n < 5) "too_short"
      else if (stopE4 > 4000) "stopword_spam"
      else if (qualityE4 < 3000) "low_quality"
      else "keep"
    }
    val want = docs.groupBy(d => (d._3, reason(d._2)))
      .map { case (k, ds) => k -> ((ds.size.toLong, ds.map(_._1).min)) }
    val got = graft.text.TextOps.textQualityFilter(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }
}

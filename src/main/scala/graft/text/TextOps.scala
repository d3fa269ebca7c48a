package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID,
  * canonical fingerprinting.
  *
  * Everything is a pure codegen'd projection (split / HOF lambdas /
  * regexp) followed by at most one narrow aggregation — no UDFs, no
  * shuffles on the per-document stage, so each operator streams through
  * whole-stage codegen and scales linearly with document count.
  */
object TextOps {

  /** documents projected to `keep` + text and spread across the
    * session's cores by doc_id hash — the r19 fix for the single-row-
    * group testdata scan arriving as ONE partition and pinning every
    * per-row tokenize/HOF/md5 stage to one core (no-op on any
    * multi-file table; see [[graft.core.Spread.byKey]]).
    */
  private def spreadText(spark: SparkSession, sfDir: String,
      keep: String*): DataFrame =
    Tables.documents(spark, sfDir)
      .select((keep.map(col) :+ col("text")): _*)
      .transform(graft.core.Spread.byKey(_, col("doc_id")))

  /** Tokenized docs `(keep…, tk)` in the r19-measured shape:
    * [[spreadText]] plus [[graft.core.Spread.evalOnce]] around `split`
    * so a pushed-down `size(tk) >= k` filter or a downstream lambda's
    * element accesses cannot re-evaluate the split per reference
    * (the dedup twin of this helper measured 0.44 s → 0.14 s at sf0.1
    * with identical rows).
    */
  private def spreadTokens(spark: SparkSession, sfDir: String,
      keep: String*): DataFrame = {
    val k = if (keep.isEmpty) Seq("doc_id") else keep
    spreadText(spark, sfDir, k: _*)
      .select((k.map(col) :+
        graft.core.Spread.evalOnce(split(col("text"), " ")).as("tk")): _*)
  }

  /** Whitespace + BPE-ish token counts per document. `regexp_count` with
    * a word/number/punct alternation approximates a byte-pair tokenizer's
    * piece count without any dictionary.
    */
  def textTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("n_chars"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        expr("regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')")
          .as("n_bpe_pieces"))
      .orderBy("doc_id")

  val textTokensSql: String =
    """SELECT doc_id, n_chars,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
      |    AS n_bpe_pieces
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  private[graft] val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private[graft] def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The [[textQuality]] integer score as an expression string over
    * columns `n` (token count), `tl` (total token length), `sh`
    * (stopword hits) — shared with
    * [[graft.pipeline.PipelineOps.prefPairs]] so the preference-pair
    * miner ranks by EXACTLY the score textQuality publishes (pinned by
    * PrefPairsSpec). `div` is Spark's integer division, `//` DuckDB's.
    */
  private[graft] def qualityE4Expr(intDiv: String): String =
    s"""((100 * least(n, 100) * n + 6000 * sh +
       |  (case when tl <= 10 * n then 400 * tl else 4000 * n end))
       |  * 10000 + (20000 * n) $intDiv 2) $intDiv (20000 * n)""".stripMargin

  /** Heuristic quality score: token count, mean token length, stopword
    * ratio — the standard cheap filters applied before expensive model
    * scoring in data pipelines.
    *
    * quality = 0.5·min(n,100)/100 + 0.3·stop_hits/n + 0.2·min(tl/n,10)/10,
    * emitted (like the ratios) in integer BASIS POINTS via half-up
    * integer division: `(x·10⁴ + d/2) div d`. Floats are avoided
    * entirely — at sf0.1, boundary documents exposed both
    * last-ulp-of-a-float-sum divergence AND a genuine engine
    * difference: Spark's round() is decimal-string-aware while
    * DuckDB's rounds raw doubles, so exact .XXXX5 values round apart.
    * Integer arithmetic is bit-identical everywhere, forever.
    */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .withColumn("tk", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n"),
        expr("aggregate(tk, 0L, (acc, x) -> acc + length(x))").as("tl"),
        expr(s"cast(size(filter(tk, x -> x in ${inList(stopwords)})) as long)")
          .as("sh"))
      .select(
        col("doc_id"),
        col("n").as("n_tokens"),
        expr("(tl * 10000L + n div 2) div n").as("avg_len_e4"),
        expr("(sh * 10000L + n div 2) div n").as("stop_e4"),
        expr("""((100 * least(n, 100) * n + 6000 * sh +
                |  (case when tl <= 10 * n then 400 * tl else 4000 * n end))
                |  * 10000L + (20000 * n) div 2) div (20000 * n)"""
          .stripMargin).as("quality_e4"))
      .orderBy("doc_id")
  }

  val textQualitySql: String =
    s"""SELECT doc_id,
       |  n AS n_tokens,
       |  (tl * 10000 + n // 2) // n AS avg_len_e4,
       |  (sh * 10000 + n // 2) // n AS stop_e4,
       |  ((100 * least(n, 100) * n + 6000 * sh +
       |    (CASE WHEN tl <= 10 * n THEN 400 * tl ELSE 4000 * n END))
       |    * 10000 + (20000 * n) // 2) // (20000 * n) AS quality_e4
       |FROM (
       |  SELECT doc_id,
       |    len(tk)::BIGINT AS n,
       |    list_sum(list_transform(tk, x -> len(x)))::BIGINT AS tl,
       |    len(list_filter(tk, x -> x IN ${inList(stopwords)}))::BIGINT AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))
       |ORDER BY doc_id""".stripMargin

  private val langSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of"),
    "es" -> Seq("el", "que", "los", "las"),
    "de" -> Seq("der", "und", "das", "ist"),
    "fr" -> Seq("les", "des", "une", "dans"))

  /** N-gram-free language ID heuristic: count hits against four disjoint
    * stopword sets, argmax with fixed precedence (en > es > de > fr).
    * Real pipelines swap in fastText-style models; the Spark plumbing
    * (pure projection, no shuffle) is identical.
    */
  def textLangId(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .withColumn("tk", split(col("text"), " "))
    val withHits = langSets.foldLeft(base) { case (df, (lang, words)) =>
      df.withColumn(s"${lang}_hits",
        expr(s"size(filter(tk, x -> x in ${inList(words)}))"))
    }
    withHits
      .withColumn("predicted_lang",
        when(col("en_hits") >= col("es_hits") &&
          col("en_hits") >= col("de_hits") &&
          col("en_hits") >= col("fr_hits"), "en")
          .when(col("es_hits") >= col("de_hits") &&
            col("es_hits") >= col("fr_hits"), "es")
          .when(col("de_hits") >= col("fr_hits"), "de")
          .otherwise("fr"))
      .select("doc_id", "en_hits", "es_hits", "de_hits", "fr_hits",
        "predicted_lang")
      .orderBy("doc_id")
  }

  val textLangIdSql: String = {
    val hitCols = langSets.map { case (lang, words) =>
      s"len(list_filter(tk, x -> x IN ${inList(words)})) AS ${lang}_hits"
    }.mkString(",\n    ")
    s"""SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       |  CASE
       |    WHEN en_hits >= es_hits AND en_hits >= de_hits
       |      AND en_hits >= fr_hits THEN 'en'
       |    WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
       |    WHEN de_hits >= fr_hits THEN 'de'
       |    ELSE 'fr' END AS predicted_lang
       |FROM (
       |  SELECT doc_id,
       |    $hitCols
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set. Robust to token order and repetition — catches the
    * shuffled-near-duplicate class that exact text hashing misses.
    */
  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        md5(array_join(array_sort(array_distinct(
          split(lower(col("text")), " "))), " ")).as("fp"),
        size(array_distinct(split(lower(col("text")), " ")))
          .as("n_distinct_tokens"))
      .orderBy("doc_id")

  val textFingerprintSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split(lower(text), ' '))), ' ')) AS fp,
      |  len(list_distinct(string_split(lower(text), ' ')))
      |    AS n_distinct_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Karp-Rabin rolling-hash fingerprints: whole document plus the
    * first-16-token prefix (the cheap near-head-dup signal). Runs
    * through the native codegen'd [[graft.functions.RollingHash]]
    * expression; the oracle reproduces it with list_reduce over code
    * points — exact integer parity.
    */
  def textRollingFp(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.RollingHash.rollingHash
    Tables.documents(spark, sfDir)
      .withColumn("prefix",
        array_join(slice(split(col("text"), " "), 1, 16), " "))
      .select(
        col("doc_id"),
        rollingHash(col("text")).as("doc_hash"),
        rollingHash(col("prefix")).as("prefix_hash"))
      .orderBy("doc_id")
  }

  val textRollingFpSql: String = {
    def rh(e: String): String =
      s"""list_reduce(list_transform(range(1, len($e) + 1),
         |  i -> ascii($e[i])::BIGINT), (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin
    s"""SELECT doc_id,
       |  ${rh("text")} AS doc_hash,
       |  ${rh("prefix")} AS prefix_hash
       |FROM (
       |  SELECT doc_id, text,
       |    array_to_string(string_split(text, ' ')[1:16], ' ') AS prefix
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Deterministic stratified sampling: K docs per language stratum,
    * chosen by md5 order (a seeded hash shuffle both engines compute
    * bit-identically — unlike rand(), which can never oracle-match).
    * This is how a 100 TB pipeline draws stable per-language eval
    * slices: one window per stratum key, no global sort, and the same
    * doc set on every run and every engine.
    */
  def textStratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(md5(concat(lit("salt42:"), col("doc_id").cast("string"))),
        col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .select("doc_id", "lang", "rk")
      .orderBy("lang", "rk")
  }

  val textStratifiedSampleSql: String =
    """SELECT doc_id, lang, rk FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5('salt42:' || doc_id::VARCHAR), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 20
      |ORDER BY lang, rk""".stripMargin

  /** Quality-filter pipeline: the composite keep/drop decision a
    * training-data pipeline runs before tokenization, with the REASON
    * kept per document (reason-tagged drops are what make corpus
    * curation debuggable). First matching rule wins: too_short →
    * stopword_spam → low_quality → keep. All thresholds compare the
    * integer basis-point scores from [[textQuality]], so the verdict
    * is bit-identical across engines. Output is the per-(lang, reason)
    * census — O(strata), not O(corpus).
    */
  /** Adds the first-match quality verdict as a `reason` column,
    * preserving every input column — the shared verdict stage behind
    * [[textQualityFilter]] and the end-to-end curation pipeline
    * ([[graft.pipeline.PipelineOps.e2eCuration]]). Pure codegen'd
    * projection; integer basis points throughout.
    */
  def withQualityReason(df: DataFrame): DataFrame =
    df.withColumn("tk", split(col("text"), " "))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("tl",
        expr("aggregate(tk, 0L, (acc, x) -> acc + length(x))"))
      .withColumn("sh",
        expr(s"cast(size(filter(tk, x -> x in ${inList(stopwords)})) as long)"))
      .withColumn("stop_e4", expr("(sh * 10000L + n div 2) div n"))
      .withColumn("quality_e4",
        expr("""((100 * least(n, 100) * n + 6000 * sh +
                |  (case when tl <= 10 * n then 400 * tl else 4000 * n end))
                |  * 10000L + (20000 * n) div 2) div (20000 * n)"""
          .stripMargin))
      .withColumn("reason",
        when(col("n") < 5, "too_short")
          .when(col("stop_e4") > 4000, "stopword_spam")
          .when(col("quality_e4") < 3000, "low_quality")
          .otherwise("keep"))
      .drop("tk", "n", "tl", "sh", "stop_e4", "quality_e4")

  /** DuckDB twin of [[withQualityReason]]: doc_id, lang, source, text,
    * reason — reused as a CTE body by the quality-filter and curation
    * oracles.
    */
  val qualityReasonSql: String =
    s"""SELECT doc_id, lang, source, text,
       |  CASE
       |    WHEN n < 5 THEN 'too_short'
       |    WHEN (sh * 10000 + n // 2) // n > 4000 THEN 'stopword_spam'
       |    WHEN ((100 * least(n, 100) * n + 6000 * sh +
       |      (CASE WHEN tl <= 10 * n THEN 400 * tl ELSE 4000 * n END))
       |      * 10000 + (20000 * n) // 2) // (20000 * n) < 3000
       |      THEN 'low_quality'
       |    ELSE 'keep' END AS reason
       |FROM (
       |  SELECT doc_id, lang, source, text,
       |    len(tk)::BIGINT AS n,
       |    list_sum(list_transform(tk, x -> len(x)))::BIGINT AS tl,
       |    len(list_filter(tk, x -> x IN ${inList(stopwords)}))::BIGINT AS sh
       |  FROM (SELECT doc_id, lang, source, text,
       |          string_split(text, ' ') AS tk
       |        FROM documents))""".stripMargin

  def textQualityFilter(spark: SparkSession, sfDir: String): DataFrame =
    withQualityReason(Tables.documents(spark, sfDir))
      .groupBy("lang", "reason")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("sample_doc"))
      .orderBy("lang", "reason")

  val textQualityFilterSql: String =
    s"""SELECT lang, reason, count(*) AS n_docs, min(doc_id) AS sample_doc
       |FROM (
       |  SELECT doc_id, lang,
       |    CASE
       |      WHEN n < 5 THEN 'too_short'
       |      WHEN (sh * 10000 + n // 2) // n > 4000 THEN 'stopword_spam'
       |      WHEN ((100 * least(n, 100) * n + 6000 * sh +
       |        (CASE WHEN tl <= 10 * n THEN 400 * tl ELSE 4000 * n END))
       |        * 10000 + (20000 * n) // 2) // (20000 * n) < 3000
       |        THEN 'low_quality'
       |      ELSE 'keep' END AS reason
       |  FROM (
       |    SELECT doc_id, lang,
       |      len(tk)::BIGINT AS n,
       |      list_sum(list_transform(tk, x -> len(x)))::BIGINT AS tl,
       |      len(list_filter(tk, x -> x IN ${inList(stopwords)}))::BIGINT AS sh
       |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk
       |          FROM documents)))
       |GROUP BY lang, reason
       |ORDER BY lang, reason""".stripMargin

  /** Benchmark decontamination — flag training documents that share
    * any 5-gram with a held-out benchmark set (here: doc_id % 7 == 0
    * stands in for the eval suite). This is the standard pre-training
    * hygiene pass: any verbatim n-gram overlap with an eval set
    * disqualifies the training doc, regardless of overall similarity —
    * which is why it is NOT the jaccard dedup operator (that one
    * thresholds pairwise similarity within one corpus).
    *
    * Plan shape for 100 TB: shingle the corpus ONCE (localCheckpoint —
    * both branches read the materialized arrays instead of re-scanning
    * and re-shingling), then join benchmark and training shingles by
    * ngram. The stand-in benchmark here is 1/7 of the corpus's distinct
    * 5-grams — corpus-proportional — so it must NOT be broadcast: a
    * shuffle join on ngram is the plan that survives 100×. A real eval
    * suite is MBs, and AQE will broadcast it on its own from runtime
    * stats; hard-coding the hint is what breaks at scale.
    */
  def textDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 5
    val grams = spreadTokens(spark, sfDir)
      .filter(size(col("tk")) >= k)
      .select(col("doc_id"), expr(
        s"""array_distinct(transform(sequence(0, size(tk) - $k),
           |  i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
           |                 tk[i+4])))""".stripMargin).as("ng"))
      .localCheckpoint()
    val bench = grams.filter(col("doc_id") % 7 === 0)
      .select(explode(col("ng")).as("ngram")).distinct()
    grams.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), explode(col("ng")).as("ngram"))
      .join(bench, Seq("ngram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  val textDecontaminateSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(tk) - 4),
      |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
      |                   tk[i+4]))) AS ng
      |  FROM t),
      |be AS (SELECT DISTINCT unnest(ng) AS ngram FROM g
      |       WHERE doc_id % 7 = 0),
      |e AS (SELECT doc_id, unnest(ng) AS ngram FROM g
      |      WHERE doc_id % 7 <> 0)
      |SELECT e.doc_id AS doc_id, count(*) AS n_shared
      |FROM e JOIN be USING (ngram)
      |GROUP BY e.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Duplicate-span detection — the Spark approximation of
    * suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): every token 8-gram
    * window is hashed, and a window is a duplicate span iff its hash
    * also occurs in a DIFFERENT document. Output is the per-document
    * duplication profile (window count, duplicated-window count and
    * basis-point fraction, first duplicated offset) — the signal a
    * curation pipeline thresholds to cut boilerplate-heavy documents
    * or clip the duplicated spans.
    *
    * Scale shape: windows ship as (doc_id, pos, md5) — 16-byte hashes,
    * never gram strings — through exactly TWO shuffles: one hash
    * partition by window hash, where cross-doc occurrence is decided
    * by `min(doc_id) != max(doc_id)` over the hash partition (constant
    * state per window, no collect_set, spillable WindowExec buffer
    * even for boilerplate 8-grams shared by millions of docs), and one
    * re-aggregation by doc_id. Within-doc repeats are NOT flagged —
    * cross-document verbatim overlap is the dedup/contamination
    * signal; same choice as [[textDecontaminate]].
    */
  def textDupSpans(spark: SparkSession, sfDir: String, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = spreadTokens(spark, sfDir)
      .filter(size(col("tk")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(tk) - $k),
           |  i -> md5(concat_ws(' ', slice(tk, i + 1, $k))))""".stripMargin)))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val wh = Window.partitionBy("h")
    wins
      .withColumn("dup",
        max("doc_id").over(wh) > min("doc_id").over(wh))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_windows"),
        min(when(col("dup"), col("pos").cast("long"))).as("first_dup_pos"))
      .withColumn("dup_e4",
        expr("(n_dup_windows * 10000L + n_windows div 2) div n_windows"))
      .orderBy("doc_id")
  }

  val textDupSpansSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8),
      |w AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(tk) - 7),
      |      i -> {'pos': i - 1,
      |            'h': md5(array_to_string(tk[i:i+7], ' '))})) AS s
      |  FROM t),
      |w2 AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM w),
      |m AS (
      |  SELECT doc_id, pos,
      |    max(doc_id) OVER (PARTITION BY h)
      |      > min(doc_id) OVER (PARTITION BY h) AS dup
      |  FROM w2)
      |SELECT doc_id,
      |  count(*)::BIGINT AS n_windows,
      |  sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_windows,
      |  min(CASE WHEN dup THEN pos END)::BIGINT AS first_dup_pos,
      |  (sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT * 10000
      |    + count(*) // 2) // count(*) AS dup_e4
      |FROM m
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** CCNet/RefinedWeb-style line-level boilerplate removal: segment
    * each document into fixed 10-token "lines" (the corpus has no
    * newlines, so a deterministic token window stands in for the
    * physical line — same substitution as [[textRepetition]]'s
    * Gopher adaptation), count each segment's document frequency
    * WITHIN its `source` (the domain analog), drop segments seen in
    * `dfCap`+ documents of the same source (nav bars, cookie
    * banners, footers), and re-emit the cleaned document: kept/removed
    * segment counts, cleaned length, and an md5 fingerprint of the
    * reconstructed text so the oracle verifies the exact re-assembly,
    * not just the counts.
    *
    * Scale shape — deliberately scan-twice, shuffle-hashes-once
    * (the opposite call from [[textBigramLm]]'s one-pass exchange
    * reuse, and for a reason): segmentation does not shrink the data
    * the way bigram folding does, so sharing one exchange here would
    * shuffle the FULL segment text. Instead the df-count branch
    * re-scans the pruned parquet (columnar scan ≪ shuffle write+read
    * at equal bytes) and ships only (source, md5, doc_id) — ~20% of
    * corpus bytes — into one count-distinct aggregation with map-side
    * combine. The removal set is then `dfc >= cap` ONLY, the sublinear
    * boilerplate vocabulary, so the decision join broadcasts it (AQE;
    * if a pathological corpus outgrows the broadcast threshold the
    * fallback SMJ still shuffles segments just once). Re-assembly is
    * one groupBy(doc_id) whose state is bounded by the document
    * itself (sort_array over the doc's own segments), never by
    * corpus size.
    */
  def textLineDedup(spark: SparkSession, sfDir: String,
      segLen: Int = 10, dfCap: Int = 2): DataFrame = {
    val segs = spreadTokens(spark, sfDir, "doc_id", "source")
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), col("source"), posexplode(expr(
        s"""transform(sequence(0, (size(tk) + ${segLen - 1}) div $segLen - 1),
           |  i -> concat_ws(' ', slice(tk, i * $segLen + 1, $segLen)))"""
          .stripMargin)))
      .select(col("doc_id"), col("source"),
        col("pos").as("seg_idx"), col("col").as("seg"),
        md5(col("col")).as("h"))
    val hot = segs
      .groupBy(col("source"), col("h"))
      .agg(countDistinct(col("doc_id")).as("dfc"))
      .filter(col("dfc") >= dfCap)
      .select(col("source"), col("h"), lit(true).as("is_hot"))
    segs
      .join(hot, Seq("source", "h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("is_hot"), 1L).otherwise(0L)).as("n_removed"),
        sort_array(collect_list(when(col("is_hot").isNull,
          struct(col("seg_idx"), col("seg"))))).as("kept"))
      .select(col("doc_id"), col("n_segs"), col("n_removed"),
        expr("concat_ws(' ', transform(kept, x -> x.seg))").as("clean"))
      .select(col("doc_id"), col("n_segs"), col("n_removed"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_fp"))
      .orderBy("doc_id")
  }

  val textLineDedupSql: String =
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS tk
      |  FROM documents WHERE len(string_split(text, ' ')) > 0),
      |seg0 AS (
      |  SELECT doc_id, source,
      |    unnest(list_transform(generate_series(1, (len(tk) + 9) // 10),
      |      i -> {'seg_idx': i - 1,
      |            'seg': array_to_string(tk[(i-1)*10+1:(i-1)*10+10], ' ')}))
      |      AS s
      |  FROM t),
      |seg AS (
      |  SELECT doc_id, source, s.seg_idx AS seg_idx, s.seg AS seg
      |  FROM seg0),
      |df AS (
      |  SELECT source, md5(seg) AS h, count(DISTINCT doc_id) AS dfc
      |  FROM seg GROUP BY 1, 2),
      |j AS (
      |  SELECT seg.doc_id, seg.seg_idx, seg.seg, df.dfc >= 2 AS is_hot
      |  FROM seg JOIN df
      |    ON df.source = seg.source AND df.h = md5(seg.seg))
      |SELECT doc_id,
      |  count(*)::BIGINT AS n_segs,
      |  sum(CASE WHEN is_hot THEN 1 ELSE 0 END)::BIGINT AS n_removed,
      |  length(coalesce(string_agg(CASE WHEN NOT is_hot THEN seg END, ' '
      |    ORDER BY seg_idx), ''))::BIGINT AS clean_len,
      |  md5(coalesce(string_agg(CASE WHEN NOT is_hot THEN seg END, ' '
      |    ORDER BY seg_idx), '')) AS clean_fp
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Repetition signals (Gopher/FineWeb-style, token-adapted): per
    * document, the fraction of n-grams claimed by the single most
    * frequent n-gram (`topN_e4`) and the fraction sitting in any
    * repeated n-gram (`dupN_e4`), for n = 2 and 3. These are the
    * cheap boilerplate/degenerate-text detectors run before model
    * scoring: templated spam shows extreme top-gram mass, stutter
    * loops show high duplicate mass. (The corpus has no newlines, so
    * the line-based Gopher variants reduce to these token forms.)
    *
    * Scale shape: explode to (doc_id, gram) then TWO hash
    * aggregations — (doc_id, gram) counts with map-side partial
    * combine (boilerplate grams collapse locally), then per-doc
    * rollup with constant state. No windows, no per-doc quadratic
    * HOF work; all fractions are half-up integer basis points, the
    * proven bit-identical formulation.
    */
  def textRepetition(spark: SparkSession, sfDir: String): DataFrame = {
    val base = spreadTokens(spark, sfDir)
      .filter(size(col("tk")) >= 3)
    // grams flow through the count agg as int64 multi-arg xxhash64, not
    // concatenated strings: no per-gram string build, 8-byte group keys
    // in the (doc_id, gram) shuffle/hashmap (the same hashed-key shape
    // that fixed dedup_ngram_jaccard's probe blowup). Token-boundary
    // safe — XxHash64 chains per-field (each field hashed with the
    // previous hash as seed), so ("ab","c") and ("a","bc") differ. The
    // oracle groups by its own gram strings; only counts leave the agg,
    // so representations never need to match across engines.
    def gramStats(n: Int): DataFrame = base
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(tk) - $n),
           |  i -> xxhash64(${(0 until n).map(j => s"tk[i + $j]")
                    .mkString(", ")}))""".stripMargin))
        .as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("ntot"),
        max("c").as("top"),
        sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("dup"))
      .select(col("doc_id"),
        col("ntot").as(s"n${n}grams"),
        expr("(top * 10000L + ntot div 2) div ntot").as(s"top${n}_e4"),
        expr("(dup * 10000L + ntot div 2) div ntot").as(s"dup${n}_e4"))
    gramStats(2).join(gramStats(3), Seq("doc_id"))
      .orderBy("doc_id")
  }

  val textRepetitionSql: String = {
    def stats(n: Int): String =
      s"""SELECT doc_id, sum(c)::BIGINT AS ntot, max(c)::BIGINT AS top,
         |    sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup
         |  FROM (
         |    SELECT doc_id, g, count(*)::BIGINT AS c FROM (
         |      SELECT doc_id,
         |        unnest(list_transform(generate_series(1, len(tk) - ${n - 1}),
         |          i -> array_to_string(tk[i:i+${n - 1}], ' '))) AS g
         |      FROM t)
         |    GROUP BY doc_id, g)
         |  GROUP BY doc_id""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |s2 AS (
       |  ${stats(2)}),
       |s3 AS (
       |  ${stats(3)})
       |SELECT s2.doc_id AS doc_id,
       |  s2.ntot AS n2grams,
       |  (s2.top * 10000 + s2.ntot // 2) // s2.ntot AS top2_e4,
       |  (s2.dup * 10000 + s2.ntot // 2) // s2.ntot AS dup2_e4,
       |  s3.ntot AS n3grams,
       |  (s3.top * 10000 + s3.ntot // 2) // s3.ntot AS top3_e4,
       |  (s3.dup * 10000 + s3.ntot // 2) // s3.ntot AS dup3_e4
       |FROM s2 JOIN s3 ON s3.doc_id = s2.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Corpus-statistics token-rarity scoring — the oracle-exact
    * stand-in for LM-perplexity quality filtering (the CCNet recipe:
    * score each document by how surprising its tokens are under a
    * corpus-level model, then review/drop both tails). The per-token
    * score here is the INTEGER floor-log10 IDF — the decimal digit
    * count of `total_tokens div token_count` — so the whole pipeline
    * is exact BIGINT arithmetic and hash-compares against the oracle;
    * a real deployment swaps an LM logprob per token into the same
    * plan (transcendental logs diverge at the final ulp across
    * engines, which is why the catalog twin is the integer form).
    *
    * Scale shape: one explode + hash-agg builds the vocabulary (tiny
    * vs the corpus; AQE broadcasts it), the exploded tokens join it,
    * and a per-doc re-aggregation folds the scores. Two data-sized
    * shuffles — (token), then (doc_id) — everything else codegen.
    */
  def textIdfRarity(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val totalDf = counts.agg(sum("cnt").as("total"))
    val vocab = counts.crossJoin(broadcast(totalDf))
      .withColumn("rare",
        length(expr("cast(total div cnt as string)")).cast("long"))
      .select("tok", "rare")
    toks.join(vocab, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("rare").as("rare_sum"))
      .withColumn("mean_rare_e4",
        expr("(rare_sum * 10000L + n_tokens div 2) div n_tokens"))
      .orderBy("doc_id")
  }

  val textIdfRaritySql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |counts AS (
      |  SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok),
      |vocab AS (
      |  SELECT tok,
      |    length(((SELECT sum(cnt)::BIGINT FROM counts) // cnt)::VARCHAR)
      |      ::BIGINT AS rare
      |  FROM counts)
      |SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
      |  sum(v.rare)::BIGINT AS rare_sum,
      |  (sum(v.rare)::BIGINT * 10000 + count(*) // 2) // count(*)
      |    AS mean_rare_e4
      |FROM toks t JOIN vocab v ON v.tok = t.tok
      |GROUP BY t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Per-document keyword extraction: the top-3 terms by exact-integer
    * tf-idf — the metadata tagger run over a curated corpus (search
    * facets, topic routing, mixture diagnostics). The idf is the
    * floor-log10 DOCUMENT-frequency form ([[textIdfRarity]] uses the
    * term-frequency form): digits of `N_docs div df`, so a term in
    * every doc scores 1 and each 10× rarity step adds 1 — integer
    * arithmetic both engines replay exactly. score = tf · idf_digits,
    * ties broken by term text ascending, so the top-3 is total-ordered
    * and hash-stable.
    *
    * Scale shape: (doc, tok) tf agg (map-side combined), df derived
    * from it (vocab-sized, no second corpus pass), idf broadcast back
    * onto the tf rows, and the per-doc top-3 runs as a rank window
    * partitioned by doc_id — millions of tiny partitions, and the
    * `rank <= 3` filter rewrites to a map-side WindowGroupLimit so at
    * most 3 rows per doc reach the Exchange.
    */
  def textKeywordsTopK(spark: SparkSession, sfDir: String, k: Int = 3)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // doc_id is the table key and tf already holds DISTINCT (doc, term)
    // rows, so both "distinct" counts are plain counts — countDistinct
    // here cost a second expand/shuffle phase for identical values
    // (x30 probe: 8.8x, the catalog's worst ratio, mostly this)
    val nDocs = Tables.documents(spark, sfDir).agg(
      count(lit(1)).as("n_docs"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"),
        length(expr("cast(n_docs div df as string)")).cast("long")
          .as("idf_digits"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(idf, "term")
      .withColumn("score", col("tf") * col("idf_digits"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "score")
      .orderBy("doc_id", "rank")
  }

  val textKeywordsTopKSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY 1, 2),
      |idf AS (
      |  SELECT term,
      |    length(((SELECT count(DISTINCT doc_id) FROM documents)
      |      // count(DISTINCT doc_id))::VARCHAR)::BIGINT AS idf_digits
      |  FROM tf GROUP BY term),
      |ranked AS (
      |  SELECT tf.doc_id, tf.term, tf.tf,
      |    tf.tf * idf.idf_digits AS score,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf * idf.idf_digits DESC, tf.term ASC) AS rank
      |  FROM tf JOIN idf ON idf.term = tf.term)
      |SELECT doc_id, rank, term, tf, score
      |FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Per-domain ADAPTIVE quality gate: keep each document iff its
    * length reaches its own source's exact lower median — threshold
    * calibration per domain, the way production quality pruning sets
    * per-source cutoffs instead of one global number (a global cutoff
    * silently empties short-form domains and passes everything in
    * long-form ones). `n_chars` is the gating metric here because it is
    * a stored column: the whole gate runs off a 3-column pruned scan
    * with NO text parsing; any scored metric (e.g. [[textQuality]]'s
    * quality_e4) drops into the same plan.
    *
    * The exact median never touches data-sized shuffles: documents are
    * pre-aggregated to (source, n_chars) counts (map-side combine; the
    * output is |distinct lengths per domain|, not |docs|), a window
    * over that TINY aggregate finds the smallest value whose cumulative
    * count reaches ceil(n/2) — the lower median, integer-exact in both
    * engines — and the per-source thresholds broadcast back onto the
    * unshuffled scan as a join + filter. At 100 TB the gate is a
    * broadcast hash join projection; domain skew is irrelevant because
    * only counts, never rows, partition by source.
    */
  def textDomainGate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars")
    val counts = docs.groupBy("source", "n_chars")
      .agg(count(lit(1)).as("c"))
    val bySource = Window.partitionBy("source")
    val cum = counts
      .withColumn("cum", sum("c").over(bySource.orderBy("n_chars")))
      .withColumn("tot", sum("c").over(bySource))
    val med = cum.filter(col("cum") >= expr("(tot + 1) div 2"))
      .groupBy("source").agg(min("n_chars").as("med"))
    docs.join(broadcast(med), "source")
      .filter(col("n_chars") >= col("med"))
      .select("doc_id", "source", "n_chars", "med")
      .orderBy("doc_id")
  }

  val textDomainGateSql: String =
    """WITH counts AS (
      |  SELECT source, n_chars, count(*)::BIGINT AS c
      |  FROM documents GROUP BY source, n_chars),
      |cum AS (
      |  SELECT source, n_chars,
      |    sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS tot
      |  FROM counts),
      |med AS (
      |  SELECT source, min(n_chars) AS med
      |  FROM cum WHERE cum >= (tot + 1) // 2
      |  GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars, m.med
      |FROM documents d JOIN med m ON m.source = d.source
      |WHERE d.n_chars >= m.med
      |ORDER BY d.doc_id""".stripMargin

  /** Fixed query terms + result size for [[textBm25TopK]] — chosen from
    * the synthetic vocabulary so every SF has matches. */
  val bm25Terms: Seq[String] = Seq("spark", "join", "window")
  val bm25K = 20

  /** BM25 top-k retrieval (k1 = 1.2, b = 0.75) in EXACT int64
    * fixed-point — the sparse-retrieval half of a training-data search
    * stack (the dense half is the ann_* family). The scoring recipe is
    * the spec: with N docs, total token count L, per-doc length `len`,
    * term frequency `tf` and document frequency `df`,
    *
    *   idf_e6   = ((2N − 2df + 1)·10^6) div (2df + 1)      -- Robertson
    *              idf (N−df+0.5)/(df+0.5), halves cleared
    *   r_e6     = (len·N·10^6) div L                        -- len/avgdl
    *   denom_e6 = tf·10^6 + 3·10^5 + (9·r_e6) div 10        -- tf +
    *              k1(1 − b + b·len/avgdl) with k1=6/5, b=3/4
    *   dpt_e6   = denom_e6 div tf                           -- per-tf-unit
    *   sq_e4    = (idf_e6·11·10^4) div (5·dpt_e6)           -- (k1+1)=11/5
    *
    * and score_e4 = Σ over matched query terms of sq_e4. Every step is
    * integer arithmetic on positive operands, so Spark `div` and DuckDB
    * `//` agree bit-for-bit (transcendental-free: the same reason
    * [[textIdfRarity]] uses digit-count IDF). Truncation error vs
    * real-valued BM25 is < 10^-3 per term — rank-irrelevant here, and
    * the spec's differential pins the recipe itself.
    *
    * OVERFLOW DOMAIN (property-tested in TextBm25Spec against BigInt):
    * dividing by tf BEFORE the idf product caps every intermediate at
    * max(idf_e6·110000, len·N·10^6), int64-safe for N ≤ 10^7 docs with
    * len ≤ 10^4 tokens — the naive (tf·idf_e6·110000) ordering
    * overflows at df=1 already for tf·N > ~8·10^7. Beyond 10^7 docs
    * (a 100 TB corpus is ~10^10) the same recipe runs with idf_e6 as
    * DECIMAL(38,0) — Spark decimals and DuckDB HUGEINT agree on
    * truncating division — or with per-shard N; the plan shape is
    * unchanged either way.
    *
    * Scale shape: one scan builds (doc, term, tf) via a 3-term literal
    * explode (output is |matches|, not |docs|×|terms|, after the tf>0
    * filter); df is a 3-row aggregate joined back by broadcast; the
    * global (N, L) scalar rides a broadcast cross join; top-k is
    * TakeOrderedAndProject (per-partition heads, no global sort).
    */
  /** The scoring stage of [[textBm25TopK]] — every matched doc's
    * integer score, no rank cut — shared with the hybrid-retrieval
    * fusion ([[graft.sim.SimilarityOps.hybridRrfTopK]]).
    */
  def bm25Scores(spark: SparkSession, sfDir: String): DataFrame = {
    // r20 note: a localCheckpoint of this tokenized relation (its
    // three consumers — totals, matched, dfCounts — each re-scan and
    // re-split the corpus) was A/B-measured WORSE at sf0.1
    // (bm25 0.54 -> 0.64 s, hybrid_rrf 0.79 -> 0.98 s) and reverted:
    // materializing 5k wide token arrays costs more than the cheap
    // parallel re-scans, and the eager barrier serializes
    // hybrid_rrf's two otherwise-concurrent arms.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("tk"))
      .withColumn("len", size(col("tk")).cast("long"))
    val totals = docs.agg(
      count(lit(1)).cast("long").as("N"), sum("len").as("L"))
    val matched = docs
      .select(col("doc_id"), col("len"), col("tk"),
        explode(array(bm25Terms.map(lit): _*)).as("term"))
      .withColumn("tf",
        expr("cast(size(filter(tk, x -> x = term)) as bigint)"))
      .filter(col("tf") > 0)
      .drop("tk")
    val dfCounts = matched.groupBy("term").agg(count(lit(1)).as("df"))
    matched
      .join(broadcast(dfCounts), "term")
      .crossJoin(broadcast(totals))
      .withColumn("sq_e4", expr(
        "((((2*N - 2*df + 1) * 1000000L) div (2*df + 1)) * 110000L)" +
          " div (5L * ((tf * 1000000L + 300000L" +
          " + (9L * ((len * N * 1000000L) div L)) div 10L) div tf))"))
      .groupBy("doc_id").agg(sum("sq_e4").as("score_e4"))
  }

  def textBm25TopK(spark: SparkSession, sfDir: String): DataFrame =
    bm25Scores(spark, sfDir)
      .orderBy(desc("score_e4"), asc("doc_id"))
      .limit(bm25K)

  val textBm25TopKSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS tk,
      |    len(string_split(lower(text), ' '))::BIGINT AS len
      |  FROM documents),
      |g AS (SELECT count(*)::BIGINT AS N, sum(len)::BIGINT AS L FROM d),
      |t(term) AS (VALUES ('spark'), ('join'), ('window')),
      |m AS (
      |  SELECT * FROM (
      |    SELECT doc_id, len, term,
      |      len(list_filter(tk, x -> x = term))::BIGINT AS tf
      |    FROM d CROSS JOIN t)
      |  WHERE tf > 0),
      |df AS (SELECT term, count(*)::BIGINT AS df FROM m GROUP BY term),
      |s AS (
      |  SELECT m.doc_id,
      |    (((((2*g.N - 2*df.df + 1) * 1000000) // (2*df.df + 1))
      |        * 110000)
      |     // (5 * ((m.tf * 1000000 + 300000
      |        + (9 * ((m.len * g.N * 1000000) // g.L)) // 10) // m.tf)))
      |      AS sq_e4
      |  FROM m CROSS JOIN g JOIN df ON df.term = m.term)
      |SELECT doc_id, sum(sq_e4)::BIGINT AS score_e4
      |FROM s GROUP BY doc_id
      |ORDER BY score_e4 DESC, doc_id
      |LIMIT 20""".stripMargin

  /** Token-level Shannon entropy per document — the information-density
    * quality signal (low entropy = repetitive/boilerplate text, a
    * standard pre-training filter alongside [[textRepetition]]'s
    * ngram-ratio view; they catch different degeneracies: entropy sees
    * skewed unigram DISTRIBUTIONS, repetition sees exact span copies).
    *
    * Cross-engine float parity via the fixed-point trick
    * ([[textBm25TopK]]): each distinct count c contributes
    * `c * round(ln(c)·1e6)` — the rounding happens per VALUE (same
    * integer in, same 1e-6-quantized term out in any engine), so the
    * per-doc sums are order-free int64 arithmetic and immune to the
    * double-summation association trap. Entropy follows exactly:
    * H = ln(n) − (Σ c·ln c)/n, all in integer µnats, emitted in 1e-4
    * nats. Two map-side-combining shuffles (doc×token, then doc) — the
    * inverted-index shape that scales linearly.
    */
  def textEntropy(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n"),
        sum(expr("c * cast(round(ln(c) * 1000000) as bigint)"))
          .as("clnc_e6"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        expr("greatest(cast(round(ln(n) * 1000000) as bigint)" +
          " - clnc_e6 div n, 0L) div 100").as("entropy_e4"))
      .orderBy("doc_id")

  val textEntropySql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tok, count(*)::BIGINT AS c
      |  FROM toks WHERE tok <> '' GROUP BY 1, 2),
      |a AS (
      |  SELECT doc_id, sum(c)::BIGINT AS n,
      |    sum(c * round(ln(c) * 1000000)::BIGINT)::BIGINT AS clnc_e6
      |  FROM c GROUP BY 1)
      |SELECT doc_id, n AS n_tokens,
      |  greatest(round(ln(n) * 1000000)::BIGINT - clnc_e6 // n, 0) // 100
      |    AS entropy_e4
      |FROM a
      |ORDER BY doc_id""".stripMargin

  /** Exact substring DEDUPLICATION (the remove pass): strip every token
    * span of length ≥ k that appears verbatim in more than one document,
    * and rebuild the cleaned text. [[textDupSpans]] is the detector twin
    * (it profiles how much of a doc is duplicated); this operator
    * actually produces the deduplicated corpus — the standard
    * exact-substring pass run over pre-training data, where verbatim
    * cross-document boilerplate is cut out of every copy.
    *
    * Semantics: token i is removed iff some k-window containing it
    * (start p ∈ [i−k+1, i]) hashes to a k-gram seen in ≥2 distinct
    * docs. Runs of overlapping dup windows therefore merge into one
    * removed span with no island bookkeeping: the membership test is a
    * per-token running `max(dup)` over the previous k−1 window starts —
    * token rows are CONSECUTIVE per doc, so a ROWS frame of k−1
    * PRECEDING is exactly the span union.
    *
    * Scale shape: tokens ship as (doc_id, i, tok, 16-byte window md5).
    * One hash agg by window hash emits ONLY the cross-doc-duplicated
    * hashes (tiny vs corpus; AQE broadcasts it), the token rows
    * left-join it, one window + final agg by doc_id share a single
    * doc_id exchange. Kept text is re-joined inside the per-doc agg
    * (doc-bounded state) and emitted as md5 so the output row stays
    * narrow at any document size.
    */
  def textSubstringDedup(spark: SparkSession, sfDir: String, k: Int = 8)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokRows = spreadTokens(spark, sfDir)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(tk, (x, i) -> named_struct(
           |  'tok', x,
           |  'h', if(i + $k <= size(tk),
           |          md5(concat_ws(' ', slice(tk, i + 1, $k))), null)))"""
          .stripMargin)))
      .select(col("doc_id"), col("pos").as("i"),
        col("col.tok").as("tok"), col("col.h").as("h"))
    val dupH = tokRows.filter(col("h").isNotNull)
      .groupBy("h").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("h"), lit(true).as("isdup"))
    val cover = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(-(k - 1), Window.currentRow)
    tokRows.join(dupH, Seq("h"), "left_outer")
      .withColumn("covered",
        max(when(col("isdup"), 1).otherwise(0)).over(cover) === 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("covered"), 1L).otherwise(0L)).as("n_removed"),
        expr("""md5(array_join(transform(array_sort(
               |  collect_list(if(covered, null, named_struct('i', i, 'tok', tok)))),
               |  s -> s.tok), ' '))""".stripMargin).as("kept_md5"))
      .orderBy("doc_id")
  }

  val textSubstringDedupSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |tr AS (
      |  SELECT doc_id, s.i AS i, s.tok AS tok, s.h AS h FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)),
      |      i -> {'i': i - 1, 'tok': tk[i],
      |            'h': CASE WHEN i + 7 <= len(tk)
      |                 THEN md5(array_to_string(tk[i:i+7], ' ')) END})) AS s
      |    FROM t)),
      |d AS (
      |  SELECT h FROM tr WHERE h IS NOT NULL
      |  GROUP BY h HAVING min(doc_id) <> max(doc_id)),
      |f AS (
      |  SELECT tr.doc_id, tr.i, tr.tok,
      |    max(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY tr.doc_id ORDER BY tr.i
      |            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) = 1 AS covered
      |  FROM tr LEFT JOIN d ON d.h = tr.h)
      |SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |  sum(CASE WHEN covered THEN 1 ELSE 0 END)::BIGINT AS n_removed,
      |  md5(coalesce(
      |    string_agg(tok, ' ' ORDER BY i) FILTER (WHERE NOT covered), ''))
      |    AS kept_md5
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bigram-LM surprisal scoring — the KenLM-perplexity quality filter
    * re-expressed as exact integer arithmetic. A 2-gram model is fit on
    * the corpus itself (counts c(w1 w2) and prefix totals c(w1 ·)); each
    * document is scored by its mean conditional surprisal
    * −ln P(w2|w1) = ln c(w1·) − ln c(w1w2), in µnats. Unlike the
    * order-free unigram views ([[textEntropy]], [[textIdfRarity]]) this
    * is CONTEXT-SENSITIVE: scrambled or stitched text scores high even
    * when its unigram profile is normal — the signal perplexity filters
    * actually use.
    *
    * Float parity by the per-value rounding trick ([[textEntropy]]):
    * both logs are `round(ln(integer count)·1e6)` — same integer in,
    * same quantized term out in any engine — so per-doc sums are exact
    * int64 and association-order-free.
    *
    * Scale shape (r11): ONE tokenize+explode pass, with bigrams as
    * 8-byte keys — `bh = xxhash64(w1, w2)` and `w1h = xxhash64(w1)`
    * (the [[textRepetition]] hashed-key shape: no per-gram string
    * builds in the shuffle, token-boundary safe because XxHash64
    * chains per-field; the oracle groups by its own gram strings and
    * only counts leave the aggs, so representations never need to
    * match across engines). The explode folds straight into a
    * per-(doc, bigram) count — the only corpus-sized shuffle — and
    * that ONE exchange feeds BOTH the model fit (c2 → c1, bounded by
    * distinct observed bigrams) and the scoring join (Spark's
    * ReuseExchange shares the materialized stage; r10's shape re-ran
    * the tokenize+explode corpus scan for each). The scored bigram
    * dim joins back on the single int64 `bh` — AQE broadcasts it when
    * small — and one doc_id agg folds the k-weighted scores.
    */
  def textBigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    // one tokenize+explode, immediately folded to per-(doc, bigram)
    // occurrence counts — the ONLY corpus-sized shuffle; both the
    // model fit (c2 → c1) and the scoring join consume this same
    // exchange (Spark's ReuseExchange/AQE shares the materialized
    // stage), so the corpus is tokenized exactly once with no
    // token-level materialization
    val dkb = spreadTokens(spark, sfDir)
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(tk) - 2),
          |  i -> named_struct('bh', xxhash64(tk[i], tk[i + 1]),
          |                    'w1h', xxhash64(tk[i])))""".stripMargin))
        .as("b"))
      .groupBy(col("doc_id"), col("b.bh").as("bh"), col("b.w1h").as("w1h"))
      .agg(count(lit(1)).as("k"))
    val c2 = dkb.groupBy("w1h", "bh").agg(sum("k").as("c2"))
    val c1 = c2.groupBy("w1h").agg(sum("c2").as("c1"))
    // the scoring join keys on BOTH hashes (r11 advice): on bh alone, a
    // cross-w1 bh collision would leave two scored rows with one bh and
    // duplicate doc rows through the join. A residual 64-bit bh
    // collision between distinct bigrams still merges their counts in
    // Spark while the string-keyed oracle keeps them apart — the same
    // documented trade-off as dedup's 60-bit hashed shingles: at 10^9
    // distinct bigrams the birthday bound puts a collision at ~3%
    // probability, and a hit perturbs one count by one, not the scale
    // shape. The exactness claim is "exact over the hashed key space".
    val scored = c2.join(c1, "w1h").select(col("w1h"), col("bh"),
      expr("""cast(round(ln(c1) * 1000000) as bigint)
             | - cast(round(ln(c2) * 1000000) as bigint)""".stripMargin)
        .as("nll"))
    dkb.join(scored, Seq("w1h", "bh"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"), sum(col("k") * col("nll")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("((s + n_bigrams div 2) div n_bigrams) div 100").as("nll_e4"))
      .orderBy("doc_id")
  }

  val textBigramLmSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bi AS (
      |  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
      |      i -> {'w1': tk[i], 'w2': tk[i + 1]})) AS s
      |    FROM t)),
      |c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1),
      |lp AS (
      |  SELECT c2.w1, c2.w2,
      |    round(ln(c1) * 1000000)::BIGINT - round(ln(c2) * 1000000)::BIGINT
      |      AS nll
      |  FROM c2 JOIN c1 ON c1.w1 = c2.w1),
      |a AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(nll)::BIGINT AS s
      |  FROM bi JOIN lp ON lp.w1 = bi.w1 AND lp.w2 = bi.w2
      |  GROUP BY 1)
      |SELECT doc_id, n_bigrams,
      |  ((s + n_bigrams // 2) // n_bigrams) // 100 AS nll_e4
      |FROM a ORDER BY doc_id""".stripMargin

  /** Corpus drift detection via the Population Stability Index — the
    * monitor a data pipeline runs when a new crawl/source lands: bin a
    * cheap feature (token count here), compare the candidate
    * population's bin mass against the baseline's, and alarm when
    * PSI = Σ (p−q)·ln(p/q) crosses ~0.2. Baseline = `src0` documents,
    * candidate = every other source; six fixed token-count bins;
    * add-one smoothing keeps empty bins defined (and is part of the
    * spec — both engines smooth identically).
    *
    * Exact integers: bin masses are e6 fixed-point via truncating
    * division, the log-ratio uses the per-value trick
    * ([[textEntropy]]) — ln of each INTEGER mass rounds to µnats
    * independently, so the difference is exact int64 — and each bin's
    * contribution divides back to e6. Max |term|: 10⁶ · ~14·10⁶
    * fits int64 with 2 decades to spare.
    *
    * Scale shape: one scan → (bin, population) counts via hash agg
    * with map-side combine (12 groups), a 6-row static bin spine
    * left-joins the counts, and everything after the first agg is
    * constant-size. The binning projection is pure codegen.
    */
  def textDriftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    val binExpr =
      """case when n < 50 then 0 when n < 100 then 1 when n < 150 then 2
        |     when n < 200 then 3 when n < 300 then 4 else 5 end"""
        .stripMargin
    val counts = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).as("n"))
      .withColumn("bin", expr(binExpr))
      .withColumn("pop",
        when(col("source") === "src0", lit("base")).otherwise(lit("cand")))
      .groupBy("bin", "pop").agg(count(lit(1)).as("c"))
    val spine = spark.range(0, 6).select(col("id").cast("int").as("bin"))
    val wide = spine
      .join(counts.filter(col("pop") === "base")
        .select(col("bin"), col("c").as("cb")), Seq("bin"), "left_outer")
      .join(counts.filter(col("pop") === "cand")
        .select(col("bin"), col("c").as("cc")), Seq("bin"), "left_outer")
      .withColumn("base_n", coalesce(col("cb"), lit(0L)))
      .withColumn("cand_n", coalesce(col("cc"), lit(0L)))
    wide
      .crossJoin(broadcast(wide.agg(
        sum("base_n").as("tb"), sum("cand_n").as("tc"))))
      // greatest(·, 1): a bin mass that truncates to 0 e6 (possible
      // only past 10^6 docs per population) must not reach ln()
      .withColumn("pb",
        expr("greatest(((base_n + 1L) * 1000000L) div (tb + 6L), 1L)"))
      .withColumn("qc",
        expr("greatest(((cand_n + 1L) * 1000000L) div (tc + 6L), 1L)"))
      .select(col("bin"), col("base_n"), col("cand_n"),
        expr("""(pb - qc)
               | * (cast(round(ln(pb) * 1000000) as bigint)
               |    - cast(round(ln(qc) * 1000000) as bigint))
               | div 1000000L""".stripMargin).as("psi_e6"))
      .orderBy("bin")
  }

  val textDriftPsiSql: String =
    """WITH d AS (
      |  SELECT source, len(string_split(text, ' ')) AS n FROM documents),
      |b AS (
      |  SELECT CASE WHEN n < 50 THEN 0 WHEN n < 100 THEN 1
      |              WHEN n < 150 THEN 2 WHEN n < 200 THEN 3
      |              WHEN n < 300 THEN 4 ELSE 5 END AS bin,
      |    CASE WHEN source = 'src0' THEN 'base' ELSE 'cand' END AS pop
      |  FROM d),
      |c AS (SELECT bin, pop, count(*)::BIGINT AS c FROM b GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(0, 5)) AS bin),
      |wide AS (
      |  SELECT s.bin,
      |    coalesce(cb.c, 0)::BIGINT AS base_n,
      |    coalesce(cc.c, 0)::BIGINT AS cand_n
      |  FROM spine s
      |  LEFT JOIN c cb ON cb.bin = s.bin AND cb.pop = 'base'
      |  LEFT JOIN c cc ON cc.bin = s.bin AND cc.pop = 'cand'),
      |t AS (SELECT sum(base_n)::BIGINT AS tb, sum(cand_n)::BIGINT AS tc
      |      FROM wide),
      |m AS (
      |  SELECT bin, base_n, cand_n,
      |    greatest(((base_n + 1) * 1000000) // (tb + 6), 1) AS pb,
      |    greatest(((cand_n + 1) * 1000000) // (tc + 6), 1) AS qc
      |  FROM wide CROSS JOIN t)
      |SELECT bin, base_n, cand_n,
      |  ((pb - qc)
      |   * (round(ln(pb) * 1000000)::BIGINT
      |      - round(ln(qc) * 1000000)::BIGINT))
      |  // 1000000 AS psi_e6
      |FROM m
      |ORDER BY bin""".stripMargin

  /** Corpus-wide top-K bigrams by DOCUMENT frequency (not raw token
    * count — df is the vocabulary-building statistic: a bigram pasted
    * 500× into one doc counts once). Complements [[textBigramLm]],
    * which scores each doc's surprisal under the corpus bigram LM but
    * never surfaces the n-grams themselves.
    *
    * Shape: HOF-generated bigrams (pure codegen, no UDF) → explode →
    * two-phase countDistinct(doc_id) → top-K. Scale: the final
    * `orderBy.limit` lowers to TakeOrderedAndProject — per-partition
    * heaps of K rows, never a global sort of the bigram vocabulary
    * (plan-asserted in TextSpec). Deterministic cut: (df DESC, bigram)
    * is a total order because bigram is the group key.
    */
  def textNgramTopK(spark: SparkSession, sfDir: String,
      k: Int = 20): DataFrame =
    spreadTokens(spark, sfDir)
      .select(col("doc_id"),
        explode(expr(
          "transform(slice(tk, 1, size(tk) - 1), " +
            "(t, i) -> concat(t, ' ', element_at(tk, i + 2)))"))
          .as("bigram"))
      .groupBy("bigram")
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("df"), asc("bigram"))
      .limit(k)

  val textNgramTopKSql: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |bg AS (
      |  SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
      |  FROM tk, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r)
      |SELECT bigram, count(*) AS df FROM bg
      |GROUP BY bigram ORDER BY df DESC, bigram LIMIT 20""".stripMargin

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc
    * by how much more likely its hashed-bigram features are under a
    * TARGET distribution (here the src1-3 slice, standing in for the
    * curated domain) than under the full-corpus SOURCE distribution.
    * weight(d) = Σ_occurrences [ln p_target(b) − ln p_source(b)] with
    * add-one smoothing over the B=1024 feature buckets; `selected`
    * marks docs whose mean log-ratio is positive (more target-like
    * than the corpus).
    *
    * Exactness: bucket ids are the md5-60-bit convention (identical in
    * both engines); each ln(integer count) quantizes to µnats
    * independently ([[textBigramLm]]'s trick), so all sums are exact
    * int64 and the output needs no float tolerance. The sum is
    * exported raw (dsir_sum_e6) rather than divided by n_bigrams:
    * integer division of NEGATIVE sums truncates in Spark but floors
    * in DuckDB, so the mean stays a consumer-side op; the `selected`
    * flag needs only the sign.
    *
    * Scale: the feature table is ≤ B+? rows regardless of corpus size
    * → broadcast; the per-doc score is one projection + one hash agg.
    * The target slice would be its own table at 100 TB; same plan.
    */
  val DsirBuckets = 1024

  /** (doc_id, source, bucket) — one row per bigram OCCURRENCE, bucketed
    * by the md5-60-bit convention. Shared by the batch weight query and
    * the feature-table build so the two can't disagree. */
  private def dsirBigrams(spark: SparkSession, sfDir: String): DataFrame =
    spreadTokens(spark, sfDir, "doc_id", "source")
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(0, size(tk) - 2),
          |  i -> concat(tk[i], ' ', tk[i + 1]))""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("source"),
        // evalOnce: the isnotnull filter below otherwise re-evaluates
        // the md5 per row via alias pushdown (guide §4.4 duplication)
        graft.core.Spread.evalOnce(
          expr(s"cast(conv(substr(md5(bg), 1, 15), 16, 10) as bigint)" +
            s" % $DsirBuckets")).as("bucket"))
      // bucket is never null (md5 of a non-null string), but Catalyst
      // types it nullable, so the scoring JOIN pushes isnotnull into
      // its branch only — making the two dkb subtrees canonically
      // unequal and defeating AQE exchange reuse (measured: the lr
      // branch re-tokenized the corpus). Carrying the no-op filter on
      // BOTH branches restores the single-scan plan.
      .filter(col("bucket").isNotNull)

  /** counts → lr projection shared by the standalone table and the
    * fused weight query: both-distribution totals via a GLOBAL WINDOW
    * over the ≤[[DsirBuckets]]-row census (safe single-partition — the
    * input is domain-bounded, never corpus-sized; the former
    * crossJoin(counts.agg) re-derived the census a second time, which
    * defeated exchange reuse and re-tokenized the corpus), each
    * ln(integer) µnat-quantized per value. */
  private def dsirLrFromCounts(counts: DataFrame): DataFrame = {
    val B = DsirBuckets
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    counts
      .withColumn("ts_tot", sum("sc").over(w))
      .withColumn("tt_tot", sum("tc").over(w))
      .select(col("bucket"), expr(
        s"""(cast(round(ln(tc + 1) * 1000000) as bigint)
           |  - cast(round(ln(tt_tot + $B) * 1000000) as bigint))
           |- (cast(round(ln(sc + 1) * 1000000) as bigint)
           |  - cast(round(ln(ts_tot + $B) * 1000000) as bigint))"""
          .stripMargin).as("lr"))
  }

  /** The per-bucket µnat log-ratio table (≤ [[DsirBuckets]] rows at any
    * corpus size — broadcastable, or collectible as a scoring map for
    * the streaming twin [[graft.streaming.DsirStream]]). */
  def dsirLogRatioTable(spark: SparkSession, sfDir: String): DataFrame = {
    // BOTH distributions in one conditional-count aggregation over one
    // bigram scan, checkpointed at ≤ B rows: the naive
    // sc-join-tc-join-totals shape re-ran the explode+md5 scan once per
    // branch (5× on the round-10 bench — it was the catalog's slowest
    // query at 1.66 s/pass)
    dsirLrFromCounts(dsirBigrams(spark, sfDir)
      .groupBy("bucket")
      .agg(count(lit(1)).as("sc"),
        count(when(col("source").isin("src1", "src2", "src3"), 1))
          .as("tc"))
      .localCheckpoint())
  }

  /** The (bucket → lr) scoring map: ≤ [[DsirBuckets]] longs, the
    * model artifact a serving/streaming layer ships around. */
  def dsirLogRatios(spark: SparkSession, sfDir: String): Map[Long, Long] =
    dsirLogRatioTable(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  def textDsirWeight(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE tokenize (r11, the textBigramLm lesson): fold the explode
    // straight into per-(doc, bucket) occurrence counts — the only
    // corpus-sized shuffle — and let that single exchange feed BOTH
    // the feature-table branch and the scoring probe via AQE stage
    // reuse (no checkpoint here: a checkpointed lr would run in its
    // own execution and the probe would re-tokenize; the standalone
    // [[dsirLogRatioTable]] keeps its checkpoint for serving use)
    val dkb = dsirBigrams(spark, sfDir)
      .groupBy("doc_id", "source", "bucket")
      .agg(count(lit(1)).as("k"))
    val lr = dsirLrFromCounts(dkb
      .groupBy("bucket")
      .agg(sum("k").as("sc"),
        sum(when(col("source").isin("src1", "src2", "src3"), col("k"))
          .otherwise(0L)).as("tc")))
    dkb.join(broadcast(lr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        sum(col("k") * col("lr")).as("dsir_sum_e6"))
      .select(col("doc_id"), col("n_bigrams"), col("dsir_sum_e6"),
        (col("dsir_sum_e6") > 0L).as("selected"))
      .orderBy("doc_id")
  }

  val textDsirWeightSql: String =
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS tk
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |bi AS (
      |  SELECT doc_id, source,
      |    (('0x' || substr(md5(bg), 1, 15))::BIGINT) % 1024 AS bucket
      |  FROM (
      |    SELECT doc_id, source,
      |      unnest(list_transform(generate_series(1, len(tk) - 1),
      |        i -> tk[i] || ' ' || tk[i + 1])) AS bg
      |    FROM t)),
      |sc AS (SELECT bucket, count(*)::BIGINT AS sc FROM bi GROUP BY 1),
      |tc AS (SELECT bucket, count(*)::BIGINT AS tc FROM bi
      |  WHERE source IN ('src1', 'src2', 'src3') GROUP BY 1),
      |tot AS (SELECT (SELECT sum(sc) FROM sc) AS ts_tot,
      |  (SELECT sum(tc) FROM tc) AS tt_tot),
      |lr AS (
      |  SELECT sc.bucket,
      |    (round(ln(coalesce(tc.tc, 0) + 1) * 1000000)::BIGINT
      |      - round(ln(tot.tt_tot + 1024) * 1000000)::BIGINT)
      |    - (round(ln(sc.sc + 1) * 1000000)::BIGINT
      |      - round(ln(tot.ts_tot + 1024) * 1000000)::BIGINT) AS lr
      |  FROM sc LEFT JOIN tc ON tc.bucket = sc.bucket, tot)
      |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
      |  sum(lr)::BIGINT AS dsir_sum_e6,
      |  sum(lr)::BIGINT > 0 AS selected
      |FROM bi JOIN lr ON lr.bucket = bi.bucket
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Perplexity-decile bucketing (the CCNet head/middle/tail split,
    * generalized to 10 bins): partition the corpus by the bigram-LM
    * surprisal score of [[textBigramLm]] and report each decile's
    * census — the standard quality-stratification step before
    * sampling training data by perplexity band.
    *
    * Deciles over the CENSUS, not the corpus: per-score counts first
    * (the score domain is bounded by construction — nll_e4 is a
    * quantized mean, so the distinct-score table stays ~1e5 rows at
    * ANY corpus size) → cumulative rank below each score via a
    * running-sum window OVER THE CENSUS → decile = (10·cum_lt) div n
    * + 1. The single-partition window is safe because its input is
    * the bounded census, never corpus-sized rows (the r10 triangular
    * broadcast join here was O(S²) BNLJ work — the window is O(S log
    * S) and dropped the query ~4× at sf0.1). Ties share a decile;
    * every step is integer-exact, so both engines agree bit-for-bit.
    */
  def textPplBucket(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = textBigramLm(spark, sfDir)
    // checkpoint the per-score census (~1e5 rows bounded by the score
    // domain): the window + totals below reference it twice, and each
    // reference otherwise re-runs the full bigram-LM corpus scan
    val cnt = scored.groupBy("nll_e4").agg(
      count(lit(1)).as("cnt"), sum("n_bigrams").as("tok"))
      .localCheckpoint()
    // r20 (same collapse as ev_rfm's thresholds): the census total
    // rides the SAME Window sort as the prefix sum (full-frame spec,
    // identical ordering — one Window exec, no extra exchange),
    // replacing the separate agg job + broadcast crossJoin.
    val wBase = org.apache.spark.sql.expressions.Window.orderBy("nll_e4")
    val ranked = cnt
      .withColumn("cum_lt", coalesce(sum("cnt").over(wBase.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n", sum("cnt").over(wBase.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("decile", expr("(cum_lt * 10) div n + 1"))
    ranked.groupBy("decile")
      .agg(sum("cnt").as("n_docs"),
        min("nll_e4").as("min_nll_e4"),
        max("nll_e4").as("max_nll_e4"),
        sum("tok").as("sum_bigrams"))
      .orderBy("decile")
  }

  val textPplBucketSql: String = {
    val lm = textBigramLmSql.replace("ORDER BY doc_id", "")
    s"""WITH scored AS ($lm),
       |cnt AS (
       |  SELECT nll_e4, count(*)::BIGINT AS cnt,
       |    sum(n_bigrams)::BIGINT AS tok
       |  FROM scored GROUP BY nll_e4),
       |ranked AS (
       |  SELECT nll_e4, cnt, tok,
       |    coalesce(sum(cnt) OVER (ORDER BY nll_e4
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
       |      AS cum_lt,
       |    (SELECT sum(cnt) FROM cnt) AS n
       |  FROM cnt)
       |SELECT ((cum_lt * 10) // n + 1)::BIGINT AS decile,
       |  sum(cnt)::BIGINT AS n_docs,
       |  min(nll_e4) AS min_nll_e4, max(nll_e4) AS max_nll_e4,
       |  sum(tok)::BIGINT AS sum_bigrams
       |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Ensemble quality gate — the "classifier committee" stand-in real
    * pipelines build from fastText/logistic scores: three independent
    * integer signals, each ALREADY a catalog entry (so the ensemble
    * can never disagree with its members), combined with fixed
    * weights into one 0..10⁴ score:
    *
    *   ens = (4·quality + 3·entropyNorm + 3·(10⁴ − dup₂)) div 10
    *
    * quality ([[textQuality]]) rewards length/stopword shape, entropy
    * ([[textEntropy]], capped at 2 nats and rescaled) rewards lexical
    * diversity, and the bigram duplication ratio ([[textRepetition]])
    * penalizes boilerplate loops. Docs too short for trigram stats
    * (< 3 tokens) carry no repetition evidence — dup₂ defaults to 0.
    *
    * Scale note: reusing the member queries verbatim costs three scans
    * of `documents`; a 100 TB deployment computes the three signal
    * branches over one checkpointed base scan exactly like
    * [[graft.pipeline.PipelineOps.e2eCuration]] — the agg/join
    * topology (doc_id-keyed, co-partitioned after each signal's own
    * agg) is unchanged.
    */
  def textQualityEnsemble(spark: SparkSession, sfDir: String): DataFrame =
    textQuality(spark, sfDir)
      .select(col("doc_id"), col("quality_e4"))
      .join(textEntropy(spark, sfDir).select(col("doc_id"),
        col("entropy_e4")), Seq("doc_id"))
      .join(textRepetition(spark, sfDir).select(col("doc_id"),
        col("dup2_e4")), Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup2_e4"))
      .select(col("doc_id"), col("quality_e4"), col("entropy_e4"),
        col("dup2_e4"),
        expr("""(4 * quality_e4 + 3 * (least(entropy_e4, 20000L) div 2)
               | + 3 * (10000L - least(dup2_e4, 10000L))) div 10"""
          .stripMargin).as("ens_e4"))
      .withColumn("keep", col("ens_e4") >= 7000L)
      .orderBy("doc_id")

  val textQualityEnsembleSql: String = {
    def strip(sql: String): String = sql.replace("ORDER BY doc_id", "")
    s"""WITH q AS (${strip(textQualitySql)}),
       |e AS (${strip(textEntropySql)}),
       |r AS (${strip(textRepetitionSql)})
       |SELECT q.doc_id, q.quality_e4, e.entropy_e4,
       |  coalesce(r.dup2_e4, 0) AS dup2_e4,
       |  (4 * q.quality_e4 + 3 * (least(e.entropy_e4, 20000) // 2)
       |    + 3 * (10000 - least(coalesce(r.dup2_e4, 0), 10000))) // 10
       |    AS ens_e4,
       |  (4 * q.quality_e4 + 3 * (least(e.entropy_e4, 20000) // 2)
       |    + 3 * (10000 - least(coalesce(r.dup2_e4, 0), 10000))) // 10
       |    >= 7000 AS keep
       |FROM q
       |JOIN e ON e.doc_id = q.doc_id
       |LEFT JOIN r ON r.doc_id = q.doc_id
       |ORDER BY q.doc_id""".stripMargin
  }

  /** Gopher/C4-style heuristic rule bundle — the cheap structural
    * filters (Rae et al. 2021 §A1.1; Raffel et al. 2020 C4 rules)
    * applied before any model-based scoring in web-scale pipelines:
    * word-count band, mean-word-length band, symbol-to-word ratio,
    * alphabetic-word fraction, and a minimum stopword-hit count. Each
    * rule is emitted as its own 0/1 flag plus the conjunction, so
    * downstream curation can re-weight rules without re-scanning.
    *
    * All ratios are exact integer comparisons (cross-multiplied), so
    * the oracle is bit-identical — same rationale as [[textQuality]].
    * Pure projection, no shuffle: linear at any scale.
    */
  def textGopherRules(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("tk", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n"),
        expr("aggregate(tk, 0L, (acc, x) -> acc + length(x))").as("tl"),
        expr("cast(size(filter(tk, x -> x rlike '[A-Za-z]')) as long)")
          .as("aw"),
        expr("cast(regexp_count(text, '#|\\\\.\\\\.\\\\.') as long)")
          .as("sym"),
        expr(s"cast(size(filter(tk, x -> x in ${inList(stopwords)})) as long)")
          .as("sh"))
      .select(
        col("doc_id"),
        col("n").as("n_words"),
        (col("n") >= 50 && col("n") <= 100000).cast("int").as("ok_nwords"),
        (col("tl") >= col("n") * 3 && col("tl") <= col("n") * 10)
          .cast("int").as("ok_wordlen"),
        (col("sym") * 10 <= col("n")).cast("int").as("ok_symbol"),
        (col("aw") * 10 >= col("n") * 8).cast("int").as("ok_alpha"),
        (col("sh") >= 2).cast("int").as("ok_stop"))
      .withColumn("gopher_pass",
        col("ok_nwords") * col("ok_wordlen") * col("ok_symbol") *
          col("ok_alpha") * col("ok_stop"))
      .orderBy("doc_id")

  val textGopherRulesSql: String =
    s"""SELECT doc_id, n AS n_words,
       |  (n BETWEEN 50 AND 100000)::INT AS ok_nwords,
       |  (tl BETWEEN n*3 AND n*10)::INT AS ok_wordlen,
       |  (sym*10 <= n)::INT AS ok_symbol,
       |  (aw*10 >= n*8)::INT AS ok_alpha,
       |  (sh >= 2)::INT AS ok_stop,
       |  (n BETWEEN 50 AND 100000)::INT * (tl BETWEEN n*3 AND n*10)::INT
       |    * (sym*10 <= n)::INT * (aw*10 >= n*8)::INT * (sh >= 2)::INT
       |    AS gopher_pass
       |FROM (
       |  SELECT doc_id, len(tk)::BIGINT AS n,
       |    list_sum(list_transform(tk, x -> len(x)))::BIGINT AS tl,
       |    len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
       |      AS aw,
       |    len(regexp_extract_all(text, '#|\\.\\.\\.'))::BIGINT AS sym,
       |    len(list_filter(tk, x -> x IN ${inList(stopwords)}))::BIGINT AS sh
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk
       |        FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Zipf-law fit over the corpus frequency head: OLS slope of
    * ln(count) against ln(rank) for the top-1000 tokens — the corpus
    * health check (natural language sits near −1; a slope collapsing
    * toward 0 means template/boilerplate flooding, a cheap drift
    * alarm on ingest).
    *
    * Cross-engine exactness: counts are exact; each ln lands in
    * fixed-point µnats PER VALUE (round(ln·10⁶) of identical integer
    * inputs is bit-identical), so the regression's Σx, Σy, Σxy, Σxx
    * are exact int64 sums (|x|,|y| ≤ ~2·10⁷ over 1000 rows → Σxy ≤
    * ~4·10¹⁷, inside int64); only the final slope/intercept divide in
    * double, rounded 4 dp.
    *
    * Scale shape: token counting is the corpus-sized hash agg; the
    * head is TakeOrdered(1000) (per-partition heaps); the rank window
    * runs AFTER the 1000-row bound (same limit-before-window shape as
    * hybrid_rrf_topk, exempted in PlanAuditSpec) and the sums are one
    * scalar agg over 1000 rows.
    */
  def textZipfFit(spark: SparkSession, sfDir: String,
      fitHead: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val vocab = counts.agg(count(lit(1)).as("n_vocab"))
    val head = counts.orderBy(col("cnt").desc, col("token")).limit(fitHead)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))))
      .select(
        expr("cast(round(ln(rank) * 1000000) as bigint)").as("x"),
        expr("cast(round(ln(cnt) * 1000000) as bigint)").as("y"))
    head.agg(count(lit(1)).as("n_fit"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .crossJoin(broadcast(vocab))
      .select(col("n_vocab"), col("n_fit"),
        round((col("n_fit").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n_fit").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) /
          lit(1.0), 4).as("slope"),
        round((col("sy").cast("double") -
          ((col("n_fit").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n_fit").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))) *
            col("sx").cast("double")) /
          col("n_fit").cast("double") / lit(1000000.0), 4)
          .as("intercept_ln"))
  }

  val textZipfFitSql: String =
    """WITH counts AS (
      |  SELECT token, count(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token != '' GROUP BY token),
      |vocab AS (SELECT count(*) AS n_vocab FROM counts),
      |head AS (
      |  SELECT CAST(round(ln(rank) * 1000000) AS BIGINT) AS x,
      |    CAST(round(ln(cnt) * 1000000) AS BIGINT) AS y
      |  FROM (
      |    SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token)
      |      AS rank
      |    FROM counts ORDER BY cnt DESC, token LIMIT 1000)),
      |s AS (
      |  SELECT count(*) AS n_fit, sum(x)::BIGINT AS sx,
      |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
      |    sum(x * x)::BIGINT AS sxx
      |  FROM head)
      |SELECT n_vocab, n_fit,
      |  round((CAST(n_fit AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (CAST(n_fit AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 1.0, 4)
      |    AS slope,
      |  round((CAST(sy AS DOUBLE)
      |    - ((CAST(n_fit AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |       (CAST(n_fit AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |      * CAST(sx AS DOUBLE)) / CAST(n_fit AS DOUBLE) / 1000000.0, 4)
      |    AS intercept_ln
      |FROM s CROSS JOIN vocab""".stripMargin

  /** Distributed-trained DOMAIN/QUALITY CLASSIFIER — the
    * fastText-style gate (Joulin et al. 2016, arXiv:1607.01759; the
    * CCNet/GPT-3 quality-filter pattern) every LLM curation pipeline
    * trains over its own corpus: learn a cheap model that predicts a
    * weak-supervision label (here: the corpus's own heuristic
    * stopword gate, stop_e4 >= 600 — the [[textQuality]] integer
    * ratio) from hashed bag-of-token features, then score every
    * document. Distilling a heuristic into a hashed-feature linear
    * model is exactly how crawl-scale gates are built: the heuristic
    * labels a slice, the classifier generalizes it at token level.
    *
    * Model: multinomial Naive Bayes with Laplace smoothing — CLOSED
    * FORM, so training is ONE distributed aggregation: explode the
    * per-token bucket ids (slot `dims` appended once per doc so class
    * doc-counts ride the same pass), count by (class, slot) with
    * map-side partial aggregation — 2·65 rows collected, never a
    * dense per-doc vector (an earlier draft densified to 64-arrays
    * via 64 interpreted filter() lambdas per doc and spent 14 s at
    * sf0.1 on pure allocation; the explode/count shape runs the same
    * corpus in ~1 s). Scoring is a map-only TOKEN-ORDER fold of
    * llr[bucket(t)] over each doc's hash array — algebraically the
    * same Σ_j cnt_j·llr_j, but one pass over the tokens with no
    * intermediate arrays. At 100 TB: two linear corpus passes, a
    * 130-row shuffle, bounded driver state, the 65-double llr literal
    * the only broadcast.
    *
    * Determinism across engines: llr_j and the prior are computed
    * driver-side from EXACT integer counts and snapped to the 1e-6
    * grid (ln() differs by ~1 ulp between libm and the JVM — the snap
    * absorbs it, the Lloyd-trainer trick); margins are then snapped
    * doubles folded in token order — bit-identical in both engines
    * (split/string_split preserve order) — so pred (raw-margin sign)
    * is exact, and the published margin uses an explicit floor-snap
    * to 4dp because Spark round() and DuckDB round() disagree on
    * exact .00005 boundaries. Features hash through md5's first 8 hex
    * digits (engine-portable; Spark conv() and DuckDB's 0x-cast read
    * the same digits).
    *
    * Output: (doc_id, y, margin, pred) per document, ORDER BY doc_id.
    * TextClassifierSpec verifies against an independent plain-Scala
    * recomputation and pins the exact confusion counts (~84%
    * accuracy against a ~52% base rate at sf0.1).
    */
  def textDomainClassifier(spark: SparkSession, sfDir: String,
      dims: Int = 64): DataFrame = {
    val thresh = 600
    val feats = Tables.documents(spark, sfDir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("sh", expr(
        s"cast(size(filter(tk, x -> x in ${inList(stopwords)})) as long)"))
      .select(
        col("doc_id"),
        (expr("(sh * 10000L + n div 2) div n") >= thresh)
          .cast("int").as("y"),
        expr("transform(tk, t -> cast(" +
          s"pmod(cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint), $dims)" +
          " as int))").as("hs"))
      .localCheckpoint() // read twice: count pass + scoring pass
    // ONE aggregation: slot `dims` appended once per doc carries the
    // class doc count; slots 0..dims-1 count bucket tokens
    val sums = feats
      .select(col("y"), explode(expr(
        s"concat(hs, array($dims))")).as("slot"))
      .groupBy("y", "slot").agg(count(lit(1)).as("t"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def cnt(y: Int, j: Int): Long = sums.getOrElse((y, j), 0L)
    val t1 = (0 until dims).map(cnt(1, _)).sum
    val t0 = (0 until dims).map(cnt(0, _)).sum
    def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // exact expression order mirrored in the SQL replay:
    // ((ln(t1j+1) - ln(t1+D)) - ln(t0j+1)) + ln(t0+D)
    val llr = Array.tabulate(dims)(j => snap(
      ((math.log(cnt(1, j) + 1.0) - math.log(t1 + dims.toDouble))
        - math.log(cnt(0, j) + 1.0)) + math.log(t0 + dims.toDouble)))
    val prior = snap(
      math.log(cnt(1, dims) + 1.0) - math.log(cnt(0, dims) + 1.0))
    feats
      .withColumn("wl", typedlit(llr.toSeq))
      .withColumn("pc", lit(prior))
      .withColumn("m", col("pc") + expr(
        "aggregate(hs, cast(0 as double), " +
          "(acc, h) -> acc + element_at(wl, h + 1))"))
      .select(col("doc_id"), col("y"),
        expr("floor(m * 10000d + 0.5d) / 10000d").as("margin"),
        (col("m") >= 0).as("pred"))
      .orderBy("doc_id")
  }

  /** DuckDB replay of [[textDomainClassifier]]: same label rule, same
    * md5-bucket features, the exploded class/slot count aggregation,
    * the snapped llr/prior arithmetic in the same operation order, and
    * the token-order margin fold.
    */
  val textDomainClassifierSql: String = {
    val dims = 64; val thresh = 600
    s"""WITH feats AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN (sh * 10000 + n // 2) // n >= $thresh
       |      THEN 1 ELSE 0 END AS y,
       |    hs
       |  FROM (
       |    SELECT doc_id,
       |      len(tk)::BIGINT AS n,
       |      len(list_filter(tk, x -> x IN ${inList(stopwords)}))::BIGINT
       |        AS sh,
       |      list_transform(tk, t ->
       |        (('0x' || substr(md5(t), 1, 8))::BIGINT % $dims)::INT) AS hs
       |    FROM (SELECT doc_id, string_split(text, ' ') AS tk
       |          FROM documents))),
       |sums AS MATERIALIZED (
       |  SELECT f.y, u.slot, count(*)::BIGINT AS t
       |  FROM feats f, unnest(list_append(f.hs, $dims)) AS u(slot)
       |  GROUP BY f.y, u.slot),
       |tot AS MATERIALIZED (
       |  SELECT y, sum(t)::BIGINT AS tt FROM sums WHERE slot < $dims
       |  GROUP BY y),
       |lw AS MATERIALIZED (
       |  SELECT list(llr ORDER BY j) AS w FROM (
       |    SELECT d.j,
       |      floor((((ln(coalesce(a.t, 0) + 1.0) - ln(t1.tt + $dims.0))
       |        - ln(coalesce(b.t, 0) + 1.0)) + ln(t0.tt + $dims.0))
       |        * 1000000.0 + 0.5) / 1000000.0 AS llr
       |    FROM (SELECT unnest(range($dims)) AS j) d
       |    LEFT JOIN sums a ON a.slot = d.j AND a.y = 1
       |    LEFT JOIN sums b ON b.slot = d.j AND b.y = 0,
       |      (SELECT tt FROM tot WHERE y = 1) t1,
       |      (SELECT tt FROM tot WHERE y = 0) t0)),
       |pr AS MATERIALIZED (
       |  SELECT floor((ln(c1.t + 1.0) - ln(c0.t + 1.0)) * 1000000.0
       |      + 0.5) / 1000000.0 AS p
       |  FROM (SELECT t FROM sums WHERE y = 1 AND slot = $dims) c1,
       |    (SELECT t FROM sums WHERE y = 0 AND slot = $dims) c0),
       |mfin AS MATERIALIZED (
       |  SELECT f.doc_id, f.y,
       |    pr.p + list_sum(list_transform(f.hs, h -> lw.w[h+1])) AS m
       |  FROM feats f, lw, pr)
       |SELECT doc_id, y, floor(m * 10000.0 + 0.5) / 10000.0 AS margin,
       |  m >= 0 AS pred
       |FROM mfin
       |ORDER BY doc_id""".stripMargin
  }

  /** Vocabulary-growth (Heaps'-law) curve — the corpus health check
    * that catches template/duplicate floods (vocabulary saturates far
    * too early) and tokenizer blow-ups (it never saturates): distinct
    * BIGRAM vocabulary size after each 10%-of-doc-ids prefix of the
    * corpus (bigrams, because this synthetic corpus's unigram
    * vocabulary saturates inside the first decile — a flat one-row
    * curve; the combinatorial bigram space keeps growing like a real
    * corpus's long-tail vocabulary does).
    *
    * The trick that makes a PREFIX-CUMULATIVE statistic one-pass: a
    * token enters the vocabulary at its FIRST document, so
    * min(doc_id) per token — a single word-count-shaped aggregation —
    * is the entire computation; the growth curve is then a 10-row
    * decile census of those first-occurrence ids with a running sum
    * (new_tokens per decile, cumulative vocab, exact per-decile
    * token-type rate in e6). No sequential scan, no per-prefix
    * re-aggregation — the shape is identical at 100 TB.
    */
  def textVocabGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val d = docs.agg((max("doc_id") + 1).as("n_docs"))
    val firsts = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> " +
          "concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"))
        .as("tok"))
      .groupBy("tok").agg(min("doc_id").as("first_doc"))
    val census = firsts
      .crossJoin(broadcast(d))
      .groupBy(expr("least(9, first_doc * 10 div n_docs)").as("decile"))
      .agg(count(lit(1)).as("new_tokens"))
    census
      .withColumn("vocab_cum", sum("new_tokens").over(
        Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("decile")
  }

  val textVocabGrowthSql: String =
    """WITH d AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
      |firsts AS (
      |  SELECT tok, min(doc_id) AS first_doc
      |  FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(tk) - 1),
      |      i -> concat_ws(' ', tk[i], tk[i + 1]))) AS tok
      |    FROM (SELECT doc_id, string_split(text, ' ') AS tk
      |          FROM documents)
      |    WHERE len(tk) >= 2)
      |  GROUP BY tok),
      |census AS (
      |  SELECT least(9, first_doc * 10 // n_docs) AS decile,
      |    count(*)::BIGINT AS new_tokens
      |  FROM firsts CROSS JOIN d
      |  GROUP BY 1)
      |SELECT decile, new_tokens,
      |  sum(new_tokens) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |    AS vocab_cum
      |FROM census
      |ORDER BY decile""".stripMargin

  /** Type-token ratio + hapax census per source — the lexical-richness
    * audit run per corpus slice before mixing sources: a boilerplate-
    * heavy or template-generated source shows a low TTR (few distinct
    * tokens per total token) and a low hapax share (few once-only
    * tokens), while natural prose runs high on both. The per-source
    * numbers are what a data-mix decision actually compares —
    * [[textVocabGrowth]] answers "does vocabulary saturate over TIME",
    * this answers "which SOURCE is lexically degenerate".
    *
    * Exact integers end to end: vocab/total/hapax are counts, the two
    * ratios are half-up e6 fixed-point divisions — bit-identical in
    * both engines.
    *
    * Scale shape: one tokenize+explode pass folded straight into a
    * per-(source, token) count — the only corpus-sized shuffle, the
    * [[textBigramLm]] lesson, with map-side combine bounded per split
    * — then a vocabulary-bounded (≤ sources × vocab) census feeds one
    * ≤|sources|-row aggregation. No window, no collect.
    */
  def textTtr(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("k"))
      .groupBy("source")
      .agg(sum("k").as("total_tokens"),
        count(lit(1)).as("vocab"),
        count(when(col("k") === 1L, 1)).as("hapax"))
      .select(col("source"), col("total_tokens"), col("vocab"),
        col("hapax"),
        expr("(vocab * 1000000L + total_tokens div 2) div total_tokens")
          .as("ttr_e6"),
        expr("(hapax * 1000000L + vocab div 2) div vocab")
          .as("hapax_ratio_e6"))
      .orderBy("source")

  val textTtrSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |census AS (
      |  SELECT source, tok, count(*)::BIGINT AS k
      |  FROM toks GROUP BY 1, 2)
      |SELECT source, sum(k)::BIGINT AS total_tokens,
      |  count(*)::BIGINT AS vocab,
      |  sum((k = 1)::INT)::BIGINT AS hapax,
      |  (count(*)::BIGINT * 1000000 + sum(k)::BIGINT // 2)
      |    // sum(k)::BIGINT AS ttr_e6,
      |  (sum((k = 1)::INT)::BIGINT * 1000000 + count(*)::BIGINT // 2)
      |    // count(*)::BIGINT AS hapax_ratio_e6
      |FROM census
      |GROUP BY source
      |ORDER BY source""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("text_ttr", textTtr _, textTtrSql),
    ("text_vocab_growth",
      (s: SparkSession, d: String) => textVocabGrowth(s, d),
      textVocabGrowthSql),
    ("text_domain_classifier",
      (s: SparkSession, d: String) => textDomainClassifier(s, d),
      textDomainClassifierSql),
    ("text_zipf_fit",
      (s: SparkSession, d: String) => textZipfFit(s, d), textZipfFitSql),
    ("text_gopher_rules", textGopherRules _, textGopherRulesSql),
    ("text_quality_ensemble", textQualityEnsemble _, textQualityEnsembleSql),
    ("text_dsir_weight", textDsirWeight _, textDsirWeightSql),
    ("text_ppl_bucket", textPplBucket _, textPplBucketSql),
    ("text_ngram_topk",
      (s: SparkSession, d: String) => textNgramTopK(s, d),
      textNgramTopKSql),
    ("text_drift_psi", textDriftPsi _, textDriftPsiSql),
    ("text_substring_dedup",
      (s: SparkSession, d: String) => textSubstringDedup(s, d),
      textSubstringDedupSql),
    ("text_bigram_lm", textBigramLm _, textBigramLmSql),
    ("text_keywords_topk",
      (s: SparkSession, d: String) => textKeywordsTopK(s, d),
      textKeywordsTopKSql),
    ("text_entropy", textEntropy _, textEntropySql),
    ("text_idf_rarity", textIdfRarity _, textIdfRaritySql),
    ("text_bm25_topk", textBm25TopK _, textBm25TopKSql),
    ("text_domain_gate", textDomainGate _, textDomainGateSql),
    ("text_tokens", textTokens _, textTokensSql),
    ("text_quality", textQuality _, textQualitySql),
    ("text_langid", textLangId _, textLangIdSql),
    ("text_fingerprint", textFingerprint _, textFingerprintSql),
    ("text_rolling_fp", textRollingFp _, textRollingFpSql),
    ("text_stratified_sample", textStratifiedSample _, textStratifiedSampleSql),
    ("text_quality_filter", textQualityFilter _, textQualityFilterSql),
    ("text_decontaminate", textDecontaminate _, textDecontaminateSql),
    ("text_dup_spans", (s: SparkSession, d: String) => textDupSpans(s, d),
      textDupSpansSql),
    ("text_line_dedup",
      (s: SparkSession, d: String) => textLineDedup(s, d),
      textLineDedupSql),
    ("text_repetition", textRepetition _, textRepetitionSql))
}

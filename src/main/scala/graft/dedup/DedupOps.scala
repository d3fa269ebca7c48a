package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline: exact hashing, canonical-fingerprint dedup,
  * n-gram Jaccard, MinHash+LSH, and SimHash with hamming-ball probing.
  *
  * Scale design (100 TB): nothing here is all-pairs. Exact/fingerprint
  * dedup are single hash aggregations; MinHash candidates come from
  * band-bucket equality joins (shuffle on band signature, cluster sizes
  * bounded by collision probability); SimHash pairs come from a
  * 17-key hamming-ball probe join instead of a cartesian product. The
  * only quadratic work is *within* candidate groups, which LSH keeps
  * tiny. All hashing is engine-portable (md5-derived 60-bit ints), so
  * the DuckDB oracle reproduces signatures bit-for-bit.
  */
object DedupOps {

  /** Modulus for the MinHash permutation family (< 2^30 so a*h+b stays
    * well inside int64 in both engines — DuckDB errors on overflow). */
  val P: Long = 1073741789L

  /** 16 fixed (a, b) permutation parameters, a odd. */
  val perms: Seq[(Long, Long)] =
    (0 until 16).map(i => ((2654435761L * (i + 1)) % P | 1L, (40503L * (i + 7) * (i + 7)) % P))

  val bands = 4
  val rowsPerBand = 4

  /** 60-bit token hash from md5 — identical in Spark and DuckDB. */
  private val sparkHb = s"cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint) % $P"
  private val duckHb = s"(('0x' || substr(md5(token), 1, 15))::BIGINT) % $P"

  /** Distinct word-trigram shingles per doc (docs with >= 3 tokens).
    * Shingling is what makes MinHash/SimHash discriminative: unigram
    * token sets collapse under a small vocabulary (every doc looks like
    * every other), while shingle sets stay sparse.
    */
  /** Tokenized docs with >= 3 tokens: (doc_id, tk) — the shared prefix
    * of every shingle pipeline here, in the r19-measured shape:
    *  - [[graft.core.Spread.byKey]] replaces the former keyless
    *    repartition (whose sortBeforeRepartition paid a single-core
    *    whole-row sort on exactly the one-partition scan stage it was
    *    spreading); still a no-op on any multi-file table;
    *  - [[graft.core.Spread.evalOnce]] pins `split` to one evaluation
    *    per row — the pushed-down `size(tk) >= 3` filter otherwise
    *    re-evaluates the split per conjunct, and alias collapse inlines
    *    it into the downstream shingle lambda's element_at calls.
    * Fragment at sf0.1 (noop sink, min of 7): 0.44 s → 0.14 s,
    * identical rows.
    */
  private def tokenizedDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .transform(graft.core.Spread.byKey(_, col("doc_id")))
      .select(col("doc_id"),
        graft.core.Spread.evalOnce(split(col("text"), " ")).as("tk"))
      .filter(size(col("tk")) >= 3)

  /** (doc_id, ng: array<bigint>, n) with the 60-bit HASHED shingle sets
    * of [[exactJaccardPairs]] / [[dedupContainment]] — same r19 shape
    * as [[tokenizedDocs]] (see there for the measurements); NOT
    * checkpointed, both callers checkpoint at their own reuse point.
    */
  private def hashedShingleDocs(spark: SparkSession, sfDir: String): DataFrame =
    tokenizedDocs(spark, sfDir)
      .select(col("doc_id"), graft.core.Spread.evalOnce(array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), i -> " +
          "cast(conv(substr(md5(concat_ws(' ', element_at(tk, i), " +
          "element_at(tk, i + 1), element_at(tk, i + 2))), 1, 15), 16, 10) " +
          "as bigint))"))).as("ng"))
      .select(col("doc_id"), col("ng"), size(col("ng")).as("n"))

  /** (doc_id, ng: array<string>, n) — one row per doc with its distinct
    * shingle set; checkpointed because several plan branches reuse it
    * AND because the barrier keeps the shingle build in its own small
    * codegen stage (fusing it into the downstream explode + minhash
    * agg was measured 7× slower at sf0.1). */
  private def shingleArrays(spark: SparkSession, sfDir: String): DataFrame =
    tokenizedDocs(spark, sfDir)
      .select(col("doc_id"), graft.core.Spread.evalOnce(array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), i -> " +
          "concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))")))
        .as("ng"))
      .select(col("doc_id"), col("ng"), size(col("ng")).as("n"))
      .localCheckpoint()

  private def shingles(spark: SparkSession, sfDir: String): DataFrame =
    shingleArrays(spark, sfDir)
      .select(col("doc_id"), explode(col("ng")).as("token"))

  private val duckShinglesCte: String =
    """shingles AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(tk) - 2),
      |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])))) AS token
      |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      |  WHERE len(tk) >= 3)""".stripMargin

  /** Exact dedup: raw-text hash groups with keeper = min doc id —
    * SURVEY §7.7's `scale` list item 1 (hash-groupBy). One shuffle on
    * the 128-bit hash; map-side partial agg collapses dups early.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .orderBy("h")

  val dedupExactSql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
      |FROM documents
      |GROUP BY 1
      |ORDER BY h""".stripMargin

  /** Fingerprint dedup: groups documents whose sorted distinct token
    * sets coincide (catches shuffled/duplicated-token near-dups that
    * exact hashing misses). Only emits real duplicate groups (n > 1).
    */
  def dedupFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(array_join(array_sort(array_distinct(
        split(lower(col("text")), " "))), " ")).as("fp"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy("fp")

  val dedupFingerprintSql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(
      |    string_split(lower(text), ' '))), ' ')) AS fp,
      |  min(doc_id) AS keeper, count(*) AS n
      |FROM documents
      |GROUP BY 1
      |HAVING count(*) > 1
      |ORDER BY fp""".stripMargin

  /** Near-dup thresholds as exact RATIONALS — one definition feeds the
    * Spark integer filters, the SQL twins, and the docs (r11 advice:
    * the integer predicates previously hard-coded 4/5/9/17 while the
    * Double constants no longer drove behavior, so editing a constant
    * silently changed nothing). Derived Double views are kept for
    * callers that want the scalar.
    *
    * The derived integer forms, for a threshold t = num/den:
    *  - prefix length:  n − ⌈t·n⌉ + 1       = n − (num·n + den−1) div den + 1
    *  - min overlap  :  ⌈t/(1+t)·(na+nb)⌉   = (num·(na+nb) + num+den−1) div (num+den)
    *  - acceptance   :  inter/(na+nb−inter) ≥ t  ⟺  inter·(num+den) ≥ num·(na+nb)
    *  - containment  :  inter/na ≥ t        ⟺  inter·den ≥ num·na
    */
  /** n-gram Jaccard near-dup threshold: 4/5 = 0.8. */
  val jacNum = 4L
  val jacDen = 5L
  val ngramJacThreshold: Double = jacNum.toDouble / jacDen

  /** One-sided containment threshold: 4/5 = 0.8. */
  val contNum = 4L
  val contDen = 5L
  val containThreshold: Double = contNum.toDouble / contDen

  /** MinHash-LSH exact-verify Jaccard threshold: 7/10 = 0.7. */
  val lshNum = 7L
  val lshDen = 10L
  val lshJacThreshold: Double = lshNum.toDouble / lshDen

  /** Corpus-size bound for broadcasting the verify-side shingle-array
    * relation: ~1e5 docs × ~50 longs ≈ 80 MB — the edge of a sane
    * executor broadcast. Checkpointed relations carry no AQE stats, so
    * the choice is made here on the real count.
    */
  private val BroadcastDocLimit = 100000L

  /** Broadcast the doc→shingle-array relation while it fits one
    * executor, plain (shuffled) join beyond — the r11 ×100 probe
    * measured the unconditional broadcast at 46 GB of spill.
    */
  private def verifyArraysSide(ndocs: Long): DataFrame => DataFrame = {
    val small = ndocs <= BroadcastDocLimit
    side => if (small) broadcast(side) else side
  }

  /** Word-trigram Jaccard near-dup pairs (threshold 0.8), via PREFIX
    * FILTERING (the ppjoin family): order every document's shingles by
    * ascending global document frequency and index only the first
    * ⌊(1−t)·n⌋+1 of them. Any pair with Jaccard ≥ t MUST share a
    * prefix shingle under a consistent global order, so candidate
    * generation is exact, and the inverted index only carries the
    * globally rarest ~20% of postings — the self-join stays near-linear
    * where a naive shingle join is quadratic on frequent shingles.
    *
    * Two further EXACT ppjoin filters run inside the candidate join,
    * before the expensive verify (measured at sf0.1: candidates
    * 118,826 → 12,784, verify 3.0 s → 0.55 s, identical output):
    *  - length: J(A,B) ≤ min(n)/max(n), so J ≥ 4/5 needs
    *    5·min(na,nb) ≥ 4·max(na,nb);
    *  - positional: for a true pair, its FIRST shared prefix shingle
    *    at ranks (i, j) bounds the overlap by 1 + min(na−i, nb−j),
    *    which must reach minoverlap ⌈t/(1+t)·(na+nb)⌉ = ⌈4(na+nb)/9⌉.
    *    Applied per matching posting, a true pair always survives via
    *    its first shared prefix element, so the filter only ever
    *    removes false candidates.
    *
    * Candidates are verified with exact Jaccard over FULL shingle
    * sets. Documents shorter than 3 tokens are excluded in both
    * engines. The whole pipeline (postings, df counts, prefix window,
    * candidate join, verify) runs on 60-bit md5 HASHES of the
    * trigrams, not the strings — see the in-body comment; the oracle
    * hashes identically, and the DedupSpec differential checks the
    * output against a string-shingled brute force.
    */
  def dedupNgramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    exactJaccardPairs(spark, sfDir, jacNum, jacDen)

  /** The exact-Jaccard prefix-filter pipeline behind
    * [[dedupNgramJaccard]], parameterized by the num/den threshold so
    * [[dedupRecallAudit]] can reuse it as the ground truth at the LSH
    * threshold (the prefix filter is EXACT at any threshold — only
    * its pruning strength changes).
    */
  private[dedup] def exactJaccardPairs(spark: SparkSession, sfDir: String,
      num: Long, den: Long): DataFrame =
    exactJaccardPairsFrom(hashedShingleDocs(spark, sfDir), num, den)

  /** [[exactJaccardPairs]] over a caller-supplied hashed-shingle-docs
    * relation (doc_id, ng: array<bigint>, n) — [[dedupRecallAudit]]
    * derives that relation from the SAME checkpointed string-shingle
    * arrays its LSH side reads, so the corpus is scanned and shingled
    * once instead of twice (r19 verdict item 2).
    */
  private def exactJaccardPairsFrom(docs0: DataFrame,
      num: Long, den: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // HASHED-shingle formulation (round 9): every downstream stage —
    // df counts, the prefix window, the candidate equi-join, and the
    // verify intersections — runs on 60-bit md5 hashes (BIGINT)
    // instead of trigram strings. The sf1-equivalent probe caught the
    // string form spending ~20 s hashing/compare-ing string payloads
    // through a 2.3M-candidate verify; longs cut the posting and
    // verify payload ~3× and make every key comparison one word. The
    // oracle hashes with the SAME md5-prefix function, so both engines
    // see identical values (collisions included — within-doc collision
    // odds at 150 shingles are ~10⁻¹⁶, and parity is exact by
    // construction either way). Jaccard over hashed shingle sets is
    // the standard production formulation.
    val docs = docs0
    val docsM = docs.localCheckpoint() // shared by prefix build + verify
    // broadcast-decision count submitted CONCURRENTLY with the explode
    // checkpoint below (guide §2.6) — both read the docsM checkpoint
    // and are independent, so the count rides the explode job's idle
    // cores instead of serializing in front of it
    val fNdocs = {
      import scala.concurrent.Future
      import scala.concurrent.ExecutionContext.Implicits.global
      Future(docsM.count())
    }
    // postings feed the df counts and the prefix index
    val ex = docsM.select(col("doc_id"), col("n"),
      explode(col("ng")).as("ngram"))
      .localCheckpoint()
    val dfs = ex.groupBy("ngram").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy("df", "ngram")
    // exact prefix length for Jaccard >= num/den is n - ceil(num·n/den)
    // + 1, computed in INTEGER arithmetic: floor(n * (1.0 - 0.8))
    // rounds the double 0.19999... down one element whenever 5 | n,
    // silently dropping true pairs (found by differential test vs
    // brute force)
    val prefix = ex.join(dfs, Seq("ngram"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= expr(
        s"n - (($num * n + ${den - 1}) div $den) + 1"))
      // a df=1 prefix entry is carried by exactly one doc (per-doc
      // shingle sets are distinct), so it cannot produce a candidate —
      // dropping it is EXACT; rn was computed before the cut, so the
      // positional filter still sees true prefix positions
      .filter(col("df") >= 2)
      .select("doc_id", "n", "rn", "ngram")
    val px = prefix.select(col("doc_id").as("da"), col("n").as("na"),
      col("rn").as("ra"), col("ngram"))
    val py = prefix.select(col("doc_id").as("db"), col("n").as("nb"),
      col("rn").as("rb"), col("ngram"))
    val cand = px.join(py, Seq("ngram"))
      .filter(col("da") < col("db"))
      // length filter: den·min(n) >= num·max(n)
      .filter(expr(
        s"$den * least(na, nb) >= $num * greatest(na, nb)"))
      // positional filter: 1 + min(na-ra, nb-rb) >=
      // ceil(num·(na+nb)/(num+den))
      .filter(expr(s"1 + least(na - ra, nb - rb) >= " +
        s"($num * (na + nb) + ${num + den - 1}) div " +
        s"${num + den}"))
      .select("da", "db", "na", "nb")
      .distinct()
    // verify candidates against FULL shingle sets with array_intersect:
    // O(na+nb) per pair in one projection, no posting-list re-join.
    // docsM is a localCheckpoint — AQE has no stats for it, so the
    // strategy is chosen HERE on the real count (O(partitions) on the
    // checkpointed relation): broadcast while the shingle arrays fit
    // one executor, shuffled join beyond — the r11 ×100 probe measured
    // the unconditional broadcast at 46 GB of spill (effectively hung),
    // exactly the corpus size where broadcast must hand over
    val arrJoin = verifyArraysSide(
      scala.concurrent.Await.result(fNdocs,
        scala.concurrent.duration.Duration.Inf))
    cand
      .join(arrJoin(docsM.select(col("doc_id").as("da"), col("ng").as("nga"))),
        Seq("da"))
      .join(arrJoin(docsM.select(col("doc_id").as("db"), col("ng").as("ngb"))),
        Seq("db"))
      .withColumn("inter", size(array_intersect(col("nga"), col("ngb"))))
      // EXACT integer acceptance: inter/(na+nb-inter) >= num/den ⟺
      // (num+den)·inter >= num·(na+nb) — the same bound the prefix/
      // positional filters prune with (a rounded-double acceptance
      // admitted jaccard in [0.79995, 0.8) that the candidate stage
      // prunes)
      .filter(expr(s"inter * ${num + den} >= (na + nb) * $num"))
      .withColumn("jac", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")), 4))
      .select("da", "db", "jac")
      .orderBy("da", "db")
  }

  val dedupNgramJaccardSql: String = exactJaccardPairsSql(jacNum, jacDen)

  /** SQL twin of [[exactJaccardPairs]], threshold-parameterized for
    * the same two callers.
    */
  private def exactJaccardPairsSql(jacNum: Long, jacDen: Long): String =
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(tk) - 2),
      |    i -> ('0x' || substr(md5(
      |      concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])), 1, 15))::BIGINT))
      |    AS ng
      |  FROM t),
      |e AS (SELECT doc_id, len(ng) AS n, unnest(ng) AS ngram FROM g),
      |dfs AS (SELECT ngram, count(*) AS df FROM e GROUP BY ngram),
      |pref AS (
      |  SELECT doc_id, n, ngram FROM (
      |    SELECT e.doc_id, e.n, e.ngram,
      |      row_number() OVER (PARTITION BY e.doc_id
      |        ORDER BY dfs.df, e.ngram) AS rn
      |    FROM e JOIN dfs USING (ngram))
      |  WHERE rn <= n - (($jacNum * n + ${jacDen - 1}) // $jacDen) + 1),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db, x.n AS na,
      |    y.n AS nb
      |  FROM pref x JOIN pref y
      |    ON x.ngram = y.ngram AND x.doc_id < y.doc_id),
      |inter AS (
      |  SELECT da, db, na, nb,
      |    len(list_intersect(ga.ng, gb.ng)) AS inter
      |  FROM cand
      |  JOIN g ga ON ga.doc_id = da
      |  JOIN g gb ON gb.doc_id = db)
      |SELECT da, db,
      |  round(inter::DOUBLE / (na + nb - inter), 4) AS jac
      |FROM inter
      |WHERE inter * ${jacNum + jacDen} >= (na + nb) * $jacNum
      |ORDER BY da, db""".stripMargin

  /** Hot-shingle bound for the containment candidate join: a shingle
    * whose document frequency exceeds max(HotDfFloor, ndocs/HotDfDiv)
    * is HOT and is excluded from the exact prefix join (its posting
    * list would make the join quadratic). Docs whose entire usable
    * prefix is hot are routed through the MinHash band screen instead
    * — see [[dedupContainment]].
    */
  val HotDfFloor = 50L
  val HotDfDiv = 1000L
  def hotDfBound(ndocs: Long): Long = math.max(HotDfFloor, ndocs / HotDfDiv)

  /** Asymmetric CONTAINMENT near-dups: ordered pairs (da, db) where
    * ≥ 80% of da's trigram shingles also appear in db — the case
    * Jaccard structurally misses (a short doc embedded in a long one
    * has tiny Jaccard but full containment; this is the
    * quote/boilerplate/subsumption signal dedup pipelines act on).
    *
    * Same hashed-shingle pipeline as [[dedupNgramJaccard]], with the
    * prefix filter applied ONE-SIDED: containment ≥ t bounds only the
    * contained side's overlap (⌈t·na⌉ shared shingles), so da indexes
    * its ⌊na−⌈t·na⌉⌋+1 globally rarest shingles while db must keep
    * full postings (the container has no length bound — that asymmetry
    * is inherent to containment, not a design choice). Two exact
    * pre-verify filters: contDen·nb ≥ contNum·na (overlap can't exceed
    * nb) and the one-sided positional bound 1 + min(na−ra, nb−rb) ≥
    * ⌈t·na⌉. Candidates verify with one array_intersect against the
    * checkpointed full sets. DedupSpec holds the unfiltered
    * brute-force differential.
    *
    * HOT-SHINGLE GUARD (r12; the r11 ×30 probe measured the unguarded
    * join at 50.8× time for 30× data): real corpora contain
    * vocabulary-collapsed regions — boilerplate, templated pages,
    * license headers — where shingle document frequencies grow with
    * the corpus and the full-postings side of the prefix join
    * degenerates toward all-pairs. The guard bounds the exact join's
    * per-shingle postings at df ≤ B, B = [[hotDfBound]] (df-fraction
    * capping, the standard prefix-filtering defense), and routes the
    * docs the cap starves — those whose ENTIRE usable prefix (df ≥ 2
    * entries) is hot — through the MinHash band screen over the same
    * hashed shingle sets (the [[dedupMinhashLsh]] candidate
    * generator, here emitting both orientations of each colliding
    * pair). Both paths feed the unchanged EXACT verify
    * (inter·contDen ≥ contNum·na over full shingle sets), so accepted
    * pairs are always true containment pairs. Semantics: candidate
    * generation stays EXACT while no shingle is hot (healthy
    * vocabulary — at sf0.1 the max df is 25 vs B = 50, so the output
    * is bit-identical to the unguarded operator); in hot regions
    * recall degrades gracefully to the band screen's (a pair sharing
    * ONLY hot prefix shingles while one side also carries a cold one
    * can be missed — the price of not being quadratic there). The
    * DuckDB oracle mirrors the cap and the routing decision
    * bit-exactly, so the gate stays hash-green in both regimes.
    *
    * On a 1000-executor/100 TB run the same shape holds: df counts and
    * the band screen are linear aggregations, the capped join's
    * per-shingle work is bounded by B, and B tracks corpus size
    * through the ndocs/HotDfDiv term.
    */
  def dedupContainment(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val docsM = hashedShingleDocs(spark, sfDir).localCheckpoint()
    // one driver-side count serves the hot bound AND the verify-side
    // broadcast decision (docsM is checkpointed: O(partitions)).
    // Submitted CONCURRENTLY with the explode checkpoint below (guide
    // §2.6: actions are only sequential because the driver calls them
    // sequentially) — both read the docsM checkpoint and are
    // independent, so the count's job rides the explode job's idle
    // cores instead of serializing in front of it.
    val fNdocs = Future(docsM.count())
    val ex = docsM.select(col("doc_id"), col("n"),
      explode(col("ng")).as("ngram"))
      .localCheckpoint()
    val ndocs = Await.result(fNdocs, Duration.Inf)
    val hotB = hotDfBound(ndocs)
    val dfs = ex.groupBy("ngram").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy("df", "ngram")
    val ranked = ex.join(dfs, Seq("ngram"))
      .withColumn("rn", row_number().over(w))
      // df = #docs carrying the shingle (per-doc sets are distinct), so
      // a df=1 posting can never meet another doc in the candidate join
      // — dropping them here is EXACT and, on near-unique trigram
      // corpora, removes most of the full-postings side (measured
      // 1.9 s → 0.6 s at sf0.1). rn is computed BEFORE the cut, so the
      // positional filter still sees true prefix positions.
      .filter(col("df") >= 2)
      .localCheckpoint() // feeds prefix side, full postings, hot routing
    val pe = ranked.filter(col("rn") <= expr(
      s"n - (($contNum * n + ${contDen - 1}) div $contDen) + 1"))
    // EXACT path, df-capped on BOTH sides: if a pair shares a COLD
    // prefix shingle of the contained side it is generated here (the
    // hot side of that shingle's postings cannot exist — the shingle
    // is cold corpus-wide)
    val px = pe.filter(col("df") <= hotB)
      .select(col("doc_id").as("da"), col("n").as("na"),
        col("rn").as("ra"), col("ngram"))
    val py = ranked.filter(col("df") <= hotB)
      .select(col("doc_id").as("db"), col("n").as("nb"),
        col("rn").as("rb"), col("ngram"))
    val candCold = px.join(py, Seq("ngram"))
      .filter(col("da") =!= col("db"))
      .filter(expr(s"$contDen * nb >= $contNum * na"))
      .filter(expr(s"1 + least(na - ra, nb - rb) >= " +
        s"($contNum * na + ${contDen - 1}) div $contDen"))
      .select("da", "db", "na")
    // routing: docs with NO cold usable-prefix entry can't reach the
    // exact path — screen them through MinHash bands instead. (A doc
    // with no df>=2 prefix entry at all has no true pair — exact.)
    val hotDocs = pe.groupBy("doc_id").agg(min("df").as("mindf"))
      .filter(col("mindf") > hotB)
      .select("doc_id")
    // (A candCold.localCheckpoint() materialized concurrently with this
    // count was A/B-measured WORSE at sf0.1 — the extra materialization
    // of the pre-distinct candidate rows costs more than the 0.12 s
    // count it overlaps; see OPTIMIZATION_r20.md. The count stays on
    // the critical path deliberately.)
    val nHot = hotDocs.count()
    val cand0 = if (nHot == 0) candCold else {
      // MinHash band signatures straight from the hashed shingles
      // (hb = shingle mod P) — same 16-perm, 4x4-band family as
      // [[dedupMinhashLsh]], identical in the oracle
      val hb = ex.select(col("doc_id"), expr(s"ngram % $P").as("hb"))
      val mhAggs = perms.zipWithIndex.map { case ((a, b), i) =>
        min(expr(s"($a * hb + $b) % $P")).as(s"mh$i")
      }
      val sig = hb.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
      val bandCols = (0 until bands).map { j =>
        val ms = (0 until rowsPerBand)
          .map(r => col(s"mh${rowsPerBand * j + r}"))
        struct(lit(j).as("band"), md5(concat_ws(",", ms: _*)).as("sig"))
      }
      val buckets = sig.select(col("doc_id"),
          explode(array(bandCols: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"),
          col("bs.sig").as("sig"))
      val hotBuckets = buckets.join(hotDocs, Seq("doc_id"))
      val hp = hotBuckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") &&
            col("a.sig") === col("b.sig") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      // containment is ordered — emit BOTH orientations of each band
      // collision (the length filter kills the impossible direction)
      val lens = docsM.select(col("doc_id"), col("n"))
      val candHot = hp.select(col("x").as("da"), col("y").as("db"))
        .unionByName(hp.select(col("y").as("da"), col("x").as("db")))
        .join(lens.select(col("doc_id").as("da"), col("n").as("na")),
          Seq("da"))
        .join(lens.select(col("doc_id").as("db"), col("n").as("nb")),
          Seq("db"))
        .filter(expr(s"$contDen * nb >= $contNum * na"))
        .select("da", "db", "na")
      candCold.unionByName(candHot)
    }
    val cand = cand0.distinct()
    val arrJoin = verifyArraysSide(ndocs)
    cand
      .join(arrJoin(docsM.select(col("doc_id").as("da"),
        col("ng").as("nga"))), Seq("da"))
      .join(arrJoin(docsM.select(col("doc_id").as("db"),
        col("ng").as("ngb"))), Seq("db"))
      .withColumn("inter", size(array_intersect(col("nga"), col("ngb"))))
      // acceptance is the EXACT integer predicate inter/na >= t — the
      // same bound the prefix/positional/length filters prune with.
      // (r10 advice: accepting on the ROUNDED cont let a pair with
      // containment in [0.79995, 0.8) pass the verify while the
      // candidate stage could prune it — a latent exactness gap for
      // docs with >= 20k shingles.) cont stays as an output column.
      .filter(expr(s"inter * $contDen >= na * $contNum"))
      .withColumn("cont",
        round(col("inter").cast("double") / col("na"), 4))
      .select("da", "db", "cont")
      .orderBy("da", "db")
  }

  /** DuckDB mirror of [[dedupContainment]] including the hot-shingle
    * guard: the df cap, the all-hot-prefix routing decision, and the
    * MinHash band screen replay bit-for-bit (same md5-derived 60-bit
    * shingle hashes, same (a,b) permutation family mod P, same band
    * signature md5) so both engines generate the identical candidate
    * set in every regime.
    */
  val dedupContainmentSql: String = {
    val mhCols = perms.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * hb + $b) % $P) AS mh$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until bands).map { j =>
      val ms = (0 until rowsPerBand).map(r => s"mh${rowsPerBand * j + r}")
        .mkString(", ")
      s"SELECT doc_id, $j AS band, md5(concat_ws(',', $ms)) AS sig FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(tk) - 2),
      |    i -> ('0x' || substr(md5(
      |      concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])), 1, 15))::BIGINT))
      |    AS ng
      |  FROM t),
      |e AS (SELECT doc_id, len(ng) AS n, unnest(ng) AS ngram FROM g),
      |params AS (
      |  SELECT greatest($HotDfFloor, count(*) // $HotDfDiv) AS hotb
      |  FROM g),
      |dfs AS (SELECT ngram, count(*) AS df FROM e GROUP BY ngram),
      |ranked AS (
      |  SELECT doc_id, n, ngram, df, rn FROM (
      |    SELECT e.doc_id, e.n, e.ngram, dfs.df,
      |      row_number() OVER (PARTITION BY e.doc_id
      |        ORDER BY dfs.df, e.ngram) AS rn
      |    FROM e JOIN dfs USING (ngram))
      |  WHERE df >= 2),
      |pe AS (
      |  SELECT * FROM ranked
      |  WHERE rn <= n - (($contNum * n + ${contDen - 1}) // $contDen) + 1),
      |cold AS (
      |  SELECT x.doc_id AS da, y.doc_id AS db, x.n AS na
      |  FROM (SELECT * FROM pe
      |        WHERE df <= (SELECT hotb FROM params)) x
      |  JOIN (SELECT * FROM ranked
      |        WHERE df <= (SELECT hotb FROM params)) y
      |    ON x.ngram = y.ngram AND x.doc_id != y.doc_id
      |    AND $contDen * y.n >= $contNum * x.n
      |    AND 1 + least(x.n - x.rn, y.n - y.rn)
      |        >= ($contNum * x.n + ${contDen - 1}) // $contDen),
      |hot AS (
      |  SELECT doc_id FROM pe GROUP BY doc_id
      |  HAVING min(df) > (SELECT hotb FROM params)),
      |hbt AS (SELECT doc_id, ngram % $P AS hb FROM e),
      |sig AS (
      |  SELECT doc_id,
      |    $mhCols
      |  FROM hbt GROUP BY doc_id),
      |bandt AS (
      |  $bandSelects),
      |hp AS (
      |  SELECT a.doc_id AS x, b.doc_id AS y
      |  FROM bandt a
      |  JOIN hot h ON h.doc_id = a.doc_id
      |  JOIN bandt b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id != b.doc_id),
      |lens AS (SELECT doc_id, len(ng) AS n FROM g),
      |hotc AS (
      |  SELECT p.da, p.db, la.n AS na
      |  FROM (SELECT x AS da, y AS db FROM hp
      |        UNION ALL SELECT y AS da, x AS db FROM hp) p
      |  JOIN lens la ON la.doc_id = p.da
      |  JOIN lens lb ON lb.doc_id = p.db
      |  WHERE $contDen * lb.n >= $contNum * la.n),
      |cand AS (
      |  SELECT DISTINCT da, db, na FROM (
      |    SELECT * FROM cold UNION ALL SELECT * FROM hotc))
      |SELECT da, db,
      |  round(len(list_intersect(ga.ng, gb.ng))::DOUBLE / na, 4) AS cont
      |FROM cand
      |JOIN g ga ON ga.doc_id = da
      |JOIN g gb ON gb.doc_id = db
      |WHERE len(list_intersect(ga.ng, gb.ng)) * $contDen >= na * $contNum
      |ORDER BY da, db""".stripMargin
  }

  /** MinHash + LSH near-dup detection: 16 minhashes over the distinct
    * word-trigram shingle set, banded 4×4; candidate pairs share at
    * least one band signature; candidates are then verified with exact
    * shingle-set Jaccard >= 0.7.
    *
    * This is the scale path for dedup at 100 TB: signatures are one
    * narrow aggregation; the candidate join keys on (band, signature)
    * so the shuffle only carries 4 rows per document and pair work is
    * confined to true collision buckets.
    */
  def dedupMinhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    // the signature pass reads the CHECKPOINTED shingle arrays: fusing
    // the shingle build straight into the explode + 16-way agg was
    // measured 7× SLOWER at sf0.1 (0.54 s → 3.88 s — the collapsed
    // scan→transform→explode→md5→agg stage falls out of efficient
    // codegen), so the barrier is load-bearing, not just a reuse cache
    // (a candidate-pruned rebuild of the verify arrays was also
    // measured and LOST: the extra scan + checkpoint jobs cost more
    // than rereading the existing corpus checkpoint at this scale)
    dedupMinhashLshFrom(shingleArrays(spark, sfDir))

  /** [[dedupMinhashLsh]] over a caller-supplied CHECKPOINTED
    * string-shingle-array relation, so [[dedupRecallAudit]] can feed
    * both of its pipelines from one checkpoint.
    */
  private def dedupMinhashLshFrom(arr: DataFrame): DataFrame = {
    val toks = arr.select(col("doc_id"), explode(col("ng")).as("token"))
      .withColumn("hb", expr(sparkHb))
    val mhAggs = perms.zipWithIndex.map { case ((a, b), i) =>
      min(expr(s"($a * hb + $b) % $P")).as(s"mh$i")
    }
    val sig = toks.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
    val bandCols = (0 until bands).map { j =>
      val ms = (0 until rowsPerBand).map(r => col(s"mh${rowsPerBand * j + r}"))
      struct(lit(j).as("band"), md5(concat_ws(",", ms: _*)).as("sig"))
    }
    val buckets = sig.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // exact shingle-set Jaccard via array_intersect on the full sets
    cand
      .join(arr.select(col("doc_id").as("da"), col("ng").as("nga"),
        col("n").as("na")), Seq("da"))
      .join(arr.select(col("doc_id").as("db"), col("ng").as("ngb"),
        col("n").as("nb")), Seq("db"))
      .withColumn("inter", size(array_intersect(col("nga"), col("ngb"))))
      // exact lshNum/lshDen bound: inter/(na+nb-inter) >= t ⟺
      // (num+den)·inter >= num·(na+nb); jac stays as a (rounded)
      // output column only
      .filter(expr(s"inter * ${lshNum + lshDen} >= (na + nb) * $lshNum"))
      .withColumn("jac", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")), 4))
      .select("da", "db", "jac")
      .orderBy("da", "db")
  }

  val dedupMinhashLshSql: String = {
    val mhCols = perms.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * hb + $b) % $P) AS mh$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until bands).map { j =>
      val ms = (0 until rowsPerBand).map(r => s"mh${rowsPerBand * j + r}")
        .mkString(", ")
      s"SELECT doc_id, $j AS band, md5(concat_ws(',', $ms)) AS sig FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $duckShinglesCte,
       |h AS (SELECT doc_id, token, $duckHb AS hb FROM shingles),
       |sig AS (
       |  SELECT doc_id,
       |    $mhCols
       |  FROM h GROUP BY doc_id),
       |bandt AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bandt a JOIN bandt b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |garr AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))) AS ng
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
       |  WHERE len(tk) >= 3),
       |inter AS (
       |  SELECT da, db, len(ga.ng) AS na, len(gb.ng) AS nb,
       |    len(list_intersect(ga.ng, gb.ng)) AS inter
       |  FROM cand
       |  JOIN garr ga ON ga.doc_id = da
       |  JOIN garr gb ON gb.doc_id = db)
       |SELECT da, db,
       |  round(inter::DOUBLE / (na + nb - inter), 4) AS jac
       |FROM inter
       |WHERE inter * ${lshNum + lshDen} >= (na + nb) * $lshNum
       |ORDER BY da, db""".stripMargin
  }

  /** SimHash width: 32 bits keeps hamming-≤1 collisions meaningful on
    * small-vocabulary corpora (16 bits collides near-quadratically). */
  val simhashBits = 32

  /** Per-document SimHash over distinct-shingle hashes. */
  private[graft] def simhashSig(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = shingles(spark, sfDir)
      .withColumn("hb", expr(sparkHb))
    val wAggs = (0 until simhashBits).map { k =>
      sum(expr(s"case when (shiftright(hb, $k) & 1) = 1 then 1 else -1 end"))
        .as(s"w$k")
    }
    val bitsExpr = (0 until simhashBits)
      .map(k => s"(case when w$k >= 0 then ${1L << k} else 0 end)")
      .mkString(" + ")
    toks.groupBy("doc_id").agg(wAggs.head, wAggs.tail: _*)
      .withColumn("simhash", expr(bitsExpr))
      .select("doc_id", "simhash")
      .localCheckpoint() // reused by probe and build sides of the join
  }

  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    simhashSig(spark, sfDir).orderBy("doc_id")

  private def duckSimhashCte: String = {
    val wCols = (0 until simhashBits)
      .map(k => s"sum(CASE WHEN ((hb >> $k) & 1) = 1 THEN 1 ELSE -1 END) AS w$k")
      .mkString(",\n    ")
    val bits = (0 until simhashBits)
      .map(k => s"(CASE WHEN w$k >= 0 THEN ${1L << k} ELSE 0 END)")
      .mkString(" + ")
    s"""$duckShinglesCte,
       |h AS (SELECT doc_id, $duckHb AS hb FROM shingles),
       |w AS (
       |  SELECT doc_id,
       |    $wCols
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $bits AS simhash FROM w)""".stripMargin
  }

  val dedupSimhashSql: String =
    s"""WITH $duckSimhashCte
       |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs with hamming distance <= 1, found by a
    * hamming-ball probe join: each doc emits 17 keys (its signature and
    * the 16 one-bit flips); pairs come from key equality — no cartesian
    * product, so the approach survives arbitrary document counts.
    */
  def dedupSimhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = simhashSig(spark, sfDir)
    val probeExpr = (Seq("simhash") ++
      (0 until simhashBits).map(k => s"simhash ^ ${1L << k}"))
      .mkString("array(", ", ", ")")
    val probes = sig.select(col("doc_id"), col("simhash"),
      explode(expr(probeExpr)).as("probe"))
    probes.as("a").join(sig.as("b"),
        col("a.probe") === col("b.simhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .orderBy("da", "db")
  }

  val dedupSimhashPairsSql: String = {
    val probeList = (Seq("simhash") ++
      (0 until simhashBits).map(k => s"xor(simhash, ${1L << k})"))
      .mkString(", ")
    s"""WITH $duckSimhashCte,
       |probes AS (
       |  SELECT doc_id, simhash, unnest([$probeList]) AS probe FROM sig)
       |SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM probes a JOIN sig b
       |  ON a.probe = b.simhash AND a.doc_id < b.doc_id
       |ORDER BY da, db""".stripMargin
  }

  /** Near-dup CLUSTERING: MinHash-LSH pairs are only edges — real
    * dedup keeps one doc per connected component of the near-dup
    * graph (A~B, B~C must collapse to ONE keeper even when A~C was
    * never emitted as a pair). Component id = min doc_id; singleton
    * docs keep themselves. This is the standard 100 TB dedup
    * architecture: candidate pairs stay near-linear via LSH, and the
    * transitive closure runs on the (tiny) edge set, not the corpus.
    *
    * The closure is DataFrame-native min-label propagation over ONLY
    * the nodes that appear in a pair: each round joins the
    * symmetrized edge set against the current labels and folds the
    * neighborhood minimum, until the label sum reaches fixpoint (a
    * one-scalar driver check; labels only ever decrease, so the sum
    * strictly drops while anything changes). Rounds = component
    * diameter — near-dup clusters are dense and shallow, so a
    * handful. Previous rounds used GraphX Pregel here; that iterated
    * state over EVERY document each round (the corpus-sized vertex
    * RDD, outside codegen) when only pair-nodes — orders of magnitude
    * fewer — can ever change label. The singleton majority now costs
    * exactly one left-join row at the end, and each round's shuffle
    * is edge-set-sized. (At petabyte edge sets the same loop upgrades
    * to alternating large-star/small-star (Kiveris et al., "CC in
    * MapReduce"), which bounds rounds by log diameter; min-label is
    * the right point on that curve for shallow LSH clusters.)
    * Per-round localCheckpoint keeps the plan flat (labels feed the
    * next round twice — without it the lineage doubles per round).
    *
    * Oracle: the same pair SQL fed through a recursive-CTE transitive
    * closure with min-label aggregation.
    */
  /** Component label per PAIR-NODE: (id, lbl) where lbl = min doc_id
    * reachable through the verified LSH pair graph. Only docs that
    * appear in at least one pair carry a row — the singleton majority
    * is resolved by the callers' left joins (`coalesce(lbl, doc_id)`),
    * never entering the propagation loop. Checkpointed output: the
    * LSH pipeline and the loop execute exactly once at construction,
    * and consumers' final plans scan documents once (pinned in
    * PlanAuditSpec).
    */
  private def ccLabels(spark: SparkSession, sfDir: String): DataFrame =
    // localCheckpoint: the edge set is rescanned every propagation
    // round — without this each round re-runs the whole LSH pipeline
    propagateMinLabels(
      dedupMinhashLsh(spark, sfDir).select("da", "db").localCheckpoint())

  /** Min-label propagation with POINTER JUMPING over a (da, db) edge
    * set: each round folds the neighborhood minimum AND adopts the
    * label of one's own label (path shortcutting), so convergence
    * takes O(log diameter) rounds, not O(diameter) — a 130-node
    * near-dup chain (sliding boilerplate drift, each adjacent pair
    * similar but distant ones not) converges in a handful of rounds
    * where one-hop propagation alone would need 130 and trip the
    * round cap (unit-tested in DedupSpec). The cap is a convergence
    * invariant: 64 shortcutting rounds cover components of diameter
    * 2^64. Exposed package-private for the synthetic-graph test.
    */
  private[dedup] def propagateMinLabels(pairs: DataFrame): DataFrame = {
    val e2 = pairs.select(col("da").as("a"), col("db").as("b"))
      .union(pairs.select(col("db").as("a"), col("da").as("b")))
      .localCheckpoint()
    // init already folds one hop: lbl = min(self, direct neighbors)
    var labels = e2.groupBy(col("a").as("id"))
      .agg(least(min("b"), col("a")).as("lbl")).localCheckpoint()
    var lblSum = labels.agg(coalesce(sum("lbl"), lit(0L))).head().getLong(0)
    var converged = lblSum == 0L
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= 64, s"CC min-label propagation did not converge")
      // one edge-sized join + one agg: neighbor labels and own label
      // union into a single min fold (checkpointed — the shortcut step
      // reads it twice)
      val hop = e2.join(labels, e2("b") === labels("id"))
        .select(col("a").as("id"), col("lbl"))
        .unionByName(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      // pointer jumping: adopt the label of one's label (the label is
      // itself a node id in the same component, so this is exact and
      // halves the remaining distance to the component minimum)
      labels = hop.join(
          hop.select(col("id").as("pid"), col("lbl").as("plbl")),
          col("lbl") === col("pid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val s2 = labels.agg(coalesce(sum("lbl"), lit(0L))).head().getLong(0)
      converged = s2 == lblSum
      lblSum = s2
    }
    labels
  }

  def dedupClusterCc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = ccLabels(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    docs.join(labels, docs("doc_id") === labels("id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster")))
      .withColumn("is_keeper", col("doc_id") === col("cluster"))
      .orderBy("doc_id")
  }

  val dedupClusterCcSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT da, db FROM ($dedupMinhashLshSql) mh),
       |e2 AS (SELECT da AS a, db AS b FROM pairs
       |       UNION SELECT db AS a, da AS b FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e2
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
       |  WHERE e.b <> r.a),
       |labels AS (SELECT a AS doc_id, min(b) AS min_reach
       |           FROM reach GROUP BY a),
       |clus AS (
       |  SELECT d.doc_id,
       |    coalesce(least(l.min_reach, d.doc_id), d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id)
       |SELECT c.doc_id, c.cluster, s.n AS cluster_size,
       |  (c.doc_id = c.cluster) AS is_keeper
       |FROM clus c JOIN (SELECT cluster, count(*) AS n FROM clus
       |                  GROUP BY cluster) s USING (cluster)
       |ORDER BY doc_id""".stripMargin

  /** Quality-aware keeper selection over the near-dup clusters — the
    * curation policy production pipelines actually want: inside each
    * [[dedupClusterCc]] component keep the HIGHEST-quality member
    * (ties to the lowest doc_id), not the arbitrary min-id
    * representative. "Which copy survives" matters: near-dup clusters
    * often mix a clean original with truncated or boilerplate-wrapped
    * copies, and min-id keeps whichever was crawled first.
    *
    * Composition: CC pair-node labels ([[ccLabels]] over the LSH edge
    * set) LEFT-join the integer quality scores of
    * [[graft.text.TextOps.textQuality]] on doc_id (`coalesce(lbl,
    * doc_id)` resolves the singleton majority), then one rank window
    * per cluster picks the keeper. Both inputs carry their own
    * oracles; the DuckDB replay nests both (recursive-CTE closure +
    * integer quality) so the composed selection is hash-compared
    * end-to-end, and the driver differential re-derives clusters with
    * an independent union-find.
    *
    * Scale shape: the LSH+CC stage executes exactly once, behind the
    * [[ccLabels]] checkpoint (the round-8 audit asked for this to be
    * pinned: measured, keep_best = cluster stage + quality + one
    * join + two windows, and the final plan scans documents ONCE —
    * the quality projection, which doubles as the cluster join base,
    * asserted in PlanAuditSpec). Quality is a projection; the join
    * and both windows share the cluster/doc_id hash partitioning;
    * singleton clusters (the overwhelming majority) cost one row
    * each.
    */
  def dedupKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = ccLabels(spark, sfDir)
    val quality = graft.text.TextOps.textQuality(spark, sfDir)
      .select("doc_id", "quality_e4")
    val j = quality.join(labels, quality("doc_id") === labels("id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster"),
        col("quality_e4"))
    val byCluster = Window.partitionBy("cluster")
    j.withColumn("rk", row_number().over(
        byCluster.orderBy(desc("quality_e4"), asc("doc_id"))))
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .filter(col("rk") <= 1)
      .select(col("cluster"), col("doc_id").as("keeper_doc"),
        col("cluster_size"), col("quality_e4").as("keeper_quality_e4"))
      .orderBy("cluster")
  }

  val dedupKeepBestSql: String =
    s"""WITH clus0 AS (
       |  SELECT doc_id, cluster FROM ($dedupClusterCcSql) cc),
       |qual AS (
       |  SELECT doc_id, quality_e4
       |  FROM (${graft.text.TextOps.textQualitySql}) tq),
       |j AS (
       |  SELECT c.cluster, c.doc_id, q.quality_e4
       |  FROM clus0 c JOIN qual q ON q.doc_id = c.doc_id),
       |sz AS (SELECT cluster, count(*)::BIGINT AS n FROM j GROUP BY cluster)
       |SELECT cluster, doc_id AS keeper_doc, n AS cluster_size,
       |  quality_e4 AS keeper_quality_e4
       |FROM (
       |  SELECT j.cluster, j.doc_id, j.quality_e4, sz.n,
       |    row_number() OVER (PARTITION BY j.cluster
       |      ORDER BY j.quality_e4 DESC, j.doc_id ASC) AS rk
       |  FROM j JOIN sz ON sz.cluster = j.cluster)
       |WHERE rk = 1
       |ORDER BY cluster""".stripMargin

  /** Shared fingerprint + corpus/delivery split — ONE definition
    * feeding the batch screen below AND the streaming ingest twin
    * ([[graft.streaming.IngestDedupStream]]), the same
    * shared-projection discipline as `semDedupIncrAssigned` /
    * `sprtDailyCensus`: (doc_id, h, is_delta) where `h` is the 60-bit
    * md5 prefix of the canonical fingerprint and `is_delta` marks the
    * deterministic 25% "today's delivery" slice.
    */
  private[graft] def bloomIncrAssigned(spark: SparkSession,
      sfDir: String): DataFrame = {
    val fp = "array_join(array_sort(array_distinct(split(lower(text), ' '))), ' ')"
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr(s"cast(conv(substr(md5($fp), 1, 15), 16, 10) as bigint)").as("h"),
        (col("doc_id") % 4 === 0).as("is_delta"))
  }

  /** Incremental ingest dedup: screen a NEW BATCH of documents against
    * the EXISTING CORPUS and keep only genuinely-new ones. The batch is
    * `doc_id % 4 == 0` (a deterministic 25% slice), the corpus is the
    * rest — standing in for "yesterday's 100 TB" vs "today's delivery".
    *
    * Scale design: the corpus is reduced to a Bloom SKETCH in one pass
    * (mergeable partial aggregation; the driver holds only the filter's
    * bit array — ~1.2 MB per 10^6 keys at 1% fpp). The sketch screens
    * the batch: bloom-NEGATIVE rows are *definitely* new (no false
    * negatives) and skip the join entirely; only bloom-POSITIVE rows —
    * true duplicates plus ~fpp false positives — reach the exact
    * anti-join, so the shuffled probe side shrinks from |batch| to
    * |dups| + fpp·|batch|. Results are EXACT: the bloom only prunes
    * work, never changes the answer, which is why the DuckDB oracle is
    * a plain NOT EXISTS. At 100 TB the corpus side of the verify join
    * reads a bucketed fingerprint table (h-bucketed, see
    * q26_bucketed_join) rather than rescanning raw text, and a corpus
    * beyond ~10^10 keys shards the bloom by hash prefix into a
    * partition-local sketch per shard; the screen semantics are
    * unchanged.
    *
    * The dedup key is the CANONICAL FINGERPRINT (md5 of the sorted
    * distinct lowercase token set, as [[dedupFingerprint]]) rather than
    * the raw text hash — the synthetic corpus contains token-order
    * near-dups, not byte dups, and an ingest screen keyed on raw bytes
    * would pass every reshuffled copy through. Hashing is the repo's
    * engine-portable 60-bit md5 prefix, so the oracle reproduces `h`
    * bit-for-bit.
    */
  def dedupBloomIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    // r20: checkpoint the assigned relation — its canonical-fingerprint
    // hash (split + sort + distinct + md5 per row, the op's only
    // expensive expression) was recomputed by all FOUR consumers
    // (bloom build, anti-join corpus side, both bloom-screen branches)
    // plus the pushed might_contain filters (r19 plan: the fingerprint
    // inlined into 6 Filter conditions). One narrow materialization
    // (doc_id, h, is_delta) feeds everything; the corpus count for the
    // bloom sizing becomes an in-memory pass. Checkpointed HERE, not in
    // bloomIncrAssigned, which the streaming twin shares.
    val docs = bloomIncrAssigned(spark, sfDir).localCheckpoint()
    val corpus = docs.filter(!col("is_delta")).select("doc_id", "h")
    val batch = docs.filter(col("is_delta")).select("doc_id", "h")
    // one corpus pass -> mergeable bloom sketch on the driver (bounded:
    // bit-array bytes, not rows); expectedNumItems from a pruned count
    // (table stats at scale)
    val bf = corpus.stat.bloomFilter("h", math.max(corpus.count(), 1L), 0.01)
    // Probe via the native BloomFilterMightContain expression (the one
    // Spark's own runtime row-level filtering injects) rather than a
    // Scala udf: the probe stays inside whole-stage codegen and the
    // serialized sketch ships as a binary literal — same bytes an
    // injected runtime filter would carry.
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    def mightContain(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(BloomFilterMightContain(
        Literal(bfBytes, BinaryType), ColumnBridge.expression(c)))
    val definitelyNew = batch.filter(!mightContain(col("h")))
    val needsVerify = batch.filter(mightContain(col("h")))
    val verifiedNew =
      needsVerify.join(corpus.select("h"), Seq("h"), "left_anti")
    definitelyNew.select("doc_id", "h")
      .unionByName(verifiedNew.select("doc_id", "h"))
      .orderBy("doc_id")
  }

  val dedupBloomIncrementalSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    (('0x' || substr(md5(array_to_string(list_sort(list_distinct(
      |       string_split(lower(text), ' '))), ' ')), 1, 15))::BIGINT) AS h
      |  FROM documents)
      |SELECT doc_id, h FROM d b
      |WHERE b.doc_id % 4 = 0
      |  AND NOT EXISTS (
      |    SELECT 1 FROM d c WHERE c.doc_id % 4 <> 0 AND c.h = b.h)
      |ORDER BY doc_id""".stripMargin

  /** Recall audit of the MinHash-LSH screen against exact Jaccard —
    * the metric a banded index ships with (the dedup twin of
    * `ann_recall_audit`): ground truth is [[exactJaccardPairs]] at the
    * LSH verify threshold ([[lshNum]]/[[lshDen]]) — the prefix filter
    * is exact at any threshold — and the candidate side is
    * [[dedupMinhashLsh]]'s output, whose pairs all passed the same
    * exact verify, so misses are pure BAND misses (no shared bucket in
    * [[bands]]×[[rowsPerBand]] minhashes). One caveat keeps `n_extra`
    * in the output: the truth side intersects 60-bit HASHED shingle
    * sets while LSH's verify intersects the string sets, so a hash
    * collision could in principle produce an LSH pair outside the
    * truth set (odds ~10⁻¹⁶ per doc; DedupSpec pins extra = 0 on the
    * fixture, and the oracle replays both sides bit-exactly either
    * way).
    *
    * Scale shape: both sides are the already-bounded pipelines; the
    * audit adds one left-semi equi-join on (da, db) and three scalar
    * counts.
    */
  def dedupRecallAudit(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE shared shingle checkpoint feeds both pipelines (r19 verdict
    // item 2 — each side previously re-scanned, re-split and
    // re-shingled the corpus): the LSH side reads the string arrays
    // directly, and the exact side derives its 60-bit hashed sets from
    // the same arrays with one md5 transform over the DISTINCT
    // shingles (hash-then-distinct == distinct-then-hash as sets, and
    // only set size/membership feed the Jaccard math downstream).
    // evalOnce pins the transform to one evaluation per row — the
    // collapsed size(ng) projection would otherwise inline it twice.
    val arr = shingleArrays(spark, sfDir)
    val hashed = arr
      .select(col("doc_id"), graft.core.Spread.evalOnce(array_distinct(
        expr("transform(ng, s -> cast(conv(substr(md5(s), 1, 15), 16, " +
          "10) as bigint))"))).as("ng"))
      .select(col("doc_id"), col("ng"), size(col("ng")).as("n"))
    val exact = exactJaccardPairsFrom(hashed, lshNum, lshDen)
      .select("da", "db")
    val lsh = dedupMinhashLshFrom(arr).select("da", "db")
    val hit = lsh.join(exact, Seq("da", "db"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_lsh"))))
      .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
      .select(col("n_exact"), col("n_lsh"), col("n_hit"),
        (col("n_lsh") - col("n_hit")).as("n_extra"),
        // empty truth set → recall is vacuously perfect; without the
        // guard Spark's integer div yields null while DuckDB errors —
        // a cross-engine divergence on a corpus with no near-dups
        // (r14 advice)
        expr("case when n_exact = 0 then 1000000 " +
          "else (n_hit * 1000000 + n_exact div 2) div n_exact end")
          .as("recall_e6"))
  }

  val dedupRecallAuditSql: String =
    s"""WITH ex AS (
       |  SELECT da, db FROM (${exactJaccardPairsSql(lshNum, lshDen)}) e),
       |got AS (SELECT da, db FROM ($dedupMinhashLshSql) m),
       |hit AS (
       |  SELECT da, db FROM got
       |  WHERE EXISTS (SELECT 1 FROM ex
       |    WHERE ex.da = got.da AND ex.db = got.db)),
       |c AS (
       |  SELECT (SELECT count(*) FROM ex)::BIGINT AS n_exact,
       |    (SELECT count(*) FROM got)::BIGINT AS n_lsh,
       |    (SELECT count(*) FROM hit)::BIGINT AS n_hit)
       |SELECT n_exact, n_lsh, n_hit, n_lsh - n_hit AS n_extra,
       |  CASE WHEN n_exact = 0 THEN 1000000
       |    ELSE (n_hit * 1000000 + n_exact // 2) // n_exact
       |  END AS recall_e6
       |FROM c""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("dedup_recall_audit", dedupRecallAudit _, dedupRecallAuditSql),
    ("dedup_exact", dedupExact _, dedupExactSql),
    ("dedup_fingerprint", dedupFingerprint _, dedupFingerprintSql),
    ("dedup_ngram_jaccard", dedupNgramJaccard _, dedupNgramJaccardSql),
    ("dedup_containment", dedupContainment _, dedupContainmentSql),
    ("dedup_minhash_lsh", dedupMinhashLsh _, dedupMinhashLshSql),
    ("dedup_simhash", dedupSimhash _, dedupSimhashSql),
    ("dedup_simhash_pairs", dedupSimhashPairs _, dedupSimhashPairsSql),
    ("dedup_cluster_cc", dedupClusterCc _, dedupClusterCcSql),
    ("dedup_keep_best", dedupKeepBest _, dedupKeepBestSql),
    ("dedup_bloom_incremental", dedupBloomIncremental _, dedupBloomIncrementalSql))
}

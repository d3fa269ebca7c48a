package graft.dedup

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential tests against brute-force ground truth. The DuckDB
  * oracle replicates the prefix-filter ALGORITHM, so an algorithmic
  * bug passes the oracle on both sides — only an independent all-pairs
  * computation can catch it (it caught the floor(n * 0.1999...)
  * short-prefix bug).
  */
class DedupSpec extends SparkSuite {

  /** All-pairs exact trigram Jaccard — O(n^2), test-only. */
  private def groundTruth(threshold: Double): DataFrame = {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .withColumn("ng", array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), i -> " +
          "concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), " +
          "element_at(tk, i + 2)))")))
      .select(col("doc_id"), col("ng"), size(col("ng")).as("n"))
    docs.as("x").crossJoin(docs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("x.ng"), col("y.ng"))))
      // same 4-decimal rounding as the product queries: the test
      // isolates candidate-generation completeness, not boundary
      // semantics at the threshold
      .withColumn("jac", round(col("inter").cast("double") /
        (col("x.n") + col("y.n") - col("inter")), 4))
      .filter(col("jac") >= threshold)
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
  }

  test("prefix-filter ngram Jaccard finds EXACTLY the ground-truth pairs") {
    val truth = groundTruth(DedupOps.ngramJacThreshold).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupOps.dedupNgramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "ground truth empty — test data changed?")
    assert(got == truth,
      s"missed ${truth -- got}; spurious ${got -- truth}")
  }

  test("one-sided containment finds EXACTLY the all-ordered-pairs truth") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .withColumn("ng", array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), i -> " +
          "concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), " +
          "element_at(tk, i + 2)))")))
      .select(col("doc_id"), col("ng"), size(col("ng")).as("n"))
    val truth = docs.as("x").crossJoin(docs.as("y"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("x.ng"), col("y.ng"))))
      .withColumn("cont",
        round(col("inter").cast("double") / col("x.n"), 4))
      .filter(col("cont") >= DedupOps.containThreshold)
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupOps.dedupContainment(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      s"missed ${truth -- got}; spurious ${got -- truth}")
    // containment must be a superset of the symmetric jaccard pairs
    val jac = DedupOps.dedupNgramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.forall { case (a, b) => got((a, b)) || got((b, a)) },
      "a Jaccard>=0.8 pair is missing from containment")
  }

  test("simhash hamming-ball probe finds exactly the all-pairs matches") {
    val got = DedupOps.dedupSimhashPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sig = DedupOps.simhashSig(spark, sf0001)
    val truth = sig.as("x").crossJoin(sig.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(expr("bit_count(x.simhash ^ y.simhash) <= 1"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      s"missed ${truth -- got}; spurious ${got -- truth}")
  }

  test("min-label propagation converges on a long path (pointer jumping)") {
    import spark.implicits._
    // a 130-node chain: diameter 129 ≫ the 64-round cap, so this only
    // converges because each round also shortcuts label-of-label —
    // the shape one-hop propagation alone would abort on (the near-dup
    // analogue: sliding boilerplate drift, adjacent docs similar,
    // distant ones not)
    val pairs = (0L until 129L).map(i => (i, i + 1)).toDF("da", "db")
    val labels = DedupOps.propagateMinLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 130)
    assert(labels.values.forall(_ == 0L),
      s"chain not fully collapsed: ${labels.filter(_._2 != 0L)}")
    // and a forest of two components keeps them separate
    val two = (0L until 10L).map(i => (i, i + 1)) ++
      (100L until 110L).map(i => (i, i + 1))
    val lbl2 = DedupOps.propagateMinLabels(two.toDF("da", "db")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 10L).forall(lbl2(_) == 0L))
    assert((100L to 110L).forall(lbl2(_) == 100L))
  }

  test("cc clustering equals union-find transitive closure of the pairs") {
    val pairs = DedupOps.dedupMinhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    // independent union-find (not the GraphX path, not the oracle CTE)
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    (pairs ++ pairs.map(_.swap)).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = docs.map(d => d -> find(d)).toMap
    val got = DedupOps.dedupClusterCc(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == docs.length)
    assert(got == truth,
      s"diverging docs: ${got.filter { case (k, v) => truth(k) != v }.take(5)}")
    // keeper flag: exactly one keeper per cluster, and it IS the min id
    val keepers = DedupOps.dedupClusterCc(spark, sf0001).collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(keepers == truth.values.toSet)
  }

  test("keep-best picks the max-quality member of every union-find cluster") {
    // clusters re-derived with the same independent union-find as the
    // cc test; quality comes from the (separately oracle-checked)
    // textQuality table — what's under test is the SELECTION
    val pairs = DedupOps.dedupMinhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    (pairs ++ pairs.map(_.swap)).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val quality = graft.text.TextOps.textQuality(spark, sf0001)
      .select("doc_id", "quality_e4").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.groupBy(find).map { case (root, members) =>
      val keeper = members.minBy(d => (-quality(d), d))
      root -> ((keeper, members.length.toLong, quality(keeper)))
    }
    val got = DedupOps.dedupKeepBest(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"${got.size} keepers vs ${expected.size} clusters expected")
    // the fixture must contain a cluster where best-quality != min-id,
    // otherwise this operator is indistinguishable from cluster_cc
    val differs = expected.exists { case (root, (keeper, n, _)) =>
      n > 1 && keeper != root
    }
    assert(differs, "no cluster where the keeper differs from min-id")
  }

  test("minhash-LSH pairs are sound and recall ground truth well") {
    val got = DedupOps.dedupMinhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness is guaranteed by exact verification; recall of the
    // banded signature scheme at its 0.7 threshold is probabilistic —
    // assert it finds most of the >= 0.8 (easier) ground-truth pairs
    val strong = groundTruth(0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & strong).size.toDouble / strong.size
    assert(recall >= 0.8, s"LSH recall $recall of ${strong.size} pairs")
  }

  test("recall audit: truth side exact, LSH side a subset, recall pinned") {
    val row = DedupOps.dedupRecallAudit(spark, sf0001).collect()(0)
    val (nExact, nLsh, nHit, nExtra, recallE6) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    // the truth side must equal an independent all-pairs computation
    // with the EXACT integer acceptance at the LSH threshold (the
    // rounded-jac groundTruth helper would blur the 0.69995 boundary)
    val docs = Tables.documents(spark, sf0001)
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .withColumn("ng", array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), i -> " +
          "concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), " +
          "element_at(tk, i + 2)))")))
      .select(col("doc_id"), col("ng"), size(col("ng")).as("n"))
    val truth = docs.as("x").crossJoin(docs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("x.ng"), col("y.ng"))))
      .filter(expr(s"inter * ${DedupOps.lshNum + DedupOps.lshDen}" +
        s" >= (x.n + y.n) * ${DedupOps.lshNum}"))
      .count()
    assert(nExact == truth,
      s"audit truth side $nExact != brute-force $truth")
    // every LSH pair passed the same exact verify → subset (no hash
    // collision on the fixture), and recall is the band-miss rate
    assert(nExtra == 0 && nHit == nLsh)
    assert(nLsh <= nExact)
    assert(recallE6 == (nHit * 1000000L + nExact / 2) / nExact)
    assert(recallE6 > 500000, s"band recall surprisingly low: $recallE6")
  }

  test("bloom incremental dedup equals the exact anti-join (no false drops)") {
    // independent ground truth on the FULL 128-bit md5 of the canonical
    // fingerprint (the operator uses a 60-bit prefix + bloom screen)
    val fp = "md5(array_join(array_sort(array_distinct(" +
      "split(lower(text), ' '))), ' '))"
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), expr(fp).as("k"))
    val truth = docs.filter(col("doc_id") % 4 === 0)
      .join(docs.filter(col("doc_id") % 4 =!= 0).select("k"),
        Seq("k"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotIds = DedupOps.dedupBloomIncremental(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(gotIds == truth,
      s"missed ${truth -- gotIds}; spurious ${gotIds -- truth}")
    // the fixture must exercise the screen: some batch docs ARE dups
    // of corpus docs (dropped), and some are new (kept)
    val batch = docs.filter(col("doc_id") % 4 === 0).count()
    assert(gotIds.nonEmpty && gotIds.size < batch,
      s"${gotIds.size} of $batch new — screen untested by fixture")
  }

  test("bloom probe is the native might_contain expression, not a udf") {
    val exec = DedupOps.dedupBloomIncremental(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(exec.contains("might_contain"), "native bloom probe missing")
    assert(!exec.contains("UDF"), "ScalaUDF found in bloom-screen plan")
  }
}

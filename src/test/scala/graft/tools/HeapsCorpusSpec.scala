package graft.tools

import graft.SparkSuite

/** The Heaps-law probe corpus (r15 verdict #3): the ×N variant for the
  * four bucket-quadratic audit ops must actually GROW the key space —
  * token vocabulary ∝ √N, embedding label space ∝ N — while preserving
  * per-copy volume, so Σ(bucket occupancy²) candidate stages see
  * realistic occupancy instead of the fixed-vocab ×N² worst case.
  */
class HeapsCorpusSpec extends SparkSuite {

  test("heaps corpus grows token vocab ~ sqrt(N) and labels ~ N") {
    val copies = 9 // vocabFactor = 3
    val dir = java.nio.file.Files
      .createTempDirectory("graft_heaps").toString
    ProbeCorpus.generate(spark, sf0001, dir, copies, heaps = true)

    def vocab(path: String): Long = spark.read.parquet(path)
      .selectExpr("explode(split(text, ' ')) as t")
      .selectExpr("count(distinct t)").head().getLong(0)
    val v1 = vocab(s"$sf0001/documents.parquet")
    val vN = vocab(s"$dir/documents.parquet")
    // copy 0 is verbatim (factor 1); copies 1..8 salt into ≤3 variants
    // per token: expected total ≈ v1 · (1 + 3) bounded by v1 · (1 + √N)
    assert(vN > 2 * v1, s"vocab barely grew: $v1 -> $vN")
    assert(vN <= v1 * (1 + ProbeCorpus.heapsVocabFactor(copies)),
      s"vocab grew past the √N rule: $v1 -> $vN")

    // row volume is exactly ×N and per-copy token counts are preserved
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(docs.count() == copies * base.count())
    val tokBase = base.selectExpr("sum(size(split(text, ' ')))")
      .head().getLong(0)
    val tokN = docs.selectExpr("sum(size(split(text, ' ')))")
      .head().getLong(0)
    assert(tokN == copies * tokBase)
    // metadata consistency: the variant suffix lengthens tokens, so
    // n_chars must be recomputed, never copied (review finding, r16)
    assert(docs.filter("n_chars <> length(text)").count() == 0,
      "n_chars out of sync with salted text")

    // labels: the blocking key of the pair-tiling ops grows ×N, so
    // per-label occupancy stays at the fixture's own level
    val labBase = base.sparkSession.read
      .parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("count(distinct label)").head().getLong(0)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(emb.selectExpr("count(distinct label)").head().getLong(0)
      == copies * labBase)
    val occ = emb.groupBy("label").count()
      .selectExpr("max(count)").head().getLong(0)
    val occBase = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .groupBy("label").count()
      .selectExpr("max(count)").head().getLong(0)
    assert(occ == occBase,
      s"per-label occupancy changed: $occBase -> $occ")

    // and the default corpus is untouched by the new path: fixed labels
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_flat").toString
    ProbeCorpus.generate(spark, sf0001, dir2, 3)
    assert(spark.read.parquet(s"$dir2/embeddings.parquet")
      .selectExpr("count(distinct label)").head().getLong(0) == labBase)
  }
}

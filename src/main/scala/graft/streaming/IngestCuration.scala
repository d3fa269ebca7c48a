package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.Tables

/** Streaming corpus ADMISSION control — the stream-side twin of the
  * batch curation front half ([[graft.pipeline.PipelineOps.e2eCuration]]
  * quality + fp-dedup stages, plus [[graft.dedup.DedupOps.dedupBloomIncremental]]'s
  * cross-corpus screen). New documents arrive continuously; each
  * micro-batch is
  *
  *  1. quality-gated (stateless codegen projection —
  *     [[graft.text.TextOps.withQualityReason]], identical thresholds
  *     to the batch pipeline),
  *  2. deduped against the stream's own recent history by canonical
  *     fingerprint via `dropDuplicatesWithinWatermark` (first
  *     occurrence wins; state bounded by the watermark delay, so a
  *     perpetual ingest feed cannot grow state forever), and
  *  3. anti-joined against the STATIC existing-corpus fingerprint set
  *     (broadcast; stream–static anti-joins are stateless, so this
  *     adds no state at all).
  *
  * Scale: stages 1 and 3 are per-row projections/broadcast probes —
  * they scale with executor count. Stage 2's state is
  * |distinct fps inside the watermark window|, partitioned by fp
  * across executors. At 100 TB of standing corpus the broadcast in
  * stage 3 becomes the bloom sketch of dedupBloomIncremental (exact
  * verify moving to a foreachBatch join against the bucketed
  * fingerprint table); the streaming topology is unchanged.
  */
object IngestCuration {

  val docSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, ts BIGINT, text STRING, lang STRING, source STRING")

  /** Parse an ingest feed of JSON documents into typed columns with an
    * arrival event time. */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), docSchema).as("j"))
      .select(col("j.doc_id").as("doc_id"),
        timestamp_millis(col("j.ts")).as("arrival_ts"),
        col("j.text").as("text"), col("j.lang").as("lang"),
        col("j.source").as("source"))

  /** Canonical sorted-distinct-token fingerprint — same definition as
    * dedup_fingerprint / dedup_bloom_incremental. */
  private val fpExpr =
    "md5(array_join(array_sort(array_distinct(split(lower(text), ' '))), ' '))"

  /** Distinct fingerprints of the standing corpus (the `doc_id % 4 != 0`
    * slice, mirroring dedup_bloom_incremental's split). */
  def corpusFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 =!= 0)
      .select(expr(fpExpr).as("fp"))
      .distinct()

  /** The admission stream: quality gate → watermarked fp-dedup →
    * static-corpus screen. Emits (doc_id, lang, source, fp) of admitted
    * documents, append mode. */
  def admit(docs: DataFrame, corpusFp: DataFrame,
      delay: String = "10 minutes"): DataFrame =
    graft.text.TextOps.withQualityReason(docs)
      .filter(col("reason") === "keep")
      .withColumn("fp", expr(fpExpr))
      .withWatermark("arrival_ts", delay)
      .dropDuplicatesWithinWatermark("fp")
      .join(broadcast(corpusFp), Seq("fp"), "left_anti")
      .select("doc_id", "lang", "source", "fp")
}

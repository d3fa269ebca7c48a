package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Streaming twin of the batch DSIR scorer
  * ([[graft.text.TextOps.textDsirWeight]]): incoming documents are
  * importance-scored against a FROZEN feature table built batch-side
  * ([[graft.text.TextOps.dsirLogRatios]] — ≤ 1024 longs, the "model"
  * a data-selection service ships to its ingest edge).
  *
  * Unlike the batch query (explode → broadcast join → per-doc agg),
  * the stream version folds the whole score inside ONE projection:
  * the bigram buckets are generated per row with a HOF `transform`,
  * and `aggregate` folds their log-ratios through the map LITERAL.
  * That makes scoring completely STATELESS — no watermark, no state
  * store, valid in append mode under any trigger, and it scales as a
  * pure map over executors. A bucket the frozen table has never seen
  * (possible only for out-of-corpus n-grams arriving later) scores 0
  * — the neutral prior, documented here as part of the contract.
  *
  * DsirStreamSpec replays the corpus through a MemoryStream and pins
  * the stream output row-for-row to the batch query — the two
  * formulations (join+agg vs in-row fold) must agree exactly because
  * every step is integer arithmetic.
  */
object DsirStream {

  /** Score a (doc_id, text, …) stream. Works identically on a batch
    * DataFrame — the projection has no streaming-only construct. */
  def score(docs: DataFrame, lr: Map[Long, Long],
      buckets: Int = TextOps.DsirBuckets): DataFrame = {
    val lrLit = typedLit(lr)
    docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .withColumn("bks", expr(
        s"""transform(sequence(0, size(tk) - 2),
           |  i -> cast(conv(substr(md5(concat(tk[i], ' ', tk[i + 1])),
           |    1, 15), 16, 10) as bigint) % $buckets""".stripMargin + ")"))
      .select(col("doc_id"),
        size(col("bks")).cast("long").as("n_bigrams"),
        aggregate(col("bks"), lit(0L),
          (acc, b) => acc + coalesce(element_at(lrLit, b), lit(0L)))
          .as("dsir_sum_e6"))
      .withColumn("selected", col("dsir_sum_e6") > 0L)
  }
}

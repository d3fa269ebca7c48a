package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state (SURVEY §2.10
  * extension — the reference never joins two live streams; its only
  * stream-side enrichment is stream x static). The canonical shape is
  * click attribution: match each click to the impression that
  * preceded it within an attribution window.
  *
  * Scale semantics: both sides are range-bounded by watermarks, so
  * the join state store holds only rows inside
  * (watermark - window, now) per key — state is O(rate x window),
  * independent of stream lifetime. Without BOTH watermarks and the
  * time-range join condition, Spark would have to buffer a stream
  * forever; the analyzer rejects outer variants for exactly that
  * reason, which is the correct 100 TB default.
  */
object StreamJoins {

  /** impressions: (imp_id long, imp_ts timestamp); clicks:
    * (click_id long, imp_id long, click_ts timestamp). Inner join —
    * a click attributes to its impression if it lands within
    * `windowMinutes` after it.
    */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 60, watermarkDelay: String = "10 minutes")
      : DataFrame = {
    val imp = impressions.withWatermark("imp_ts", watermarkDelay)
    val clk = clicks
      .withColumnRenamed("imp_id", "click_imp_id")
      .withWatermark("click_ts", watermarkDelay)
    imp.join(clk,
      expr(s"""imp_id = click_imp_id AND
              |click_ts >= imp_ts AND
              |click_ts <= imp_ts + interval $windowMinutes minutes""".stripMargin))
      .select(col("imp_id"), col("click_id"), col("imp_ts"),
        col("click_ts"),
        (unix_micros(col("click_ts")) - unix_micros(col("imp_ts")))
          .as("latency_us"))
  }

  /** Stream x static enrichment join — the one join shape the
    * reference's architecture implies (its streaming pipeline enriches
    * events against fixed vocabularies; SURVEY §2.10) but never writes
    * as a join. The static side is broadcast-hinted: each micro-batch
    * hash-joins against the dim copy already resident on executors, so
    * the stream side never shuffles and no join state accumulates —
    * stream-static joins are stateless by construction (the static
    * side is re-resolvable per batch, which is also the refresh hook:
    * swap the underlying table and the next batch sees it).
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Left-outer variant: impressions with no click inside the window
    * emit a null-click row once the watermark passes the window end —
    * the streaming form of "unconverted impressions". Same bounded
    * state; the null emission is what the watermark makes safe.
    */
  def clickAttributionOuter(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 60, watermarkDelay: String = "10 minutes")
      : DataFrame = {
    val imp = impressions.withWatermark("imp_ts", watermarkDelay)
    val clk = clicks
      .withColumnRenamed("imp_id", "click_imp_id")
      .withWatermark("click_ts", watermarkDelay)
    imp.join(clk,
      expr(s"""imp_id = click_imp_id AND
              |click_ts >= imp_ts AND
              |click_ts <= imp_ts + interval $windowMinutes minutes""".stripMargin),
      "leftOuter")
      .select(col("imp_id"), col("click_id"), col("imp_ts"), col("click_ts"))
  }
}

package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** The demo `{ts, value}` stream (`app/spark_stream.py`,
  * `app/spark_stream_web.py`): last-200-points live chart state.
  */
object DemoStream {

  /** `{ts: epoch-ms long, value: double}` — `app/spark_stream.py:15-18`. */
  val demoSchema: StructType = StructType(Seq(
    StructField("ts", LongType),
    StructField("value", DoubleType)))

  def parse(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), demoSchema).as("json"))
      .select("json.*")

  /** Complete-mode streaming top-K (O4): the reference runs
    * `orderBy(desc ts).limit(200)` directly in complete mode
    * (`app/spark_stream.py:31-36`); Spark 4 requires an aggregation for
    * complete output, so the points are first deduplicated per ts
    * (`groupBy(ts).agg(max value)` — matching the chart feed's
    * (ts,value) dedup intent) and then sorted+limited. The memory-sink
    * table holds the latest `n` points after every trigger, as before.
    */
  def startLast200(parsed: DataFrame, queryName: String, n: Int = 200)
      : StreamingQuery =
    parsed.groupBy(col("ts")).agg(max("value").as("value"))
      .orderBy(desc("ts")).limit(n)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
}

/** Driver-side last-N state with dedup — the S11 operator
  * (`app/spark_stream_web.py:37-52`): per batch, sort by ts, merge with
  * existing state, drop duplicate (ts, value) pairs keeping the first
  * occurrence, keep the last N by ts, persist as JSON.
  *
  * Mirrors the pandas semantics: `drop_duplicates(keep='first')` ≡
  * Vector#distinct; `sort_values` (stable) ≡ sortBy (stable).
  */
final class LastNPoints(n: Int = 200, outPath: Option[Path] = None) {

  private var state = Vector.empty[(Long, Double)]

  def snapshot: Vector[(Long, Double)] = synchronized(state)

  /** Merge one micro-batch; returns the new state. */
  def update(batch: Seq[(Long, Double)]): Vector[(Long, Double)] =
    synchronized {
      val merged = (state ++ batch.sortBy(_._1)).distinct
      state = merged.sortBy(_._1).takeRight(n)
      if (outPath.isDefined) writeJson(state)
      state
    }

  /** foreachBatch adapter: collect the (small, bounded) batch to the
    * driver and merge. The batch is at most one trigger's worth of a
    * 200-point chart feed — collecting it is the operator's contract,
    * not an accident (C10: serving state must not launch jobs).
    */
  def foreachBatchFn: (DataFrame, Long) => Unit = { (df, _) =>
    val pts = df.select(col("ts").cast("long"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    update(pts.toSeq)
  }

  private def writeJson(pts: Vector[(Long, Double)]): Unit = {
    val body = pts
      .map { case (t, v) => s"""{"ts": $t, "value": $v}""" }
      .mkString("""{"points": [""", ", ", "]}")
    Files.writeString(outPath.get, body)
  }
}

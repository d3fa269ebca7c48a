package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.text.TextOps.textDriftPsi]] — the live
  * drift alarm over an ingest stream: as documents arrive, the running
  * (token-count bin, population) counters update and the 6-bin PSI
  * table re-emits, so a dashboard watches the candidate corpus drift
  * away from the `src0` baseline in real time. The latest emit_seq
  * snapshot always equals the batch operator over the documents seen
  * so far (asserted in DriftMonitorSpec), same contract as the monitor
  * family.
  *
  * State architecture: the bin counts are a FULL pre-aggregation of
  * the stream — each micro-batch reduces to ≤ 12 (bin, pop) delta rows
  * via a distributed hash agg with map-side combine, and the driver
  * folds those 12 longs into its running table. Nothing row-sized ever
  * reaches the driver, there is no streaming-state store to size, and
  * restart rebuilds from a replay (or a table the foreachBatch MERGEs
  * into, keyed by batchId — the standard idempotent-sink pattern).
  * The PSI arithmetic is the exact integer recipe of the batch
  * operator, re-run driver-side over 6 bins per emission.
  */
object DriftMonitor {

  final case class DriftCell(bin: Int, base_n: Long, cand_n: Long,
      psi_e6: Long, emit_seq: Long)

  private def binOf(n: Int): Int =
    if (n < 50) 0 else if (n < 100) 1 else if (n < 150) 2
    else if (n < 200) 3 else if (n < 300) 4 else 5

  /** The batch operator's integer PSI over a 6-bin count table —
    * shared by every emission (and by the spec's recompute).
    */
  def psiTable(baseC: IndexedSeq[Long], candC: IndexedSeq[Long])
      : Seq[(Int, Long, Long, Long)] = {
    val (tb, tc) = (baseC.sum, candC.sum)
    def lnE6(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    (0 until 6).map { b =>
      val pb = math.max(((baseC(b) + 1) * 1000000L) / (tb + 6), 1L)
      val qc = math.max(((candC(b) + 1) * 1000000L) / (tc + 6), 1L)
      (b, baseC(b), candC(b), (pb - qc) * (lnE6(pb) - lnE6(qc)) / 1000000L)
    }
  }

  /** `docs` must stream (source string, text string) rows. `sink`
    * receives each emission's 6-row PSI table (the foreachBatch
    * hand-off).
    */
  def driftStream(docs: DataFrame)(
      sink: Dataset[DriftCell] => Unit): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val baseC = Array.fill(6)(0L)
    val candC = Array.fill(6)(0L)
    var lastBatch = Long.MinValue
    docs
      .select(col("source").cast("string").as("source"),
        col("text").cast("string").as("text"))
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (batchId <= lastBatch) { // fresh query reusing this closure
          java.util.Arrays.fill(baseC, 0L)
          java.util.Arrays.fill(candC, 0L)
        }
        lastBatch = batchId
        // distributed pre-aggregation: the batch collapses to <= 12
        // (bin, pop) counter deltas before anything reaches the driver
        val deltas = batch
          .select(
            expr("""case when size(split(text, ' ')) < 50 then 0
                   |     when size(split(text, ' ')) < 100 then 1
                   |     when size(split(text, ' ')) < 150 then 2
                   |     when size(split(text, ' ')) < 200 then 3
                   |     when size(split(text, ' ')) < 300 then 4
                   |     else 5 end""".stripMargin).as("bin"),
            when(col("source") === "src0", lit(0)).otherwise(lit(1))
              .as("pop"))
          .groupBy("bin", "pop").agg(count(lit(1)).as("c"))
          .collect()
        if (deltas.nonEmpty) {
          deltas.foreach { r =>
            val (b, p, c) = (r.getInt(0), r.getInt(1), r.getLong(2))
            if (p == 0) baseC(b) += c else candC(b) += c
          }
          val seq = batchId + 1
          val out = psiTable(baseC.toIndexedSeq, candC.toIndexedSeq)
            .map { case (b, bn, cn, psi) => DriftCell(b, bn, cn, psi, seq) }
          sink(spark.createDataset(out))
        }
      }
  }
}

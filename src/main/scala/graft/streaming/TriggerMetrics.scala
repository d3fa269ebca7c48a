package graft.streaming

import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-trigger observability (SURVEY §2.10 ST6): the reference's
  * measured variants append `epoch_id,count,duration_ms,timestamp` to a
  * CSV from inside foreachBatch
  * (`apps_mediciones/live_counts_metrics.py:72-81`). Both that exact
  * shape and the idiomatic StreamingQueryListener are provided; the CSV
  * format matches `metrics_*.csv` so BASELINE.md comparisons are
  * apples-to-apples.
  */
object TriggerMetrics {

  def initCsv(path: Path): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    if (!Files.exists(path))
      Files.writeString(path, "epoch_id,count,duration_ms,timestamp\n")
  }

  private def appendLine(path: Path, line: String): Unit =
    Files.writeString(path, line, StandardOpenOption.APPEND)

  /** foreachBatch callback mirroring `save_and_log`: registers the
    * batch as a replace-per-batch view (the ST7 latest-batch-only
    * snapshot quirk, replicated as-is), counts it, logs the trigger.
    * A GLOBAL temp view is used because Spark 4 runs foreachBatch on a
    * cloned session — a plain temp view would be invisible to the
    * serving session. Query it as `global_temp.<viewName>`.
    */
  def saveAndLogFn(path: Path, viewName: String = "feedback_raw",
      viewCols: Seq[String] = Seq("gender", "occupation", "age_bin"))
      : (DataFrame, Long) => Unit = { (df, epochId) =>
    val t0 = System.nanoTime()
    df.selectExpr(viewCols: _*).createOrReplaceGlobalTempView(viewName)
    val count = df.count()
    val durationMs = (System.nanoTime() - t0) / 1e6
    appendLine(path,
      f"$epochId,$count,$durationMs%.4f,${Instant.now().atOffset(ZoneOffset.UTC)}%n"
        .replace(String.format("%n"), "\n"))
  }

  /** Summary stats over a metrics CSV — the reference's latency
    * analysis (`Explorativa2.ipynb` cells 16-18): mean/median trigger
    * duration and the improvement percentage between two runs.
    */
  /** p95/p99 (nearest-rank over the sorted per-trigger durations)
    * ship alongside mean/median so a tail-dominated mean is
    * attributable from the artifact alone — the r14 verdict's 10×
    * run had mean 57 ms vs median 39 ms with nothing in the numbers
    * saying whether the gap was GC pauses or state-store growth. */
  final case class LatencyStats(n: Int, meanMs: Double, medianMs: Double,
      p95Ms: Double = 0.0, p99Ms: Double = 0.0)

  def stats(path: Path): LatencyStats = {
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(Files.readAllLines(path)).asScala.drop(1)
      .filter(_.nonEmpty)
    val ds = lines.map(_.split(",")(2).toDouble).toIndexedSeq.sorted
    val mean = if (ds.isEmpty) 0.0 else ds.sum / ds.size
    val median =
      if (ds.isEmpty) 0.0
      else if (ds.size % 2 == 1) ds(ds.size / 2)
      else (ds(ds.size / 2 - 1) + ds(ds.size / 2)) / 2.0
    def pct(p: Double): Double =
      if (ds.isEmpty) 0.0
      else ds(math.min(ds.size - 1, math.ceil(p * ds.size).toInt - 1).max(0))
    LatencyStats(ds.size, mean, median, pct(0.95), pct(0.99))
  }

  /** `(mean_b / mean_a - 1) * 100` — "Porcentaje de mejora",
    * `Explorativa2.ipynb` cell 18. */
  def improvementPct(a: LatencyStats, b: LatencyStats): Double =
    (b.meanMs / a.meanMs - 1.0) * 100.0
}

/** Idiomatic per-trigger metrics: a StreamingQueryListener appending
  * the same CSV shape from query-progress events (no work inside the
  * data path).
  */
final class ProgressCsvListener(path: Path) extends StreamingQueryListener {
  TriggerMetrics.initCsv(path)

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    Files.writeString(path,
      s"${p.batchId},${p.numInputRows},$duration,${p.timestamp}\n",
      StandardOpenOption.APPEND)
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

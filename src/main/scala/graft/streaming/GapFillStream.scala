package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch gap-fill operator
  * ([[EventWindows.gapFill]]): per event type, emit one FINAL row per
  * hour as the watermark closes it — observed hours with their count
  * and (rounded) sum, gap hours with a zero count and the
  * last-observation-carried-forward sum. The live form of time-series
  * regularization: a dashboard tailing this sink sees a dense hourly
  * grid that never revises.
  *
  * State per event type is O(open hours), not O(events): a map from
  * open hour → (count, running sum), the last closed hour, and the
  * LOCF sum. Hours close exactly when the event-time watermark passes
  * their end — until then late data still folds in, so the emitted
  * cell equals the batch aggregate for in-watermark data. An
  * event-time timeout re-arms at every update so gap cells flow even
  * for types receiving no events at all (that is the point of LOCF).
  *
  * Divergences from the batch twin, both inherent to unbounded input:
  * each type's spine starts at its own first observed hour (a stream
  * cannot know the global min hour), and trailing gap cells continue
  * past the last observation only up to `trailingHours` (default 48)
  * so an idle key cannot emit unbounded filler if the watermark jumps
  * far ahead. GapFillStreamSpec pins cell-level equality with the
  * batch operator on the overlapping spine.
  */
object GapFillStream {

  private val HourUs = 3600000000L

  final case class FillState(pending: Map[Long, (Long, Double)],
      lastHour: Long, lastSum: Double, maxSeen: Long, nLate: Long)
  final case class FillOut(event_type: String, h: Long, n_events: Long,
      is_gap: Int, filled_sum: Double)

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** events: streaming DataFrame with (event_type string, ts_us long,
    * value double). */
  def gapFillStream(events: DataFrame, watermarkDelay: String = "0 seconds",
      trailingHours: Long = 48L): Dataset[FillOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string"), col("ts_us").cast("long"),
        col("value").cast("double"))
      .withColumn("ts_wm", timestamp_micros(col("ts_us")))
      .withWatermark("ts_wm", watermarkDelay)
      .as[(String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FillState, FillOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (tpe, rows, state: GroupState[FillState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var s = state.getOption.getOrElse(
            FillState(Map.empty, Long.MinValue, 0.0, Long.MinValue, 0L))
          if (!state.hasTimedOut) rows.foreach { r =>
            val h = r._2 / HourUs
            if (s.lastHour != Long.MinValue && h <= s.lastHour)
              s = s.copy(nLate = s.nLate + 1) // hour already emitted: final
            else {
              val (n, sum) = s.pending.getOrElse(h, (0L, 0.0))
              s = s.copy(pending = s.pending.updated(h, (n + 1L, sum + r._3)),
                maxSeen = math.max(s.maxSeen, h))
            }
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[FillOut]
          // hour h covers [h·H, (h+1)·H): closed once wm >= (h+1)·H
          val bound0 = wmUs / HourUs - 1L
          val bound =
            if (s.maxSeen == Long.MinValue) Long.MinValue
            else math.min(bound0, s.maxSeen + trailingHours)
          val start =
            if (s.lastHour != Long.MinValue) s.lastHour + 1L
            else if (s.pending.nonEmpty) s.pending.keys.min
            else Long.MinValue
          if (start != Long.MinValue && bound >= start) {
            var h = start
            var (lastSum, pending) = (s.lastSum, s.pending)
            while (h <= bound) {
              pending.get(h) match {
                case Some((n, sum)) =>
                  lastSum = round2(sum)
                  out += FillOut(tpe, h, n, 0, lastSum)
                  pending = pending.removed(h)
                case None =>
                  out += FillOut(tpe, h, 0L, 1, lastSum)
              }
              h += 1L
            }
            s = s.copy(pending = pending, lastHour = bound, lastSum = lastSum)
          }
          state.update(s)
          // re-arm at the next hour close so gap cells flow on pure
          // watermark advance (must sit strictly past the watermark)
          val nextCloseMs =
            (math.max(s.lastHour + 1L, wmUs / HourUs) + 1L) * 3600000L
          state.setTimeoutTimestamp(
            math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1L))
          out.iterator
      }
  }
}

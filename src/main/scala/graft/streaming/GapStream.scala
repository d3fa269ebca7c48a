package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch inter-event-gap operator
  * ([[EventWindows.gapStats]]'s window stage): per-user consecutive
  * gaps emitted live as events arrive — the inter-arrival monitor a
  * latency/liveness dashboard tails (a user's gap suddenly exploding
  * is the per-entity outage signal the global hourly monitors
  * average away).
  *
  * State per user is O(1): the last (ts, event_id) pair plus the
  * in-order-contract counters — the same bounded-state story as
  * [[FunnelRetentionStream]], including its event-time TTL option for
  * the unbounded-user-space deployment. Emission is append-mode: each
  * event past the first yields exactly one (event_type, gap_us) row
  * keyed by the LATER event (the batch operator's convention), so
  * count/min/max/sum per type over the emitted rows reproduce the
  * batch aggregate exactly under in-order replay (GapStreamSpec).
  *
  * In-order contract, made observable like the funnel's: within a
  * batch rows are sorted by (ts, event_id) before folding, so
  * single-batch disorder is absorbed; an event whose (ts, event_id)
  * precedes the state's last pair arrived in the wrong BATCH — the
  * batch recompute would have inserted its gap between existing ones.
  * Such events emit a row with `late = true` and gap measured from
  * the current last event (the dashboard still sees the arrival),
  * but do NOT advance state, so subsequent in-order gaps stay
  * batch-consistent.
  */
object GapStream {

  final case class GapState(lastUs: Long, lastId: Long, nLate: Long)
  final case class GapOut(user_id: Long, event_type: String, gap_us: Long,
      late: Boolean)

  /** events: streaming DataFrame with (user_id long, event_id long,
    * ts_us long, event_type string). */
  def gapStream(events: DataFrame,
      stateTtl: Option[java.time.Duration] = None,
      watermarkDelay: String = "0 seconds"): Dataset[GapOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(col("user_id").cast("long"),
      col("event_id").cast("long"), col("ts_us").cast("long"),
      col("event_type").cast("string"))
    val timeout = stateTtl match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    val withTs = base.withColumn("ts_wm", timestamp_micros(col("ts_us")))
    val marked = stateTtl match {
      case Some(_) => withTs.withWatermark("ts_wm", watermarkDelay)
      case None => withTs
    }
    marked
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GapState, GapOut](
        OutputMode.Append, timeout) {
        case (uid, rows, state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle user past ttl; re-arrival restarts fresh
            Iterator.empty
          } else {
            val evs = rows.map(r => (r._3, r._2, r._4)).toIndexedSeq
              .sortBy(e => (e._1, e._2))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[GapOut]
            evs.foreach { case (tsUs, id, tpe) =>
              cur match {
                case None =>
                  cur = Some(GapState(tsUs, id, 0L))
                case Some(s) if tsUs > s.lastUs ||
                    (tsUs == s.lastUs && id >= s.lastId) =>
                  out += GapOut(uid, tpe, tsUs - s.lastUs, late = false)
                  cur = Some(GapState(tsUs, id, s.nLate))
                case Some(s) => // cross-batch straggler: flag, don't advance
                  out += GapOut(uid, tpe, tsUs - s.lastUs, late = true)
                  cur = Some(s.copy(nLate = s.nLate + 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              stateTtl.foreach { d =>
                val at = math.max(s.lastUs / 1000L + d.toMillis,
                  state.getCurrentWatermarkMs() + 1L)
                state.setTimeoutTimestamp(at)
              }
            }
            out.iterator
          }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[EventWindows.attribution]]: U-shaped
  * multi-touch credits emitted live, the moment the purchase arrives.
  *
  * State per user is the clicks inside the trailing 24 h attribution
  * window — bounded by per-user activity rate × window, NOT by stream
  * length, because every new click first TRIMS clicks older than 24 h
  * before its own timestamp. Idle users don't retain state either
  * (r10 advice: with NoTimeout, a user who stopped sending kept their
  * last window forever, so total state grew with distinct-user
  * cardinality): the stream carries a 1 h event-time watermark and
  * each update arms an event-time timeout at newest-click + 24 h —
  * once the watermark passes that, no future in-contract purchase can
  * credit anything in the window, and the timed-out invocation clears
  * the user's state.
  *
  * On a purchase the current window contents ARE the path: positions,
  * k, and the exact rational credits (num / den = k + 2) are computed
  * in place and emitted as final append-mode rows — identical
  * arithmetic to the batch operator, pinned by the replay
  * differential in AttributionStreamSpec.
  *
  * Ordering contract mirrors [[StreamAsof]]: rows within a batch are
  * sorted by (ts, side, event_id) with clicks before purchases at
  * equal timestamps excluded (batch uses strict c_us < p_us, so a
  * same-instant click never joins its purchase); across batches,
  * event-time order is the replay contract (rows later than the 1 h
  * watermark delay are dropped, the standard watermark trade).
  */
object AttributionStream {

  private val WinUs = 24L * 3600L * 1000000L
  private val WinMs = 24L * 3600L * 1000L

  final case class ClickWindow(clicks: Vector[(Long, Long)]) // (ts, id)
  final case class AttrOut(purchase_id: Long, click_id: Long,
      user_id: Long, pos: Int, k: Int, credit_num: Int, credit_den: Int)

  /** events: streaming DataFrame with (event_id long, ts_us long,
    * user_id long, event_type string). */
  def attributionStream(events: DataFrame): Dataset[AttrOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long"),
        col("ts_us").cast("long"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"),
        col("event_id").cast("long"),
        timestamp_micros(col("ts_us")).as("ts_evt"))
      .withWatermark("ts_evt", "1 hour")
      .as[(Long, Long, Int, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ClickWindow, AttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[ClickWindow]) =>
          if (state.hasTimedOut) {
            // watermark passed newest-click + 24 h: nothing left in the
            // window can ever be credited — drop the user's state
            state.remove()
            Iterator.empty
          } else {
            // clicks (side 0) fold before purchases (side 1) at equal
            // ts, but a same-instant click must NOT credit that
            // purchase — batch semantics are strict c_us < p_us
            val sorted = rows.toIndexedSeq.sortBy(r => (r._2, r._3, r._4))
            var win = state.getOption.getOrElse(ClickWindow(Vector.empty))
            val out = scala.collection.mutable.ArrayBuffer.empty[AttrOut]
            sorted.foreach { case (_, tsUs, side, eid, _) =>
              if (side == 0) {
                win = ClickWindow(
                  win.clicks.dropWhile(_._1 < tsUs - WinUs) :+ ((tsUs, eid)))
              } else {
                val path = win.clicks
                  .filter(c => c._1 < tsUs && c._1 >= tsUs - WinUs)
                val k = path.length
                path.zipWithIndex.foreach { case ((_, cid), i) =>
                  val num =
                    if (k == 1) k + 2
                    else if (i == 0 || i == k - 1) 2
                    else 1
                  out += AttrOut(eid, cid, uid, i + 1, k, num, k + 2)
                }
              }
            }
            if (win.clicks.isEmpty) state.remove()
            else {
              // CEIL the µs→ms conversion: flooring would expire state
              // up to ~1 ms before the inclusive `c >= p − 24h` window
              // closes, dropping a credit for a purchase landing at
              // event time inside [watermark, trueExpiry] that the
              // batch replay differential would emit (r11 advice)
              val expireMs = (win.clicks.last._1 + 999L) / 1000L + WinMs
              if (expireMs < state.getCurrentWatermarkMs()) {
                // already STRICTLY expired relative to the watermark
                // (e.g. a purchase-only batch long after the last
                // click): clearing now is identical to an immediate
                // timeout. Strict `<` (not `<=`): at equality the
                // window edge may still credit a not-yet-late purchase
                state.remove()
              } else {
                state.update(win)
                // max(·, wm+1): Spark rejects a timeout at/behind the
                // watermark; at equality the state survives this batch
                // and times out on the very next trigger
                state.setTimeoutTimestamp(
                  math.max(expireMs, state.getCurrentWatermarkMs() + 1L))
              }
            }
            out.iterator
          }
      }
  }
}

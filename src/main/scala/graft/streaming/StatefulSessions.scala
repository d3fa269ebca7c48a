package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator (SURVEY §2.10 ST5 extension —
  * the reference keeps no in-engine state): gap-based session windows
  * per user over an event stream, built on
  * `flatMapGroupsWithState` with event-time timeouts.
  *
  * Semantics match the batch [[EventWindows.sessionize]]: a session
  * closes after `gapMinutes` of user inactivity. Sessions that close
  * WITHIN a batch (a later event arrives past the gap) are emitted
  * immediately; the trailing open session is held in state and emitted
  * when the watermark passes its end + gap (event-time timeout). State
  * per key is O(1) — four numbers — so a billion users is a billion
  * tiny state rows, partitioned by user across the cluster.
  */
object StatefulSessions {

  final case class SessionState(startUs: Long, endUs: Long, n: Long,
      sum: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** events: (ts: timestamp, user_id, value) streaming DataFrame. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    val typed = events
      .filter(col("ts").isNotNull) // malformed input -> dropped
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("user_id").cast("long").as("uid"),
        col("value").cast("double").as("v"))
      .as[(java.sql.Timestamp, Long, Double)]

    typed
      .groupByKey(_._2)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.startUs, s.endUs, s.n, s.sum))
          } else {
            val evs = rows.map { case (ts, _, v) =>
              (ts.getTime * 1000L + (ts.getNanos / 1000) % 1000, v)
            }.toIndexedSeq.sortBy(_._1)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            evs.foreach { case (tsUs, v) =>
              cur match {
                case Some(s) if tsUs - s.endUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, tsUs, s.n + 1, s.sum + v))
                case Some(s) =>
                  closed += SessionOut(uid, s.startUs, s.endUs, s.n, s.sum)
                  cur = Some(SessionState(tsUs, tsUs, 1, v))
                case None =>
                  cur = Some(SessionState(tsUs, tsUs, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark passes session end + gap
              state.setTimeoutTimestamp(s.endUs / 1000L + gapMinutes * 60000L)
            }
            closed.iterator
          }
      }
  }
}

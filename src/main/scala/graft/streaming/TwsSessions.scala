package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.streaming.StatefulSessions.SessionOut

/** Gap-based session windows on Spark 4's `transformWithState` — the
  * successor API to the `flatMapGroupsWithState` implementation in
  * [[StatefulSessions]] (same semantics, asserted equal in
  * TwsSessionsSpec).
  *
  * Why carry both: transformWithState is where stateful streaming is
  * headed at scale — typed state variables with per-variable TTL,
  * explicit timers (register/delete, many per key), and the RocksDB
  * state store as backend, which keeps billions of keys off-heap with
  * incremental checkpointing instead of the HDFS-backed full-snapshot
  * store. State per key is one fixed-size row here too.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass` =
  * RocksDBStateStoreProvider (transformWithState does not run on the
  * default provider).
  */
object TwsSessions {

  final case class TwsState(startUs: Long, endUs: Long, n: Long,
      sum: Double, timerMs: Long)

  /** One session per key in state; an event-time timer fires at
    * session end + gap to emit the trailing open session. Extending a
    * session deletes the stale timer and registers the new one, so at
    * most one timer per key is live.
    */
  class SessionProcessor(gapMinutes: Int)
      extends StatefulProcessor[Long, (Timestamp, Long, Double), SessionOut] {
    private val gapUs = gapMinutes * 60L * 1000000L
    private val gapMs = gapMinutes * 60000L
    @transient private var state: ValueState[TwsState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TwsState]("session",
        Encoders.product[TwsState], TTLConfig.NONE)

    override def handleInputRows(uid: Long,
        rows: Iterator[(Timestamp, Long, Double)],
        timers: TimerValues): Iterator[SessionOut] = {
      val evs = rows.map { case (ts, _, v) =>
        (ts.getTime * 1000L + (ts.getNanos / 1000) % 1000, v)
      }.toIndexedSeq.sortBy(_._1)
      val prior = if (state.exists()) Some(state.get()) else None
      val oldTimer = prior.map(_.timerMs).getOrElse(0L)
      var cur = prior
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      evs.foreach { case (tsUs, v) =>
        cur match {
          case Some(s) if tsUs - s.endUs <= gapUs =>
            cur = Some(s.copy(endUs = tsUs, n = s.n + 1, sum = s.sum + v))
          case Some(s) =>
            closed += SessionOut(uid, s.startUs, s.endUs, s.n, s.sum)
            cur = Some(TwsState(tsUs, tsUs, 1, v, 0L))
          case None =>
            cur = Some(TwsState(tsUs, tsUs, 1, v, 0L))
        }
      }
      cur.foreach { s =>
        val newTimer = s.endUs / 1000L + gapMs
        if (oldTimer != 0L && oldTimer != newTimer)
          getHandle.deleteTimer(oldTimer)
        if (oldTimer != newTimer) getHandle.registerTimer(newTimer)
        state.update(s.copy(timerMs = newTimer))
      }
      closed.iterator
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (state.exists() &&
          expired.getExpiryTimeInMs >= state.get().timerMs) {
        val s = state.get()
        state.clear()
        Iterator.single(SessionOut(uid, s.startUs, s.endUs, s.n, s.sum))
      } else Iterator.empty
    }
  }

  /** events: (ts: timestamp, user_id, value) streaming DataFrame. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("user_id").cast("long").as("uid"),
        col("value").cast("double").as("v"))
      .as[(Timestamp, Long, Double)]
      .groupByKey(_._2)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the two batch event analytics that lacked one —
  * [[EventWindows.funnel]] and [[EventWindows.retention]] — so the
  * funnel/retention dashboards can run on the live feedback stream the
  * way the reference's live counters do (SURVEY §2.10; the reference's
  * headline surface is a live dashboard, `app3`).
  *
  * Both are `flatMapGroupsWithState` keyed on user_id, the same shard
  * key as [[StatefulSessions]] — a billion users is a billion small
  * state rows spread across the cluster.
  *
  *  - Funnel state is O(1) per user: the three chained first-step
  *    timestamps plus an emission counter. Every batch that touches a
  *    user re-emits that user's current funnel row (Update mode — the
  *    live-dashboard contract, latest row per user wins).
  *  - Retention state is the user's cohort week plus the set of
  *    week-offsets already credited — bounded by the number of weeks
  *    the user has been active (a few hundred longs even over years;
  *    a fixed bitmap at scale). Each NEW (cohort, offset) credit emits
  *    one append-mode cell delta; the matrix itself is a trivial
  *    count/sum over emitted cells, exactly the shape a dashboard
  *    store ingests.
  *
  * Exactness contract (asserted in FunnelRetentionStreamSpec):
  * incremental state equals the batch recompute when each user's
  * events are processed in event-time order. Within a batch the
  * processors sort by ts, so any single-batch disorder is absorbed;
  * across batches the stream must not regress in event time per user
  * (the watermark bound). A click arriving BEFORE the view it follows
  * can otherwise credit differently than the batch chained-min — the
  * same in-order caveat every incremental funnel carries.
  */
object FunnelRetentionStream {

  // 0 marks "step not reached": real epoch-µs timestamps are always > 0
  final case class FunnelState(tv: Long, tc: Long, tp: Long, nSeen: Long)
  final case class FunnelOut(user_id: Long, t_view_us: Option[Long],
      t_click_us: Option[Long], t_purchase_us: Option[Long], stage: Int,
      n_seen: Long)

  /** events: streaming DataFrame with (user_id long, ts_us long,
    * event_type string). Update-mode per-user funnel rows; `n_seen`
    * is monotone per user, so "row with max n_seen" is the final
    * state in any at-least-once sink.
    */
  def funnelStream(events: DataFrame): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts_us").cast("long"),
        col("event_type").cast("string"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          val evs = rows.map { case (_, tsUs, et) => (tsUs, et) }
            .toIndexedSeq.sortBy(_._1)
          var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L, 0L))
          evs.foreach { case (tsUs, et) =>
            et match {
              // the chained-min rule of EventWindows.funnel, folded
              // incrementally: each step only arms once, and only from
              // an event strictly after the previous step's time
              case "view" if s.tv == 0L =>
                s = s.copy(tv = tsUs)
              case "click" if s.tv != 0L && tsUs > s.tv && s.tc == 0L =>
                s = s.copy(tc = tsUs)
              case "purchase" if s.tc != 0L && tsUs > s.tc && s.tp == 0L =>
                s = s.copy(tp = tsUs)
              case _ => ()
            }
          }
          s = s.copy(nSeen = s.nSeen + evs.size)
          state.update(s)
          def opt(x: Long): Option[Long] = if (x == 0L) None else Some(x)
          val stage =
            if (s.tp != 0L) 3 else if (s.tc != 0L) 2
            else if (s.tv != 0L) 1 else 0
          Iterator.single(
            FunnelOut(uid, opt(s.tv), opt(s.tc), opt(s.tp), stage, s.nSeen))
      }
  }

  final case class RetState(cohortWeek: Long, offsets: Seq[Long])
  final case class RetCell(cohort_week: Long, week_offset: Long,
      user_id: Long)

  /** events: streaming DataFrame with (user_id long, ts_us long).
    * Append-mode (cohort_week, week_offset, user_id) cell credits,
    * each emitted exactly once per user — `n_active` per cell is a
    * count over this stream, `cohort_n` is the cell at offset 0.
    */
  def retentionCells(events: DataFrame,
      weekUs: Long = 7L * 86400L * 1000000L): Dataset[RetCell] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts_us").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetState, RetCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[RetState]) =>
          val weeks = rows.map(_._2 / weekUs).toIndexedSeq.sorted
          var s = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[RetCell]
          weeks.foreach { w =>
            s match {
              case None =>
                // first event ever: this week IS the cohort (in-order
                // contract — see the object docstring)
                s = Some(RetState(w, Seq(0L)))
                out += RetCell(w, 0L, uid)
              case Some(st) =>
                val off = w - st.cohortWeek
                if (!st.offsets.contains(off)) {
                  s = Some(st.copy(offsets = st.offsets :+ off))
                  out += RetCell(st.cohortWeek, off, uid)
                }
            }
          }
          s.foreach(state.update)
          out.iterator
      }
  }
}

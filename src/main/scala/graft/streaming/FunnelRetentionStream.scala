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
  *    timestamps, the max event time seen, and two counters. Every
  *    batch that touches a user re-emits that user's current funnel
  *    row (Update mode — the live-dashboard contract, latest row per
  *    user wins).
  *  - Retention state is the user's cohort week plus a BITMAP of
  *    week-offsets already credited — one bit per week since the
  *    cohort, i.e. 64 weeks per long, ~2 longs per user-year
  *    regardless of activity (an O(activeWeeks) Seq with linear
  *    `contains` per event would contradict the bounded-state story
  *    at dashboard scale). Each NEW (cohort, offset) credit emits one
  *    append-mode cell delta; the matrix itself is a trivial
  *    count/sum over emitted cells, exactly the shape a dashboard
  *    store ingests.
  *
  * State lifetime: both operators take `stateTtl`. `None` keeps state
  * forever (NoTimeout) — the exact-batch-parity mode the differential
  * specs assert, correct for bounded replays. `Some(ttl)` arms an
  * event-time timeout at `lastSeenEventTime + ttl` (monotone
  * last-seen — a late event never pulls the expiry earlier): once the
  * watermark passes it, the user's state is dropped — the production
  * setting, since an unbounded user-id space (the 100 TB narrative)
  * otherwise grows state forever. The tradeoff is explicit: a user
  * who returns after `ttl` of silence restarts from empty state
  * (funnel re-enters at stage 0 with n_seen reset; retention opens a
  * NEW cohort), which is the standard dashboard semantics for expired
  * visitors.
  *
  * TTL mode also changes which rows the fold SEES: a watermark makes
  * Spark drop rows older than it BEFORE flatMapGroupsWithState runs,
  * so events later than `watermarkDelay` never reach the fold (and
  * therefore can't be counted in `n_late`). Size `watermarkDelay` to
  * the disorder you want folded: within the delay, disorder reaches
  * the fold and `n_late` flags it; beyond it, rows are dropped by the
  * engine — standard watermark semantics, but with the default
  * "0 seconds" delay ANY cross-batch event-time skew is data loss, so
  * production TTL deployments should set a real delay. NoTimeout mode
  * has no watermark and folds everything, which is why the n_late
  * spec runs there.
  *
  * Exactness contract (asserted in FunnelRetentionStreamSpec):
  * incremental state equals the batch recompute when each user's
  * events are processed in event-time order. Within a batch the
  * processors sort by ts, so any single-batch disorder is absorbed;
  * across batches the stream must not regress in event time per user
  * (the watermark bound). A click arriving BEFORE the view it follows
  * can otherwise credit differently than the batch chained-min. That
  * contract is no longer a silent assumption: the funnel tracks the
  * max event time per user and counts cross-batch regressions in
  * `n_late` — a nonzero `n_late` on a dashboard row says "this user's
  * funnel stage may disagree with the batch recompute", turning the
  * in-order caveat into an observable signal.
  */
object FunnelRetentionStream {

  // 0 marks "step not reached": real epoch-µs timestamps are always > 0
  final case class FunnelState(tv: Long, tc: Long, tp: Long, nSeen: Long,
      maxTs: Long, nLate: Long)
  final case class FunnelOut(user_id: Long, t_view_us: Option[Long],
      t_click_us: Option[Long], t_purchase_us: Option[Long], stage: Int,
      n_seen: Long, n_late: Long)

  /** events: streaming DataFrame with (user_id long, ts_us long,
    * event_type string). Update-mode per-user funnel rows; `n_seen`
    * is monotone per user, so "row with max n_seen" is the final
    * state in any at-least-once sink. `n_late` counts events that
    * arrived in a LATER batch than one with a greater event time —
    * violations of the in-order contract (see object doc).
    *
    * `stateTtl` (event-time, e.g. `Duration.ofDays(90)`) requires the
    * input to carry event time; a watermark of `watermarkDelay` is
    * applied here on `timestamp_micros(ts_us)`.
    */
  def funnelStream(events: DataFrame,
      stateTtl: Option[java.time.Duration] = None,
      watermarkDelay: String = "0 seconds"): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .select(col("user_id").cast("long"), col("ts_us").cast("long"),
        col("event_type").cast("string"))
    val timeout = stateTtl match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    withWatermarkIf(base, stateTtl.isDefined, watermarkDelay)
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update, timeout) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen + ttl: idle user, drop state.
            // No emission — the sink already holds the user's latest row
            state.remove()
            Iterator.empty
          } else {
            val evs = rows.map { case (_, tsUs, et, _) => (tsUs, et) }
              .toIndexedSeq.sortBy(_._1)
            var s = state.getOption.getOrElse(
              FunnelState(0L, 0L, 0L, 0L, 0L, 0L))
            // events older than anything already folded arrived across a
            // batch boundary out of order — count them (they are still
            // folded below; the count makes the contract breach visible)
            val late = evs.count(_._1 < s.maxTs)
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
            s = s.copy(nSeen = s.nSeen + evs.size,
              maxTs = math.max(s.maxTs, if (evs.isEmpty) 0L else evs.last._1),
              nLate = s.nLate + late)
            state.update(s)
            armTimeout(state, stateTtl, s.maxTs)
            def opt(x: Long): Option[Long] = if (x == 0L) None else Some(x)
            val stage =
              if (s.tp != 0L) 3 else if (s.tc != 0L) 2
              else if (s.tv != 0L) 1 else 0
            Iterator.single(FunnelOut(uid, opt(s.tv), opt(s.tc), opt(s.tp),
              stage, s.nSeen, s.nLate))
          }
      }
  }

  /** Week-offset bitmap: bit `off` of word `off / 64`. Bounded by
    * weeks-since-cohort / 64 words per user (~1 long/year), O(1) test
    * and set — the state shape that survives years of activity.
    * `maxTs` is the MONOTONE last-seen event time: the TTL must be
    * armed off it, not off the current batch's max, or a late (but
    * above-watermark) event would move the expiry EARLIER and break
    * the lastSeen+ttl contract.
    */
  final case class RetState(cohortWeek: Long, bits: Array[Long],
      maxTs: Long)
  private def bitSet(bits: Array[Long], off: Long): Boolean = {
    val w = (off >> 6).toInt
    w < bits.length && (bits(w) & (1L << (off & 63))) != 0L
  }
  private def withBit(bits: Array[Long], off: Long): Array[Long] = {
    val w = (off >> 6).toInt
    val out = if (w < bits.length) bits.clone()
    else java.util.Arrays.copyOf(bits, w + 1)
    out(w) |= 1L << (off & 63)
    out
  }

  final case class RetCell(cohort_week: Long, week_offset: Long,
      user_id: Long)

  /** `week_offset` of a reject-marker cell: an event whose offset from
    * the user's cohort exceeded [[retentionCells]]'s `maxWeekOffset`
    * was NOT credited (filter `week_offset >= 0` before aggregating;
    * count the markers to observe the rejects, like `n_late`). */
  val RejectOffset: Long = -1L

  /** events: streaming DataFrame with (user_id long, ts_us long).
    * Append-mode (cohort_week, week_offset, user_id) cell credits,
    * each emitted exactly once per user — `n_active` per cell is a
    * count over this stream, `cohort_n` is the cell at offset 0.
    *
    * `maxWeekOffset` bounds the state against corrupt far-future
    * timestamps (the classic ms-vs-µs unit error lands ~1000× in the
    * future): an unclamped offset would allocate off/64 longs in the
    * user's bitmap — hundreds of KB persisted per checkpoint from ONE
    * bad event — and pin the TTL into the far future. An event beyond
    * the horizon (default 5200 weeks ≈ a century) is rejected: no bit,
    * no maxTs/TTL advance, one [[RejectOffset]] marker cell emitted so
    * the breach is observable downstream. The bitmap is therefore
    * bounded by `maxWeekOffset / 64 + 1` longs (~82) per user.
    *
    * A corrupt timestamp that is a user's FIRST event opens a bogus
    * far-future cohort instead (nothing to clamp against yet); it is
    * detected retroactively when a sane event arrives more than
    * `maxWeekOffset` weeks BEFORE the cohort: the state re-opens at
    * the sane event's week (re-arming the TTL reachably) and the
    * phantom cohort is tombstoned with a [[RejectOffset]] marker.
    * Residual: a user whose ONLY events are corrupt keeps one bogus
    * state entry until its (far-future) TTL — bounded at one row per
    * corrupt-only user, with the marker trail making it observable.
    */
  def retentionCells(events: DataFrame,
      weekUs: Long = 7L * 86400L * 1000000L,
      stateTtl: Option[java.time.Duration] = None,
      watermarkDelay: String = "0 seconds",
      maxWeekOffset: Long = 5200L): Dataset[RetCell] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .select(col("user_id").cast("long"), col("ts_us").cast("long"))
    val timeout = stateTtl match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    withWatermarkIf(base, stateTtl.isDefined, watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetState, RetCell](
        OutputMode.Append, timeout) {
        case (uid, rows, state: GroupState[RetState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val tss = rows.map(_._2).toIndexedSeq.sorted
            var s = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[RetCell]
            tss.foreach { ts =>
              val w = ts / weekUs
              s match {
                case None =>
                  // first event ever: this week IS the cohort (in-order
                  // contract — see the object docstring)
                  s = Some(RetState(w, withBit(Array(0L), 0L), ts))
                  out += RetCell(w, 0L, uid)
                case Some(st) =>
                  val off = w - st.cohortWeek
                  if (off > maxWeekOffset) {
                    // corrupt far-future ts: reject (see doc) — state
                    // and TTL untouched, breach made visible
                    out += RetCell(st.cohortWeek, RejectOffset, uid)
                  } else if (off < -maxWeekOffset) {
                    // the COHORT itself was corrupt: a sane event this
                    // far BEFORE the first-seen week can only mean the
                    // first event carried a far-future timestamp and
                    // opened a bogus cohort (which also pinned the TTL
                    // out of reach). Re-open at this event's week —
                    // maxTs and the TTL re-arm sanely below — and
                    // tombstone the phantom cohort with a marker so
                    // downstream can drop its cell
                    out += RetCell(st.cohortWeek, RejectOffset, uid)
                    s = Some(RetState(w, withBit(Array(0L), 0L), ts))
                    out += RetCell(w, 0L, uid)
                  } else {
                    val st2 = st.copy(maxTs = math.max(st.maxTs, ts))
                    // a pre-cohort week (off < 0) is a late arrival from
                    // before the first-seen event; it cannot be credited
                    // into the bitmap and the batch twin would have used
                    // it as the cohort — skip rather than corrupt
                    if (off >= 0L && !bitSet(st.bits, off)) {
                      s = Some(st2.copy(bits = withBit(st.bits, off)))
                      out += RetCell(st.cohortWeek, off, uid)
                    } else {
                      s = Some(st2)
                    }
                  }
              }
            }
            s.foreach { st =>
              state.update(st)
              // monotone last-seen, NOT the batch max: a late event
              // must never pull the expiry earlier
              armTimeout(state, stateTtl, st.maxTs)
            }
            out.iterator
          }
      }
  }

  /** EventTimeTimeout requires a watermarked event-time COLUMN to be
    * present in the grouped input (the checker looks for the watermark
    * metadata on an output attribute, not just for the plan node), so
    * `ts_wm` is appended in both modes — watermarked only when a TTL
    * asks for it — and ignored by the fold.
    */
  private def withWatermarkIf(df: DataFrame, enabled: Boolean,
      delay: String): DataFrame = {
    val withTs = df.withColumn("ts_wm", timestamp_micros(col("ts_us")))
    if (enabled) withTs.withWatermark("ts_wm", delay) else withTs
  }

  /** Arm the event-time timeout at lastSeen + ttl, clamped above the
    * current watermark (Spark rejects a timeout at or below it — a
    * user whose latest event is already older than watermark - ttl
    * expires at the next possible instant instead).
    */
  private def armTimeout[S](state: GroupState[S],
      ttl: Option[java.time.Duration], lastSeenUs: Long): Unit =
    ttl.foreach { d =>
      val at = math.max(lastSeenUs / 1000L + d.toMillis,
        state.getCurrentWatermarkMs() + 1L)
      state.setTimeoutTimestamp(at)
    }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.operators.StatsOps

/** Streaming Wald SPRT — the sequential-stopping monitor
  * [[graft.operators.StatsOps.statSprt]] computes in batch,
  * re-expressed over Spark 4's `transformWithState` (r17 verdict #7:
  * close the loop between the stats suite and the ST5 state
  * machinery). SPRT is *inherently* a streaming computation — Wald's
  * design decides after EVERY observation whether to stop — so the
  * batch operator is really a replay of this monitor over a finished
  * log; here the decision is live, per trigger, with three longs and
  * a string of state per arm.
  *
  * Shared definitions, three engines: the per-day LLR increments and
  * the decision boundaries are [[StatsOps.SprtLogS]]/`SprtLogF`/
  * `SprtUpper`/`SprtLower` — the same Scala vals that feed the batch
  * plan and generate the DuckDB oracle SQL — and the census
  * projection is [[StatsOps.sprtDailyCensus]]. SprtStreamSpec pins
  * the twin: the streamed output over the sf0.001 census equals the
  * oracle-green batch operator's rows exactly, under any trigger
  * chunking.
  *
  * Input contract: a stream of CLOSED (variant, day, n, conv) census
  * rows, in day order per variant (days may share a trigger; a day
  * must not straddle triggers). That is the natural product of a
  * watermarked daily aggregation upstream — or of
  * [[StatsOps.sprtDailyCensus]] inside foreachBatch over a daily
  * ingest. Feeding raw events instead would funnel the corpus through
  * two keys; feeding the census keeps the keyed stage at arms × days
  * rows while the corpus-sized work stays in the upstream map-side
  * combine — the statSprt scale argument, unchanged.
  *
  * State per arm is ONE fixed-size row (cumulative LLR, the frozen
  * crossing day + LLR-at-crossing): a year of triggers grows the
  * output, never the state. Decisions FREEZE at the first boundary
  * crossing exactly as in batch — later wandering of the cumulative
  * LLR cannot rewrite `state`, and post-crossing days are marked
  * `post_stop` (the sample a sequential design would never have
  * collected).
  *
  * Requires the RocksDB state-store provider (transformWithState
  * does not run on the default provider — the [[TwsSessions]] note).
  */
object SprtStream {

  /** One closed day of one arm — the input element. */
  final case class DailyCensus(variant: String, day: String,
      n: Long, conv: Long)

  /** Mirrors statSprt's output schema column-for-column. */
  final case class SprtOut(variant: String, day: String, n: Long,
      conv: Long, llr_day_e6: Long, llr_e6: Long, state: String,
      post_stop: Int)

  /** Per-arm monitor state: the running LLR, the frozen decision, and
    * the last day folded in (the in-order contract's watermark).
    * `crossDay == null` ⇔ still in (log B, log A); `lastDay == null`
    * ⇔ no day seen yet. */
  final case class SprtState(llrE6: Long, crossDay: String,
      llrAtCross: Long, lastDay: String)

  class SprtProcessor
      extends StatefulProcessor[String, DailyCensus, SprtOut] {
    @transient private var state: ValueState[SprtState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SprtState]("sprt",
        Encoders.product[SprtState], TTLConfig.NONE)

    override def handleInputRows(variant: String,
        rows: Iterator[DailyCensus],
        timers: TimerValues): Iterator[SprtOut] = {
      // day order within the trigger (iterator order is not
      // guaranteed); cross-trigger order is the input contract — and
      // a contract VIOLATION fails the query loudly rather than fold
      // a late day into the wrong prefix sum (a sequential test whose
      // evidence order is wrong is wrong everywhere after; silent
      // acceptance would be a lie in every later verdict)
      val days = rows.toIndexedSeq.sortBy(_.day)
      var st = if (state.exists()) state.get()
        else SprtState(0L, null, 0L, null)
      if (st.lastDay != null && days.nonEmpty &&
          days.head.day <= st.lastDay)
        throw new IllegalStateException(
          s"SprtStream contract violation for variant '$variant': day " +
            s"'${days.head.day}' arrived at or before the already-folded " +
            s"'${st.lastDay}' — the census stream must deliver closed " +
            "days in order (late or replayed days cannot be folded " +
            "into a sequential test's prefix)")
      days.iterator.sliding(2).withPartial(false).foreach { p =>
        if (p(0).day == p(1).day)
          throw new IllegalStateException(
            s"SprtStream contract violation for variant '$variant': two " +
              s"census rows for day '${p(0).day}' in one trigger — a day " +
              "must arrive as ONE closed census row")
      }
      val out = days.map { d =>
        val inc = d.conv * StatsOps.SprtLogS +
          (d.n - d.conv) * StatsOps.SprtLogF
        val llr = st.llrE6 + inc
        if (st.crossDay == null &&
            (llr >= StatsOps.SprtUpper || llr <= StatsOps.SprtLower))
          st = st.copy(crossDay = d.day, llrAtCross = llr)
        st = st.copy(llrE6 = llr)
        // the batch operator's exact decision expression — kept
        // verbatim (including the day < crossDay branch a correctly
        // ordered stream never takes) so the twin claim is textual,
        // not approximate
        val decided =
          if (st.crossDay == null || d.day < st.crossDay) "continue"
          else if (st.llrAtCross >= StatsOps.SprtUpper) "accept_h1"
          else "accept_h0"
        val postStop =
          if (st.crossDay != null && d.day > st.crossDay) 1 else 0
        SprtOut(variant, d.day, d.n, d.conv, inc, llr, decided, postStop)
      }
      if (days.nonEmpty) st = st.copy(lastDay = days.last.day)
      state.update(st)
      out.iterator
    }
  }

  /** dailyCensus: streaming DataFrame with (variant, day, n, conv) —
    * see the input contract above. */
  def sprtStream(dailyCensus: DataFrame): Dataset[SprtOut] = {
    val spark = dailyCensus.sparkSession
    import spark.implicits._
    dailyCensus
      .select(col("variant").cast("string"), col("day").cast("string"),
        col("n").cast("long"), col("conv").cast("long"))
      .as[DailyCensus]
      .groupByKey(_.variant)
      .transformWithState(new SprtProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

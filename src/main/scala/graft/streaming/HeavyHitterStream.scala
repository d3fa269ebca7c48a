package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch skew audit
  * ([[graft.operators.StatsOps.statSkewAudit]]): per event type, a
  * live top-k of the heaviest user_ids — the monitor that catches a
  * runaway key (one bot user, one hot partition) while it is
  * happening rather than in the nightly audit.
  *
  * State per event type is a SPACE-SAVING sketch (Metwally et al.
  * 2005) of `capacity` counters — O(capacity), NOT O(distinct users),
  * which is the whole point: the batch audit's per-key groupBy is
  * unbounded state in a stream. NoTimeout is safe here because BOTH
  * state dimensions are bounded (r12 state-expiry audit): the group
  * key is event_type — a small fixed vocabulary, not user/doc ids —
  * and each group's sketch is capacity-capped, so total state is
  * O(#types × capacity) forever. Guarantees carried by the sketch and
  * pinned in the spec: every item with true count > n/capacity is
  * tracked; a tracked item's count overestimates truth by at most its
  * recorded `err`; with fewer distinct keys than capacity the counts
  * are EXACT (err 0) and equal the batch recount.
  *
  * Emission is update-flavored inside append mode: each trigger emits
  * that type's current top-`k` rows tagged with a monotone `seq`
  * number, so the sink's latest seq per type IS the current top-k
  * (the tail-200 merge pattern from DemoStream applies).
  */
object HeavyHitterStream {

  final case class Counter(cnt: Long, err: Long)
  final case class HhState(counters: Map[Long, Counter], n: Long, seq: Long)
  final case class HhOut(event_type: String, seq: Long, rank: Int,
      user_id: Long, cnt: Long, err: Long, n_total: Long)

  /** events: streaming DataFrame with (event_type string, user_id
    * long). */
  def heavyHitters(events: DataFrame, capacity: Int = 64, k: Int = 5)
      : Dataset[HhOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string"), col("user_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HhState, HhOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (tpe, rows, state: GroupState[HhState]) =>
          var s = state.getOption.getOrElse(HhState(Map.empty, 0L, 0L))
          var c = s.counters
          rows.foreach { case (_, uid) =>
            s = s.copy(n = s.n + 1L)
            c.get(uid) match {
              case Some(Counter(cnt, err)) =>
                c = c.updated(uid, Counter(cnt + 1L, err))
              case None if c.size < capacity =>
                c = c.updated(uid, Counter(1L, 0L))
              case None =>
                // evict the smallest counter (ties: smallest user id,
                // for determinism); the newcomer inherits its count as
                // overestimation error
                val (evictId, Counter(minCnt, _)) =
                  c.minBy { case (id, ctr) => (ctr.cnt, id) }
                c = c.removed(evictId)
                  .updated(uid, Counter(minCnt + 1L, minCnt))
            }
          }
          s = s.copy(counters = c, seq = s.seq + 1L)
          state.update(s)
          c.toSeq
            .sortBy { case (id, ctr) => (-ctr.cnt, id) }
            .take(k).zipWithIndex
            .map { case ((id, ctr), i) =>
              HhOut(tpe, s.seq, i + 1, id, ctr.cnt, ctr.err, s.n)
            }.iterator
      }
  }
}

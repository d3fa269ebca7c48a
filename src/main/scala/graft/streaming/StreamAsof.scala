package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[EventWindows.asofJoin]] (SURVEY §2.10 ST5
  * extension): enrich a live click stream with the latest
  * prior-or-equal purchase per user.
  *
  * Unlike the watermark-windowed stream-stream joins in
  * [[StreamJoins]], as-of enrichment wants the latest value EVER, not
  * a match inside a bounded window — so it is built on
  * `flatMapGroupsWithState` with "latest purchase" state per user:
  * three numbers, O(#users) total, partitioned by user across the
  * cluster (a billion users is a billion 24-byte rows, the same state
  * story as [[StatefulSessions]]). Dormant-user state is TTL'd with an
  * event-time timeout via the optional `stateTtl`; the None default
  * keeps it indefinite so the differential against the batch operator
  * stays exact.
  *
  * Within a micro-batch a group's rows arrive unordered: they are
  * sorted by (ts, side, event_id) — purchases before clicks at equal
  * timestamps — which reproduces the batch operator's window ordering
  * exactly. Across batches, a purchase that ARRIVES after a click of
  * the same user was already emitted cannot retro-enrich it; that is
  * the inherent streaming deviation, and the spec feeds event-time
  * -ordered batches so the differential is still bit-exact.
  */
object StreamAsof {

  final case class PurchaseState(eventId: Long, tsUs: Long, value: Double)
  final case class AsofOut(click_id: Long, user_id: Long,
      click_ts_us: Long, last_purchase_id: Option[Long],
      last_purchase_value: Option[Double])

  /** events: streaming DataFrame with (event_id long, ts timestamp,
    * user_id long, event_type string, value double).
    *
    * stateTtl (r12 state-expiry audit): None keeps per-user state
    * indefinitely — NoTimeout, the exact-batch-parity mode the
    * differential requires ("latest purchase EVER" has no natural
    * horizon). Production deployments pass a TTL: the input gains a
    * watermark, idle users' state times out `ttl` after their last
    * purchase (event time), and a click arriving later simply enriches
    * to no-purchase — the [[GapStream]] pattern. The timeout timestamp
    * is clamped above the current watermark so Spark never rejects it.
    */
  def asofStream(events: DataFrame,
      stateTtl: Option[java.time.Duration] = None,
      watermarkDelay: String = "0 seconds"): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    val timeout = stateTtl match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    val base = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long").as("uid"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"),
        col("event_id").cast("long").as("eid"),
        col("value").cast("double").as("v"))
      .withColumn("ts_wm", timestamp_micros(col("ts_us")))
    val marked = stateTtl match {
      case Some(_) => base.withWatermark("ts_wm", watermarkDelay)
      case None => base
    }
    marked
      .as[(Long, Long, Int, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PurchaseState, AsofOut](
        OutputMode.Append, timeout) {
        case (uid, rows, state: GroupState[PurchaseState]) =>
          if (state.hasTimedOut) {
            // dormant user past ttl: drop the purchase memory; a later
            // click enriches to None, a later purchase restarts state
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toIndexedSeq.sortBy(r => (r._2, r._3, r._4))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
            sorted.foreach { case (_, tsUs, side, eid, v, _) =>
              if (side == 0) {
                // keep the max-(ts, event_id) purchase — idempotent under
                // at-least-once replay of an old purchase
                if (cur.forall(s =>
                    tsUs > s.tsUs || (tsUs == s.tsUs && eid > s.eventId)))
                  cur = Some(PurchaseState(eid, tsUs, v))
              } else {
                out += AsofOut(eid, uid, tsUs, cur.map(_.eventId),
                  cur.map(_.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              stateTtl.foreach { d =>
                // ceil the µs→ms conversion so state never expires
                // before the nominal purchase-time-plus-TTL horizon
                // (same rounding rule as AttributionStream's horizon)
                val at = math.max((s.tsUs + 999L) / 1000L + d.toMillis,
                  state.getCurrentWatermarkMs() + 1L)
                state.setTimeoutTimestamp(at)
              }
            }
            out.iterator
          }
      }
  }
}

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
  * story as [[StatefulSessions]]). At 100 TB dormant-user state would
  * be TTL'd with an event-time timeout; kept indefinite here so the
  * differential against the batch operator is exact.
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
    */
  def asofStream(events: DataFrame): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    val typed = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long").as("uid"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"),
        col("event_id").cast("long").as("eid"),
        col("value").cast("double").as("v"))
      .as[(Long, Long, Int, Long, Double)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[PurchaseState, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[PurchaseState]) =>
          val sorted = rows.toIndexedSeq.sortBy(r => (r._2, r._3, r._4))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          sorted.foreach { case (_, tsUs, side, eid, v) =>
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
          cur.foreach(state.update)
          out.iterator
      }
  }
}

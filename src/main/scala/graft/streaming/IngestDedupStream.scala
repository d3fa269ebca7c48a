package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming exact-ingest dedup — the third streaming twin (the r18
  * verdict #7 option): [[graft.dedup.DedupOps.dedupBloomIncremental]]
  * re-expressed as a LIVE ingest screen over `transformWithState`.
  * The batch operator's whole framing is "yesterday's 100 TB corpus vs
  * today's delivery, keep only genuinely-new docs"; this makes the
  * framing literal — the corpus fingerprint set IS the state,
  * deliveries are triggers, and a delivery is screened the moment it
  * lands instead of in tomorrow's batch window.
  *
  * Semantics (the batch contract, verbatim at the one-delivery point):
  * rows flagged `is_delta = false` are CORPUS — absorbed into state,
  * emitting nothing. Delta rows are kept iff their canonical
  * fingerprint `h` does not exist in the accumulated corpus; kept rows
  * mirror the batch output column-for-column (doc_id, h). Within one
  * delivery, same-h delta rows do NOT screen each other — the batch's
  * anti-join probes only the corpus side, so both copies survive —
  * and survivors join the corpus only AFTER the whole delivery is
  * screened. Across deliveries the screen is the natural recurrence
  * the batch can't express: day N's survivors are corpus for day N+1,
  * and a doc the screen already dropped can never block a later one
  * (it was a dup OF something that remains in state).
  *
  * Shared definitions with the batch side:
  * [[graft.dedup.DedupOps.bloomIncrAssigned]] is the one fingerprint +
  * split projection both engines consume — IngestDedupStreamSpec pins
  * streamed == batch rows EXACTLY over the sf0.001 corpus under
  * arbitrary bootstrap chunking, plus a hand-computed multi-delivery
  * recurrence and a checkpoint-restart recovery.
  *
  * Scale shape: keyed by `h mod` [[IngestDedupStream.NumShards]] — the
  * hash-prefix sharding the batch operator's scaladoc prescribes for a
  * beyond-bloom corpus, made the shard map (production raises the
  * shard count with the corpus exactly as that note says). Per-shard
  * state is a RocksDB `MapState` keyed by the fingerprint itself, so
  * every probe and every absorb is a POINT lookup/put — O(1) per
  * document, no list scan, no corpus materialization; per-trigger work
  * is O(|delivery|) regardless of how large the accumulated corpus
  * has grown. That is the streamed analog of the batch's
  * bloom-pruned anti-join: flat per-delivery cost against an
  * ever-growing base.
  *
  * Input contracts (violations FAIL the query rather than corrupt
  * later verdicts, like the other twins): a doc_id must not repeat
  * within a trigger, and corpus rows must arrive before the shard has
  * screened any delivery — a late bootstrap would retroactively change
  * what earlier deliveries should have been screened against, which a
  * prefix screen cannot honor. (Cross-trigger doc_id replays are
  * undetectable at this state shape — the state holds fingerprints,
  * not ids — and are the upstream exactly-once contract, documented
  * rather than half-checked.)
  *
  * Requires the RocksDB state-store provider (transformWithState does
  * not run on the default provider — the [[TwsSessions]] note).
  */
object IngestDedupStream {

  /** One fingerprinted document: `is_delta = false` ⇒ corpus. */
  final case class DocIn(doc_id: Long, h: Long, is_delta: Boolean)

  /** Mirrors dedupBloomIncremental's output schema column-for-column
    * (kept — genuinely-new — rows only, exactly as the batch emits). */
  final case class IngestOut(doc_id: Long, h: Long)

  /** Shard fan-out of the fingerprint space. 64 here matches the
    * sf-scale fixtures; production raises it with the corpus (the
    * batch scaladoc's hash-prefix bloom sharding, as the key map). */
  val NumShards = 64

  def shardOf(h: Long): Long = java.lang.Math.floorMod(h, NumShards.toLong)

  class IngestDedupProcessor
      extends StatefulProcessor[Long, DocIn, IngestOut] {
    // the shard's slice of the corpus fingerprint set: point probes
    // and point puts, never iterated
    @transient private var seen: MapState[Long, Boolean] = _
    // whether this shard has screened any delivery yet — arms the
    // late-bootstrap contract guard
    @transient private var screened: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[Long, Boolean]("seen",
        Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      screened = getHandle.getValueState[Boolean]("screened",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(shard: Long, rows: Iterator[DocIn],
        timers: TimerValues): Iterator[IngestOut] = {
      val batch = rows.toIndexedSeq.sortBy(_.doc_id)
      batch.iterator.sliding(2).withPartial(false).foreach { p =>
        if (p(0).doc_id == p(1).doc_id)
          throw new IllegalStateException(
            s"IngestDedupStream contract violation in shard $shard: " +
              s"doc_id ${p(0).doc_id} appears twice in one trigger")
      }
      val (delta, bootstrap) = batch.partition(_.is_delta)
      if (bootstrap.nonEmpty) {
        // corpus-before-feed contract: bootstrap AND delta sharing a
        // trigger is fine (the corpus half is absorbed first, below —
        // the batch replay needs exactly that), but a bootstrap row
        // arriving AFTER this shard has screened a delivery cannot be
        // honored by a prefix screen
        if (screened.exists() && screened.get())
          throw new IllegalStateException(
            s"IngestDedupStream contract violation in shard $shard: a " +
              s"corpus (bootstrap) row arrived after this shard already " +
              "screened a delivery — the standing corpus must load " +
              "before the live feed is screened against it")
        bootstrap.foreach(b => seen.updateValue(b.h, true))
      }
      if (delta.isEmpty) Iterator.empty
      else {
        // screen the whole delivery against the corpus as it stood at
        // trigger start + this trigger's own bootstrap rows — same-h
        // delta rows never screen each other (batch parity: the
        // anti-join probes only the corpus side)
        val kept = delta.collect {
          case d if !seen.containsKey(d.h) => IngestOut(d.doc_id, d.h)
        }
        // survivors join the corpus for every LATER delivery
        kept.foreach(o => seen.updateValue(o.h, true))
        screened.update(true)
        kept.iterator
      }
    }
  }

  /** docs: streaming DataFrame with (doc_id, h, is_delta) — see
    * [[graft.dedup.DedupOps.bloomIncrAssigned]] for the batch-shared
    * projection. */
  def ingestDedupStream(docs: DataFrame): Dataset[IngestOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("h").cast("long"),
        col("is_delta").cast("boolean"))
      .as[DocIn]
      .groupByKey(d => shardOf(d.h))
      .transformWithState(new IngestDedupProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

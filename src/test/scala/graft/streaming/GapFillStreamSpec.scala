package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stream==batch differential for the gap-fill LOCF monitor. */
class GapFillStreamSpec extends SparkSuite {

  private def parsed(src: MemorySource) =
    src.load(spark)
      .select(from_json(col("value").cast("string"),
        StructType.fromDDL("event_type string, ts_us long, value double"))
        .as("j"))
      .select("j.*")

  private def msg(tpe: String, tsUs: Long, v: Double): String =
    s"""{"event_type": "$tpe", "ts_us": $tsUs, "value": $v}"""

  test("closed cells equal the batch gap-fill on the overlapping spine") {
    val evs = Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(ts) as ts_us", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2)
    val maxH = evs.map(_._2).max / 3600000000L

    val src = new MemorySource(spark)
    val q = GapFillStream.gapFillStream(parsed(src))
      .writeStream.format("memory").queryName("gapfill_stream")
      .outputMode("append").start()
    try {
      evs.map(e => msg(e._1, e._2, e._3))
        .grouped(evs.length / 4 + 1)
        .foreach { b => src.add(b.toSeq); q.processAllAvailable() }
      // sentinel 3h past the end: watermark passes maxH, closing it
      src.add(Seq(msg("zz_sentinel", (maxH + 3) * 3600000000L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("gapfill_stream")
      .filter(col("event_type") =!= "zz_sentinel")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getDouble(4))).toMap

    // batch spine, restricted per type to [its own first hour, maxH]
    val firstHour = evs.groupBy(_._1).map { case (t, es) =>
      t -> es.map(_._2 / 3600000000L).min }
    val batch = EventWindows.gapFill(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getDouble(4)))
      .filter { case ((t, h), _) => h >= firstHour(t) && h <= maxH }
      .toMap

    // every batch cell in the stream's window must match exactly
    // (sums tolerate one ulp-at-the-rounding-boundary of drift)
    batch.foreach { case (k, (n, gap, filled)) =>
      val (gn, ggap, gfilled) = got.getOrElse(k, fail(s"missing cell $k"))
      assert(gn == n && ggap == gap, s"cell $k")
      assert(math.abs(gfilled - filled) < 0.011, s"sum at $k")
    }
    // trailing cells past maxH are LOCF gap cells, final and zero-count
    got.keys.filterNot(batch.contains).foreach { case (t, h) =>
      assert(h > maxH, s"unexpected early cell ($t,$h)")
      assert(got((t, h))._1 == 0L && got((t, h))._2 == 1, s"trailer ($t,$h)")
    }
  }

  test("gap cells flow for an idle type on pure watermark advance") {
    val base = 1700000000000000L // realistic event time, off epoch 0
    val src = new MemorySource(spark)
    val q = GapFillStream.gapFillStream(parsed(src))
      .writeStream.format("memory").queryName("gapfill_idle")
      .outputMode("append").start()
    try {
      src.add(Seq(msg("a", base, 5.0)))
      q.processAllAvailable()
      // only type "b" advances the watermark by 4 hours; "a" is idle
      src.add(Seq(msg("b", base + 4L * 3600000000L, 1.0)))
      q.processAllAvailable()
      src.add(Seq(msg("b", base + 5L * 3600000000L, 1.0)))
      q.processAllAvailable()
    } finally q.stop()

    val h0 = base / 3600000000L
    val aCells = spark.table("gapfill_idle")
      .filter(col("event_type") === "a").orderBy("h").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    // a's observed hour closed, then LOCF gap cells with a's last sum
    assert(aCells.head == ((h0, 1L, 0, 5.0)), s"observed cell: ${aCells.head}")
    assert(aCells.length >= 3, s"expected trailing gap cells: ${aCells.toSeq}")
    aCells.tail.foreach { case (h, n, gap, filled) =>
      assert(h > h0 && n == 0L && gap == 1 && filled == 5.0, s"gap cell $h")
    }
  }
}

package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("feedback parse: schema, age bins, malformed JSON -> null row") {
    val msgs = Seq(
      """{"gender": "Mujer", "occupation": "Jubilado", "age": 67, "ratings": [{"filmId": 1, "rating": 5}]}""",
      """{"gender": "Hombre", "occupation": "Programador", "age": 17}""",
      """{"gender": "Hombre", "occupation": "X", "age": 18}""",
      """{"gender": "Hombre", "occupation": "X", "age": 24}""",
      """{"gender": "Hombre", "occupation": "X", "age": 25}""",
      """{"gender": "Hombre", "occupation": "X", "age": 55}""",
      """{"gender": "Hombre", "occupation": "X", "age": 56}""",
      "this is not json")
    val parsed = FeedbackPipeline.parse(msgs.toDF("value")).collect()
    assert(parsed.length == 8)
    val bins = parsed.map(r => Option(r.getAs[String]("age_bin")))
    assert(bins.take(7).flatten.toSeq ==
      Seq("56+", "<18", "18-24", "18-24", "25-34", "50-55", "56+"))
    // malformed JSON -> null fields, age_bin falls through to otherwise
    val bad = parsed(7)
    assert(bad.isNullAt(bad.fieldIndex("gender")))
  }

  test("memory append sink accumulates across micro-batches (S9)") {
    val src = new MemorySource(spark)
    val q = FeedbackPipeline.startMemoryAppend(
      FeedbackPipeline.parse(src.load(spark)), "feedback_raw_test")
    src.add(FeedbackGenerator.batch("inserso", 0, 10))
    q.processAllAvailable()
    src.add(FeedbackGenerator.batch("revista", 10, 15))
    q.processAllAvailable()
    val t = spark.sql("select * from feedback_raw_test")
    assert(t.count() == 25)
    // inserso profile must spike Jubilado/56+ (the reference's bot soak
    // check, SURVEY §5)
    val jub = t.filter(col("occupation") === "Jubilado").count()
    assert(jub == 10)
    assert(t.filter(col("age_bin") === "<18").count() == 15)
    q.stop()
  }

  test("complete-mode last-200 keeps latest by ts (O4)") {
    val src = new MemorySource(spark)
    val q = DemoStream.startLast200(
      DemoStream.parse(src.load(spark)), "demo_agg_test", n = 200)
    src.add((0 until 150).map(i => s"""{"ts": $i, "value": ${i * 0.5}}"""))
    q.processAllAvailable()
    src.add((150 until 250).map(i => s"""{"ts": $i, "value": ${i * 0.5}}"""))
    q.processAllAvailable()
    val rows = spark.sql("select * from demo_agg_test").collect()
    assert(rows.length == 200)
    val tss = rows.map(_.getAs[Long]("ts")).sorted
    assert(tss.head == 50 && tss.last == 249)
    q.stop()
  }

  test("LastNPoints: dedup (ts,value), sort, tail-N (S11)") {
    val state = new LastNPoints(n = 5)
    state.update(Seq((3L, 0.3), (1L, 0.1), (2L, 0.2)))
    // duplicate (ts,value) dropped; new points merged in ts order
    val s2 = state.update(Seq((2L, 0.2), (5L, 0.5), (4L, 0.4)))
    assert(s2 == Vector((1L, 0.1), (2L, 0.2), (3L, 0.3), (4L, 0.4), (5L, 0.5)))
    // same ts, different value is NOT a duplicate
    val s3 = state.update(Seq((5L, 0.9), (6L, 0.6)))
    assert(s3.size == 5) // tail-5 keeps latest
    assert(s3.last == (6L, 0.6))
    assert(s3.count(_._1 == 5L) == 2)
  }

  test("LastNPoints via foreachBatch writes JSON snapshots (S11)") {
    val out = Files.createTempFile("lastn", ".json")
    val state = new LastNPoints(n = 200, outPath = Some(out))
    val src = new MemorySource(spark)
    val q = FeedbackPipeline.startForeachBatch(
      DemoStream.parse(src.load(spark)), state.foreachBatchFn)
    src.add(Seq("""{"ts": 10, "value": 1.5}""", """{"ts": 20, "value": 2.5}"""))
    q.processAllAvailable()
    q.stop()
    val json = Files.readString(out)
    assert(json.contains(""""ts": 10""") && json.contains(""""value": 2.5"""))
    assert(state.snapshot.size == 2)
  }

  test("foreachBatch metrics CSV: one line per trigger; temp view shows only latest batch (ST6/ST7)") {
    val csv = Files.createTempFile("metrics", ".csv")
    Files.delete(csv)
    TriggerMetrics.initCsv(csv)
    val src = new MemorySource(spark)
    val q = FeedbackPipeline.startForeachBatch(
      FeedbackPipeline.parse(src.load(spark)),
      TriggerMetrics.saveAndLogFn(csv, "feedback_raw_metrics"))
    src.add(FeedbackGenerator.batch("masculino", 0, 7))
    q.processAllAvailable()
    src.add(FeedbackGenerator.batch("masculino", 7, 3))
    q.processAllAvailable()
    q.stop()
    val lines = Files.readAllLines(csv)
    // header + >=2 trigger lines (first trigger may be an empty batch 0)
    val dataLines = lines.subList(1, lines.size())
    val counts = scala.jdk.CollectionConverters
      .ListHasAsScala(dataLines).asScala
      .map(_.split(",")(1).toInt).filter(_ > 0)
    assert(counts.toSeq == Seq(7, 3))
    // ST7 quirk: replace-per-batch view exposes ONLY the last batch
    assert(
      spark.sql("select * from global_temp.feedback_raw_metrics").count() == 3)
    val stats = TriggerMetrics.stats(csv)
    assert(stats.n >= 2 && stats.meanMs > 0)
  }

  test("update-mode aggregated counts match batch value_counts (A8)") {
    val src = new MemorySource(spark)
    val q = FeedbackPipeline.startCountsUpdate(
      FeedbackPipeline.parse(src.load(spark)), "age_bin", "live_counts_test")
    val msgs = FeedbackGenerator.batch("inserso", 0, 20) ++
      FeedbackGenerator.batch("revista", 20, 10)
    src.add(msgs)
    q.processAllAvailable()
    val got = spark.sql("select * from live_counts_test").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = FeedbackPipeline.parse(msgs.toDF("value"))
      .groupBy("age_bin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    q.stop()
  }

  test("streaming hourly window with watermark matches batch result (ST4 extension)") {
    // stream the events parquet as files; compare emitted windows to
    // the batch oracle query for windows the watermark closed
    val batch = EventWindows.hourlyWindow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val events = Tables.events(spark, sf0001)
    val dir = Files.createTempDirectory("ev_stream")
    events.write.mode("overwrite").parquet(dir.toString)
    val streamIn = spark.readStream
      .schema(events.schema)
      .parquet(dir.toString)
    val q = EventWindows.hourlyWindowStreaming(streamIn)
      .writeStream.format("memory").queryName("ev_hourly_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val emitted = spark.sql("select * from ev_hourly_stream").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(emitted.nonEmpty, "watermark should close at least some windows")
    // every emitted window must agree exactly with the batch computation
    emitted.foreach { case (k, v) =>
      assert(batch(k) == v, s"window $k: stream $v != batch ${batch(k)}")
    }
  }

  test("funnel stages match a driver event-replay recompute") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      val t1 = sorted.collectFirst { case (_, ts, "view") => ts }
      val t2 = t1.flatMap(a =>
        sorted.collectFirst { case (_, ts, "click") if ts > a => ts })
      val t3 = t2.flatMap(b =>
        sorted.collectFirst { case (_, ts, "purchase") if ts > b => ts })
      u -> ((t1, t2, t3))
    }
    val out = EventWindows.funnel(spark, sf0001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val u = r.getLong(0)
      def opt(i: Int): Option[Long] =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      val (t1, t2, t3) = expected(u)
      assert(opt(1) == t1, s"user $u t_view")
      assert(opt(2) == t2, s"user $u t_click")
      assert(opt(3) == t3, s"user $u t_purchase")
      val stage = Seq(t1, t2, t3).count(_.isDefined)
      assert(r.getInt(4) == stage, s"user $u stage")
    }
    // sf0.001 is dense enough that every user converts — stages are
    // validated by the exact per-user asserts above; here just bound
    assert(out.forall(r => r.getInt(4) >= 0 && r.getInt(4) <= 3))
  }

  test("anomaly flags match a BigInt driver recompute of the sigma test") {
    val hourUs = 3600L * 1000000L
    val evs = Tables.events(spark, sf0001)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / hourUs * hourUs))
    val sparse = evs.groupBy(identity).map { case ((et, h), rows) =>
      (et, h, rows.length.toLong)
    }.toSeq
    val gmax = sparse.map(_._2).max
    val expected = sparse.groupBy(_._1).flatMap { case (et, active) =>
      // densify type-min..GLOBAL-max with zero-filled hours — the
      // dead-producer grid the operator now computes over
      val byHour = active.map(r => r._2 -> r._3).toMap
      val rows = (byHour.keys.min to gmax by hourUs)
        .map(h => (h, byHour.getOrElse(h, 0L)))
      val n = BigInt(rows.length)
      val s = BigInt(rows.map(_._2).sum)
      val q = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      rows.map { case (h, c) =>
        val dev = n * c - s
        (et, h) -> ((c, dev * dev * (n - 1) > 9 * n * (n * q - s * s)))
      }
    }
    val got = EventWindows.anomalyHours(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"cell $k: got ${got(k)}, want $v")
    }
    // the fixture must exercise the densification (sf0.001 has empty
    // hours) AND stay mostly normal — not an all-true degenerate flag
    assert(got.values.exists(_._1 == 0L), "no zero-filled hours in grid")
    assert(got.values.count(_._2) < got.size / 2)
    // ...and the GLOBAL-max extension specifically: sf0.001's types end
    // at different hours, so some type must carry zero-rows BEYOND its
    // own last active hour (the terminal-outage grid; a per-type max
    // bound would emit no such row and this assertion would fail)
    val ownMax = sparse.groupBy(_._1).map { case (et, rs) =>
      et -> rs.map(_._2).max
    }
    assert(ownMax.values.toSet.size > 1,
      "fixture degenerate: every type ends at the same hour")
    val trailing = got.keys.filter { case (et, h) => h > ownMax(et) }
    assert(trailing.nonEmpty, "no trailing zero-hours past a type's end")
    trailing.foreach { k =>
      assert(got(k)._1 == 0L, s"trailing cell $k should be zero-filled")
    }
  }

  test("MAD anomaly flags match an exact integer driver recompute") {
    val hourUs = 3600L * 1000000L
    val evs = Tables.events(spark, sf0001)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / hourUs * hourUs))
    val sparse = evs.groupBy(identity).map { case ((et, h), rows) =>
      (et, h, rows.length.toLong)
    }.toSeq
    // exact 2x-median of Longs: sum of the two middle elements (odd n:
    // the middle twice) — no floating point anywhere in the recompute
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val gmax = sparse.map(_._2).max
    val expected = sparse.groupBy(_._1).flatMap { case (et, active) =>
      val byHour = active.map(r => r._2 -> r._3).toMap
      val rows = (byHour.keys.min to gmax by hourUs)
        .map(h => (h, byHour.getOrElse(h, 0L)))
      val m2 = med2(rows.map(_._2))
      val devs = rows.map { case (h, c) => (h, c, (2 * c - m2).abs) }
      val mad4 = med2(devs.map(_._3))
      devs.map { case (h, c, d2) =>
        (et, h) -> ((c, BigInt(13490) * d2 > BigInt(35000) * mad4))
      }
    }
    val got = EventWindows.anomalyHoursMad(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"cell $k: got ${got(k)}, want $v")
    }
    // robust monitor on the same series: flags exist but stay a minority
    assert(got.values.exists(_._2), "fixture produced no MAD anomalies")
    assert(got.values.count(_._2) < got.size / 2)
  }

  test("streaming anomaly monitor converges to the batch 3-sigma flags") {
    // the monitor consumes the finalized hourly cells that
    // hourlyWindowStreaming emits; here the SAME cells (batch hourly
    // rollup of the real sf0.001 events) are replayed through a memory
    // stream in hour order across 4 micro-batches — the latest
    // emit_seq snapshot per type must equal the batch anomalyHours
    // output cell-for-cell, flags included
    val cells = EventWindows.hourlyWindow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    val msgs = cells.map { case (h, et, n) =>
      s"""{"event_type": "$et", "hour_us": $h, "n": $n}"""
    }
    val src = new MemorySource(spark)
    val parsed = src.load(spark)
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type string, hour_us long, n long")).as("j"))
      .select("j.*")
    val buf = scala.collection.mutable.ArrayBuffer.empty[EventWindows.AnomCell]
    val q = EventWindows.anomalyHoursStreaming(parsed) { out =>
      buf.synchronized { buf ++= out.collect() }
    }.start()
    msgs.grouped(math.max(1, msgs.length / 4 + 1)).foreach { b =>
      src.add(b.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    spark.createDataset(buf.toSeq).createOrReplaceTempView("anom_stream")
    val fin = spark.sql(
      """select event_type, hour_us, n, is_anomaly from (
        |  select *, max(emit_seq) over (partition by event_type) as mx
        |  from anom_stream)
        |where emit_seq = mx""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    val batch = EventWindows.anomalyHours(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(fin == batch,
      s"stream snapshot (${fin.size} cells) != batch (${batch.size})")
    // mid-stream snapshots are PREFIX recomputes, so the final equality
    // plus nonempty intermediate emissions is the convergence contract
    val nSeqs = spark.sql(
      "select count(distinct emit_seq) from anom_stream")
      .collect()(0).getLong(0)
    assert(nSeqs >= 3, s"expected multiple incremental snapshots, got $nSeqs")
  }

  test("streaming monitor keeps emitting zeros for a dead producer") {
    // type A emits one cell then dies; type B keeps the feed alive.
    // The global-max grid must keep extending A with n=0 rows — the
    // terminal outage a per-type bound would never show.
    def msg(et: String, hour: Long, n: Long): String = {
      val hourUs = 3600L * 1000000L
      s"""{"event_type": "$et", "hour_us": ${hour * hourUs}, "n": $n}"""
    }
    val src = new MemorySource(spark)
    val parsed = src.load(spark)
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type string, hour_us long, n long")).as("j"))
      .select("j.*")
    // the ROBUST monitor: with most of the series dead the median is
    // 0 and MAD is 0, so any nonzero hour flags — 3-sigma on a 6-point
    // series would not (one spike inflates its own stddev)
    val buf = scala.collection.mutable.ArrayBuffer.empty[EventWindows.AnomCell]
    val q = EventWindows.anomalyMadStreaming(parsed) { out =>
      buf.synchronized { buf ++= out.collect() }
    }.start()
    src.add(Seq(msg("A", 100L, 5L), msg("B", 100L, 5L)))
    q.processAllAvailable()
    src.add((101L to 105L).map(h => msg("B", h, 5L)))
    q.processAllAvailable()
    // batch 3 REVISES an existing B hour without advancing the global
    // clock: A must be SKIPPED (no new cells, gmax unchanged) — its
    // freshest sink rows keep an older emit_seq, which is exactly why
    // consumers read latest-per-type below
    src.add(Seq(msg("B", 105L, 7L)))
    q.processAllAvailable()
    q.stop()
    spark.createDataset(buf.toSeq).createOrReplaceTempView("anom_dead")
    val hourUs = 3600L * 1000000L
    // latest emit_seq PER TYPE: the monitor skips types whose grid
    // did not change, so a type's freshest rows may carry an older seq
    val fin = spark.sql(
      """select event_type, hour_us, n, is_anomaly from (
        |  select *, max(emit_seq) over (partition by event_type) as mx
        |  from anom_dead)
        |where emit_seq = mx""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1) / hourUs) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    // A's grid extends to B's clock: hours 101..105 exist with n=0
    (101L to 105L).foreach { h =>
      assert(fin.contains(("A", h)), s"dead producer A missing hour $h")
      assert(fin(("A", h))._1 == 0L, s"A hour $h not zero")
    }
    // the revision landed, and the skip path actually ran: A's newest
    // emission is OLDER than B's (batch 3 touched only B)
    assert(fin(("B", 105L))._1 == 7L, "B's hour-105 revision lost")
    val maxSeq = spark.sql(
      """select event_type, max(emit_seq) from anom_dead
        |group by event_type""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(maxSeq("A") < maxSeq("B"),
      s"type A was not skipped in the no-new-cells batch: $maxSeq")
    // and the deviation IS visible: A's series is 5,0,0,0,0,0 with
    // median/MAD = 0, so the one live hour flags under the modified
    // z-score (MAD=0 degenerates to "flag any deviation")
    assert(fin(("A", 100L)) == ((5L, true)),
      s"live hour of mostly-dead series not flagged: ${fin(("A", 100L))}")
    assert((101L to 105L).forall(h => !fin(("A", h))._2),
      "zero hours of an all-dead tail should not self-flag")
  }

  test("streaming MAD monitor converges to the batch robust flags") {
    // same replay harness as the 3-sigma monitor test; the robust twin
    // must converge to anomalyHoursMad cell-for-cell
    val cells = EventWindows.hourlyWindow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    val msgs = cells.map { case (h, et, n) =>
      s"""{"event_type": "$et", "hour_us": $h, "n": $n}"""
    }
    val src = new MemorySource(spark)
    val parsed = src.load(spark)
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type string, hour_us long, n long")).as("j"))
      .select("j.*")
    val buf = scala.collection.mutable.ArrayBuffer.empty[EventWindows.AnomCell]
    val q = EventWindows.anomalyMadStreaming(parsed) { out =>
      buf.synchronized { buf ++= out.collect() }
    }.start()
    msgs.grouped(math.max(1, msgs.length / 4 + 1)).foreach { b =>
      src.add(b.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    spark.createDataset(buf.toSeq).createOrReplaceTempView("anom_mad_stream")
    val fin = spark.sql(
      """select event_type, hour_us, n, is_anomaly from (
        |  select *, max(emit_seq) over (partition by event_type) as mx
        |  from anom_mad_stream)
        |where emit_seq = mx""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    val batch = EventWindows.anomalyHoursMad(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(fin == batch,
      s"stream snapshot (${fin.size} cells) != batch (${batch.size})")
  }

  test("retention matrix matches a driver cohort recompute") {
    val weekUs = 7L * 86400L * 1000000L
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / weekUs))
      .distinct
    val cohortOf = evs.groupBy(_._1).map { case (u, ws) =>
      u -> ws.map(_._2).min
    }
    val cohortSize = cohortOf.values.groupBy(identity).map {
      case (c, us) => c -> us.size.toLong
    }
    val cells = evs.groupBy { case (u, w) => (cohortOf(u), w - cohortOf(u)) }
      .map { case (k, rows) => k -> rows.map(_._1).distinct.size.toLong }
    val out = EventWindows.retention(spark, sf0001).collect()
    assert(out.length == cells.size)
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == cells(key), s"cell $key n_active")
      val cn = cohortSize(key._1)
      assert(r.getLong(3) == cn, s"cell $key cohort_n")
      assert(r.getLong(4) == (cells(key) * 10000L + cn / 2) / cn,
        s"cell $key ret_e4")
    }
    // offsets start at 0 for every cohort and week-0 retention is 100%
    out.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getLong(4) == 10000L)
    }
  }
}

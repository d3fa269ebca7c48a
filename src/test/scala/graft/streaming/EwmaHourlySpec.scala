package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Differential test for [[EventWindows.ewmaHourly]]: densify the
  * hourly series driver-side (type-min..global-max, the monitor-family
  * grid), refit the 12-tap truncated-EWMA in exact integers, and
  * compare every smoothed cell.
  */
class EwmaHourlySpec extends SparkSuite {
  import spark.implicits._

  private val taps: Seq[Long] =
    (0 until 12).map(j => math.round(0.3 * math.pow(0.7, j) * 1e6))

  test("ewma cells match an exact-integer driver recompute") {
    val hourUs = 3600L * 1000000L
    val evs = Tables.events(spark, sf0001)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / hourUs * hourUs))
    val sparse = evs.groupBy(identity).map { case ((et, h), rows) =>
      (et, h, rows.length.toLong)
    }.toSeq
    val gmax = sparse.map(_._2).max

    val expected: Map[(String, Long), (Long, Long)] =
      sparse.groupBy(_._1).flatMap { case (et, active) =>
        val byHour = active.map(r => r._2 -> r._3).toMap
        val series = (byHour.keys.min to gmax by hourUs)
          .map(h => (h, byHour.getOrElse(h, 0L)))
        series.zipWithIndex.map { case ((h, c), t) =>
          val inRange = taps.zipWithIndex.filter { case (_, j) => j <= t }
          val num = inRange.map { case (cj, j) => cj * series(t - j)._2 }.sum
          val den = inRange.map(_._1).sum
          (et, h) -> ((c, (num * 100L + den / 2) / den))
        }
      }

    val got = EventWindows.ewmaHourly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"cell $k: got ${got(k)}, want $v")
    }
    // fixture sanity: the smoother must actually smooth — some cell's
    // EWMA must differ from its raw count, and the leading-edge
    // renormalization must have fired (series longer than the taps)
    assert(got.exists { case (_, (c, e)) => e != c * 100 })
    assert(expected.keys.groupBy(_._1).values.exists(_.size > taps.size),
      "fixture degenerate: every series shorter than the tap window")
  }

  test("streaming ewma converges to the batch smoothed cells") {
    // same replay harness as the anomaly monitors: the batch hourly
    // cells stream in hour order across 4 micro-batches; the latest
    // emit_seq snapshot per type must equal ewmaHourly cell-for-cell
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
    val buf = scala.collection.mutable.ArrayBuffer.empty[EventWindows.EwmaCell]
    val q = EventWindows.ewmaStreaming(parsed) { out =>
      buf.synchronized { buf ++= out.collect() }
    }.start()
    msgs.grouped(math.max(1, msgs.length / 4 + 1)).foreach { b =>
      src.add(b.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    spark.createDataset(buf.toSeq).createOrReplaceTempView("ewma_stream")
    val fin = spark.sql(
      """select event_type, hour_us, n, ewma_e2 from (
        |  select *, max(emit_seq) over (partition by event_type) as mx
        |  from ewma_stream)
        |where emit_seq = mx""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val batch = EventWindows.ewmaHourly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(fin == batch,
      s"stream snapshot (${fin.size} cells) != batch (${batch.size})")
    val nSeqs = spark.sql(
      "select count(distinct emit_seq) from ewma_stream")
      .collect()(0).getLong(0)
    assert(nSeqs >= 3, s"expected multiple incremental snapshots, got $nSeqs")
  }

  test("ewma plans one Window node, hash-partitioned by event_type") {
    val plan = EventWindows.ewmaHourly(spark, sf0001)
      .queryExecution.executedPlan.toString
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"expected 1 Window node, got $windows:\n$plan")
    // the PlanAuditSpec exemption's justification: the series window
    // shuffles by type (never SinglePartition — the only single
    // partition in this plan is the 1-row global-clock agg)
    assert(plan.contains("hashpartitioning(event_type"),
      s"window input not hash-partitioned by event_type:\n$plan")
  }
}

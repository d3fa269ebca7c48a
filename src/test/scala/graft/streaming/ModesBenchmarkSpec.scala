package graft.streaming

import java.nio.file.Files

import graft.SparkSuite

class ModesBenchmarkSpec extends SparkSuite {

  test("A/B mode benchmark produces comparable per-trigger metrics (C6)") {
    val dir = Files.createTempDirectory("ab_bench")
    val batches = (0 until 5)
      .map(i => FeedbackGenerator.batch("random", i * 20, 20))
    val r = ModesBenchmark.run(spark, batches, dir)
    assert(r.append.n >= 5)
    assert(r.updateEarliest.n >= 1)
    assert(r.append.meanMs > 0 && r.updateEarliest.meanMs > 0)
    // epoch 0 of the replay variant carries the whole backlog
    val linesB = Files.readAllLines(dir.resolve("metrics_update_earliest.csv"))
    val epoch0 = scala.jdk.CollectionConverters
      .ListHasAsScala(linesB).asScala.drop(1)
      .map(_.split(","))
      .find(_(1).toInt > 0)
    assert(epoch0.exists(_(1).toInt == 100),
      s"replay epoch should see all 100 backlog messages, got ${epoch0.map(_.mkString(","))}")
  }

  test("exact backlogRows override cycles to the requested replay size") {
    val dir = Files.createTempDirectory("ab_bench_rows")
    val batches = (0 until 4)
      .map(i => FeedbackGenerator.batch("random", i * 10, 10))
    // 95 is NOT a multiple of the 40-row increment stream — the cycle
    // must truncate, and epoch 0 must see exactly 95 rows
    val r = ModesBenchmark.run(spark, batches, dir, backlogRows = 95)
    val linesB = Files.readAllLines(dir.resolve("metrics_update_earliest.csv"))
    val epoch0 = scala.jdk.CollectionConverters
      .ListHasAsScala(linesB).asScala.drop(1)
      .map(_.split(","))
      .find(_(1).toInt > 0)
    assert(epoch0.exists(_(1).toInt == 95),
      s"replay epoch should see exactly 95 rows, got ${epoch0.map(_.mkString(","))}")
    assert(r.epoch0ReplayMs > 0, "epoch-0 replay duration must be reported")
  }
}

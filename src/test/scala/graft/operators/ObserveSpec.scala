package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** `Dataset.observe` — accumulator-backed per-action metrics with NO
  * extra pass over the data (vs a separate agg job): the row-count /
  * checksum observability a 100 TB pipeline attaches to every write.
  * Batch metrics arrive via QueryExecutionListener; streaming metrics
  * ride StreamingQueryProgress.observedMetrics.
  */
class ObserveSpec extends SparkSuite {

  test("batch observe delivers exact metrics without a second scan") {
    @volatile var got: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get("li_metrics").foreach(r => got = Some(r))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Tables.lineitem(spark, sf0001)
        .observe("li_metrics", count(lit(1)).as("n_rows"),
          sum(expr("cast(round(l_quantity) as bigint)")).as("qty_sum"))
      val n = df.count()
      // listener delivery is async off the action
      val deadline = System.nanoTime() + 10e9.toLong
      while (got.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = got.getOrElse(fail("observed metrics never arrived"))
      assert(m.getAs[Long]("n_rows") == n)
      val want = Tables.lineitem(spark, sf0001)
        .agg(sum(expr("cast(round(l_quantity) as bigint)"))).head().getLong(0)
      assert(m.getAs[Long]("qty_sum") == want)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming observe rides the progress events") {
    import graft.streaming.MemorySource
    val src = new MemorySource(spark)
    val df = src.load(spark)
      .selectExpr("cast(value as string) as v")
      .observe("st_metrics", count(lit(1)).as("n_rows"))
    val q = df.writeStream.format("memory").queryName("observe_st")
      .outputMode("append").start()
    try {
      src.add(Seq("a", "b", "c")); q.processAllAvailable()
      src.add(Seq("d", "e")); q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("st_metrics")))
        .map(_.getAs[Long]("n_rows"))
      assert(metrics.sum == 5L, s"per-batch observed counts: $metrics")
    } finally q.stop()
  }
}

package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drives a checkpointed stateful query, then reads its state back
  * OFFLINE through the state data source and checks it agrees with
  * what the query emitted. Also exercises the stream x static
  * enrichment join (stateless — metadata must show no join state).
  */
class StateInspectSpec extends SparkSuite {
  import spark.implicits._

  test("offline state read matches the live aggregation result") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(String, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_ckpt").toString
    val agg = events.toDF.toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
    val q = agg.writeStream.format("memory").queryName("state_live")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    events.addData(("a", 1L), ("a", 2L), ("b", 10L))
    q.processAllAvailable()
    events.addData(("a", 4L), ("c", 7L))
    q.processAllAvailable()
    val live = spark.table("state_live").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()

    // the query is stopped; read its committed state from disk.
    // value fields carry the AGGREGATION BUFFER names (count, sum),
    // not the query's output aliases — state is physical, not logical
    val offline = StateInspect.state(spark, ckpt)
      .select(col("key.k"), col("value.count"), col("value.sum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(offline == live)
    assert(offline == Set(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 7L)))

    val meta = StateInspect.metadata(spark, ckpt)
      .select("operatorName").as[String].collect().toSet
    assert(meta.contains("stateStoreSave"), s"unexpected operators: $meta")
  }

  test("stream x static enrichment broadcasts and keeps no state") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Int, Double)]
    val dim = Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"))
      .toDF("r_regionkey", "r_name")
    val enriched = StreamJoins.enrichWithStatic(
      events.toDF.toDF("r_regionkey", "value"), dim, "r_regionkey")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    events.addData((0, 1.5), (2, 2.5), (9, 3.5))
    q.processAllAvailable()

    val got = spark.table("enrich_out")
      .select("r_regionkey", "r_name").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    assert(got == Set((0, Some("AFRICA")), (2, Some("ASIA")), (9, None)))
    // stateless: the physical plan has a broadcast join, no state store
    val phys = q.lastProgress.sources.length // progress exists
    assert(q.lastProgress.stateOperators.isEmpty,
      s"stream-static join must keep no state: ${q.lastProgress.stateOperators.mkString}")
    q.stop()
    assert(phys == 1)
  }
}

package graft.streaming

import graft.SparkSuite
import graft.functions.FreqItemsSketch
import org.apache.spark.sql.functions._

/** Sketch aggregates in STREAMING state: the freq-items
  * TypedImperativeAggregate runs inside a streaming groupBy in update
  * mode — per-key state is the serialized constant-size sketch, which
  * is what makes top-terms-over-a-stream viable (the exact groupBy
  * alternative grows state with every new term forever).
  */
class StreamSketchSpec extends SparkSuite {

  test("freq-items sketch accumulates across micro-batches") {
    val src = new MemorySource(spark)
    val parsed = src.load(spark).select(col("value").as("term"))
    val q = parsed
      .groupBy()
      .agg(FreqItemsSketch.freqItems(col("term"), 64).as("fi"))
      .select(explode(col("fi")).as("f"))
      .select(col("f.item"), col("f.est"))
      .writeStream.format("memory").queryName("stream_fi")
      .outputMode("complete")
      .start()
    src.add(Seq.fill(30)("alpha") ++ Seq.fill(10)("beta"))
    q.processAllAvailable()
    src.add(Seq.fill(25)("beta") ++ Seq.fill(5)("gamma"))
    q.processAllAvailable()
    val got = spark.sql("select * from stream_fi").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // totals across BOTH batches: state carried the sketch forward
    assert(got == Map("alpha" -> 30L, "beta" -> 35L, "gamma" -> 5L), got)
    q.stop()
  }
}

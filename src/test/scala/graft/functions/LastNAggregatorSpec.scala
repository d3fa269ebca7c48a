package graft.functions

import graft.SparkSuite
import graft.streaming.MemorySource
import org.apache.spark.sql.functions._

class LastNAggregatorSpec extends SparkSuite {
  import spark.implicits._

  test("batch aggregate keeps latest N deduplicated points") {
    val agg = new LastNAggregator(5)
    val pts = Seq((3L, 0.3), (1L, 0.1), (9L, 0.9), (9L, 0.9), (2L, 0.2),
      (7L, 0.7), (8L, 0.8), (5L, 0.5), (6L, 0.6))
    val got = pts.toDS().select(agg.toColumn).head()
    assert(got == Seq((5L, 0.5), (6L, 0.6), (7L, 0.7), (8L, 0.8), (9L, 0.9)))
  }

  test("merge across partitions is bounded and correct") {
    val agg = new LastNAggregator(3)
    val got = (1L to 1000L).map(i => (i, i * 0.5)).toDS()
      .repartition(8)
      .select(agg.toColumn)
      .head()
    assert(got == Seq((998L, 499.0), (999L, 499.5), (1000L, 500.0)))
  }

  test("SQL UDAF registration via functions.udaf") {
    spark.udf.register("last_n", udaf(new LastNAggregator(2)))
    Seq((1L, 1.0), (4L, 4.0), (3L, 3.0)).toDF("ts", "value")
      .createOrReplaceTempView("pts")
    // tuple-input aggregator surfaces as a 2-argument SQL function
    val got = spark
      .sql("select last_n(ts, value) from pts").head()
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((3L, 3.0), (4L, 4.0)))
  }

  test("streaming update-mode last-N matches complete-mode result") {
    val agg = new LastNAggregator(200)
    val src = new MemorySource(spark)
    val parsed = graft.streaming.DemoStream.parse(src.load(spark))
      .as[(Long, Double)]
    val q = parsed.select(agg.toColumn.name("points"))
      .writeStream.format("memory").queryName("lastn_agg")
      .outputMode("complete").start()
    src.add((0 until 150).map(i => s"""{"ts": $i, "value": ${i * 0.5}}"""))
    q.processAllAvailable()
    src.add((150 until 250).map(i => s"""{"ts": $i, "value": ${i * 0.5}}"""))
    q.processAllAvailable()
    q.stop()
    val pts = spark.sql("select points from lastn_agg").head()
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]](0)
    assert(pts.size == 200)
    assert(pts.head.getLong(0) == 50 && pts.last.getLong(0) == 249)
  }
}

package graft.graph

import graft.SparkSuite

/** Regression spec for the r15 advice item on the shared item-graph
  * prelude: `cappedInteractions` parses the event item id as LONG (so
  * the O(cap) BottomKDistinct aggregate sees exact keys) and casts back
  * to int at the end. An out-of-int-range id must be DROPPED — exactly
  * what the previous string→int cast did (null) and what the SQL
  * oracles' window formulation does — not survive the bottom-k and
  * silently wrap in the final long→int cast.
  */
class CappedIntRangeSpec extends SparkSuite {

  test("out-of-int-range item ids are dropped, not wrapped") {
    import spark.implicits._
    val big = 5000000000L // > Int.MaxValue; wraps to 705032704 as int
    val wrapped = big.toInt
    val rows = Seq(
      // (event_id, user_id, item)
      (1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, big),
      (4L, 2L, 10L), (5L, 2L, 20L),
      (6L, 3L, 10L), (7L, 3L, big))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_intrange").toString
    rows.toDF("event_id", "user_id", "item")
      .selectExpr("event_id",
        "timestamp_micros(1700000000000000 + event_id) as ts",
        "user_id", "'view' as event_type", "1.0d as value",
        "concat('{\"k\": \"', item, '\"}') as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = GraphOps.graphItemCooccur(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .toSeq

    // the wrapped alias must never appear on either side of an edge
    assert(!got.exists(t => t._1 == wrapped || t._2 == wrapped),
      s"out-of-range id wrapped to $wrapped and leaked into the graph")
    // with big dropped, the only pair is (10, 20) from users 1 and 2
    assert(got.toSet == Set((10, 20, 2L), (20, 10, 2L)))
  }
}

package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for ev_sliding_distinct: the explode-into-buckets
  * plan must agree with a brute-force per-window recount on the driver.
  */
class SlidingDistinctSpec extends SparkSuite {

  test("each 3h window counts exactly the distinct users it covers") {
    val events = Tables.events(spark, sf0001)
      .select(expr("unix_micros(ts) div 3600000000").as("h"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = EventWindows.slidingDistinct(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val windows = events.map(_._1).flatMap(h => Seq(h - 2, h - 1, h)).distinct
    assert(got.keySet == windows.toSet, "window-start set mismatch")
    windows.foreach { w =>
      val covered = events.filter { case (h, _) => h >= w && h <= w + 2 }
      assert(got(w) == ((covered.map(_._2).distinct.length.toLong,
        covered.length.toLong)), s"window $w")
    }
    // the sliding factor is exact: every event lands in 3 windows
    assert(got.values.map(_._2).sum == 3L * events.length)
  }
}

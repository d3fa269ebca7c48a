package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential + conservation checks for ev_attribution. */
class AttributionSpec extends SparkSuite {

  test("credits match a brute path recount and always sum to 1") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val winUs = 24L * 3600L * 1000000L
    val byUser = ev.groupBy(_._2)

    val want = ev.filter(_._4 == "purchase").flatMap { p =>
      val path = byUser(p._2)
        .filter(c => c._4 == "click" && c._3 < p._3 && c._3 >= p._3 - winUs)
        .sortBy(c => (c._3, c._1))
      val k = path.length
      path.zipWithIndex.map { case (c, i) =>
        val num =
          if (k == 1) k + 2
          else if (i == 0 || i == k - 1) 2
          else 1
        (p._1, c._1) -> (i + 1, k, num, k + 2)
      }
    }.toMap

    val got = EventWindows.attribution(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    assert(got == want, s"${(want.toSet -- got.toSet).take(3)} missing; " +
      s"${(got.toSet -- want.toSet).take(3)} spurious")
    assert(want.nonEmpty, "degenerate fixture: no attribution paths")

    // conservation: per purchase, sum(num) == den — full credit, no
    // leakage, regardless of path length
    got.groupBy(_._1._1).foreach { case (pid, rows) =>
      val den = rows.values.head._4
      assert(rows.values.map(_._3).sum == den, s"credit leak at $pid")
    }
  }
}

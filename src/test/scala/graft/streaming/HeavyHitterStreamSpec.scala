package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Space-saving heavy-hitter monitor: exactness under capacity,
  * coverage + error bounds over capacity.
  */
class HeavyHitterStreamSpec extends SparkSuite {

  private def parsed(src: MemorySource) =
    src.load(spark)
      .select(from_json(col("value").cast("string"),
        StructType.fromDDL("event_type string, user_id long")).as("j"))
      .select("j.*")

  private def run(name: String, batches: Seq[Seq[String]],
      capacity: Int, k: Int): Unit = {
    val src = new MemorySource(spark)
    val q = HeavyHitterStream.heavyHitters(parsed(src), capacity, k)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => src.add(b); q.processAllAvailable() }
    finally q.stop()
  }

  test("under capacity: top-k equals the exact batch recount") {
    val evs = Tables.events(spark, sf0001)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nUsers = evs.map(_._2).distinct.length
    run("hh_exact", evs.toSeq.map(e =>
        s"""{"event_type": "${e._1}", "user_id": ${e._2}}""")
      .grouped(evs.length / 3 + 1).toSeq, capacity = nUsers + 1, k = 5)

    val latest = spark.sql(
      """SELECT * FROM hh_exact h
        |WHERE seq = (SELECT max(seq) FROM hh_exact x
        |             WHERE x.event_type = h.event_type)""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(latest.nonEmpty)
    val exact = evs.groupBy(identity).map { case ((t, u), v) =>
      (t, u) -> v.length.toLong }
    latest.foreach { case (t, rank, uid, cnt, err) =>
      assert(err == 0L, s"nonzero err under capacity at ($t,$uid)")
      assert(cnt == exact((t, uid)), s"count at ($t,$uid)")
      val want = exact.collect { case ((tt, u), c) if tt == t => (u, c) }
        .toSeq.sortBy { case (u, c) => (-c, u) }
      assert(want(rank - 1)._1 == uid, s"rank $rank of $t")
    }
  }

  test("over capacity: every key above n/capacity survives, errs bounded") {
    // skewed synthetic: user 1 hits 300x, user 2 150x, 200 onesies
    val evs = Seq.fill(300)(1L) ++ Seq.fill(150)(2L) ++
      (100L until 300L)
    val shuffled = new scala.util.Random(7).shuffle(evs)
    run("hh_over", shuffled.map(u =>
        s"""{"event_type": "t", "user_id": $u}""")
      .grouped(120).toSeq, capacity = 16, k = 5)

    val latest = spark.sql(
      """SELECT * FROM hh_over
        |WHERE seq = (SELECT max(seq) FROM hh_over)
        |ORDER BY rank""".stripMargin)
      .collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = evs.length.toLong
    val tracked = latest.map(_._1).toSet
    // space-saving guarantee: true count > n/m is always tracked
    assert(tracked.contains(1L) && tracked.contains(2L),
      s"heavy keys lost: $tracked")
    latest.foreach { case (uid, cnt, err, nTotal) =>
      assert(nTotal == n)
      val truth = evs.count(_ == uid).toLong
      assert(cnt >= truth, s"sketch undercounts $uid")
      assert(cnt - err <= truth, s"err bound violated for $uid")
      assert(err <= n / 16, s"err above n/m for $uid")
    }
    // the two real heavy hitters rank 1 and 2
    assert(latest.take(2).map(_._1).toSeq == Seq(1L, 2L))
  }
}

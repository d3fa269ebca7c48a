package graft

import org.apache.spark.sql.functions._

/** Third differential batch: session construction and the chunk-plan
  * arithmetic (byte-range and sliding-token manifests) re-derived on
  * the driver. For sessionize, the session STRUCTURE (boundaries,
  * counts, extents) compares exactly; the float `sum_value` compares
  * within 1 cent (double addition order differs between a distributed
  * agg and a sequential fold — the rounded column is presentational).
  */
class AlgorithmicDifferentialSpec3 extends SparkSuite {

  test("ev_sessionize equals a driver gap-scan session build") {
    val evs = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_id", "user_id", "unix_micros(ts) as ts_us",
        "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val gapUs = 30L * 60L * 1000000L
    val want = evs.groupBy(_._2).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      var sid = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { r =>
        if (prev == Long.MinValue || r._3 - prev > gapUs) sid += 1
        prev = r._3
        (sid, r)
      }
      tagged.groupBy(_._1).map { case (s, rs) =>
        val ts = rs.map(_._2._3)
        (uid, s) -> ((ts.min, ts.max, rs.size.toLong,
          rs.map(_._2._4).sum))
      }
    }
    val got = graft.streaming.EventWindows.sessionize(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == want.keySet,
      s"session sets differ: ${(want.keySet -- got.keySet).take(3)} / " +
        s"${(got.keySet -- want.keySet).take(3)}")
    want.foreach { case (k, (s, e, n, sum)) =>
      val (gs, ge, gn, gsum) = got(k)
      assert(gs == s && ge == e && gn == n, s"session $k structure")
      assert(math.abs(gsum - sum) <= 0.011, s"session $k sum $gsum vs $sum")
    }
  }

  test("mm_chunk_ranges equals a driver byte-range plan") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cb = 100L
    val want = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8").length.toLong
      if (bytes == 0) Seq.empty
      else (0L to (bytes - 1) / cb).map { i =>
        (id, i, i * cb, math.min(cb, bytes - i * cb))
      }
    }.toSet
    val got = graft.multimodal.MultimodalOps.mmChunkRanges(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("pipe_chunk_sliding equals a driver stride plan") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val c = 32L; val s = 24L
    val want = docs.flatMap { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val chunks = 1L + (math.max(n - c, 0L) + s - 1) / s
      (0L until chunks).map { k =>
        val st = k * s
        val en = math.min(st + c, n)
        (id, n, k, st, en, en - st)
      }
    }.toSet
    val got = graft.pipeline.PipelineOps.chunkSliding(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
  }
}

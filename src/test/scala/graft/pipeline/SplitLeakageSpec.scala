package graft.pipeline

import graft.SparkSuite

/** Differential test for [[PipelineOps.splitLeakage]]: recompute the
  * cross-split 5-gram contamination report in plain driver-side Scala
  * from the raw fixture — split assignment (md5 4-hex thresholds),
  * per-doc distinct shingles, per-split presence sets, pairwise
  * intersections and the ppm share — and compare row-for-row.
  */
class SplitLeakageSpec extends SparkSuite {

  test("pipe_split_leakage matches a driver recompute at sf0.001") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = md.synchronized {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySplit = docs
      .map { case (id, text) =>
        val h = md5hex(s"split42:$id").substring(0, 4)
        val split =
          if (h < f"${58982}%04x") "train"
          else if (h < f"${62259}%04x") "val"
          else "test"
        val tk = text.split(" ", -1)
        val sh =
          if (tk.length < 5) Set.empty[String]
          else (0 to tk.length - 5)
            .map(i => tk.slice(i, i + 5).mkString(" ")).toSet
        (split, sh)
      }
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).reduce(_ ++ _) }
    val expected = bySplit.keys.toSeq.sorted.combinations(2).toSeq
      .map { case Seq(a, b) =>
        val shared = (bySplit(a) & bySplit(b)).size.toLong
        val nb = bySplit(b).size.toLong
        (a, b, shared, bySplit(a).size.toLong, nb,
          (shared * 1000000L + nb / 2) / nb)
      }
      .filter(_._3 > 0)
      .sortBy(t => (t._1, t._2))

    val got = PipelineOps.splitLeakage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

    assert(got == expected)
    assert(got.nonEmpty, "fixture must have cross-split shared 5-grams")
    // the split rule must produce all three splits on the fixture
    assert(bySplit.keySet == Set("train", "val", "test"))
  }
}

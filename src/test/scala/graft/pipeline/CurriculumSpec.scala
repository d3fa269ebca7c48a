package graft.pipeline

import graft.SparkSuite

/** Checks for pipe_curriculum: quartile stages, and the two-level
  * (stage, md5-bucket) rank reconstruction must equal the plain
  * single-window ordering re-derived on the driver.
  */
class CurriculumSpec extends SparkSuite {

  test("stages quarter the corpus and stage_pos is the md5 permutation") {
    val rows = PipelineOps.curriculum(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byStage = rows.groupBy(_._3)
    assert(byStage.keySet.subsetOf(Set(0, 1, 2, 3)) && byStage.size >= 2)
    // stages are difficulty-ordered: every stage-k token count <= every
    // stage-(k+1) minimum is too strict at ties, but maxima must be
    // monotone across stage boundaries by construction of the cut points
    val maxTok = byStage.view.mapValues(_.map(_._2).max).toMap
    maxTok.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(maxTok(a) <= maxTok(b), s"stages $a,$b")
      case _ =>
    }
    byStage.foreach { case (stage, members) =>
      // stage_pos is a 0..size-1 permutation...
      assert(members.map(_._4).sorted.toSeq == (0L until members.length),
        s"stage $stage positions")
      // ...in exactly md5('cur42:' || doc_id) order
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = members.map(_._1).sortBy(id => (md5hex(s"cur42:$id"), id))
      val got = members.sortBy(_._4).map(_._1)
      assert(got.toSeq == expected.toSeq, s"stage $stage order")
    }
  }
}

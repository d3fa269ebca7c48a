package graft.sim

import graft.SparkSuite

/** Checks for [[SimilarityOps.annFilteredTopK]]: every result row's
  * neighbor must share the query's label (the filter is a hard
  * predicate, not a preference), ranks are dense with descending
  * cosines, and the result equals the plain brute-force ranking
  * recomputed over only same-label candidates on the driver.
  */
class FilteredTopKSpec extends SparkSuite {

  test("filtered top-k = brute force over the label-filtered candidates") {
    val rows = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rows.filter(_._1 < 20).sortBy(_._1).flatMap {
      case (qid, qlabel, qv) =>
        rows.filter(r => r._1 != qid && r._2 == qlabel)
          .map(r => (r._1, cos(qv, r._3)))
          .sortBy { case (nid, c) => (-c, nid) }
          .take(5).zipWithIndex
          .map { case ((nid, c), i) => (qid, qlabel, nid, i + 1, c) }
    }.toSeq
    val got = SimilarityOps.annFilteredTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    val labels = rows.map(r => r._1 -> r._2).toMap
    got.foreach { case (qid, ql, nid, _, _) =>
      assert(labels(nid) == ql && labels(qid) == ql,
        s"neighbor $nid of $qid crosses the label filter")
    }
  }
}

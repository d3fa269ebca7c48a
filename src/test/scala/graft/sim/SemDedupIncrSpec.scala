package graft.sim

import graft.SparkSuite
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Tests for [[SimilarityOps.embSemDedupIncr]] — incremental
  * cross-snapshot semantic dedup. Two pins:
  *
  *  1. a full driver recompute at sf0.001 sharing no Spark code with
  *     the operator (md5 snapshot split, integer-grid assignment,
  *     delta-vs-base + ordered delta-vs-delta greedy drop);
  *  2. tile-size invariance — the bipartite block tiling must not
  *     change the pair set, so blockSize 4 and 16 yield identical
  *     results (the same invariance SemDedupSpec pins for the
  *     self-join tiling).
  */
class SemDedupIncrSpec extends SparkSuite {

  private val K = 16
  private val Tau = 0.3

  private def round4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("emb_semdedup_incr matches an independent driver recompute") {
    val vecs: Array[(Long, Array[Double])] =
      graft.core.Tables.embeddings(spark, sf0001)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)

    def quant(v: Array[Double]): Array[Long] =
      v.map(x => math.floor(x * 10000.0 + 0.5).toLong)
    val cents = vecs.filter(_._1 < K).map { case (id, v) => (id, quant(v)) }
    val cluster: Map[Long, Long] = vecs.map { case (id, v) =>
      val q = quant(v)
      id -> cents.map { case (cid, cv) =>
        var d = 0L; var i = 0
        while (i < q.length) { val t = q(i) - cv(i); d += t * t; i += 1 }
        (d, cid)
      }.min._2
    }.toMap
    def isDelta(id: Long): Boolean = md5Hex(s"snap42:$id").head >= 'c'
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    val expected = vecs.filter(t => isDelta(t._1)).map { case (id, v) =>
      def matches(p: (Long, Array[Double])): Boolean =
        cluster(p._1) == cluster(id) && round4(cos(p._2, v)) >= Tau
      val fromBase = vecs.filter(o => !isDelta(o._1) && matches(o))
        .map(_._1).sorted.headOption
      val fromDelta = vecs.filter(o =>
        isDelta(o._1) && o._1 < id && matches(o))
        .map(_._1).sorted.headOption
      val dupOf = (fromBase.toSeq ++ fromDelta.toSeq).sorted.headOption
      (id, cluster(id), fromBase, fromDelta, dupOf, dupOf.isEmpty)
    }.toSeq

    val got = SimilarityOps.embSemDedupIncr(spark, sf0001).collect()
      .map { r =>
        def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), r.getLong(1), optL(2), optL(3), optL(4),
          r.getBoolean(5))
      }.toSeq

    assert(got == expected)
    // the fixture must exercise all three outcomes or the test is
    // vacuous: base-dominated drops, delta-dominated drops, keeps
    assert(expected.exists(_._3.nonEmpty), "no delta-vs-base duplicate")
    assert(expected.exists(r => r._4.nonEmpty), "no delta-vs-delta duplicate")
    assert(expected.exists(_._6), "nothing kept")
    // only delta rows appear; base is immutable by construction
    assert(got.map(_._1).forall(isDelta))
  }

  test("bipartite tiling is invariant in blockSize") {
    def run(bs: Int) =
      SimilarityOps.embSemDedupIncr(spark, sf0001, blockSize = bs)
        .collect().map(_.toSeq).toSeq
    assert(run(4) == run(16))
  }
}

package graft.text

import graft.SparkSuite
import graft.core.Tables

/** Differential check for text_dsir_weight: the full importance-weight
  * computation re-derived on the driver (md5 bucketing, add-one
  * smoothed µnat log-ratios, occurrence sums) must match the
  * distributed result EXACTLY — every step is integer arithmetic by
  * design, so there is no tolerance.
  */
class TextDsirSpec extends SparkSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dsir weights match a driver-side recomputation exactly") {
    val B = 1024
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    def buckets(text: String): Seq[Int] = {
      val tk = text.split(" ", -1)
      tk.iterator.zip(tk.iterator.drop(1)).map { case (a, b) =>
        (java.lang.Long.parseLong(md5hex(s"$a $b").substring(0, 15), 16)
          % B).toInt
      }.toSeq
    }
    val perDoc = docs.collect {
      case (id, src, text) if text.split(" ", -1).length >= 2 =>
        (id, src, buckets(text))
    }
    val sc = perDoc.flatMap(_._3).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val tc = perDoc.filter(d => Set("src1", "src2", "src3")(d._2))
      .flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tsTot, ttTot) = (sc.values.sum, tc.values.sum)
    def mu(x: Double): Long = math.round(math.log(x) * 1e6)
    val lr: Map[Int, Long] = sc.map { case (b, s) =>
      b -> ((mu(tc.getOrElse(b, 0L) + 1.0) - mu(ttTot + B.toDouble))
        - (mu(s + 1.0) - mu(tsTot + B.toDouble)))
    }
    val expect = perDoc.map { case (id, _, bs) =>
      id -> (bs.length.toLong, bs.map(lr).sum)
    }.toMap

    val got = TextOps.textDsirWeight(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (id, (n, s, sel)) =>
      val (en, es) = expect(id)
      assert(n == en && s == es, s"mismatch at doc $id")
      assert(sel == (s > 0L))
    }
    // the target slice must skew positive relative to the rest —
    // otherwise the weighting carries no signal on this corpus
    val selRate = got.values.count(_._3).toDouble / got.size
    assert(selRate > 0.0 && selRate < 1.0, s"degenerate selection $selRate")
  }
}

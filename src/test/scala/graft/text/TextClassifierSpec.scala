package graft.text

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions.col

/** Differential check for text_domain_classifier: the distributed
  * Naive-Bayes training must equal an INDEPENDENT driver
  * recomputation (java.security MD5, plain-Scala counts and logs —
  * no Spark expressions), because the DuckDB oracle replays the same
  * algorithm and would pass on a shared algorithmic bug. Also pins
  * the exact confusion counts: the classifier must actually beat the
  * base rate, not just run.
  */
class TextClassifierSpec extends SparkSuite {

  private val stop =
    Set("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private val D = 64

  private def md5Bucket(t: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % D).toInt
  }

  test("NB classifier equals an independent driver recomputation") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    // independent feature/label build
    val rows = docs.map { case (id, text) =>
      val tk = text.split(" ", -1)
      val n = tk.length.toLong
      val sh = tk.count(stop.contains).toLong
      val y = if ((sh * 10000L + n / 2) / n >= 600) 1 else 0
      (id, y, tk.map(md5Bucket))
    }

    // independent NB training (same smoothing, same snap)
    def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val t = Array.ofDim[Long](2, D)
    val nd = new Array[Long](2)
    rows.foreach { case (_, y, hs) =>
      nd(y) += 1
      hs.foreach(j => t(y)(j) += 1)
    }
    val t1 = t(1).sum; val t0 = t(0).sum
    val llr = Array.tabulate(D)(j => snap(
      ((math.log(t(1)(j) + 1.0) - math.log(t1 + D.toDouble))
        - math.log(t(0)(j) + 1.0)) + math.log(t0 + D.toDouble)))
    val prior = snap(math.log(nd(1) + 1.0) - math.log(nd(0) + 1.0))
    // token-order fold, like the operator (and its SQL replay)
    val want = rows.map { case (id, y, hs) =>
      var m = 0.0
      hs.foreach(j => m += llr(j))
      m = prior + m
      (id, y, math.floor(m * 1e4 + 0.5) / 1e4, m >= 0)
    }

    val got = TextOps.textDomainClassifier(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))

    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._4 == w._4, s"$g vs $w")
      assert(math.abs(g._3 - w._3) < 1e-9, s"margin at ${g._1}: $g vs $w")
    }

    // pinned confusion counts on sf0.001 (500 docs, base rate 280/500):
    // the learned gate must BEAT predicting the majority class
    val tp = got.count(r => r._4 && r._2 == 1)
    val tn = got.count(r => !r._4 && r._2 == 0)
    val acc = tp + tn
    info(s"confusion: tp=$tp tn=$tn acc=$acc/500")
    assert(acc == 402, s"accuracy $acc/500 != pinned 402 (base rate 280)")
  }
}

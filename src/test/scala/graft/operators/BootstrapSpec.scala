package graft.operators

import graft.SparkSuite
import graft.core.Tables

/** Checks for stat_bootstrap_ci: the Poisson-bootstrap replicate means
  * must be deterministic, statistically centered on the true mean, and
  * each replicate must equal a driver re-derivation of the same
  * integer-hash weights.
  */
class BootstrapSpec extends SparkSuite {

  private def collect() =
    StatsOps.statBootstrapCi(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("replicates re-derive exactly from the (doc_id, r) hash weights") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = collect()
    assert(got.length == 100 && got.map(_._1).toSeq == (0L until 100L))
    got.foreach { case (r, nEff, meanE4) =>
      val ws = docs.map { case (id, x) =>
        val h = (id * 2654435761L + r * 40503L) % 1000L
        val w = if (h < 368) 0L else if (h < 736) 1L else if (h < 920) 2L else 3L
        (w, w * x)
      }
      val (sw, swx) = (ws.map(_._1).sum, ws.map(_._2).sum)
      assert(nEff == sw, s"n_eff at replicate $r")
      assert(meanE4 == (swx * 10000L + sw / 2) / sw, s"mean at replicate $r")
    }
  }

  test("distribution is centered on the true mean and is deterministic") {
    val docs = Tables.documents(spark, sf0001)
      .select("n_chars").collect().map(_.getLong(0))
    val trueMeanE4 = docs.sum * 10000L / docs.length
    val got = collect()
    val means = got.map(_._3)
    val center = means.sum / means.length
    // bootstrap means scatter ~ sd/sqrt(n) around the sample mean: the
    // ensemble center must sit well within 5% of it
    assert(math.abs(center - trueMeanE4).toDouble / trueMeanE4 < 0.05,
      s"center $center vs true $trueMeanE4")
    assert(means.distinct.length > 1, "degenerate: all replicates equal")
    assert(collect().toSeq == got.toSeq, "non-deterministic")
  }
}

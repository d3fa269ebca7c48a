package graft.text

import graft.SparkSuite

/** Differential for [[TextOps.textDriftPsi]]: rebin the corpus
  * driver-side (token-count bins, base=src0 vs candidate populations,
  * add-one smoothing, per-value µnat log rounding) and compare every
  * bin's PSI contribution exactly.
  */
class TextDriftPsiSpec extends SparkSuite {

  private def bin(n: Int): Int =
    if (n < 50) 0 else if (n < 100) 1 else if (n < 150) 2
    else if (n < 200) 3 else if (n < 300) 4 else 5

  test("PSI contributions match an exact-integer driver recompute") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length))

    val baseC = Array.fill(6)(0L)
    val candC = Array.fill(6)(0L)
    docs.foreach { case (src, n) =>
      val b = bin(n)
      if (src == "src0") baseC(b) += 1 else candC(b) += 1
    }
    val (tb, tc) = (baseC.sum, candC.sum)
    def lnE6(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val expected = (0 until 6).map { b =>
      val pb = math.max(((baseC(b) + 1) * 1000000L) / (tb + 6), 1L)
      val qc = math.max(((candC(b) + 1) * 1000000L) / (tc + 6), 1L)
      (b, baseC(b), candC(b), (pb - qc) * (lnE6(pb) - lnE6(qc)) / 1000000L)
    }

    val got = TextOps.textDriftPsi(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // PSI terms are nonnegative by construction (monotone log); the
    // fixture must put mass in several bins on both sides
    assert(got.forall(_._4 >= 0))
    assert(got.count(r => r._2 > 0 && r._3 > 0) >= 2,
      "fixture degenerate: fewer than 2 shared-mass bins")
  }
}

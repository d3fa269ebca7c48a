package graft.operators

import graft.SparkSuite

/** Differential test for [[StatsOps.statMutualInfo]]: recompute the
  * (lang, source) entropies and MI in plain driver-side Scala from raw
  * counts and compare, plus pin the information-theoretic invariants
  * (0 ≤ MI ≤ min(H_lang, H_source), H_joint ≤ H_lang + H_source,
  * NMI ∈ [0, 1]).
  */
class MutualInfoSpec extends SparkSuite {

  test("stat_mutual_info matches a driver recompute") {
    val pairs = graft.core.Tables.documents(spark, sf0001)
      .select("lang", "source").collect()
      .map(r => (Option(r.getString(0)).getOrElse("__null__"),
        Option(r.getString(1)).getOrElse("__null__")))

    val n = pairs.length.toDouble
    def entropy[K](groups: Map[K, Long]): Double =
      math.log(n) - groups.values.map(c =>
        c.toDouble * math.log(c.toDouble)).sum / n
    val hj = entropy(pairs.groupBy(identity).view
      .mapValues(_.length.toLong).toMap)
    val hl = entropy(pairs.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap)
    val hs = entropy(pairs.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap)
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val row = StatsOps.statMutualInfo(spark, sf0001).collect().head
    assert(row.getLong(0) == pairs.length.toLong)
    assert(math.abs(row.getDouble(1) - hl) < 1e-6, "h_lang")
    assert(math.abs(row.getDouble(2) - hs) < 1e-6, "h_source")
    assert(math.abs(row.getDouble(3) - hj) < 1e-6, "h_joint")
    assert(math.abs(row.getDouble(4) - rnd6(hl + hs - hj)) < 1e-6, "mi")
    assert(math.abs(row.getDouble(5)
      - rnd6((hl + hs - hj) / math.sqrt(hl * hs))) < 1e-6, "nmi")

    // invariants
    val (miv, nmiv) = (row.getDouble(4), row.getDouble(5))
    assert(miv >= -1e-6 && miv <= math.min(hl, hs) + 1e-6)
    assert(row.getDouble(3) <= hl + hs + 1e-6)
    assert(nmiv >= -1e-6 && nmiv <= 1.0 + 1e-6)
  }
}

package graft.operators

import graft.SparkSuite

/** Differential test for [[StatsOps.statCalibration]]: recompute the
  * reliability diagram and ECE in plain driver-side Scala from the raw
  * fixture — e4 quantization, min-max normalization, equal-width
  * binning with the top-bin clamp, truncating means, half-up positive
  * rate — and compare row-for-row.
  */
class CalibrationSpec extends SparkSuite {

  test("stat_calibration matches a driver recompute at sf0.001") {
    val rows = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("cast(element_at(embedding, 1) as double) as x", "label")
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val qy = rows.map { case (x, l) =>
      (math.floor(x * 10000d + 0.5d).toLong, if (l == 0) 1L else 0L)
    }
    val qmin = qy.map(_._1).min
    val qmax = qy.map(_._1).max
    val span = math.max(qmax - qmin, 1L)
    val binned = qy.map { case (q, y) =>
      val p = (q - qmin) * 1000000L / span
      (math.min(p * 10 / 1000000L, 9L).toInt, p, y)
    }
    val census = binned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, xs) =>
        val n = xs.size.toLong
        val nPos = xs.map(_._3).sum
        val conf = xs.map(_._2).sum / n
        val acc = (nPos * 1000000L + n / 2) / n
        (bin, n, nPos, conf, acc, math.abs(conf - acc))
    }
    val ece = census.map(c => c._6 * c._2).sum /
      census.map(_._2).sum
    val expected = census.map(c =>
      (c._1, c._2, c._3, c._4, c._5, c._6, ece))

    val got = StatsOps.statCalibration(spark, sf0001).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

    assert(got == expected)
    assert(got.nonEmpty && got.map(_._2).sum == rows.length)
    // the fixture must spread over several bins for the curve to mean
    // anything
    assert(got.size >= 5, s"only ${got.size} bins populated")
  }
}

package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for ev_gapfill: the spine/forward-fill plan must
  * agree with a driver-side re-derivation from the raw events.
  */
class GapFillSpec extends SparkSuite {

  test("dense spine, zero-filled counts, LOCF sums") {
    val raw = Tables.events(spark, sf0001)
      .select(expr("unix_micros(ts) div 3600000000").as("h"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

    val hourly = raw.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      k -> (es.length.toLong,
        BigDecimal(es.map(_._3).sum).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val hLo = raw.map(_._1).min
    val hHi = raw.map(_._1).max
    val types = raw.map(_._2).distinct.sorted

    val got = EventWindows.gapFill(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getDouble(4))).toMap

    // spine is exactly hours x types, dense
    assert(got.size == types.length * (hHi - hLo + 1).toInt)
    types.foreach { t =>
      var lastSum = 0.0
      (hLo to hHi).foreach { h =>
        val (n, isGap, filled) = got((t, h))
        hourly.get((h, t)) match {
          case Some((en, es)) =>
            assert(n == en && isGap == 0, s"($t,$h) observed cell")
            lastSum = es
          case None =>
            assert(n == 0L && isGap == 1, s"($t,$h) gap cell")
        }
        assert(math.abs(filled - lastSum) < 1e-9,
          s"($t,$h) LOCF: got $filled want $lastSum")
      }
    }
    // zero-filling preserves the event total
    assert(got.values.map(_._1).sum == raw.length.toLong)
  }
}

package graft.streaming

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative contract for the exact-integer Holt-Winters recursion
  * (r15 verdict #7): random bounded series through the PRODUCTION
  * expressions ([[EventWindows.holtWintersCore]]) vs an in-test plain
  * Scala reference, EXACT equality. The fixture pin (HoltWintersSpec)
  * checks one real series; this pins the integer-arithmetic contract —
  * e6 fixed point, truncating-toward-zero division on negative
  * intermediate state (trend and seasonals go negative on declining
  * series) — so the contract cannot drift when the next recursive
  * operator lands.
  */
class HoltWintersPropertySpec extends SparkSuite {
  import spark.implicits._

  private def ref(ys: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    // (n_days, level_e2, trend_e2, forecast_e2 for h = row index + 1)
    val w1 = ys.slice(0, 7).sum
    val w2 = ys.slice(7, 14).sum
    var l = w1 * 1000000L / 7
    var b = (w2 - w1) * 1000000L / 49
    var s = ys.slice(0, 7).map(_ * 1000000L - l).toVector
    ys.drop(7).foreach { y =>
      val lNew = (200000L * (y * 1000000L - s.head) +
        800000L * (l + b)) / 1000000L
      val bNew = (100000L * (lNew - l) + 900000L * b) / 1000000L
      val sNew = (300000L * (y * 1000000L - lNew) +
        700000L * s.head) / 1000000L
      l = lNew; b = bNew; s = s.tail :+ sNew
    }
    (1 to 7).map(h =>
      (ys.size.toLong, l / 10000L, b / 10000L,
        (l + h * b + s(h - 1)) / 10000L))
  }

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i =>
      g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("property: production recursion == plain Scala reference, exact") {
    // bounded daily counts incl. spiky, declining and all-zero weeks —
    // declining series push trend and seasonals negative, the
    // truncation-direction hot spot
    val genSeries: Gen[List[Long]] = for {
      n <- Gen.chooseNum(14, 45)
      base <- Gen.chooseNum(0L, 100000L)
      ys <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.chooseNum(0L, 200000L),
        1 -> Gen.const(0L),
        1 -> Gen.chooseNum(0L, 40L)))
    } yield ys.zipWithIndex.map { case (y, i) =>
      // overlay a decaying ramp so many series have strong negative trend
      math.max(0L, y + base - i * (base / 20 + 1))
    }
    val series = samples(genSeries, 60, 0xe6L)
      .zipWithIndex.map { case (ys, i) => (f"t$i%03d", ys.toArray) }
    // one Spark job over the whole batch (a job per sample would crawl)
    val got = EventWindows
      .holtWintersCore(series.toDF("event_type", "ys"))
      .orderBy("event_type", "h")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    val want = series.sortBy(_._1).flatMap { case (et, ys) =>
      ref(ys.toSeq).zipWithIndex.map { case ((n, l, b, f), i) =>
        (et, n, l, b, (i + 1).toLong, f)
      }
    }
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
    // the generator must actually exercise the negative-state paths
    assert(want.exists(_._4 < 0), "no negative trend sampled")
  }

  test("series shorter than two weeks are skipped, not mis-seeded") {
    val df = Seq(("short", (1L to 13L).toArray),
      ("ok", (1L to 14L).toArray)).toDF("event_type", "ys")
    val got = EventWindows.holtWintersCore(df)
      .select("event_type").distinct().collect().map(_.getString(0))
    assert(got.toSeq == Seq("ok"))
  }
}

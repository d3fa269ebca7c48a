package graft.streaming

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative contract for the exact-integer CUSUM recursion — the
  * second operator under the recursion-family discipline established
  * for Holt-Winters (r15 verdict #7): random bounded series through
  * the PRODUCTION expressions ([[EventWindows.cusumCore]]) vs an
  * in-test plain Scala reference, EXACT equality. The CUSUM update is
  * division-free (adds and max(0,·) on e6 int64), so this pins the
  * state threading, the baseline-week seeding, the emitted-history
  * alignment (hist[i] = state after day 8+i), and the alarm
  * thresholding.
  */
class CusumPropertySpec extends SparkSuite {
  import spark.implicits._

  private def ref(ys: Seq[Long])
      : Seq[(Long, Long, Long, Long, Long, Int, Int)] = {
    // rows of (n_days, mu_e2, t, sp_e2, sn_e2, up_alarm, down_alarm)
    val mu = ys.take(7).sum * 1000000L / 7
    val k = mu / 20
    val h = mu / 2
    var sp = 0L; var sn = 0L
    ys.drop(7).zipWithIndex.map { case (y, i) =>
      sp = math.max(0L, sp + (y * 1000000L - mu - k))
      sn = math.max(0L, sn + (mu - k - y * 1000000L))
      (ys.size.toLong, mu / 10000L, (i + 8).toLong, sp / 10000L,
        sn / 10000L, if (sp > h) 1 else 0, if (sn > h) 1 else 0)
    }
  }

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i =>
      g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("property: production recursion == plain Scala reference, exact") {
    // series with genuine level shifts up AND down so both sides of
    // the statistic accumulate and both alarms fire somewhere
    val genSeries: Gen[List[Long]] = for {
      n <- Gen.chooseNum(8, 60)
      base <- Gen.chooseNum(10L, 50000L)
      shiftAt <- Gen.chooseNum(8, 30)
      shift <- Gen.oneOf(-1L, 0L, 1L)
      mag <- Gen.chooseNum(0L, 30000L)
      noise <- Gen.listOfN(n, Gen.chooseNum(-10L, 10L))
    } yield noise.zipWithIndex.map { case (e, i) =>
      math.max(0L, base + e + (if (i >= shiftAt) shift * mag else 0L))
    }
    val series = samples(genSeries, 60, 0xc5L)
      .zipWithIndex.map { case (ys, i) => (f"t$i%03d", ys.toArray) }
    val got = EventWindows
      .cusumCore(series.toDF("event_type", "ys"))
      .orderBy("event_type", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6),
        r.getInt(7)))
      .toSeq
    val want = series.sortBy(_._1).flatMap { case (et, ys) =>
      ref(ys.toSeq).map { case (n, m, t, sp, sn, ua, da) =>
        (et, n, m, t, sp, sn, ua, da)
      }
    }
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
    // the generator must exercise both alarm directions
    assert(want.exists(_._7 == 1), "no up alarm sampled")
    assert(want.exists(_._8 == 1), "no down alarm sampled")
  }

  test("series shorter than baseline week + 1 are skipped") {
    val df = Seq(("short", (1L to 7L).toArray),
      ("ok", (1L to 8L).toArray)).toDF("event_type", "ys")
    val got = EventWindows.cusumCore(df)
      .select("event_type").distinct().collect().map(_.getString(0))
    assert(got.toSeq == Seq("ok"))
  }

  test("a sustained small shift alarms even though no single day could") {
    // baseline 1000/day, then +8% forever: each day adds 3% of mu
    // (8% − 5% allowance) to s⁺, crossing h = 50% of mu strictly on
    // the 17th shifted day (30e6·17 = 510e6 > 500e6) → t = 8+17−1 = 24
    val ys = (Array.fill(7)(1000L) ++ Array.fill(30)(1080L))
    val rows = EventWindows
      .cusumCore(Seq(("shift", ys)).toDF("event_type", "ys"))
      .orderBy("t").collect()
    val firstAlarm = rows.find(_.getInt(6) == 1).map(_.getLong(3))
    assert(firstAlarm.contains(24L),
      s"expected first up-alarm at t=24, got $firstAlarm")
    assert(rows.forall(_.getInt(7) == 0)) // never a down alarm
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r17 wall-clock-budget gate: BENCH_r17.json was rc 124 — the
  * driver killed the ~57-min bench on a loaded host, so round 17 had
  * no independent bench record at all. BenchBudget makes the record's
  * EXISTENCE robust the way the degraded gates made its QUALITY
  * robust: optional blocks are shed loudly (recorded in budget_shed)
  * in a fixed priority order — big probe first, then 10× streaming,
  * then extra/noisy passes, then the warmup refinement — while the
  * mandatory core (timed passes, scale ratios, baseline-parity
  * streaming, artifact writes) always runs.
  *
  * The shed order is enforced by what each gate RESERVES (mandatory
  * remainder only, never a lower-priority optional block), so this
  * spec drives a fake-clock simulation of Bench.main's exact gate
  * sequence and pins which blocks survive at each budget level.
  */
class BenchBudgetSpec extends AnyFunSuite {

  test("GRAFT_BENCH_BUDGET_SEC is validated, clamped, and defaulted") {
    def env(v: String) = Map("GRAFT_BENCH_BUDGET_SEC" -> v)
    assert(BenchBudget.fromEnv(Map.empty) == 2400.0)
    // garbage must not crash the bench (the ABPanel .toInt lesson)
    assert(BenchBudget.fromEnv(env("soon")) == 2400.0)
    assert(BenchBudget.fromEnv(env("")) == 2400.0)
    assert(BenchBudget.fromEnv(env("900")) == 900.0)
    assert(BenchBudget.fromEnv(env("1e4")) == 10000.0)
    // zero/negative/absurdly small would shed everything and produce a
    // nonsense record — clamped to the 300 s floor
    assert(BenchBudget.fromEnv(env("0")) == 300.0)
    assert(BenchBudget.fromEnv(env("-5")) == 300.0)
    assert(BenchBudget.fromEnv(env("60")) == 300.0)
  }

  test("allow() sheds once, reports via onShed, and never un-sheds") {
    var now = 0L
    val shedEvents = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double)]
    val b = new BenchBudget(100.0, () => now,
      (blk, rem) => shedEvents += ((blk, rem)))
    assert(b.allow("a", 50.0, 40.0)) // 90 <= 100 fits
    assert(!b.allow("b", 50.0, 60.0)) // 110 > 100
    assert(!b.allow("b", 50.0, 60.0)) // asked again: still refused...
    assert(b.shed == Seq("b")) // ...but recorded and reported ONCE
    assert(shedEvents == Seq(("b", 100.0)))
    now = (80 * 1e9).toLong
    assert(b.remainingSec == 20.0 && b.elapsedSec == 80.0)
    assert(!b.allow("c", 30.0))
    assert(b.shed == Seq("b", "c"))
  }

  /** Bench.main's gate sequence with a fake clock: same block names,
    * same cost estimates and mandatory reserves (pass ≈ 100 s — the
    * sf0.1 catalog's measured scale — stream mandatory 360 s,
    * 10× 240 s, probe 600 s, artifact margin 60 s). Returns the shed
    * list. Mandatory blocks always advance the clock — the simulation
    * cannot "save" them, exactly like main. */
  private def driveGates(budgetSec: Double, passSec: Double = 100.0)
      : Seq[String] = {
    var now = 0L
    def advance(sec: Double): Unit = now += (sec * 1e9).toLong
    val b = new BenchBudget(budgetSec, () => now)
    advance(60 + passSec) // sf0.001 warmup + first target warm pass
    if (b.allow("warmup_refinement", passSec,
        4 * passSec + 360.0)) advance(passSec)
    advance(3 * passSec) // the three timed passes (mandatory)
    if (b.allow("extra_pass", passSec, passSec + 360.0)) advance(passSec)
    if (b.allow("noisy_repass", 0.2 * passSec, passSec + 360.0))
      advance(0.2 * passSec)
    advance(passSec) // scale-ratio mid+small passes (mandatory)
    advance(360.0) // streaming A/B + full-volume parity (mandatory)
    if (b.allow("streaming_10x", 240.0, 60.0)) advance(240.0)
    if (b.allow("big_probe", 600.0, 60.0)) advance(600.0)
    b.shed
  }

  test("a generous budget sheds nothing") {
    assert(driveGates(3600.0).isEmpty)
  }

  test("the probe starves first as the budget tightens") {
    assert(driveGates(2000.0) == Seq("big_probe"))
  }

  test("then the 10x streaming volume") {
    assert(driveGates(1300.0) == Seq("streaming_10x", "big_probe"))
  }

  test("then the extra and warmup passes — never the mandatory core") {
    val shed = driveGates(1000.0)
    assert(shed.contains("warmup_refinement"))
    assert(shed.contains("extra_pass"))
    assert(shed.contains("streaming_10x") && shed.contains("big_probe"))
    // the cheap noisy repass still fits at this level — shedding is
    // cost-driven, not a blanket kill switch
    assert(!shed.contains("noisy_repass"))
  }

  test("at the clamp floor everything optional sheds, loudly") {
    val shed = driveGates(BenchBudget.MinBudgetSec)
    assert(shed.toSet == Set("warmup_refinement", "extra_pass",
      "noisy_repass", "streaming_10x", "big_probe"))
    // chronological refusal order — the artifact's budget_shed reads
    // as the run's own timeline
    assert(shed == Seq("warmup_refinement", "extra_pass",
      "noisy_repass", "streaming_10x", "big_probe"))
  }

  test("the default budget completes everything on a quiet host") {
    // 2400 s at the measured ~100 s/pass: the whole chain fits — the
    // budget only ever bites when the host misbehaves
    assert(driveGates(BenchBudget.DefaultBudgetSec).isEmpty)
  }

  test("on a loaded host the default budget sheds only the probe") {
    // 1.6× pass cost (the documented load-spike regime): the official
    // record keeps the timed passes, both streaming volume points and
    // the refinements, losing only the extra-decade probe sweep —
    // which the builder's large-budget close run still carries
    assert(driveGates(BenchBudget.DefaultBudgetSec, passSec = 160.0)
      == Seq("big_probe"))
  }
}

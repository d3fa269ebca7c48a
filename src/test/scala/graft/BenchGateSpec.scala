package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r15 artifact gate: a host-degraded bench run must self-describe
  * (`host_degraded` + culprit pass) and must be UNABLE to overwrite a
  * previous clean full-bench artifact. The r15 driver record —
  * pass totals [112.0, 621.3, 112.8, 206.9] — is the pinned fixture.
  */
class BenchGateSpec extends AnyFunSuite {

  test("the r15 degraded run is flagged with its culprit pass") {
    val (degraded, culprit) =
      Bench.degradedVerdict(Seq(112.0, 621.3, 112.8, 206.9))
    // best-3 = [112.0, 112.8, 206.9] -> spread 84.7% > 15%
    assert(degraded)
    assert(culprit == 2) // the 621.3 s pass
  }

  test("a quiet run is clean and names no culprit") {
    val (degraded, culprit) =
      Bench.degradedVerdict(Seq(57.8, 56.3, 58.2))
    assert(!degraded && culprit == -1)
  }

  test("one outlier pass above a tight best-3 is culprit-named but not degraded") {
    // the designed-for case: the >10% trigger bought a 4th pass and
    // the engine reproduces itself once the noise pass is set aside
    val (degraded, culprit) =
      Bench.degradedVerdict(Seq(56.0, 90.0, 57.0, 56.5))
    assert(!degraded)
    assert(culprit == 2)
  }

  test("degenerate inputs never flag") {
    assert(Bench.degradedVerdict(Seq(57.0)) == (false, -1))
    assert(Bench.degradedVerdict(Seq.empty) == (false, -1))
    assert(Bench.degradedVerdict(Seq(0.0, 0.0, 0.0)) == (false, -1))
  }

  test("a degraded run cannot overwrite a clean prior artifact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gate")
    val out = dir.resolve("bench_full.json").toString
    // no prior artifact: degraded may claim the path (self-describing)
    assert(Bench.artifactTarget(out, degraded = true) == out)
    // clean prior: a degraded run is diverted
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      """{"total_min":57.1,"host_degraded":false}""")
    assert(Bench.artifactTarget(out, degraded = true) == out + ".degraded")
    // a clean run always lands on the canonical path
    assert(Bench.artifactTarget(out, degraded = false) == out)
    // degraded prior: a degraded rerun may overwrite it
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      """{"total_min":457.1,"host_degraded":true}""")
    assert(Bench.artifactTarget(out, degraded = true) == out)
    // and a pre-gate legacy artifact (no field at all) counts as clean
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      """{"total_min":57.1}""")
    assert(Bench.artifactTarget(out, degraded = true) == out + ".degraded")
    // fail CLOSED: an existing-but-unreadable prior diverts too (a
    // read hiccup must never let a degraded run destroy a record)
    val locked = dir.resolve("unreadable").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(locked))
    assert(Bench.artifactTarget(locked, degraded = true)
      == locked + ".degraded")
  }

  test("published best-3 spread and the verdict share one definition") {
    val r15 = Seq(112.0, 621.3, 112.8, 206.9)
    // best-3 = [112.0, 112.8, 206.9] -> (206.9-112.0)/112.0 = 84.73%
    assert(math.abs(Bench.best3SpreadPct(r15) - 84.73) < 0.01)
    assert(Bench.best3SpreadPct(Seq(57.0)) == -1.0)
    assert(Bench.best3SpreadPct(Seq.empty) == -1.0)
  }
}

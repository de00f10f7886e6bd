package graft

import org.scalatest.funsuite.AnyFunSuite

/** Boundary pins for the bench headline protocol ([[Bench.headlineOf]]
  * / [[Bench.headlineDiverges]]): the committed `value` must be the
  * median of the recent quiet same-registry runs, fall back to the raw
  * total when fewer than three qualify, never pool totals across
  * registry sizes or unknown-load history, exclude runs whose IO-stall
  * fingerprint is known-dirty (while letting the pre-field history
  * through), and flag a quiet current run that diverges from the
  * committed median. These rules decide the official cross-round
  * number, so they get the same executable-pin treatment as a plan
  * shape.
  */
class BenchProtocolSpec extends AnyFunSuite {

  private def dioUnknown(n: Int) = Seq.fill(n)(-1.0)

  test("median of the quiet same-size window; loud and wrong-size " +
      "runs excluded") {
    val (v, label) = Bench.headlineOf(
      runs = Seq(300.0, 220.0, 210.0, 400.0, 230.0),
      runsLoad = Seq(4.0, 4.5, 4.0, 9.0, 4.2), // 400.0 is loud
      runsOf = Seq(200, 277, 277, 277, 277), // 300.0 is another registry
      runsDio = dioUnknown(5),
      registrySize = 277, thisTotal = 230.0)
    // quiet same-size = [220, 210, 230] → median 220
    assert(v == 220.0 && label == "median_quiet_3")
  }

  test("window keeps only the most recent HeadlineWindow quiet runs") {
    val runs = Seq(500.0, 490.0, 480.0, 230.0, 210.0, 220.0, 215.0)
    val (v, label) = Bench.headlineOf(runs,
      runsLoad = Seq.fill(7)(4.0), runsOf = Seq.fill(7)(277),
      runsDio = dioUnknown(7),
      registrySize = 277, thisTotal = 215.0)
    // last 5 quiet = [480, 230, 210, 220, 215] → median 220 — the two
    // oldest slow readings have aged out
    assert(v == 220.0 && label == "median_quiet_5")
  }

  test("fewer than three qualifying runs → this run's raw total, " +
      "labelled single_run") {
    val (v1, l1) = Bench.headlineOf(Seq(220.0, 230.0),
      Seq(4.0, 4.0), Seq(277, 277), dioUnknown(2), 277, thisTotal = 230.0)
    assert(v1 == 230.0 && l1 == "single_run")
    // unknown-load history (−1, pre-field artifacts) never qualifies
    val (v2, l2) = Bench.headlineOf(Seq(220.0, 225.0, 230.0),
      Seq(-1.0, -1.0, 4.0), Seq(277, 277, 277), dioUnknown(3), 277,
      thisTotal = 230.0)
    assert(v2 == 230.0 && l2 == "single_run")
  }

  test("a loud current run still reads the quiet history's median") {
    // the run that happened on a contended host commits the history's
    // number, not its own inflated total — its raw total stays in
    // value_this_run
    val (v, label) = Bench.headlineOf(Seq(210.0, 220.0, 230.0, 380.0),
      Seq(4.0, 4.0, 4.0, 11.0), Seq.fill(4)(277), dioUnknown(4), 277,
      thisTotal = 380.0)
    assert(v == 220.0 && label == "median_quiet_3")
  }

  test("a known-dirty IO fingerprint disqualifies a run; unknown dio " +
      "(pre-r16 history / no PSI) stays eligible") {
    // 350.0 is CPU-quiet but disk-spiked (dio 0.4 ≥ QuietDioMax) — the
    // exact r14 failure mode a load cut cannot see; the −1 rows are the
    // whole pre-field ledger, which must keep qualifying or the median
    // could never seed
    val (v, label) = Bench.headlineOf(
      runs = Seq(210.0, 220.0, 350.0, 230.0),
      runsLoad = Seq(4.0, 4.0, 4.5, 4.2),
      runsOf = Seq.fill(4)(277),
      runsDio = Seq(-1.0, -1.0, 0.4, 0.01),
      registrySize = 277, thisTotal = 230.0)
    assert(v == 220.0 && label == "median_quiet_3")
  }

  test("headline_diverges: flags a QUIET current run whose raw total " +
      "exceeds the committed median by the riser factor; loud or " +
      "dio-dirty current runs never flag") {
    // quiet current run, real regression: 214.2 committed, 330 raw
    assert(Bench.headlineDiverges(214.2, 330.0, 4.5, 0.01))
    // same total but the run was loud — its total is noise, no flag
    assert(!Bench.headlineDiverges(214.2, 330.0, 9.0, 0.01))
    // CPU-quiet but disk-spiked — same reasoning, no flag
    assert(!Bench.headlineDiverges(214.2, 330.0, 4.5, 0.5))
    // unknown dio must not suppress the flag (pre-PSI host)
    assert(Bench.headlineDiverges(214.2, 330.0, 4.5, -1.0))
    // within the factor: 1.5 × 200 = 300 is the boundary (boundary
    // values chosen binary-exact — 1.5 × 214.2 is not representable)
    assert(!Bench.headlineDiverges(200.0, 300.0, 4.5, 0.01))
    assert(Bench.headlineDiverges(200.0, 300.5, 4.5, 0.01))
  }
}

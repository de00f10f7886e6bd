package graft

import org.scalatest.funsuite.AnyFunSuite

/** Boundary pins for the r15 bench headline protocol
  * ([[Bench.headlineOf]]): the committed `value` must be the median of
  * the recent quiet same-registry runs, fall back to the raw total
  * when fewer than three qualify, and never pool totals across
  * registry sizes or unknown-load history. These rules decide the
  * official cross-round number, so they get the same executable-pin
  * treatment as a plan shape.
  */
class BenchProtocolSpec extends AnyFunSuite {

  test("median of the quiet same-size window; loud and wrong-size " +
      "runs excluded") {
    val (v, label) = Bench.headlineOf(
      runs = Seq(300.0, 220.0, 210.0, 400.0, 230.0),
      runsLoad = Seq(4.0, 4.5, 4.0, 9.0, 4.2), // 400.0 is loud
      runsOf = Seq(200, 277, 277, 277, 277), // 300.0 is another registry
      registrySize = 277, thisTotal = 230.0)
    // quiet same-size = [220, 210, 230] → median 220
    assert(v == 220.0 && label == "median_quiet_3")
  }

  test("window keeps only the most recent HeadlineWindow quiet runs") {
    val runs = Seq(500.0, 490.0, 480.0, 230.0, 210.0, 220.0, 215.0)
    val (v, label) = Bench.headlineOf(runs,
      runsLoad = Seq.fill(7)(4.0), runsOf = Seq.fill(7)(277),
      registrySize = 277, thisTotal = 215.0)
    // last 5 quiet = [480, 230, 210, 220, 215] → median 220 — the two
    // oldest slow readings have aged out
    assert(v == 220.0 && label == "median_quiet_5")
  }

  test("fewer than three qualifying runs → this run's raw total, " +
      "labelled single_run") {
    val (v1, l1) = Bench.headlineOf(Seq(220.0, 230.0),
      Seq(4.0, 4.0), Seq(277, 277), 277, thisTotal = 230.0)
    assert(v1 == 230.0 && l1 == "single_run")
    // unknown-load history (−1, pre-field artifacts) never qualifies
    val (v2, l2) = Bench.headlineOf(Seq(220.0, 225.0, 230.0),
      Seq(-1.0, -1.0, 4.0), Seq(277, 277, 277), 277, thisTotal = 230.0)
    assert(v2 == 230.0 && l2 == "single_run")
  }

  test("a loud current run still reads the quiet history's median") {
    // the run that happened on a contended host commits the history's
    // number, not its own inflated total — its raw total stays in
    // value_this_run
    val (v, label) = Bench.headlineOf(Seq(210.0, 220.0, 230.0, 380.0),
      Seq(4.0, 4.0, 4.0, 11.0), Seq.fill(4)(277), 277, thisTotal = 380.0)
    assert(v == 220.0 && label == "median_quiet_3")
  }
}

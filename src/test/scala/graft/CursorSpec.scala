package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CursorState

/** Golden-trace tests of the reference's cursor state machine
  * (`sources/meteosat.py:61-122` semantics; SURVEY §5 item 4).
  */
class CursorSpec extends AnyFunSuite {
  private val slot = CursorState.slotUs

  private def run(tsUs: Seq[Long]): CursorState =
    tsUs.foldLeft(CursorState.zero)(_.advance(_))

  test("each 15-min slot is counted once, however many events land in it") {
    // slots: 0, 0, 1, 3  -> 3 distinct slots, 4 events
    val st = run(Seq(10L, 20L, slot + 5, 3 * slot + 1))
    assert(st.nEvents == 4)
    assert(st.nSlots == 3)
    assert(st.lastSlot == 3)
  }

  test("cursor is monotone: a stale-slot event never rewinds it (A3)") {
    val forward = run(Seq(5 * slot, 6 * slot))
    val replayed = forward.advance(2 * slot) // event from a passed slot
    assert(replayed.lastSlot == forward.lastSlot) // cursor did not move back
    assert(replayed.nSlots == forward.nSlots)     // and nothing re-counted
    assert(replayed.nEvents == forward.nEvents + 1)
  }

  test("an empty tick stalls the cursor: state is carried bit-identically (A6/A17)") {
    val st = run(Seq(7 * slot))
    assert(Seq.empty[Long].foldLeft(st)(_.advance(_)) == st)
  }

  test("statistics track min/max event time exactly") {
    val st = run(Seq(300L, 100L, 200L))
    assert(st.firstTs == 100L && st.lastTs == 300L)
  }

  test("batch boundaries are invisible: splitting the trace at any point yields the same final state") {
    val trace = Seq(1L, slot, slot + 2, 2 * slot, 5 * slot, 5 * slot + 1)
    val whole = run(trace)
    (0 to trace.size).foreach { cut =>
      val (a, b) = trace.splitAt(cut)
      assert(b.foldLeft(run(a))(_.advance(_)) == whole, s"cut=$cut")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for [[Bench.segmentGate]] — the mid-pass throttle gate
  * (VERDICT r9 stretch item, carried through r10 item 4): a contended
  * window INSIDE a pass must drop only that pass-segment's samples,
  * never the whole pass, and calib failures must never widen the gate.
  * Pure function, no Spark session.
  */
class BenchGateSpec extends AnyFunSuite {
  private val nan = Double.NaN

  test("uniform healthy calibs: every segment kept") {
    val gate = Bench.segmentGate(Array(
      Array(1.0, 1.1, 0.9, 1.0),
      Array(1.0, 1.0, 1.1, 1.0)))
    assert(gate.flatten.forall(identity))
  }

  test("one hot interior segment drops only itself, rest of the pass survives") {
    // pass 0 segment 1 is bounded by calibs (1.0, 9.0) -> mean 5.0 vs
    // best ~1.0: contended. Segment 2's (9.0, 1.0) is also contended by
    // construction (it shares the hot boundary) but segment 0 must stay.
    val gate = Bench.segmentGate(Array(
      Array(1.0, 1.0, 9.0, 1.0),
      Array(1.0, 1.0, 1.0, 1.0)))
    assert(gate(0)(0) && !gate(0)(1) && !gate(0)(2))
    assert(gate(1).forall(identity))
  }

  test("a whole contended pass drops every segment; healthy pass untouched") {
    val gate = Bench.segmentGate(Array(
      Array(6.0, 6.3, 5.9, 6.1),
      Array(1.0, 1.0, 1.0, 1.0)))
    assert(gate(0).forall(g => !g))
    assert(gate(1).forall(identity))
  }

  test("NaN bounding calibs: one-sided mean still gates, all-NaN segment is kept") {
    // segment 0 of pass 0: bounds (NaN, 9.0) -> one-sided mean 9.0,
    // contended vs best 1.0; segment 1: (9.0, NaN)... use a layout where
    // one segment has NO finite bound and must be kept
    val gate = Bench.segmentGate(Array(
      Array(nan, 9.0, nan, nan),
      Array(1.0, 1.0, 1.0, 1.0)))
    assert(!gate(0)(0) && !gate(0)(1)) // one-sided means 9.0, gated out
    assert(gate(0)(2)) // (NaN, NaN): ungateable, kept
    assert(gate(1).forall(identity))
  }

  test("all calibs failed: nothing is gated (fallback keeps every sample)") {
    val gate = Bench.segmentGate(Array(Array(nan, nan), Array(nan, nan)))
    assert(gate.flatten.forall(identity))
  }

  test("empty input degrades to empty output") {
    assert(Bench.segmentGate(Array.empty).isEmpty)
  }
}

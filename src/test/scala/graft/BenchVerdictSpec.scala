package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-breach adjudication contract (round-14 judge task 2:
  * "every breach carries a verdict"). Pure-function spec — the sampling
  * loop feeds [[Bench.verdictFor]] the (elapsed, stealDelta) samples it
  * took; these pin what each verdict means. */
class BenchVerdictSpec extends AnyFunSuite {

  test("breaches: >2x AND >1s over — the absolute guard exempts " +
    "centisecond jitter") {
    assert(Bench.breaches(3.0, 1.0))
    assert(!Bench.breaches(1.9, 1.0), "under 2x")
    assert(!Bench.breaches(0.09, 0.03), "3x but only 60 ms over")
    assert(!Bench.breaches(2.0, 1.0), "exactly 2x is not a breach")
  }

  test("healed: any clean sample resolves the breach (its min is kept)") {
    assert(Bench.verdictFor(List((5.0, 0L), (0.9, 0L)), base = 1.0)
      == "healed")
    assert(Bench.verdictFor(List((5.0, 120L), (6.0, 80L), (1.1, 0L)),
      base = 1.0) == "healed")
  }

  test("displaced_steal: still breaching, but EVERY elevated sample shows " +
    "nonzero hypervisor steal — displacement proven") {
    assert(Bench.verdictFor(List((5.0, 328L), (6.0, 91L), (4.8, 12L)),
      base = 1.0) == "displaced_steal")
  }

  test("unresolved: still breaching with at least one zero-steal elevated " +
    "sample — candidate real regression") {
    assert(Bench.verdictFor(List((5.0, 0L), (5.5, 120L), (4.9, 33L)),
      base = 1.0) == "unresolved")
    assert(Bench.verdictFor(List((5.0, 0L), (5.5, 0L), (4.9, 0L)),
      base = 1.0) == "unresolved",
      "a reproducible zero-steal breach is the real-regression signature")
    // steal telemetry unavailable (-1) cannot prove displacement
    assert(Bench.verdictFor(List((5.0, -1L), (5.5, -1L), (4.9, -1L)),
      base = 1.0) == "unresolved")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the adaptive warmup-deadline arithmetic ([[Bench
  * .warmupDeadlineTarget]]) — the regime boundaries the r18 verdict asked
  * for: spend on warmup only what leaves `2 × predicted-pass × slowdown +
  * margin` of budget, fall back to a 1-pass + anomaly-partial target when
  * two passes can't fit, never cut below the 120 s floor (migrated
  * cold-compile costs exceed the savings), never exceed the static cap.
  */
class BenchDeadlineSpec extends AnyFunSuite {
  private val budget = 885.0
  private val cap = 300.0

  test("fast host, 2 passes fit comfortably: deadline is the 2-pass latest or the cap") {
    // predicted 180s at slowdown 1: latest2 = 885 - 369 - 45 = 471 > cap
    assert(Bench.warmupDeadlineTarget(budget, 0, cap, 180, 1.0) === 300.0)
  }

  test("mild slowdown narrows the 2-pass window below the cap") {
    // predicted 241s at slowdown 1.2: latest2 = 885 - 592.9 - 45 = 247.1
    val d = Bench.warmupDeadlineTarget(budget, 0, cap, 241, 1.2)
    assert(d > 246 && d < 249, s"expected the 2-pass latest (~247), got $d")
  }

  test("severe slowdown flips to the 1-pass target instead of cutting warmup to nothing") {
    // predicted 241s at slowdown 2: latest2 < 0 (2 passes can't fit) ->
    // 1-pass target = 885 - 554.3 - 45 = 285.7, clamped by the cap only
    val d = Bench.warmupDeadlineTarget(budget, 0, cap, 241, 2.0)
    assert(d > 284 && d < 287, s"expected the 1-pass latest (~285.7), got $d")
  }

  test("the 1-pass target never cuts below the 120s floor") {
    // hopeless budget: even one pass doesn't fit -> floor, not zero
    assert(Bench.warmupDeadlineTarget(300.0, 0, cap, 241, 3.0) === 120.0)
  }

  test("the static cap is always the ceiling") {
    assert(Bench.warmupDeadlineTarget(10000.0, 0, cap, 10, 1.0) === 300.0)
  }

  test("warmupStart offsets both the floor and the cap (deadlines are absolute)") {
    val d = Bench.warmupDeadlineTarget(300.0, 50, cap, 241, 3.0)
    assert(d === 170.0, s"floor must be warmupStart + 120, got $d")
    assert(Bench.warmupDeadlineTarget(10000.0, 50, cap, 10, 1.0) === 350.0)
  }

  test("the regime boundary: latest2 at exactly the floor stays in 2-pass mode") {
    // choose predicted so latest2 == 120: 885 - 2.05*p - 45 = 120 -> p = 351.2...
    val p = (budget - 45 - 120) / 2.05
    val d = Bench.warmupDeadlineTarget(budget, 0, cap, p, 1.0)
    assert(math.abs(d - 120.0) < 1e-9, s"latest2 == floor must be honored as 2-pass, got $d")
  }
}

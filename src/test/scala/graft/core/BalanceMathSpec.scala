package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Count-oracle tests (SURVEY §5.3): a literal Scala transcription of the
  * reference's `_balance_set` loop (reference `demv/helpers.py:5-29`) is the
  * model; [[BalanceMath.balanceCell]] and [[BalanceMath.balanceCellFast]]
  * must match it exactly on sizes, iteration counts and traces. Property
  * cases are seeded random sweeps (no scalatest-scalacheck bridge in the
  * offline cache).
  */
class BalanceMathSpec extends AnyFunSuite {

  /** Direct model of reference demv/helpers.py:5-29 on sizes. */
  private def referenceBalance(
      wExp: Double, g0: Long, total: Long, roundLevel: Int, stop: Long):
      (Long, Long, Vector[Double]) = {
    var size = g0
    var i = 0L
    def wObs = size.toDouble / total.toDouble
    def disp = {
      val raw = wExp / wObs
      if (roundLevel > 0) BalanceMath.pyRound(raw, roundLevel) else raw
    }
    var trace = Vector(disp)
    var done = false
    while (!done && disp != 1.0 && i != stop) {
      if (wExp / wObs > 1) size += 1
      else if (wExp / wObs < 1) size -= 1
      if (size == 0) done = true // w_obs == 0 branch: return immediately
      else { trace :+= disp; i += 1 }
    }
    (size, i, trace)
  }

  test("pyRound matches Python round-half-even") {
    // Python: round(0.5)=0, round(1.5)=2, round(2.5)=2, round(0.25,1)=0.2,
    // round(0.35,1)=0.3 (0.35 is 0.34999...8 in binary)
    assert(BalanceMath.pyRound(0.5, 0) === 0.0)
    assert(BalanceMath.pyRound(1.5, 0) === 2.0)
    assert(BalanceMath.pyRound(2.5, 0) === 2.0)
    assert(BalanceMath.pyRound(0.25, 1) === 0.2)
    assert(BalanceMath.pyRound(0.35, 1) === 0.3)
    assert(BalanceMath.pyRound(1.05, 1) === 1.1) // 1.05 binary is 1.05000...0003
    assert(BalanceMath.pyRound(-1.5, 0) === -2.0)
  }

  test("balanced cell: no iterations") {
    // w_exp == w_obs exactly -> disparity 1 -> zero iterations
    val r = BalanceMath.balanceCell(wExp = 0.25, g0 = 25, total = 100, roundLevel = 1, stop = 10000)
    assert(r.targetSize === 25)
    assert(r.iters === 0)
    assert(r.trace === Vector(1.0))
    assert(!r.maxIterHit)
  }

  test("upsample walk matches reference model") {
    // w_exp = 0.3, g0 = 10, total = 100: ratio 3.0 -> grow to ~30
    val r = BalanceMath.balanceCell(0.3, 10, 100, 1, 10000)
    val (size, iters, trace) = referenceBalance(0.3, 10, 100, 1, 10000)
    assert(r.targetSize === size)
    assert(r.iters === iters)
    assert(r.trace === trace)
  }

  test("downsample walk matches reference model") {
    val r = BalanceMath.balanceCell(0.1, 40, 100, 1, 10000)
    val (size, iters, trace) = referenceBalance(0.1, 40, 100, 1, 10000)
    assert(r.targetSize === size)
    assert(r.iters === iters)
    assert(r.trace === trace)
  }

  test("stop budget expires mid-walk") {
    val r = BalanceMath.balanceCell(0.5, 10, 1000, 1, stop = 7)
    val (size, iters, _) = referenceBalance(0.5, 10, 1000, 1, 7)
    assert(r.targetSize === size)
    assert(r.iters === 7)
    assert(iters === 7)
    assert(r.maxIterHit)
  }

  test("roundLevel <= 0 disables rounding (Python falsy round_level)") {
    // with no rounding the walk converges only on exact ratio 1 — here it
    // oscillates until stop
    val r = BalanceMath.balanceCell(0.333, 30, 100, 0, stop = 50)
    val (size, iters, _) = referenceBalance(0.333, 30, 100, 0, 50)
    assert(r.targetSize === size)
    assert(r.iters === iters)
  }

  test("property sweep: balanceCell replays the reference loop exactly") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val total = 10L + rng.nextInt(4990)
      val g0 = 1L + (rng.nextLong().abs % total)
      val wExp = (0.01 + rng.nextDouble() * 0.99) * (0.01 + rng.nextDouble() * 0.99)
      val roundLevel = rng.nextInt(3)
      val stop = Seq(10L, 100L, 10000L)(rng.nextInt(3))
      val r = BalanceMath.balanceCell(wExp, g0, total, roundLevel, stop)
      val (size, iters, trace) = referenceBalance(wExp, g0, total, roundLevel, stop)
      withClue(s"(wExp=$wExp g0=$g0 total=$total r=$roundLevel stop=$stop) ") {
        assert(r.targetSize === size)
        assert(r.iters === iters)
        assert(r.trace === trace)
      }
    }
  }

  test("property sweep: balanceCellFast agrees with balanceCell") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val total = 10L + rng.nextInt(99990)
      val g0 = 1L + (rng.nextLong().abs % total)
      val wExp = (0.001 + rng.nextDouble() * 0.999) * (0.001 + rng.nextDouble() * 0.999)
      val roundLevel = rng.nextInt(3)
      // stop = 0 included: evalDemv's sweep starts there, and it is where
      // maxIterHit's converged-at-entry clause matters
      val stop = Seq(0L, 10L, 1000L, 100000L)(rng.nextInt(4))
      val slow = BalanceMath.balanceCell(wExp, g0, total, roundLevel, stop, traceLimit = 1)
      val (size, iters, hit) = BalanceMath.balanceCellFast(wExp, g0, total, roundLevel, stop)
      withClue(s"(wExp=$wExp g0=$g0 total=$total r=$roundLevel stop=$stop) ") {
        assert(size === slow.targetSize)
        assert(iters === slow.iters)
        assert(hit === slow.maxIterHit)
      }
    }
  }

  test("stop=0 on an already-converged cell reports maxIterHit=false in both paths") {
    // pick wExp so disparity(g0) rounds to exactly 1.0 at roundLevel 2
    val (wExp, g0, total) = (0.25, 250L, 1000L)
    val r = BalanceMath.balanceCell(wExp, g0, total, 2, stop = 0L)
    assert(r.targetSize === g0 && r.iters === 0L && !r.maxIterHit)
    assert(BalanceMath.balanceCellFast(wExp, g0, total, 2, 0L) === ((g0, 0L, false)))
  }

  test("balanceCellFast survives an effectively-unbounded stop sentinel") {
    // Long.MaxValue as 'no budget': g0 + stop + 1 must not overflow into a
    // garbage negative targetSize
    val (size, iters, hit) =
      BalanceMath.balanceCellFast(0.9, 10L, 1000L, 2, Long.MaxValue)
    assert(size > 10L && size <= 1001L, s"targetSize $size out of range")
    assert(iters === size - 10L)
    assert(!hit)
  }

  test("walk down to zero ends loop without final increment") {
    // tiny w_exp forces the group to shrink to nothing: reference's
    // w_obs == 0 branch (demv/helpers.py:8-9 via 18-26)
    val r = BalanceMath.balanceCell(1e-9, 5, 1000, 1, 10000)
    val (size, iters, _) = referenceBalance(1e-9, 5, 1000, 1, 10000)
    assert(r.targetSize === size)
    assert(size === 0)
    assert(r.iters === iters)
    assert(iters === 4) // i increments only while size stays >= 1
  }
}

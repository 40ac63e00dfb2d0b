package graft.core

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Pure driver-side arithmetic for group balancing.
  *
  * The reference engine (reference `demv/helpers.py:5-29`, `_balance_set`)
  * balances each sensitive group by appending/dropping ONE uniformly-random
  * row per iteration until `round(w_exp / w_obs, roundLevel) == 1`. Which
  * row moves never affects the ratio — the loop is pure arithmetic on the
  * group SIZE. We therefore replay the loop on counts alone, on the driver,
  * and only materialize the final resize distributedly (see [[ExactSampler]]).
  * This is what makes the operator viable at 100 TB: the cluster computes one
  * aggregation of per-cell counts; everything else is O(iterations) scalar
  * arithmetic on <= 2^n * L cells.
  */
object BalanceMath {

  /** Python-compatible `round(x, ndigits)`: round-half-even performed on the
    * exact binary value of the double (CPython uses correctly-rounded dtoa;
    * `new BigDecimal(double)` is the same exact value). Spark SQL's `round`
    * is half-up — do NOT use it for parity (reference `demv/helpers.py:10`).
    */
  def pyRound(x: Double, ndigits: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else new JBigDecimal(x).setScale(ndigits, RoundingMode.HALF_EVEN).doubleValue()

  /** Disparity as the reference computes it: `w_exp / w_obs`, optionally
    * rounded. `roundLevel <= 0` means no rounding (Python falsy
    * `round_level`, reference `demv/helpers.py:10`).
    */
  private def disparity(wExp: Double, size: Long, total: Long, roundLevel: Int): Double = {
    val wObs = size.toDouble / total.toDouble
    val raw = wExp / wObs
    if (roundLevel > 0) pyRound(raw, roundLevel) else raw
  }

  private def rawRatio(wExp: Double, size: Long, total: Long): Double =
    wExp / (size.toDouble / total.toDouble)

  /** Outcome of replaying the balance loop for one (sensitive..., label) cell.
    *
    * @param targetSize   final group size after balancing
    * @param iters        number of +-1 iterations performed (reference `i`)
    * @param trace        disparity after each iteration, first entry is the
    *                     pre-loop disparity (reference `disparity` list). May
    *                     be truncated to `traceLimit` entries for huge walks;
    *                     `traceTruncated` flags that.
    * @param maxIterHit   the loop stopped because `iters == stop`
    *                     (reference prints "Warning: max iterations reached")
    */
  final case class BalanceResult(
      targetSize: Long,
      iters: Long,
      trace: Vector[Double],
      maxIterHit: Boolean,
      traceTruncated: Boolean)

  /** Replay `_balance_set` (reference `demv/helpers.py:5-29`) on sizes only.
    *
    * Exact semantics preserved:
    *  - loop guard uses the ROUNDED disparity, step direction uses the RAW
    *    ratio (they differ; with small groups the walk can overshoot the
    *    rounding window and oscillate until `stop`);
    *  - the iteration counter only increments while the group stays
    *    non-empty; the group hitting size 0 ends the loop immediately;
    *  - floating-point op order matches the reference:
    *    `w_obs = size/total` then `w_exp / w_obs`.
    *
    * @param wExp  expected weight: `(comboCount/total) * (labelCount/total)`,
    *              computed by the caller with exactly that op order
    * @param g0    initial cell size (> 0; empty cells are skipped upstream,
    *              reference `demv/helpers.py:52`)
    * @param total size of the FULL dataset — fixed for the whole loop
    * @param stop  max iterations (reference default 10000)
    */
  def balanceCell(
      wExp: Double,
      g0: Long,
      total: Long,
      roundLevel: Int,
      stop: Long,
      traceLimit: Int = 1 << 20): BalanceResult = {
    require(g0 > 0, s"balanceCell requires a non-empty cell, got size $g0")
    require(total > 0, s"balanceCell requires a non-empty dataset, got $total")
    var size = g0
    var i = 0L
    val trace = Vector.newBuilder[Double]
    var traced = 0
    var truncated = false
    def record(d: Double): Unit =
      if (traced < traceLimit) { trace += d; traced += 1 } else truncated = true
    var disp = disparity(wExp, size, total, roundLevel)
    record(disp)
    var sizeHitZero = false
    while (disp != 1.0 && i != stop && !sizeHitZero) {
      val raw = rawRatio(wExp, size, total)
      if (raw > 1) size += 1
      else if (raw < 1) size -= 1
      else { /* raw == 1 implies disp == 1; unreachable, guard anyway */ }
      if (size == 0) {
        // reference: w_obs == 0 => return (df, disparity, i) without a
        // final append/increment (demv/helpers.py:18-26 else-branch)
        sizeHitZero = true
      } else {
        disp = disparity(wExp, size, total, roundLevel)
        record(disp)
        i += 1
      }
    }
    // maxIterHit = the budget expired: all `stop` iterations consumed, OR
    // stop == 0 on a cell that still needed walking. A cell already
    // converged at entry (disp == 1, zero iterations) never hits the cap —
    // without the `disp != 1.0` clause, stop == 0 would flag EVERY cell
    // (evalDemv's sweep starts at stop = 0) and diverge from
    // balanceCellFast's (g0, 0, false).
    BalanceResult(size, i, trace.result(),
      maxIterHit = i == stop && (stop > 0 || disp != 1.0), traceTruncated = truncated)
  }

  /** Closed-form target size, usable when `stop` (and hence the walk) is too
    * long to replay step-by-step. Returns the same (targetSize, iters,
    * maxIterHit) as [[balanceCell]] without materializing the trace.
    *
    * The walk from g0 moves size toward `wExp * total` one step at a time and
    * stops at the first size whose rounded disparity is 1. Because the raw
    * ratio is strictly monotone in size, the stopping size — or the point
    * where the walk overshoots and starts oscillating — is found by binary
    * search in O(log range).
    */
  def balanceCellFast(
      wExp: Double,
      g0: Long,
      total: Long,
      roundLevel: Int,
      stop: Long): (Long, Long, Boolean) = {
    val d0 = disparity(wExp, g0, total, roundLevel)
    if (d0 == 1.0) return (g0, 0L, false)
    if (stop == 0) return (g0, 0L, true)
    val up = rawRatio(wExp, g0, total) > 1
    // "the walk stops or flips direction at size s":
    //   up-walk:   disp(s)==1 (converged) or raw(s) < 1 (overshoot -> flip)
    //   down-walk: disp(s)==1 or raw(s) > 1
    // raw is strictly decreasing in s, so each predicate is monotone in s:
    // up-walk true for all s >= T, down-walk true for all s <= T.
    def stopsAt(s: Long): Boolean = {
      val d = disparity(wExp, s, total, roundLevel)
      d == 1.0 || (if (up) rawRatio(wExp, s, total) < 1 else rawRatio(wExp, s, total) > 1)
    }
    if (up) {
      // `stop` may be an "effectively unbounded" sentinel (Long.MaxValue);
      // clamp the SEARCH ceiling so `g0 + budget + 1` and the doubling
      // probe can never overflow. The walk's true stopping point is
      // bounded by ~wExp*total << the clamp, so when the clamp is active
      // the budget-expiry branch (which uses the unclamped `stop`) is
      // unreachable and every return value stays exact.
      val budget = math.min(stop, (Long.MaxValue >> 2) - g0)
      // T = smallest s > g0 with stopsAt(s); exponential then binary search.
      var b = g0 + 1
      while (!stopsAt(b) && b <= g0 + budget) b = math.min(b * 2, g0 + budget + 1)
      if (!stopsAt(b)) return (g0 + stop, stop, true) // budget expires mid-walk
      var a = g0 + 1
      while (a < b) { val m = a + (b - a) / 2; if (stopsAt(m)) b = m else a = m + 1 }
      val t = a
      val steps = t - g0
      if (steps > stop) (g0 + stop, stop, true)
      else if (disparity(wExp, t, total, roundLevel) == 1.0) (t, steps, steps == stop)
      else { // overshot the rounding window: oscillates t-1 <-> t until stop
        val rem = stop - steps
        (if (rem % 2 == 1) t - 1 else t, stop, true)
      }
    } else {
      // T = largest s < g0 with stopsAt(s) (predicate downward-closed).
      if (!stopsAt(1)) {
        // walk never stops: sizes g0-1 ... 1 then 0 ends the loop. i only
        // increments while size stays >= 1 (reference demv/helpers.py:18-26).
        return if (stop <= g0 - 1) (g0 - stop, stop, true) else (0L, g0 - 1, false)
      }
      var a = 1L
      var b = g0 - 1
      while (a < b) { val m = a + (b - a + 1) / 2; if (stopsAt(m)) a = m else b = m - 1 }
      val t = a
      val steps = g0 - t
      if (steps > stop) (g0 - stop, stop, true)
      else if (disparity(wExp, t, total, roundLevel) == 1.0) (t, steps, steps == stop)
      else { // raw(t) > 1 but rounded disp != 1: oscillates t <-> t+1
        val rem = stop - steps
        (if (rem % 2 == 1) t + 1 else t, stop, true)
      }
    }
  }
}

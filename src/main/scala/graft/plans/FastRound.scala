package graft.plans

/** Bit-compatible fast path for Spark's Round(DOUBLE, s) — BigDecimal
  * HALF_UP over the value's SHORTEST-DECIMAL representation — for the
  * two scales the native assignment kernels use (6 and 0).
  *
  * Why it exists: the literal-matrix assignment kernels call Round once
  * or twice per (row, codeword) pair. BigDecimal.valueOf + setScale +
  * doubleValue measures ~325 ns and allocates; the floor arithmetic
  * below measures ~9 ns (20M-op micro, this box) — and a PQ corpus
  * pass at 100x makes ~410M such calls, so the reference rounding was
  * the single largest term of a Lloyd training round.
  *
  * Bit-compatibility argument (vs `BigDecimal.valueOf(d).setScale(s,
  * HALF_UP).doubleValue()`):
  *  - Scale 0: every tie boundary (k + 0.5) is exactly representable,
  *    and the shortest-decimal value v(d) round-trips to d, so v(d)
  *    and d always sit on the SAME side of any representable boundary
  *    (if they straddled one, the decimal would convert to a double on
  *    the far side, contradicting the round-trip). The fraction
  *    d - floor(d) is correctly rounded, not exact, so a COMPUTED 0.5
  *    is ambiguous (a true tie or a collapsed neighbor) and routes to
  *    the reference; strict computed inequalities vs 0.5 imply the
  *    same strict inequality for the true fraction.
  *  - Scale 6: tie boundaries (k + 0.5)·1e-6 are NOT representable in
  *    binary, so d never sits exactly on one — but v(d) CAN (e.g. the
  *    shortest decimal "1.5E-6"), and the scaled y = d·1e6 carries up
  *    to 0.5 ulp of multiply error. A band of 4 ulp(y) around the tie
  *    boundary therefore routes to the exact BigDecimal path (total
  *    drift between y and v(d)·1e6 is < 3 ulp(y)); outside the band,
  *    d, v(d) and y all agree on the side. The kept value k/1e6 is the
  *    correctly-rounded quotient — the same double
  *    BigDecimal(k·10^-6).doubleValue() returns.
  *  - |scaled| ≥ 2^52 or non-finite input: reference/passthrough path.
  *  - BigDecimal never returns -0.0 (valueOf(-0.0) is decimal 0), so
  *    zero results normalize to +0.0.
  * Pinned against the BigDecimal reference by FastRoundSpec's sweep
  * over boundary-adversarial values.
  */
object FastRound {
  private val Big = 4.503599627370496e15 // 2^52

  /** The reference — Spark Round's own arithmetic. */
  def ref(d: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  def round0(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return d
    if (Math.abs(d) >= Big) return ref(d, 0)
    val f = Math.floor(d)
    // d - f is CORRECTLY ROUNDED, not exact (e.g. d just below -0.5 has
    // finer granularity than d + 1, so the fraction collapses onto 0.5):
    // a strict computed inequality vs the representable 0.5 implies the
    // same strict inequality for the true fraction, but a computed 0.5
    // is ambiguous (true tie OR collapsed neighbor) — route it to the
    // reference. Cold in the kernels: their round0 inputs are 6-decimal
    // values scaled by 1e6, i.e. near-integers, never near ties.
    val frac = d - f
    if (frac == 0.5) return ref(d, 0)
    val r = if (frac > 0.5) f + 1.0 else f
    if (r == 0.0) 0.0 else r
  }

  def round6(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return d
    val y = d * 1e6
    if (Math.abs(y) >= Big) return ref(d, 6)
    val f = Math.floor(y)
    val frac = y - f
    val band = 4.0 * Math.ulp(y) + java.lang.Double.MIN_VALUE
    if (Math.abs(frac - 0.5) <= band) return ref(d, 6)
    val k = if (frac > 0.5) f + 1.0 else f
    val r = k / 1e6
    if (r == 0.0) 0.0 else r
  }
}

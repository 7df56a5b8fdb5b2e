package graft

import graft.plans.FastRound

/** Pins FastRound.{round0, round6} bit-identical to the BigDecimal
  * reference (Spark Round's own arithmetic) over boundary-adversarial
  * values — the kernels substitute FastRound per (row, codeword), so a
  * single divergent bit would break the native/join parity contract. */
class FastRoundSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def eq(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b) ||
      (a != a && b != b) // NaN == NaN for this purpose

  // Spark Round's semantics: non-finite passes through (the BigDecimal
  // reference would throw on it, which is why the kernels guard first)
  private def refSafe(d: Double, s: Int): Double =
    if (d != d || java.lang.Double.isInfinite(d)) d else FastRound.ref(d, s)

  private def checkAll(vals: Iterator[Double]): Unit =
    vals.foreach { d =>
      assert(eq(FastRound.round0(d), refSafe(d, 0)),
        s"round0 diverges at $d (bits ${java.lang.Double.doubleToRawLongBits(d)})")
      assert(eq(FastRound.round6(d), refSafe(d, 6)),
        s"round6 diverges at $d (bits ${java.lang.Double.doubleToRawLongBits(d)})")
    }

  test("exact ties, signed zeros, non-finite, magnitude extremes") {
    val base = Seq(0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 1e6 + 0.5,
      -(1e6 + 0.5), 0.25, -0.25, 0.75, -0.75,
      1.0 / 3.0, -1.0 / 3.0, 1e-7, -1e-7, 4.9e-7, 5e-7, 5.1e-7,
      -4.9e-7, -5e-7, -5.1e-7, 1.5e-6, -1.5e-6, 2.5e-6, -2.5e-6,
      0.49999999999999994, -0.49999999999999994, // largest double < 0.5
      0.5000000000000001, -0.5000000000000001,
      4.503599627370495e15, 4.503599627370497e15, // 2^52 straddle
      -4.503599627370495e15, -4.503599627370497e15,
      9.007199254740992e15, 1e300, -1e300, 1e-300, -1e-300,
      Double.MaxValue, Double.MinValue, Double.MinPositiveValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    checkAll(base.iterator)
    // every tie neighborhood at both scales: k + 0.5 (± ulps) and
    // (k + 0.5)e-6 (± ulps)
    val ties = for {
      k <- (-20 to 20).iterator
      b <- Iterator(k + 0.5, (k + 0.5) / 1e6)
      i <- (-3 to 3).iterator
    } yield {
      var v = b
      var j = 0
      while (j < math.abs(i)) { v = if (i > 0) Math.nextUp(v) else Math.nextDown(v); j += 1 }
      v
    }
    checkAll(ties)
  }

  test("deterministic pseudo-random sweep over the kernels' value range") {
    // cosine-like (|d| <= ~1.2), distance-like (0..400), and the
    // *1e6-scaled forms — the exact ranges the assignment kernels feed
    val rnd = new java.util.Random(20260819L)
    val vals = Iterator.continually {
      val u = rnd.nextDouble()
      rnd.nextInt(4) match {
        case 0 => u * 2.4 - 1.2
        case 1 => u * 400.0
        case 2 => (u * 2.4 - 1.2) * 1e6
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case x if x != x || java.lang.Double.isInfinite(x) => u
          case x => x
        }
      }
    }.take(200000)
    checkAll(vals)
  }
}

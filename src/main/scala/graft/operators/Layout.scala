package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout keys for multi-dimensional data skipping.
  *
  * Z-ordering (Morton curve) interleaves the bits of several columns so
  * rows close in the multi-dimensional key space land close in the
  * one-dimensional sort order. Written with `repartitionByRange(zval) +
  * sortWithinPartitions(zval)`, every file then covers a small
  * hyper-rectangle of the key space, and min/max file statistics prune
  * scans for predicates on ANY prefix-interleaved dimension — the
  * standard lakehouse clustering trick, here as a plain codegen'd
  * column expression (shift/mask arithmetic, no UDF).
  *
  * At 100 TB: a single-column sort skips files only for that column's
  * predicates; the Z-curve gives (slightly weaker) skipping on BOTH
  * dimensions from one layout — the right trade when queries filter on
  * either of two keys (e.g. customer and date) against the same table.
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (classic parallel-prefix bit spread, 4 shift/mask
    * rounds). */
  def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b1 = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b2 = b1.bitwiseOR(shiftleft(b1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val b3 = b2.bitwiseOR(shiftleft(b2, 2)).bitwiseAND(lit(0x33333333L))
    b3.bitwiseOR(shiftleft(b3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z (Morton) value of two 16-bit dimensions: x occupies the
    * even bits, y the odd bits. Inputs must already be reduced to
    * [0, 2^16) (pmod / scale upstream). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** N-dimensional Z (Morton) value: bit j of dimension i lands at
    * position `j * N + i`, so the interleave round-robins across all N
    * dimensions and file min/max stats prune on any of them. Curation
    * layout keys are routinely 3+ (source, language, length bucket) —
    * the 2-D fast path above doesn't compose to that.
    *
    * `bitsPerDim` defaults to the most that fits a signed long
    * (63 / N, e.g. 21 bits for 3 dims). Inputs must already be reduced
    * to [0, 2^bitsPerDim) (pmod / scale upstream); the expression masks
    * defensively. Pure shift/mask arithmetic — one codegen'd projection,
    * no UDF: bit-at-a-time is O(bits*N) ops, but they are all long ALU
    * ops fused into a single whole-stage-codegen expression, which at
    * scan width is free relative to the I/O it saves. */
  def zValueN(dims: Seq[Column], bitsPerDim: Int = 0): Column = {
    require(dims.nonEmpty, "zValueN needs at least one dimension")
    val n = dims.size
    val bits = if (bitsPerDim > 0) bitsPerDim else 63 / n
    require(n * bits <= 63, s"$n dims x $bits bits overflows a signed long")
    if (n == 2 && bits == 16) zValue(dims(0), dims(1))
    else dims.zipWithIndex.map { case (d, i) =>
      val masked = d.bitwiseAND(lit((1L << bits) - 1))
      (0 until bits).map { j =>
        shiftleft(shiftright(masked, j).bitwiseAND(lit(1L)), j * n + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }
}

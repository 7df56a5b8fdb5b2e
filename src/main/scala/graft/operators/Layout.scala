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
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `pq_assign(vec, sub_codewords, sub_cids)` — per-row product-
  * quantization assignment against a LITERAL codebook, as one native
  * codegen'd pass returning the m-long array of nearest-codeword ids.
  *
  * The join formulation ([[graft.operators.Pq.assign]]'s fallback)
  * cross-joins the corpus against the broadcast m×k codebook and packed-
  * min-aggregates the |corpus|·m·k pair relation back to |corpus|·m —
  * the same join-machinery shape the round-20 stage breakdown measured
  * dominating semantic decontamination, here multiplied by the FOUR
  * assign calls in the PQ chain (two Lloyd rounds, codes, distortion).
  * This expression computes the identical argmin in a tight loop over a
  * driver-packed primitive codebook: the pair relation never exists,
  * and the only surviving exchange is the duplicate-collapse aggregate
  * the join form also pays.
  *
  * Exact-parity contract with the join form, per (row e, subspace s):
  *  - d2 = Σᵢ (double(e[s·len+i]) − c[i])², left-to-right over the
  *    slice (the unrolled `reduce(_ + _)` order); q = round(round(d2,6)
  *    ·1e6, 0) cast long (Spark Round HALF_UP; a non-finite d2 or a q
  *    past the packable range FAILS FAST, as the ANSI join form's cast/
  *    multiply raise — never a silently saturating toLong); winner =
  *    min over codewords of q·B + cid, cell = that min mod B — lowest
  *    distance, lowest cid on ties, exactly the packed-long min.
  *  - a null slice (null vec, or a null element inside the slice)
  *    null-poisons every codeword's d2 in the join form, so that
  *    subspace's cell is NULL — reproduced here per subspace. A vector
  *    too SHORT for a subspace's slice is out of contract and raises
  *    (the join form's ANSI element_at does the same).
  *  - the [[graft.operators.Pq.checked]] codebook contract (cid ∈
  *    [0, B), unit-scale codewords) is enforced at driver packing time
  *    with the same message.
  * Output: ARRAY<BIGINT> of length m (entries nullable). The literal
  * children are (per-sub codeword matrices, per-sub cid lists), shaped
  * ARRAY<ARRAY<ARRAY<DOUBLE>>> / ARRAY<ARRAY<BIGINT>>; the caller
  * guarantees every sub non-empty with uniform codeword length
  * (gated at collect time — malformed books route to the join form).
  */
case class PqAssign(vec: Expression, subVecs: Expression, subCids: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = subVecs
  override def third: Expression = subCids
  override def prettyName: String = "pq_assign"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(vec.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"pq_assign expects ARRAY<FLOAT|DOUBLE> vec, got ${vec.dataType}")
    else if (!subVecs.foldable || !subCids.foldable)
      TypeCheckResult.TypeCheckFailure("pq_assign expects FOLDABLE codebook literals")
    else (subVecs.dataType, subCids.dataType) match {
      case (ArrayType(ArrayType(ArrayType(DoubleType, _), _), _),
            ArrayType(ArrayType(LongType, _), _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"pq_assign expects (ARRAY<ARRAY<ARRAY<DOUBLE>>>, ARRAY<ARRAY<BIGINT>>), got ($a, $b)")
    }

  private def vecFloat = vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val packed: PqAssign.Packed = {
    val vs = subVecs.eval(null).asInstanceOf[ArrayData]
    val ids = subCids.eval(null).asInstanceOf[ArrayData]
    require(vs != null && ids != null && vs.numElements() == ids.numElements()
      && vs.numElements() > 0, "pq_assign: per-sub literals must align and be non-empty")
    val m = vs.numElements()
    val books = new Array[Array[Array[Double]]](m)
    val cids = new Array[Array[Long]](m)
    var s = 0
    while (s < m) {
      val sub = vs.getArray(s)
      val k = sub.numElements()
      require(k > 0, s"pq_assign: subspace $s has no codewords")
      val words = new Array[Array[Double]](k)
      var j = 0
      while (j < k) { words(j) = sub.getArray(j).toDoubleArray(); j += 1 }
      books(s) = words
      cids(s) = ids.getArray(s).toLongArray()
      require(cids(s).length == k, s"pq_assign: cid/codeword mismatch in sub $s")
      s += 1
    }
    PqAssign.Packed(books, cids, books(0)(0).length)
  }

  override def eval(input: InternalRow): Any = {
    val e = vec.eval(input)
    PqAssign.scan(if (e == null) null else e.asInstanceOf[ArrayData], vecFloat, packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eGen = vec.genCode(ctx)
    val ref = ctx.addReferenceObj("pqAssignPacked", packed,
      classOf[PqAssign.Packed].getName)
    val resultCode =
      code"""
        ${eGen.code}
        ArrayData ${ev.value} = graft.plans.PqAssign.scan(
          ${eGen.isNull} ? null : ${eGen.value}, $vecFloat, $ref);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAssign =
    copy(vec = newFirst, subVecs = newSecond, subCids = newThird)
}

object PqAssign {
  private val B = 1L << 30 // MUST equal Pq.B (spec-pinned)

  case class Packed(books: Array[Array[Array[Double]]],
                    cids: Array[Array[Long]], subLen: Int)

  /** q at or past this overflows q·B + cid — exactly where the join
    * form's ANSI long multiply raises (B = 2^30, so q·B needs
    * q < 2^33). Unreachable under the |x| ≤ 10 contract (worst-case d2
    * ≈ 8590·1e6 < 2^33); the guard keeps out-of-contract corpus
    * vectors (which only the codebook side is checked for) failing
    * fast instead of letting a saturating toLong wrap the pack and
    * mint a negative/aliased cell the fallback would never emit. */
  private val QLimit = (1L << 33).toDouble

  // Spark Round(DOUBLE, s) semantics via FastRound: bit-identical to
  // the BigDecimal reference (see FastRound's compatibility argument +
  // FastRoundSpec), ~35x cheaper — this is called twice per
  // (row, codeword) pair, ~410M times per 100x corpus pass.

  def scan(e: ArrayData, eFloat: Boolean, p: Packed): ArrayData = {
    val m = p.books.length
    val len = p.subLen
    val out = new Array[Any](m)
    // copy the elementwise-read vector once; remember the first null
    // element position (slices containing it null-poison their sub)
    val eLen = if (e == null) -1 else e.numElements()
    val ev = if (eLen > 0) new Array[Double](eLen) else null
    var firstNull = -1
    if (eLen > 0) {
      var i = 0
      while (i < eLen) {
        if (e.isNullAt(i)) { if (firstNull < 0) firstNull = i }
        else ev(i) = if (eFloat) e.getFloat(i).toDouble else e.getDouble(i)
        i += 1
      }
    }
    var s = 0
    while (s < m) {
      val base = s * len
      // a too-short vector is OUT OF CONTRACT and the join form FAILS
      // FAST on it (ANSI element_at raises past the array bound) —
      // raise the same class of error rather than minting a null cell
      if (e != null && base + len > eLen)
        throw new ArrayIndexOutOfBoundsException(
          s"pq_assign: vector has $eLen elements but subspace $s needs " +
            s"indices [$base, ${base + len}) — m·subLen exceeds the vector length")
      // null vec, or a null element inside the slice -> every
      // codeword's d2 is null in the join form -> NULL cell
      val bad = e == null ||
        (firstNull >= 0 && firstNull >= base && firstNull < base + len)
      if (bad) out(s) = null
      else {
        val words = p.books(s)
        val cs = p.cids(s)
        var best = Long.MaxValue
        var j = 0
        while (j < words.length) {
          val c = words(j)
          var acc = 0.0
          var i = 0
          while (i < len) {
            val d = ev(base + i) - c(i)
            acc = if (i == 0) d * d else acc + d * d
            i += 1
          }
          val qd = FastRound.round0(FastRound.round6(acc) * 1e6)
          // ANSI parity: the join form raises on Cast(NaN/Inf AS BIGINT)
          // and on q·B + cid long-multiply overflow — fail fast
          // identically instead of letting toLong saturate and wrap
          // (d2 is a sum of squares, so qd < 0 cannot occur finite)
          if (java.lang.Double.isNaN(qd) || qd >= QLimit)
            throw new ArithmeticException(
              s"pq_assign: distance term $acc in subspace $s is outside " +
                "the packable range (out-of-contract vector magnitude?) — " +
                "the ANSI join form fails fast on the cast/multiply, so " +
                "does the native path")
          val q = qd.toLong
          val pk = q * B + cs(j)
          if (pk < best) best = pk
          j += 1
        }
        out(s) = java.lang.Long.valueOf(best % B)
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

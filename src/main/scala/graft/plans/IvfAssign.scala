package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `ivf_assign(vec, cent_vecs, cent_cids)` — per-row IVF coarse-cell
  * assignment (max-cosine, lowest-cid ties) against a LITERAL centroid
  * matrix, as one native codegen'd pass returning the winning cell id.
  *
  * The join formulation ([[graft.operators.Similarity.ivfAssignToJoin]],
  * the fallback) cross-joins the corpus against the broadcast ≤64-row
  * centroid relation and packed-max-aggregates the |corpus|·k pair
  * relation back to |corpus| rows — the same broadcast-join×corpus→
  * immediate-argmax shape [[BenchMaxCos]] and [[PqAssign]] already
  * collapsed (round-20 A/B: 2.4–3.3× on their call sites), paid here
  * per Lloyd round in `kmeansCentroids`, per IVF/ANN query, and per
  * ST19 trigger's coarse assign. This expression computes the identical
  * argmax in a tight loop over a driver-packed primitive matrix: the
  * pair relation never exists, and the only surviving exchange is the
  * duplicate-collapse aggregate the join form also pays.
  *
  * Exact-parity contract with the join form, per row e:
  *  - vn = sqrt(Σᵢ double(e[i])²), cn_j = sqrt(Σᵢ double(c_j[i])²) —
  *    the `vec_dot(a, a)` left-to-right fold (cn_j precomputed at
  *    driver packing time, as the join form computes it once per
  *    centroid row);
  *  - ccos_j = round(dot(e, c_j) / (vn · cn_j), 6) (Spark Round
  *    HALF_UP, non-finite passthrough); q_j = round(ccos_j·1e6, 0)
  *    cast long; winner = max over centroids of q_j·B + (B−1−cid_j);
  *    cell = B−1 − pmod(winner, B) — highest cosine, lowest cid on
  *    ties, exactly the packed-long max with B = 2^40.
  *  - a null vec, a null element inside it, or a length mismatch with
  *    the (uniform-length) centroids null-poisons `vec_dot` for EVERY
  *    centroid in the join form, so the cell is NULL — reproduced here.
  *  - a non-finite ccos (zero-norm vector) or a |q| that would overflow
  *    the packed long FAILS FAST in the join form (ANSI Cast /
  *    multiply raise) — reproduced here with the same fail-fast
  *    posture rather than a silently saturating toLong.
  *  - the cid range invariant (0 ≤ cid < 2^40) is enforced at driver
  *    packing time with the join form's assert message.
  * Output: BIGINT cell (nullable). The literal children are
  * (centroid matrix, cid list), shaped ARRAY<ARRAY<DOUBLE>> /
  * ARRAY<BIGINT>; the caller guarantees a non-empty matrix of uniform
  * row length (gated at collect time — malformed or oversized centroid
  * sets route to the join form).
  */
case class IvfAssign(vec: Expression, centVecs: Expression, centCids: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = centVecs
  override def third: Expression = centCids
  override def prettyName: String = "ivf_assign"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(vec.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"ivf_assign expects ARRAY<FLOAT|DOUBLE> vec, got ${vec.dataType}")
    else if (!centVecs.foldable || !centCids.foldable)
      TypeCheckResult.TypeCheckFailure("ivf_assign expects FOLDABLE centroid literals")
    else (centVecs.dataType, centCids.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"ivf_assign expects (ARRAY<ARRAY<DOUBLE>>, ARRAY<BIGINT>), got ($a, $b)")
    }

  private def vecFloat = vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val packed: IvfAssign.Packed = {
    val vs = centVecs.eval(null).asInstanceOf[ArrayData]
    val ids = centCids.eval(null).asInstanceOf[ArrayData]
    require(vs != null && ids != null && vs.numElements() == ids.numElements()
      && vs.numElements() > 0, "ivf_assign: centroid literals must align and be non-empty")
    val k = vs.numElements()
    val cents = new Array[Array[Double]](k)
    val cids = ids.toLongArray()
    val cnorms = new Array[Double](k)
    var j = 0
    while (j < k) {
      // the join form's cid-range guard, enforced at packing time with
      // the same message (a cid outside [0, 2^40) would corrupt the pack)
      require(cids(j) >= 0 && cids(j) < IvfAssign.B,
        "ivfAssignTo: centroid cid must be in [0, 2^40)")
      val c = vs.getArray(j).toDoubleArray()
      require(j == 0 || c.length == cents(j - 1).length,
        s"ivf_assign: centroid $j length ${c.length} breaks uniform-length contract")
      cents(j) = c
      // per-centroid norm exactly as the join form's one-per-centroid
      // projection: sqrt of the vec_dot(c, c) left-to-right fold
      var acc = 0.0
      var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      cnorms(j) = Math.sqrt(acc)
      j += 1
    }
    IvfAssign.Packed(cents, cids, cnorms, cents(0).length)
  }

  override def eval(input: InternalRow): Any = {
    val e = vec.eval(input)
    IvfAssign.scan(if (e == null) null else e.asInstanceOf[ArrayData], vecFloat, packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eGen = vec.genCode(ctx)
    val ref = ctx.addReferenceObj("ivfAssignPacked", packed,
      classOf[IvfAssign.Packed].getName)
    val box = ctx.freshName("ivfCellBox")
    val resultCode =
      code"""
        ${eGen.code}
        java.lang.Long $box = graft.plans.IvfAssign.scan(
          ${eGen.isNull} ? null : ${eGen.value}, $vecFloat, $ref);
        boolean ${ev.isNull} = ($box == null);
        long ${ev.value} = ${ev.isNull} ? -1L : $box.longValue();
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): IvfAssign =
    copy(vec = newFirst, centVecs = newSecond, centCids = newThird)
}

object IvfAssign {
  private[plans] val B = 1L << 40 // MUST equal Similarity's packing base (spec-pinned)

  /** |q| at or past this overflows q·B + (B−1−cid) — exactly where the
    * join form's ANSI long multiply raises. Unreachable for real
    * cosines (|q| ≤ ~1e6 < 2^21); the guard keeps out-of-contract
    * inputs failing fast instead of silently corrupting the pack. */
  private val QLimit = (1L << 23).toDouble

  case class Packed(cents: Array[Array[Double]], cids: Array[Long],
                    cnorms: Array[Double], centLen: Int)

  // Spark Round(DOUBLE, s) semantics via FastRound: bit-identical to
  // the BigDecimal reference (see FastRound's compatibility argument +
  // FastRoundSpec), ~35x cheaper — called twice per (row, centroid).

  def scan(e: ArrayData, eFloat: Boolean, p: Packed): java.lang.Long = {
    if (e == null) return null // null vec -> null dot for every centroid -> NULL cell
    val n = e.numElements()
    // vec_dot nulls on length mismatch; centroids are uniform-length, so
    // EVERY pair row nulls and the join form's max-of-nulls is NULL
    if (n != p.centLen) return null
    val ev = new Array[Double](n)
    var vsq = 0.0
    var i = 0
    while (i < n) {
      // a null element null-poisons vec_dot for every centroid -> NULL
      if (e.isNullAt(i)) return null
      val x = if (eFloat) e.getFloat(i).toDouble else e.getDouble(i)
      ev(i) = x
      vsq += x * x
      i += 1
    }
    val vn = Math.sqrt(vsq)
    var best = Long.MinValue
    var j = 0
    while (j < p.cents.length) {
      val c = p.cents(j)
      var dot = 0.0
      var k = 0
      while (k < c.length) { dot += ev(k) * c(k); k += 1 }
      val ccos = FastRound.round6(dot / (vn * p.cnorms(j)))
      val q = FastRound.round0(ccos * 1e6)
      // ANSI parity: the join form raises on Cast(non-finite AS BIGINT)
      // (zero-norm vector) and on packed-long multiply overflow — fail
      // fast identically instead of letting toLong saturate silently
      if (java.lang.Double.isNaN(q) || q >= QLimit || q < -QLimit)
        throw new ArithmeticException(
          s"ivf_assign: cosine term $ccos is outside the packable range " +
            "(zero-norm or out-of-contract vector) — the ANSI join form " +
            "fails fast on the cast/multiply, so does the native path")
      val pk = q.toLong * B + (B - 1L - p.cids(j))
      if (pk > best) best = pk
      j += 1
    }
    java.lang.Long.valueOf(B - 1L - Math.floorMod(best, B))
  }
}

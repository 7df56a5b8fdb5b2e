package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `bench_max_cos(vec, bench_vecs, bench_ids)` — per-row max cosine
  * against a LITERAL benchmark matrix, as one native codegen'd pass.
  *
  * The fallback formulation of semantic decontamination
  * ([[graft.operators.Curation.semanticContamination]]) cross-joins the
  * corpus against the broadcast bench relation and struct-max-aggregates
  * the pair relation back down — |corpus|·|bench| ROWS of join machinery
  * (UnsafeRow materialization, per-pair array re-reads, partial-agg
  * hashing) around |corpus|·|bench| fused dot products. The round-20
  * per-stage breakdown of `q_curation_e2e` at 100× measured that stage
  * at 57–127 s of a ~90–130 s total — both the flagship's dominant term
  * AND all of its run-to-run spread. This expression does the identical
  * arithmetic in a tight per-row loop over a driver-packed primitive
  * matrix: no join, no pair relation, no agg state — the stage becomes
  * a map-only projection (plus the |corpus|-row per-id max the fallback
  * also pays), and the DuckDB oracle keeps its independent CROSS JOIN
  * re-derivation as the mirror.
  *
  * Exact-parity contract with the fallback, per (row e, bench j):
  *  - cos_j = when(en > 0 && bn_j > 0, round(dot(e,b_j)/(en·bn_j), 6))
  *    .otherwise(0.0) — en = sqrt(vec_dot(e,e)); a null en or bn_j
  *    (null array / null element) nulls the AND and falls to 0.0,
  *    reproduced here by routing invalid/zero-norm cases to 0.0 (an
  *    invalid bench vector is encoded as the EMPTY inner array, whose
  *    bn = 0 takes the same branch). A length mismatch with en,bn > 0
  *    yields a NULL cos (vec_dot's null-poisoning), kept as null.
  *  - dot and norms are the exact [[VecDot.dot]] fold (left-to-right
  *    double accumulation from 0.0); round6 is Spark's Round on DOUBLE
  *    (BigDecimal HALF_UP, non-finite passthrough).
  *  - the result is max by (cos asc-nulls-first, -bench_id asc) — i.e.
  *    greatest cosine, smallest id on ties, null cos losing to any
  *    non-null — exactly the fallback's max(struct(c, -bid)).
  * Output: struct(max_cos DOUBLE, top_bench_id BIGINT); a NULL input
  * row behaves like the fallback's null-norm case (all cos 0.0).
  * `bench_vecs`/`bench_ids` must be foldable non-empty literals (the
  * empty-bench case returns an empty RELATION in the fallback, which no
  * per-row expression can express — callers gate on it).
  */
case class BenchMaxCos(vec: Expression, benchVecs: Expression, benchIds: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = benchVecs
  override def third: Expression = benchIds
  override def prettyName: String = "bench_max_cos"
  override def dataType: DataType = BenchMaxCos.schema
  override def nullable: Boolean = false

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(vec.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"bench_max_cos expects ARRAY<FLOAT|DOUBLE> vec, got ${vec.dataType}")
    else if (!benchVecs.foldable || !benchIds.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bench_max_cos expects FOLDABLE bench matrix/id literals")
    else (benchVecs.dataType, benchIds.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (bv, bi) => TypeCheckResult.TypeCheckFailure(
        s"bench_max_cos expects (ARRAY<ARRAY<DOUBLE>>, ARRAY<BIGINT>), got ($bv, $bi)")
    }

  private def vecFloat = vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Literal children evaluated ONCE into primitive arrays with
    * precomputed norms; shared by interpreted eval and (as a codegen
    * reference object) every generated task. */
  @transient private lazy val packed: BenchMaxCos.Packed = {
    val vs = benchVecs.eval(null).asInstanceOf[ArrayData]
    val ids = benchIds.eval(null).asInstanceOf[ArrayData]
    require(vs != null && ids != null && vs.numElements() == ids.numElements()
      && vs.numElements() > 0,
      "bench_max_cos: bench matrix and id literals must be equal-length and non-empty")
    val m = vs.numElements()
    val vecs = new Array[Array[Double]](m)
    val bn = new Array[Double](m)
    var j = 0
    while (j < m) {
      val row = vs.getArray(j)
      val a = if (row == null) new Array[Double](0) else row.toDoubleArray()
      vecs(j) = a
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * a(i); i += 1 }
      bn(j) = math.sqrt(acc)
      j += 1
    }
    BenchMaxCos.Packed(vecs, bn, ids.toLongArray())
  }

  override def eval(input: InternalRow): Any = {
    val e = vec.eval(input)
    BenchMaxCos.scan(
      if (e == null) null else e.asInstanceOf[ArrayData], vecFloat, packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eGen = vec.genCode(ctx)
    val ref = ctx.addReferenceObj("benchMaxCosPacked", packed,
      classOf[BenchMaxCos.Packed].getName)
    val resultCode =
      code"""
        ${eGen.code}
        InternalRow ${ev.value} = graft.plans.BenchMaxCos.scan(
          ${eGen.isNull} ? null : ${eGen.value}, $vecFloat, $ref);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BenchMaxCos =
    copy(vec = newFirst, benchVecs = newSecond, benchIds = newThird)
}

object BenchMaxCos {
  val schema: StructType = StructType(Seq(
    StructField("max_cos", DoubleType, nullable = true),
    StructField("top_bench_id", LongType, nullable = false)))

  /** Primitive-packed bench side: raw vectors (invalid → empty array),
    * precomputed norms, ids. Serializable — shipped once per task as a
    * codegen reference object, like a broadcast but expression-local. */
  case class Packed(vecs: Array[Array[Double]], bn: Array[Double], bids: Array[Long])

  /** Spark Round(DOUBLE, 6) via FastRound: bit-identical to the
    * BigDecimal reference (FastRound's compatibility argument +
    * FastRoundSpec), ~35x cheaper — called once per (row, bench row). */
  private def round6(d: Double): Double = FastRound.round6(d)

  def scan(e: ArrayData, eFloat: Boolean, p: Packed): InternalRow = {
    // One elementwise read of the input per ROW (copied to a primitive
    // array, norm folded into the same pass) — the |bench| dot loops
    // below then run over pure double[]s instead of re-reading the
    // ArrayData |bench| times through its accessor indirection.
    // en: null array or any null element -> the fallback's null norm ->
    // every cosine 0.0 (enPos = false takes that branch for all j)
    var enPos = false
    var en = 0.0
    var eLen = 0
    var ev: Array[Double] = null
    if (e != null) {
      val n = e.numElements()
      val copy = new Array[Double](n)
      var ok = true
      var acc = 0.0
      var i = 0
      while (ok && i < n) {
        if (e.isNullAt(i)) ok = false
        else {
          val v = if (eFloat) e.getFloat(i).toDouble else e.getDouble(i)
          copy(i) = v
          acc += v * v
          i += 1
        }
      }
      if (ok) { en = math.sqrt(acc); enPos = en > 0.0; eLen = n; ev = copy }
    }
    // max by (cos, -bid): null cos sorts below every non-null
    var bestSet = false
    var bestNull = false
    var bestC = 0.0
    var bestBid = 0L
    var j = 0
    while (j < p.vecs.length) {
      val bnj = p.bn(j)
      var cNull = false
      var c = 0.0
      if (!enPos || !(bnj > 0.0)) c = 0.0
      else {
        val b = p.vecs(j)
        if (eLen != b.length) cNull = true // vec_dot's length-mismatch null
        else {
          var acc = 0.0
          var i = 0
          while (i < b.length) {
            acc += ev(i) * b(i)
            i += 1
          }
          c = round6(acc / (en * bnj))
        }
      }
      val bid = p.bids(j)
      val better =
        if (!bestSet) true
        else if (cNull != bestNull) bestNull // non-null beats null
        else if (cNull) bid < bestBid        // both null: smallest id
        else {
          val cmp = java.lang.Double.compare(c, bestC)
          cmp > 0 || (cmp == 0 && bid < bestBid)
        }
      if (better) { bestSet = true; bestNull = cNull; bestC = c; bestBid = bid }
      j += 1
    }
    new GenericInternalRow(Array[Any](
      if (bestNull) null else java.lang.Double.valueOf(bestC), bestBid))
  }
}

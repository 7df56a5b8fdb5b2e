package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_dot(a, b)` — double-precision dot product over float/double
  * array columns as a native codegen'd expression.
  *
  * Identical fold to the built-in composition
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  * (acc, x) -> acc + x)` — left-to-right accumulation starting at 0.0,
  * per-element widening to double — so results are bit-identical and
  * DuckDB oracle mirrors are unaffected. The built-in form runs three
  * interpreted higher-order functions per evaluation; embeddings work
  * (cosine ranking, hyperplane bucketing, IVF assignment) evaluates it
  * per row × per plane/centroid/pair, which makes it the second hot
  * path worth a real `Expression` (after shingling).
  */
case class VecDot(a: Expression, b: Expression) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // Null even for non-null inputs: length mismatch / null elements.
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(a.dataType) && elemOk(b.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects ARRAY<FLOAT|DOUBLE> args, got (${a.dataType}, ${b.dataType})")

  private def aFloat = a.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def bFloat = b.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(x: Any, y: Any): Any =
    VecDot.dot(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      java.lang.Double ${ev.value}Box =
        graft.plans.VecDot.dot($x, $y, $aFloat, $bFloat);
      if (${ev.value}Box == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Box.doubleValue();
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(a = newLeft, b = newRight)
}

object VecDot {
  /** Left-to-right double accumulation from 0.0 — the exact fold of the
    * built-in aggregate/zip_with composition. zip_with null-pads the
    * shorter array and a null product poisons the whole sum, so a length
    * mismatch (or a null element) yields NULL, not a partial dot — a
    * truncated embedding must surface as null, not a plausible score. */
  def dot(x: ArrayData, y: ArrayData, xFloat: Boolean, yFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — word n-grams as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Semantically identical to the built-in composition
  * `filter(transform(sequence(...), i -> concat_ws(' ', slice(split(text,
  * '\\s+'), i+1, n))), s -> s <> '')` (see
  * [[graft.operators.Similarity.shinglesArray]]), but the built-in form
  * runs through three higher-order functions, which are CodegenFallback
  * (interpreted per row, with per-shingle array allocations). Shingling
  * feeds every MinHash/LSH/Jaccard pipeline, so this is the one hot path
  * where a custom `Expression` is genuinely warranted; `doGenCode` emits
  * a single static call that runs inside the surrounding codegen stage.
  *
  * Registered as a SQL function by [[graft.GraftExtensions]]; operators
  * fall back to the built-in composition when the extension is absent.
  */
case class WordShingles(text: Expression, n: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects (STRING, INT), got (${text.dataType}, ${n.dataType})")

  // Null text yields an EMPTY array, not null — shinglesArray's
  // when(size >= n, ...).otherwise(empty) falls to otherwise on a null
  // condition, and the bit-identical invariant must hold at the column
  // level. Only a null n propagates null.
  override def nullable: Boolean = n.nullable

  override def eval(input: InternalRow): Any = {
    val nv = n.eval(input)
    if (nv == null) null
    else {
      val tv = text.eval(input)
      if (tv == null) WordShingles.EMPTY
      else WordShingles.build(tv.asInstanceOf[UTF8String], nv.asInstanceOf[Int])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tGen = text.genCode(ctx)
    val nGen = n.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${nGen.code}
      boolean ${ev.isNull} = ${nGen.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${tGen.code}
        ${ev.value} = ${tGen.isNull}
          ? graft.plans.WordShingles.EMPTY()
          : graft.plans.WordShingles.build(${tGen.value}, ${nGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): WordShingles =
    copy(text = newLeft, n = newRight)
}

object WordShingles {
  /** Shared empty result for null text (accessed from generated code via
    * the static forwarder `EMPTY()`). */
  val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Exact replica of the built-in composition's semantics:
    * split on `\s+` with limit -1 (Spark's `split` keeps trailing
    * empties), windows of n tokens joined by single spaces, fully-empty
    * shingles dropped, fewer-than-n tokens -> empty array. */
  def build(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (s.nonEmpty) out.add(UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

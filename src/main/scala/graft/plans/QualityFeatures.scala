package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `quality_features(text)` — every count the composite quality score
  * needs, from ONE pass over the document's bytes, as a native
  * codegen'd expression.
  *
  * The built-in formulation ([[graft.functions.Text.qualityScore]]
  * fallback) re-scans the document once per signal: two
  * `regexp_extract_all` (each allocating a match ARRAY with one entry
  * per matched character), one `regexp_replace`, one `split` plus a
  * higher-order `filter` (CodegenFallback, interpreted). That regex
  * stack is the dominant linear term of every quality-driven query
  * (fitted p = 0.77 on q_curriculum_anneal, 0.66 on q_source_cap —
  * SCALE.md round 18). This expression computes the SAME six counts in
  * a single allocation-free byte scan; the score's arithmetic stays in
  * Column space on top of the struct, so the composite is bit-identical
  * to the fallback and the DuckDB oracles keep their independent regex
  * formulation as the mirror.
  *
  * Exact-parity contract, per field (Java regex semantics, ASCII `\s`):
  *  - n_chars = length(c)                  — Unicode code points
  *  - n_alpha = count of matches of [A-Za-z]
  *  - n_punct = count of matches of [^A-Za-z0-9\s] (one per code point;
  *    every non-ASCII code point is in this class)
  *  - n_ws    = code points removed by regexp_replace(c, "\\s+", "")
  *  - n_tok   = size(split(c, "\\s+")) = (number of maximal \s+ runs)
  *    + 1, reproducing Java split-with-limit=-1 exactly: leading
  *    separators contribute an empty first token, trailing separators
  *    an empty last one, "" has one (empty) token
  *  - n_stop  = size(filter(split(c, "\\s+"), t -> t isin ENGLISH_STOP))
  *
  * Registered by [[graft.GraftExtensions]]; null text yields null.
  */
case class QualityFeatures(text: Expression) extends UnaryExpression {

  override def child: Expression = text
  override def prettyName: String = "quality_features"
  override def dataType: DataType = QualityFeatures.schema
  override def nullable: Boolean = text.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_features expects STRING, got ${text.dataType}")

  override def nullSafeEval(t: Any): Any =
    QualityFeatures.scan(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.QualityFeatures.scan($t);")

  override protected def withNewChildInternal(newChild: Expression): QualityFeatures =
    copy(text = newChild)
}

object QualityFeatures {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  /** [[graft.functions.Text.englishStopwords]] as UTF-8 byte arrays —
    * token membership compares raw slices, no string materialization.
    * Derived from the canonical list at class load (same convention as
    * GopherCounts/LangHits) so an edit there propagates here; the sync
    * spec stays as the tripwire for the fallback path. */
  private val STOP: Array[Array[Byte]] =
    graft.functions.Text.englishStopwords.map(_.getBytes("UTF-8")).toArray
  private val STOP_MAX: Int = STOP.map(_.length).max

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One pass over the UTF-8 bytes. Code points are counted at
    * non-continuation bytes ((b & 0xC0) != 0x80 — how UTF8String's own
    * numChars counts); classification only needs the lead byte because
    * every non-ASCII code point falls in the punct class ([A-Za-z],
    * [0-9] and Java's default `\s` are ASCII-only). */
  def scan(t: UTF8String): InternalRow = {
    val bytes = t.getBytes
    val n = bytes.length
    var nChars = 0; var nAlpha = 0; var nPunct = 0; var nWs = 0
    var wsRuns = 0; var nStop = 0
    var inWs = false
    var tokStart = 0 // byte offset where the current token began
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xC0) != 0x80) { // code-point start
        nChars += 1
        if (b >= 0) { // ASCII
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
            nAlpha += 1; if (inWs) { inWs = false; tokStart = i }
          } else if (b >= '0' && b <= '9') {
            if (inWs) { inWs = false; tokStart = i }
          } else if (isWs(b)) {
            nWs += 1
            if (!inWs) { wsRuns += 1; nStop += stopHit(bytes, tokStart, i); inWs = true }
          } else {
            nPunct += 1; if (inWs) { inWs = false; tokStart = i }
          }
        } else { // non-ASCII lead byte: always the punct class
          nPunct += 1; if (inWs) { inWs = false; tokStart = i }
        }
      }
      i += 1
    }
    if (!inWs) nStop += stopHit(bytes, tokStart, n)
    // split-with-limit=-1: tokens = separator runs + 1. The stopword
    // accounting above closes a token at each run start and at end of
    // string UNLESS the string ends inside a separator run (that run's
    // trailing token is empty — never a stopword, nothing to add).
    new GenericInternalRow(Array[Any](
      nChars, nAlpha, nPunct, nWs, wsRuns + 1, nStop))
  }

  /** 1 when bytes[from, until) equals one of the stopwords. */
  private def stopHit(bytes: Array[Byte], from: Int, until: Int): Int = {
    val len = until - from
    if (len < 1 || len > STOP_MAX) return 0
    var w = 0
    while (w < STOP.length) {
      val s = STOP(w)
      if (s.length == len) {
        var j = 0
        while (j < len && s(j) == bytes(from + j)) j += 1
        if (j == len) return 1
      }
      w += 1
    }
    0
  }
}

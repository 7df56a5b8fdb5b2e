package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gopher_counts(text)` — the five counts the Gopher rule bank needs,
  * from one lowercase pass plus one byte scan, as a native codegen'd
  * expression. Completes the no-interpreted-text-scan story started by
  * `quality_features` and `lang_hits`: the fallback formulation
  * ([[graft.functions.Text.gopherRules]]) runs `regexp_extract_all`
  * over the lowercased text (allocating one string per word), a
  * `regexp_replace`, two interpreted higher-order filters (one with a
  * per-word `rlike`!), and another `regexp_extract_all` — and it gates
  * EVERY document at the head of the curation E2E.
  *
  * Exact-parity contract (thresholds stay in Column algebra upstream,
  * exactly like the quality score):
  *  - n_words = size(regexp_extract_all(lower(c), "[a-z0-9]+"))
  *    — maximal ASCII-alnum runs of the LOWERCASED text. Lowercasing
  *    uses UTF8String.toLowerCase — the same function Spark's lower()
  *    executes — so exotic mappings (Kelvin sign → 'k') agree by
  *    construction; in UTF-8, no byte of a multi-byte code point is in
  *    [a-z0-9], so byte-level run detection is exact.
  *  - sum_len = length(regexp_replace(lower(c), "[^a-z0-9]", ""))
  *    — the total count of alnum code points (all ASCII).
  *  - n_alpha = words containing at least one [a-z] byte.
  *  - n_sym   = size(regexp_extract_all(c, "#|\\.\\.\\.")) over the
  *    ORIGINAL text — leftmost non-overlapping: at each position '#'
  *    matches first, else a 3-byte "..." consumes all three dots.
  *  - n_stop  = words byte-equal to an English stopword (the canonical
  *    [[graft.functions.Text.englishStopwords]], compiled at load).
  * Null text → null struct (the rule booleans read null, as the regex
  * path's do). Registered by [[graft.GraftExtensions]].
  */
case class GopherCounts(text: Expression) extends UnaryExpression {

  override def child: Expression = text
  override def prettyName: String = "gopher_counts"
  override def dataType: DataType = GopherCounts.schema
  override def nullable: Boolean = text.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_counts expects STRING, got ${text.dataType}")

  override def nullSafeEval(t: Any): Any =
    GopherCounts.scan(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.GopherCounts.scan($t);")

  override protected def withNewChildInternal(newChild: Expression): GopherCounts =
    copy(text = newChild)
}

object GopherCounts {
  import graft.functions.Text

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  private val STOP: Array[Array[Byte]] =
    Text.englishStopwords.map(_.getBytes("UTF-8")).toArray
  private val STOP_MAX = STOP.map(_.length).max

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def scan(t: UTF8String): GenericInternalRow = {
    // one lowercase materialization (identical semantics to lower()),
    // then allocation-free byte scans
    val low = t.toLowerCase.getBytes
    var nWords = 0L; var sumLen = 0L; var nAlpha = 0L; var nStop = 0L
    var i = 0
    val n = low.length
    while (i < n) {
      if (isWordByte(low(i))) {
        val from = i
        var hasAlpha = false
        while (i < n && isWordByte(low(i))) {
          if (low(i) >= 'a' && low(i) <= 'z') hasAlpha = true
          i += 1
        }
        nWords += 1
        sumLen += i - from
        if (hasAlpha) nAlpha += 1
        if (i - from <= STOP_MAX) nStop += stopHit(low, from, i)
      } else i += 1
    }
    // symbol count on the ORIGINAL bytes: '#' first, else a 3-dot run
    val orig = t.getBytes
    var nSym = 0L
    var j = 0
    while (j < orig.length) {
      if (orig(j) == '#') { nSym += 1; j += 1 }
      else if (orig(j) == '.' && j + 2 < orig.length &&
               orig(j + 1) == '.' && orig(j + 2) == '.') { nSym += 1; j += 3 }
      else j += 1
    }
    new GenericInternalRow(Array[Any](nWords, sumLen, nAlpha, nSym, nStop))
  }

  private def stopHit(bytes: Array[Byte], from: Int, until: Int): Long = {
    val len = until - from
    var w = 0
    while (w < STOP.length) {
      val s = STOP(w)
      if (s.length == len) {
        var j = 0
        while (j < len && s(j) == bytes(from + j)) j += 1
        if (j == len) return 1L
      }
      w += 1
    }
    0L
  }
}

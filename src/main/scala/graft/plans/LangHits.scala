package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_hits(text)` — per-language stopword hit counts from ONE pass
  * over the document's bytes, as a native codegen'd expression.
  *
  * The built-in formulation ([[graft.functions.Text.langId]] fallback)
  * runs `size(filter(split(text, "\\s+"), t -> t isin words))` once PER
  * LANGUAGE: five splits (each allocating the token array) and five
  * interpreted higher-order filters per document. Language-ID runs in
  * every curation composite (q_curate, q_prepare_corpus, the lang-mix
  * panels), so after the quality-regex stack (QualityFeatures) this was
  * the next-largest interpreted linear term (fitted p = 0.47 on
  * q_langid_kappa's corpus scan).
  *
  * Exact-parity contract: tokens are Java split-with-limit=-1 segments
  * between ASCII `\s+` runs (empty segments match no stopword, so only
  * non-empty tokens need comparing); each language counts tokens
  * byte-equal to one of its ten stopwords — a token may score for
  * SEVERAL languages ('de' is a French and Spanish stopword), exactly
  * as five independent filters would. Null text yields a null struct,
  * which the argmax fold upstream reads as 'und' — same as the
  * built-in path. The stopword tables derive from the canonical
  * [[graft.functions.Text.stopwords]] at class-load, so the two paths
  * cannot drift.
  *
  * Registered by [[graft.GraftExtensions]].
  */
case class LangHits(text: Expression) extends UnaryExpression {

  override def child: Expression = text
  override def prettyName: String = "lang_hits"
  override def dataType: DataType = LangHits.schema
  override def nullable: Boolean = text.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_hits expects STRING, got ${text.dataType}")

  override def nullSafeEval(t: Any): Any =
    LangHits.scan(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.LangHits.scan($t);")

  override protected def withNewChildInternal(newChild: Expression): LangHits =
    copy(text = newChild)
}

object LangHits {
  import graft.functions.Text

  val schema: StructType = StructType(
    Text.stopwords.map { case (lang, _) =>
      StructField(s"h_$lang", IntegerType, nullable = false) })

  private val LANG_WORDS: Array[Array[Array[Byte]]] =
    Text.stopwords.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
  private val N_LANGS = LANG_WORDS.length
  private val MAX_LEN = LANG_WORDS.iterator.flatten.map(_.length).max

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def scan(t: UTF8String): GenericInternalRow = {
    val bytes = t.getBytes
    val n = bytes.length
    val hits = new Array[Int](N_LANGS)
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || (bytes(i) >= 0 && isWs(bytes(i)))) {
        score(bytes, tokStart, i, hits)
        // skip the whole separator run (token starts after it)
        while (i < n && bytes(i) >= 0 && isWs(bytes(i))) i += 1
        tokStart = i
        if (i == n) i += 1 // end-of-string token already scored; terminate
      } else i += 1
    }
    new GenericInternalRow(hits.map(Int.box(_): Any))
  }

  /** Count bytes[from, until) into each language it stopword-matches. */
  private def score(bytes: Array[Byte], from: Int, until: Int,
                    hits: Array[Int]): Unit = {
    val len = until - from
    if (len < 1 || len > MAX_LEN) return
    var li = 0
    while (li < N_LANGS) {
      val words = LANG_WORDS(li)
      var w = 0
      var matched = false
      while (!matched && w < words.length) {
        val s = words(w)
        if (s.length == len) {
          var j = 0
          while (j < len && s(j) == bytes(from + j)) j += 1
          matched = j == len
        }
        w += 1
      }
      if (matched) hits(li) += 1
      li += 1
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting.
  *
  * All pure `Column` combinators (codegen'd, no UDFs) so they scale to
  * 100 TB document corpora as embarrassingly-parallel projections — no
  * shuffle, no state.
  */
object Text {

  /** A/B kill switch for the native one-pass text expressions
    * (quality_features / lang_hits / gopher_counts): set
    * GRAFT_AB_NO_NATIVE_TEXT=1 to force the regex/HOF fallbacks for
    * re-adjudication, same convention as GRAFT_AB_NO_MEMO. */
  private def nativeTextEnabled: Boolean =
    !sys.env.contains("GRAFT_AB_NO_NATIVE_TEXT")

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(c, "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token counting: letter runs, digit runs, and single
    * punctuation marks each count as one token. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column = size(regexp_extract_all(c, lit(bpeTokenPattern), lit(0)))

  // ---------------------------------------------------------------------
  // Language ID — n-gram/stopword heuristic. Scores each language by the
  // fraction of tokens found in its tiny stopword set; argmax with a fixed
  // priority order for deterministic ties.
  // ---------------------------------------------------------------------
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "que", "por"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人")
  )

  /** English stopword list looked up BY KEY — [[qualityScore]] and
    * [[gopherRules]] hard-depend on the English list specifically (their
    * oracles inline these ten words), so a positional `stopwords.head`
    * would silently diverge if the language table were ever reordered. */
  val englishStopwords: Seq[String] = stopwords.toMap.apply("en")

  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(words: _*)))

  def stopwordRatio(c: Column, words: Seq[String]): Column =
    stopwordHits(c, words) / greatest(tokenCount(c), lit(1))

  /** Predicted language: highest stopword-hit count wins; ties resolve in
    * `stopwords` declaration order; zero hits everywhere -> 'und'.
    *
    * With [[graft.GraftExtensions]] registered, the five hit counts come
    * from the native one-pass `lang_hits` expression
    * ([[graft.plans.LangHits]]) instead of five split+interpreted-filter
    * passes; the argmax fold is the same Column algebra over the same
    * integer counts either way (null text -> null scores -> 'und' on
    * both paths), so results — and the DuckDB oracles' independent
    * formulation — are bit-identical. */
  def langId(c: Column): Column = {
    val native = nativeTextEnabled &&
      org.apache.spark.sql.SparkSession.getActiveSession
      .exists(s => try s.catalog.functionExists("lang_hits")
                   catch { case _: Throwable => false })
    val scored: Seq[(String, Column)] =
      if (native) {
        val f = call_function("lang_hits", c)
        stopwords.map { case (lang, _) => lang -> f.getField(s"h_$lang") }
      } else stopwords.map { case (lang, words) => lang -> stopwordHits(c, words) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // first declared language holding the max score wins (deterministic ties)
    scored.reverse.foldLeft(lit("und")) { case (els, (lang, score)) =>
      when(score === best && score > 0, lit(lang)).otherwise(els)
    }
  }

  // ---------------------------------------------------------------------
  // Quality scoring — length / punctuation / stopword signals, the
  // standard pre-training corpus filters.
  // ---------------------------------------------------------------------
  def punctRatio(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0))) / greatest(length(c), lit(1))

  def alphaRatio(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]"), lit(0))) / greatest(length(c), lit(1))

  def meanTokenLength(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")) / greatest(tokenCount(c), lit(1)).cast(DoubleType)

  /** Composite quality score in [0,1]-ish: rewards alpha density and
    * stopword presence, penalizes extreme token lengths & punctuation.
    *
    * When [[graft.GraftExtensions]] is registered on the active
    * session, the six counts come from the native one-pass
    * `quality_features` expression ([[graft.plans.QualityFeatures]]) —
    * the regex-stack fallback re-scans the document ~5× with per-match
    * array allocation, and was the dominant linear term of every
    * quality-driven query (p=0.77 on q_curriculum_anneal, SCALE.md).
    * The score ARITHMETIC is identical Column algebra over the same
    * integer counts either way (Int/Int divisions, same between/least
    * terms, same final round), so the two paths — and the DuckDB
    * oracle's independent regex formulation — are bit-identical. */
  def qualityScore(c: Column): Column = {
    val native = nativeTextEnabled &&
      org.apache.spark.sql.SparkSession.getActiveSession
      .exists(s => try s.catalog.functionExists("quality_features")
                   catch { case _: Throwable => false })
    if (native) {
      val f = call_function("quality_features", c)
      val nTok = f.getField("n_tok")
      val nChars = greatest(f.getField("n_chars"), lit(1))
      val enRatio = f.getField("n_stop") / greatest(nTok, lit(1))
      val meanTok = (f.getField("n_chars") - f.getField("n_ws")) /
        greatest(nTok, lit(1)).cast(DoubleType)
      round(
        (f.getField("n_alpha") / nChars) * lit(0.4)
          + least(enRatio * lit(4.0), lit(1.0)) * lit(0.3)
          + when(nTok.between(20, 100000), lit(0.2)).otherwise(lit(0.0))
          + when(meanTok.between(3.0, 10.0), lit(0.1)).otherwise(lit(0.0))
          - (f.getField("n_punct") / nChars) * lit(0.4),
        4)
    } else qualityScoreBuiltin(c)
  }

  /** The regex-stack formulation — the fallback for vanilla sessions
    * and the parity mirror QualityFeaturesSpec holds the native path
    * to (the DuckDB oracles restate THIS form independently). */
  private[graft] def qualityScoreBuiltin(c: Column): Column = {
    val enRatio = stopwordRatio(c, englishStopwords)
    round(
      alphaRatio(c) * lit(0.4)
        + least(enRatio * lit(4.0), lit(1.0)) * lit(0.3)
        + when(tokenCount(c).between(20, 100000), lit(0.2)).otherwise(lit(0.0))
        + when(meanTokenLength(c).between(3.0, 10.0), lit(0.1)).otherwise(lit(0.0))
        - punctRatio(c) * lit(0.4),
      4)
  }

  // ---------------------------------------------------------------------
  // Document fingerprinting — order-insensitive content key (md5 of the
  // sorted distinct token set): catches shuffled/bag-of-words duplicates
  // that exact-hash dedup misses.
  // ---------------------------------------------------------------------
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(c))))))

  /** Exact-content key for hash dedup. */
  def contentHash(c: Column): Column = md5(c)

  // ---------------------------------------------------------------------
  // Context-window chunking — split a document into fixed-size token
  // chunks with overlap (stride = chunkSize - overlap), the pretraining
  // sequence-preparation step. Pure projection: the chunk array is a
  // per-row expression; explode it downstream for one-row-per-chunk.
  // The final partial chunk is kept (training pipelines pad it);
  // a doc shorter than one chunk yields a single chunk = the doc.
  // ---------------------------------------------------------------------
  def chunkTokens(c: Column, chunkSize: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkSize, "0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = tokens(c)
    // start offsets 0, stride, 2*stride, ... while start < numTokens
    // (last start = stride * floor((n-1)/stride) for n > 0)
    val lastStart = lit(stride) * floor((size(toks) - 1).cast(DoubleType) / stride).cast(IntegerType)
    when(size(toks) > 0,
      transform(sequence(lit(0), lastStart, lit(stride)),
        s => concat_ws(" ", slice(toks, s + 1, lit(chunkSize)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  // ---------------------------------------------------------------------
  // PII redaction — regex scrub of emails / US phone numbers / SSNs to
  // typed placeholder tokens, the standard pre-training privacy pass.
  // Patterns avoid lookaround/backreferences so Java regex and RE2-style
  // engines agree; applied SSN-first so a phone pattern can never eat a
  // partial SSN. Pure projection: scales as a map-only pass.
  // ---------------------------------------------------------------------
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val phonePattern = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, ssnPattern, "<SSN>"),
        emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  // ---------------------------------------------------------------------
  // Markup stripping — web-scraped corpora arrive as HTML/markdown; the
  // text-extraction pass drops tags, resolves markdown links to their
  // anchor text, strips emphasis/heading markers, and collapses the
  // whitespace the removals leave behind. Regexes avoid lookaround so
  // Java regex (Spark) and RE2 (DuckDB/Go tooling) agree; pure
  // projection, map-only at any scale.
  // ---------------------------------------------------------------------
  val tagPattern = "<[^>]*>"
  val mdLinkPattern = "\\[([^\\]]*)\\]\\([^)]*\\)"
  val mdMarkPattern = "[*_`#]+"

  def stripMarkup(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, tagPattern, " "),
          mdLinkPattern, "$1"),
        mdMarkPattern, ""),
      "\\s+", " "))

  // ---------------------------------------------------------------------
  // Unicode normalization — casefold + accent fold + punctuation strip,
  // the canonical-key pass before exact dedup or term indexing (a true
  // NFKC pass needs an ICU UDF; the translate map covers the Latin-1
  // accent block, which is what web-corpus near-ASCII text contains).
  // translate() is per-codepoint in both Spark and DuckDB, so the fold
  // is engine-portable on NFC input. Pure projection — map-only at any
  // scale. Escapes, not raw bytes, per the invisible-byte incident.
  // ---------------------------------------------------------------------
  val accentFrom =
    "\u00e1\u00e0\u00e2\u00e4\u00e3\u00e5\u00e7\u00e9" +
    "\u00e8\u00ea\u00eb\u00ed\u00ec\u00ee\u00ef\u00f1" +
    "\u00f3\u00f2\u00f4\u00f6\u00f5\u00fa\u00f9\u00fb" +
    "\u00fc\u00fd\u00ff"
  val accentTo = "aaaaaaceeeeiiiinooooouuuuyy"
  require(accentFrom.length == accentTo.length, "accent map must be 1:1")

  /** Lowercase + strip Latin-1 accents (lower() first, so uppercase
    * accented letters fold through their lowercase forms). */
  def foldAccents(c: Column): Column = translate(lower(c), accentFrom, accentTo)

  /** Canonical text key: accent-folded, non-alphanumerics collapsed to
    * single spaces, trimmed. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(foldAccents(c), "[^a-z0-9 ]", " "), " +", " "))

  // ---------------------------------------------------------------------
  // Gopher-style rule bank — the per-rule boolean filter set of Rae et
  // al. 2021 (word-count bounds, mean-word-length band, symbol ratio,
  // alphabetic-word fraction, stopword floor), as distinct from the
  // weighted composite `qualityScore`: a curator reads WHICH rule a
  // document failed, and ablates rules independently. Every threshold
  // is an all-integer comparison (3n ≤ Σlen, 5·n_alpha ≥ 4n, …), so
  // verdicts never ride a double — exactly reproducible in any engine.
  // Pure projection: map-only at any scale.
  // ---------------------------------------------------------------------
  val wordPattern = "[a-z0-9]+"
  val symbolPattern = "#|\\.\\.\\."

  /** Per-document Gopher rule flags as a struct: word count within
    * [minWords, maxWords]; mean word length within [3, 10]; symbol
    * (# / ellipsis) to word ratio ≤ 1/10; ≥ 4/5 of words contain an
    * alphabetic character; ≥ 2 stopword hits; and the conjunction.
    * Words are maximal lowercase alnum runs (no empty tokens). */
  def gopherRules(c: Column, minWords: Int = 10, maxWords: Int = 100000): Column = {
    val native = nativeTextEnabled &&
      org.apache.spark.sql.SparkSession.getActiveSession
      .exists(s => try s.catalog.functionExists("gopher_counts")
                   catch { case _: Throwable => false })
    // With GraftExtensions registered, the five counts come from the
    // native one-lowercase-pass `gopher_counts` expression
    // ([[graft.plans.GopherCounts]]) instead of two regexp_extract_all,
    // a regexp_replace, and two interpreted HOF filters (one running a
    // per-word rlike). The rule booleans are the same Long algebra over
    // the same counts either way — bit-identical, oracles unchanged.
    val (nWords, sumLen, nAlpha, nSym, nStop) =
      if (native) {
        val f = call_function("gopher_counts", c)
        (f.getField("n_words"), f.getField("sum_len"), f.getField("n_alpha"),
          f.getField("n_sym"), f.getField("n_stop"))
      } else {
        val words = regexp_extract_all(lower(c), lit(wordPattern), lit(0))
        (size(words).cast(LongType),
          length(regexp_replace(lower(c), "[^a-z0-9]", "")).cast(LongType),
          size(filter(words, w => w.rlike("[a-z]"))).cast(LongType),
          size(regexp_extract_all(c, lit(symbolPattern), lit(0))).cast(LongType),
          size(filter(words, w => w.isin(englishStopwords: _*))).cast(LongType))
      }
    val rWc = nWords.between(minWords.toLong, maxWords.toLong)
    val rMwl = lit(3L) * nWords <= sumLen && sumLen <= lit(10L) * nWords
    val rAlpha = lit(5L) * nAlpha >= lit(4L) * nWords
    val rSym = lit(10L) * nSym <= nWords
    val rStop = nStop >= 2L
    struct(
      nWords.as("n_words"),
      rWc.as("r_wordcount"),
      rMwl.as("r_meanwordlen"),
      rAlpha.as("r_alphawords"),
      rSym.as("r_symbolratio"),
      rStop.as("r_stopwords"),
      (rWc && rMwl && rAlpha && rSym && rStop).as("passed"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Text

/** The native one-pass quality_features expression must be
  * bit-identical to the regex-stack formulation it replaces — the
  * DuckDB oracles restate the regex form independently, so ANY
  * divergence here is a future correctness FAIL, not a perf nuance. */
class QualityFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("extension registers quality_features and qualityScore uses it") {
    assert(spark.catalog.functionExists("quality_features"))
    val plan = Seq("x").toDF("t").select(Text.qualityScore(col("t")))
      .queryExecution.analyzed.toString
    assert(plan.contains("quality_features"),
      s"qualityScore must route through the native expression:\n$plan")
  }

  test("per-count parity with the regex definitions on adversarial cases") {
    val cases = Seq(
      "", " ", "  ", "a", "the", " the ", "\tthe\n", "the the the",
      "Hello, world! x2", "a  b   c", "  leading", "trailing  ",
      "élève café", // Latin-1 accents: non-ASCII = punct class
      "的是了 the 我", // CJK + embedded stopword
      "emoji 😀 mixed", // supplementary code point (4-byte UTF-8)
      "that is it for", "That Is It For", // case sensitivity
      "ab\fc", // the exotic \s members: VT and FF
      "numbers 123 and-hyphens don't_split", "!!!@@@###",
      ("the quick brown fox jumps over the lazy dog and it is a fine day " * 5).trim)
    val df = cases.toDF("t")
    val got = df.select(expr("quality_features(t)").as("f")).select(
      col("f.n_chars"), col("f.n_alpha"), col("f.n_punct"),
      col("f.n_ws"), col("f.n_tok"), col("f.n_stop")).collect()
    val want = df.select(
      length(col("t")),
      size(regexp_extract_all(col("t"), lit("[A-Za-z]"), lit(0))),
      size(regexp_extract_all(col("t"), lit("[^A-Za-z0-9\\s]"), lit(0))),
      length(col("t")) - length(regexp_replace(col("t"), "\\s+", "")),
      size(split(col("t"), "\\s+")),
      size(filter(split(col("t"), "\\s+"),
        t => t.isin(Text.englishStopwords: _*)))).collect()
    cases.indices.foreach { i =>
      assert(got(i).toSeq == want(i).toSeq,
        s"counts diverge on ${cases(i).take(40)}: native ${got(i)} vs regex ${want(i)}")
    }
  }

  test("composite score parity: native path == regex fallback, null-safe") {
    val texts = (Gen.listOfN(400, Gen.oneOf(
      Gen.listOfN(30, Gen.oneOf("the", "a", "of", "zz", "Ab1", "!?", "café"))
        .map(_.mkString(" ")),
      Gen.asciiPrintableStr,
      Gen.listOfN(12, Gen.asciiPrintableStr).map(_.mkString(" "))))
      .apply(Gen.Parameters.default, Seed(19L)).get :+ null) :+ ""
    val df = texts.map(Tuple1(_)).toDF("t")
    val bad = df.select(
        Text.qualityScore(col("t")).as("native"),
        Text.qualityScoreBuiltin(col("t")).as("builtin"))
      .filter(!(col("native") <=> col("builtin")))
    assert(bad.count() == 0, s"diverging rows:\n${bad.collect().mkString("\n")}")
  }

  test("lang_hits: native counts == five split+filter passes, incl. cross-language tokens") {
    val cases = Seq(
      "the cat sat on the mat and it is warm",
      "der hund ist nicht mit der katze und das haus",
      "le chat est dans la maison et il est pour les amis",
      "el gato es de la casa y es por una amiga",
      "的 是 了 在 我 有", // whitespace-separated zh stopwords (3-byte UTF-8)
      "de de de",          // 'de' scores for BOTH fr and es, never for lang de
      "", " ", "xyzzy qwerty", "the", " the ", "that\tis\nit")
    val df = cases.toDF("t")
    val got = df.select(expr("lang_hits(t)").as("f"))
      .select(Text.stopwords.map { case (l, _) => col(s"f.h_$l") }: _*).collect()
    val want = df.select(Text.stopwords.map { case (_, ws) =>
      Text.stopwordHits(col("t"), ws) }: _*).collect()
    cases.indices.foreach(i => assert(got(i).toSeq == want(i).toSeq,
      s"hit counts diverge on '${cases(i)}': native ${got(i)} vs builtin ${want(i)}"))
  }

  test("langId parity: native struct path == built-in argmax fold, null-safe") {
    val texts = (Gen.listOfN(300, Gen.oneOf(
      Gen.listOfN(12, Gen.oneOf("the", "der", "le", "el", "的", "de", "la",
        "is", "ist", "es", "zz", "!?")).map(_.mkString(" ")),
      Gen.asciiPrintableStr)).apply(Gen.Parameters.default, Seed(23L)).get :+ null) :+ ""
    val df = texts.map(Tuple1(_)).toDF("t")
    // the built-in fold, assembled from public pieces (the session has the
    // extension registered, so Text.langId itself takes the native path)
    val scored = Text.stopwords.map { case (l, ws) => l -> Text.stopwordHits(col("t"), ws) }
    val best = scored.map(_._2).reduce(greatest(_, _))
    val builtin = scored.reverse.foldLeft(lit("und")) { case (els, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(els) }
    val bad = df.select(Text.langId(col("t")).as("native"), builtin.as("builtin"))
      .filter(!(col("native") <=> col("builtin")))
    assert(bad.count() == 0, s"diverging rows:\n${bad.collect().take(5).mkString("\n")}")
  }

  test("gopher_counts: native counts == the regex/HOF definitions, incl. unicode lower") {
    val cases = Seq(
      "", " ", "The Quick BROWN fox", "the the", "a1b2 3c4d",
      "no#sym ### ....", "......", ".. . ...", "#",
      "KELVIN", // KELVIN SIGN lowercases to ASCII 'k' — the nasty one
      "élève café the", "的是了 the", "CAPS-ONLY WORDS THE OF",
      "x" * 300, "word " * 50)
    val df = cases.toDF("t")
    val got = df.select(expr("gopher_counts(t)").as("f")).select(
      col("f.n_words"), col("f.sum_len"), col("f.n_alpha"),
      col("f.n_sym"), col("f.n_stop")).collect()
    val words = regexp_extract_all(lower(col("t")), lit(Text.wordPattern), lit(0))
    val want = df.select(
      size(words).cast("long"),
      length(regexp_replace(lower(col("t")), "[^a-z0-9]", "")).cast("long"),
      size(filter(words, w => w.rlike("[a-z]"))).cast("long"),
      size(regexp_extract_all(col("t"), lit(Text.symbolPattern), lit(0))).cast("long"),
      size(filter(words, w => w.isin(Text.englishStopwords: _*))).cast("long")).collect()
    cases.indices.foreach(i => assert(got(i).toSeq == want(i).toSeq,
      s"gopher counts diverge on '${cases(i).take(30)}': native ${got(i)} vs regex ${want(i)}"))
  }

  test("gopherRules parity: native path == regex fallback on generated text, null-safe") {
    val texts = (Gen.listOfN(300, Gen.oneOf(
      Gen.listOfN(25, Gen.oneOf("the", "of", "Word", "x9", "###", "...", "é"))
        .map(_.mkString(" ")),
      Gen.asciiPrintableStr)).apply(Gen.Parameters.default, Seed(31L)).get :+ null) :+ ""
    val df = texts.map(Tuple1(_)).toDF("t")
    // the fallback, assembled from the same public regex pieces
    val words = regexp_extract_all(lower(col("t")), lit(Text.wordPattern), lit(0))
    val nWords = size(words).cast("long")
    val sumLen = length(regexp_replace(lower(col("t")), "[^a-z0-9]", "")).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[a-z]"))).cast("long")
    val nSym = size(regexp_extract_all(col("t"), lit(Text.symbolPattern), lit(0))).cast("long")
    val nStop = size(filter(words, w => w.isin(Text.englishStopwords: _*))).cast("long")
    val rWc = nWords.between(10L, 100000L)
    val rMwl = lit(3L) * nWords <= sumLen && sumLen <= lit(10L) * nWords
    val rAlpha = lit(5L) * nAlpha >= lit(4L) * nWords
    val rSym = lit(10L) * nSym <= nWords
    val rStop = nStop >= 2L
    val builtin = struct(nWords.as("n_words"), rWc.as("r_wordcount"),
      rMwl.as("r_meanwordlen"), rAlpha.as("r_alphawords"),
      rSym.as("r_symbolratio"), rStop.as("r_stopwords"),
      (rWc && rMwl && rAlpha && rSym && rStop).as("passed"))
    val bad = df.select(Text.gopherRules(col("t")).as("native"), builtin.as("builtin"))
      .filter(!(col("native") <=> col("builtin")))
    assert(bad.count() == 0, s"diverging rows:\n${bad.collect().take(5).mkString("\n")}")
  }

  test("stopword byte table stays in sync with the canonical list") {
    // the expression compiles the english stopwords into byte arrays;
    // membership over the column path must agree with isin on every word
    val df = Text.englishStopwords.toDF("t")
    val hits = df.select(expr("quality_features(t)").as("f"))
      .select(sum(col("f.n_stop"))).collect()(0).getLong(0)
    assert(hits == Text.englishStopwords.length.toLong,
      "every canonical stopword must count as its own hit")
  }
}

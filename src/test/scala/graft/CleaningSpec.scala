package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Cleaning

/** Table-driven unit tests for the §2.8 scalar family, with cases lifted
  * from the reference literals (file:line cited per test). */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](in: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    in.toDF("v").select(f(col("v")).as("r")).collect().map(_.get(0)).toSeq

  // F17 — lot-size free-text parse (Kafka_GSMLSConsumer.py:494-519)
  test("F17 lotSizeSqft parses LxW / SF / AC and defaults garbage to 0.0") {
    val cases = Seq(
      "100x50"   -> 5000.0,
      "100 X 50" -> 5000.0,
      "12000 SF" -> 12000.0,
      "12000SF." -> 12000.0,
      "1.5 AC"   -> 65340.0,
      "2 ACRES"  -> 87120.0,
      "IRR"      -> 0.0,
      ""         -> 0.0,
      "50x"      -> 0.0)
    val got = eval1(cases.map(_._1), Cleaning.lotSizeSqft)
    assert(got == cases.map(_._2))
  }

  test("F17 lotSizeSqft null-in -> 0.0") {
    val r = Seq[Option[String]](None).toDF("v")
      .select(Cleaning.lotSizeSqft(col("v"))).collect()(0).getDouble(0)
    assert(r == 0.0)
  }

  // F3 — currency parse (GSMLS.py:916-928)
  test("F3 parseCurrency strips $ and commas; '---' sentinel -> 0.0") {
    val cases = Seq(
      "$1,234.56" -> 1234.56,
      "1,234"     -> 1234.0,
      "$0"        -> 0.0,
      "---"       -> 0.0,
      " --- "     -> 0.0)
    assert(eval1(cases.map(_._1), Cleaning.parseCurrency) == cases.map(_._2))
  }

  test("F3 parseCurrency unparsable -> null (coercing, not throwing)") {
    assert(eval1(Seq("abc"), Cleaning.parseCurrency) == Seq(null))
  }

  // F18 — APN zero-pad (GSMLS.py:694-754)
  test("F18 apnNormalize pads town-block-qual-lot-qual segments") {
    val r = Seq((7, 42, 3)).toDF("t", "b", "l")
      .select(Cleaning.apnNormalize(col("t"), col("b"), col("l")).as("apn"))
      .collect()(0).getString(0)
    assert(r == "0007-00042-00000-00003-00000")
  }

  // F9 — short-sale negation override (Kafka_GSMLSConsumer.py:522-587)
  test("F9 shortSaleFlag honors the NOT A SHORT SALE negation") {
    val df = Seq(
      ("this is a short sale opportunity", true),
      ("THIS IS NOT A SHORT SALE", false),
      ("regular listing", false),
      ("Short Sale! bank must approve", true)).toDF("remarks", "expected")
    val bad = df.filter(!(Cleaning.shortSaleFlag(col("remarks")) <=> col("expected"))).count()
    assert(bad == 0)
  }

  test("F9 flags escalate (OR of detectors), never unset") {
    val df = Seq("fixer upper AND bank-owned reo").toDF("remarks")
    val r = df.select(
      Cleaning.fixerUpperFlag(col("remarks")),
      Cleaning.bankOwnedFlag(col("remarks")),
      Cleaning.distressedFlag(col("remarks"))).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  // F4 — concat with na_rep (Kafka_GSMLSConsumer.py:143-149)
  test("F4 concatNaRep substitutes na_rep for nulls (pandas str.cat parity)") {
    val df = Seq(("a", null: String, "c")).toDF("x", "y", "z")
    val r = df.select(Cleaning.concatNaRep(". ", "_", col("x"), col("y"), col("z")))
      .collect()(0).getString(0)
    assert(r == "a. _. c")
  }

  // F22 — first-match classifier bank (RealEstateImages.py:36-60)
  test("F22 firstMatchClassify routes first match, default otherwise") {
    val rules = Cleaning.homeSections
    val cases = Seq(
      "Master Bathroom" -> "Bathroom",   // 'bath' wins over 'master' (declaration order)
      "Eat-in Kitchen"  -> "Kitchen",
      "floor plan"      -> "Alternates",
      "mystery room"    -> "Other")
    val got = eval1(cases.map(_._1), c => Cleaning.firstMatchClassify(c, rules, "Other"))
    assert(got == cases.map(_._2))
  }

  // F26 — tolerant cast (Kafka_GSMLSConsumer.py:477-483)
  test("F26 tolerantCast falls back per-value, never throws") {
    val df = Seq("12.5", "junk", "-3").toDF("v")
    val got = df.select(Cleaning.tolerantCast(col("v"), DoubleType, lit(-1.0)))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(12.5, -1.0, -3.0))
  }

  // F20 — municipality suffix strip (GSMLS.py:2177-2179)
  test("F20 stripMunicipalitySuffix strips only the trailing suffix word") {
    val cases = Seq(
      "Morris Twp"    -> "Morris",
      "Jersey City"   -> "Jersey",
      "Boro Park"     -> "Boro Park",   // not trailing -> kept
      "Madison Boro"  -> "Madison")
    assert(eval1(cases.map(_._1), Cleaning.stripMunicipalitySuffix) == cases.map(_._2))
  }

  // F19 — address normalization (GSMLS.py:131-151)
  test("F19 normalizeAddressPart collapses junk; dropDotZero; padZip") {
    assert(eval1(Seq("  12  MAIN*ST  "), Cleaning.normalizeAddressPart) == Seq("12 MAIN ST"))
    assert(eval1(Seq("123.0"), Cleaning.dropDotZero) == Seq("123"))
    val zip = Seq(942).toDF("z").select(Cleaning.padZip(col("z"))).collect()(0).getString(0)
    assert(zip == "00942")
  }

  // F12 — coercing date parse (Kafka_GSMLSConsumer.py:51-86)
  test("F12 parseDateCoerce nulls on sentinel/garbage, parses valid") {
    val got = Seq("03/15/2024 10:30:00", Cleaning.Sentinels.DateStr, "nonsense")
      .toDF("v").select(Cleaning.parseDateCoerce(col("v")).as("t")).collect()
    assert(got(0).get(0) != null && got(1).get(0) == null && got(2).get(0) == null)
  }

  // F8 — dict-driven multi-hot expansion (Kafka_GSMLSConsumer.py:617-885)
  test("F8 multiHot expands attribute dictionaries to boolean columns") {
    val df = Seq(("Wood,Tile", "Gas"), ("Carpet", "Electric")).toDF("FLOORS", "UTILITIES")
    val out = Cleaning.multiHot(df, Map(
      "FLOORS" -> Map("WOOD_FLOORS" -> "Wood", "TILE_FLOORS" -> "Tile"),
      "UTILITIES" -> Map("GAS_UTIL" -> "Gas"),
      "MISSING_COL" -> Map("NEVER" -> "x")))
    assert(out.columns.toSet == Set("FLOORS", "UTILITIES", "WOOD_FLOORS", "TILE_FLOORS", "GAS_UTIL"))
    val rows = out.orderBy("FLOORS").collect()
    assert(!rows(0).getAs[Boolean]("WOOD_FLOORS")) // Carpet row
    assert(rows(1).getAs[Boolean]("WOOD_FLOORS") && rows(1).getAs[Boolean]("TILE_FLOORS")
      && rows(1).getAs[Boolean]("GAS_UTIL"))
  }

  // F10 — style reclassification incl. csv-list membership (Kafka_GSMLSConsumer.py:1185-1218)
  test("F10 subPropTypeSfh checks primary style and STYLE_SHORT csv list") {
    val df = Seq(
      ("OneFloor", "Colonial", "CCT"),
      ("Colonial", "TwnEndUn,Ranch", "CCT"),
      ("Colonial", "Ranch", "SinglFam"),
      ("Colonial", null, "SinglFam")).toDF("prim", "list", "expected")
    val bad = df.filter(
      !(Cleaning.subPropTypeSfh(col("prim"), col("list")) <=> col("expected"))).count()
    assert(bad == 0)
  }

  // F21 — lat/long extraction (GSMLS.py:883,909-911) + IMAGES dict parse
  test("F21 extractLat/Lng from navigate(); parseImagesDict to map") {
    val r = Seq("javascript:navigate(40.7128,-74.0060)").toDF("v")
      .select(Cleaning.extractLat(col("v")), Cleaning.extractLng(col("v"))).collect()(0)
    assert(r.getString(0) == "40.7128" && r.getString(1) == "-74.0060")
    val m = Seq("{'Front': 'http://x/1.png', 'Kitchen': 'http://x/2.png'}").toDF("v")
      .select(Cleaning.parseImagesDict(col("v")).as("m"))
      .collect()(0).getMap[String, String](0)
    assert(m == Map("Front" -> "http://x/1.png", "Kitchen" -> "http://x/2.png"))
  }

  // F5 — regex rule bank applies in declared order to declared columns
  test("F5 applyRegexRules applies rule bank in order, skips absent columns") {
    val df = Seq(("Newark.(1234)*", "12%")).toDF("TOWN", "SP/LP%")
    val out = Cleaning.applyRegexRules(df, Cleaning.gsmlsCleanupRules)
      .collect()(0)
    assert(out.getString(0) == "Newark" && out.getString(1) == "12")
  }

  // F27 — sentinel fillna restricted to present columns
  test("F27 fillSentinels fills only covered, present columns") {
    val df = Seq((Some("x"), None: Option[String]), (None, None))
      .toDF("a", "b")
    val out = Cleaning.fillSentinels(df, Map("b" -> "Unknown", "zzz" -> "nope"))
    assert(out.filter(!(col("b") <=> "Unknown")).count() == 0)
    assert(out.filter(col("a").isNull).count() == 1) // 'a' untouched
  }
}

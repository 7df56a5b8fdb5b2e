package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar / column-level cleaning functions — SURVEY.md §2.8 (F1–F28).
  *
  * Every function here is a pure `Column` combinator built from
  * `org.apache.spark.sql.functions._`, so the whole cleaning surface stays
  * inside whole-stage codegen: no UDFs, no row loops. The reference
  * (TheNJineer/GSMLS-Analysis) performs the same transforms row-at-a-time
  * in pandas (`iterrows()`); here each one is a columnar expression that
  * Catalyst can push, prune, and fuse.
  *
  * Config tables (regex rule banks, attribute dictionaries, fillna
  * sentinel maps) are plain Scala `Seq`/`Map` so pipelines stay data-driven
  * exactly like the reference's dict-driven stages.
  */
object Cleaning {

  // ---------------------------------------------------------------------
  // F1 — column-name case normalization (GSMLS.py:1362, :1703)
  // ---------------------------------------------------------------------
  def upperColumns(df: DataFrame): DataFrame = df.toDF(df.columns.map(_.toUpperCase): _*)
  def lowerColumns(df: DataFrame): DataFrame = df.toDF(df.columns.map(_.toLowerCase): _*)

  // ---------------------------------------------------------------------
  // F3 — currency / formatted-number parse (GSMLS.py:916-928)
  // '$1,234.56' -> 1234.56 ; '1,234' -> 1234.0 ; '---' -> 0.0
  // ---------------------------------------------------------------------
  def parseCurrency(c: Column): Column =
    when(trim(c) === "---", lit(0.0))
      .otherwise(regexp_replace(c, "[$,]", "").try_cast(DoubleType))
      // try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
      // THROWS on unparsable input; the reference's errors='coerce' nulls.

  // ---------------------------------------------------------------------
  // F4 — null-safe concat with explicit na_rep (Kafka_GSMLSConsumer.py:143-149)
  // pandas str.cat(sep='. ', na_rep='_') substitutes the sentinel for nulls;
  // Spark's concat_ws *skips* nulls — coalesce each piece for parity.
  // ---------------------------------------------------------------------
  def concatNaRep(sep: String, naRep: String, cols: Column*): Column =
    concat_ws(sep, cols.map(c => coalesce(c.cast(StringType), lit(naRep))): _*)

  // ---------------------------------------------------------------------
  // F5 — regex cleanup rule bank (Kafka_GSMLSConsumer.py:1106-1182)
  // Rules are (pattern, replacement, columns); applied in declared order.
  // ---------------------------------------------------------------------
  final case class RegexRule(pattern: String, replacement: String, columns: Seq[String])

  def applyRegexRules(df: DataFrame, rules: Seq[RegexRule]): DataFrame =
    rules.foldLeft(df) { (acc, r) =>
      r.columns.foldLeft(acc) { (a, cName) =>
        if (a.columns.contains(cName))
          a.withColumn(cName, regexp_replace(col(cName), r.pattern, r.replacement))
        else a
      }
    }

  /** Cleanup rules mirroring Kafka_GSMLSConsumer.py:1108-1164 semantics. */
  val gsmlsCleanupRules: Seq[RegexRule] = Seq(
    RegexRule("\\*", "", Seq("TOWN", "STREETNAME", "STREETNUMDISPLAY")),
    RegexRule("%", "", Seq("SP/LP%", "OLP/LP%", "SP/OLP%", "RP/LP%")),
    RegexRule("\\.\\s*\\(\\d+\\)\\*?$", "", Seq("TOWN")),           // 'Newark.(1234)*' -> 'Newark'
    RegexRule("^00:00:00$", "0.0", Seq("ASSESSTOTAL", "ASSESSAMOUNTBLDG", "ASSESSAMOUNTLAND")),
    RegexRule("^Public(,\\w+)?", "Public", Seq("WATER_SHORT")),
    RegexRule("^(\\d)\\1{3,}$", "0.0", Seq("SQFTAPPROX", "TAXAMOUNT"))  // repeated-digit garbage
  )

  // ---------------------------------------------------------------------
  // F6 — control-character strip (Kafka_GSMLSConsumer.py:287-313)
  // ---------------------------------------------------------------------
  def stripControlChars(c: Column): Column = regexp_replace(c, "[\\x00-\\x1f]", "")

  def stripControlChars(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df)((a, n) => a.withColumn(n, stripControlChars(col(n))))

  // ---------------------------------------------------------------------
  // F7 — case-insensitive regex containment flag (Kafka_GSMLSConsumer.py:590-597)
  // SELLERNAME ~ llc|Investment|Builders|Inc|Corp|Group -> INVESTMENT_SALE
  // ---------------------------------------------------------------------
  def regexFlag(c: Column, pattern: String): Column =
    coalesce(c.rlike("(?i)" + pattern), lit(false))

  val investmentSellerPattern = "llc|investment|builders|inc|corp|group"

  // ---------------------------------------------------------------------
  // F8 — multi-hot attribute expansion (Kafka_GSMLSConsumer.py:617-885)
  // Comma-joined attr list column × token dictionary -> boolean columns.
  // array_contains over split() keeps exact-token semantics (a `rlike`
  // would also match substrings); both stay codegen'd.
  // ---------------------------------------------------------------------
  def tokenFlag(listCol: Column, token: String, sep: String = ","): Column =
    coalesce(array_contains(split(listCol, sep), token), lit(false))

  /** Expand (sourceCol -> (newBoolCol -> token)) dictionaries in one pass. */
  def multiHot(df: DataFrame, dict: Map[String, Map[String, String]], sep: String = ","): DataFrame = {
    val newCols: Map[String, Column] = for {
      (src, flags) <- dict if df.columns.contains(src)
      (newCol, token) <- flags
    } yield newCol -> tokenFlag(col(src), token, sep)
    df.withColumns(newCols)
  }

  // ---------------------------------------------------------------------
  // F9 — remarks text classification (Kafka_GSMLSConsumer.py:522-587)
  // Flags may only ESCALATE (never unset): encode as OR of detectors, not
  // sequential overwrite — SURVEY §7.4(5).
  // ---------------------------------------------------------------------
  val fixerUpperPattern =
    "(?i)fixer\\s?upper|handyman|tlc|as[- ]is|needs? work|bring your tools|investor special"
  val bankOwnedPattern  = "(?i)bank[- ]owned|reo|foreclos|corporate owned"
  val shortSalePattern  = "(?i)short sale"
  val notShortSalePattern = "(?i)not a short sale"

  /** Short-sale flag with the "NOT A SHORT SALE" negation override. */
  def shortSaleFlag(remarks: Column): Column =
    coalesce(remarks.rlike(shortSalePattern) && !remarks.rlike(notShortSalePattern), lit(false))

  def bankOwnedFlag(remarks: Column): Column  = regexFlag(remarks, "bank[- ]owned|reo|foreclos|corporate owned")
  def fixerUpperFlag(remarks: Column): Column = coalesce(remarks.rlike(fixerUpperPattern), lit(false))

  def distressedFlag(remarks: Column): Column =
    fixerUpperFlag(remarks) || bankOwnedFlag(remarks) || shortSaleFlag(remarks)

  // ---------------------------------------------------------------------
  // F10 — style-based reclassification (Kafka_GSMLSConsumer.py:1185-1218)
  // ---------------------------------------------------------------------
  val cctStyles = Seq("TwnIntUn", "OneFloor", "MultiFlr", "TwnEndUn", "FirstFlr", "HighRise")

  def subPropTypeSfh(stylePrimary: Column, styleList: Column): Column =
    when(stylePrimary.isin(cctStyles: _*) ||
           arrays_overlap(split(coalesce(styleList, lit("")), ","),
                          lit(cctStyles.toArray)), "CCT")
      .otherwise("SinglFam")

  // ---------------------------------------------------------------------
  // F11/F12 — month/year extraction + coercing date parse
  // (Kafka_GSMLSConsumer.py:888-895, :51-86)
  // ---------------------------------------------------------------------
  /** pandas to_datetime(errors='coerce') analog: null on parse failure. */
  def parseDateCoerce(c: Column, fmt: String = "MM/dd/yyyy HH:mm:ss"): Column =
    try_to_timestamp(c, lit(fmt))

  def parseMonth(dateStr: Column): Column = split(dateStr, "/").getItem(0).try_cast(LongType)
  def parseYear(dateStr: Column): Column  = substring(split(dateStr, "/").getItem(2), 1, 4).try_cast(LongType)

  // ---------------------------------------------------------------------
  // F14 — quarter from date (GSMLS.py:798-811) — builtin `quarter`.
  // F13 — date diffs (Kafka_GSMLSConsumer.py:55-87) — builtin `datediff`.
  // ---------------------------------------------------------------------
  def daysBetween(end: Column, start: Column): Column = datediff(end, start)
  def yearsBetween(end: Column, start: Column): Column = datediff(end, start) / lit(365.25)

  // ---------------------------------------------------------------------
  // F15 — percentage deltas (Kafka_GSMLSConsumer.py:58-82, 605-614)
  // ---------------------------------------------------------------------
  def pctDelta(newV: Column, base: Column, scale: Int = 0): Column =
    round((newV - base) / base * 100, scale)

  // ---------------------------------------------------------------------
  // F16/F17 — lot-size normalization (Kafka_GSMLSConsumer.py:222-243,494-519)
  // Free text: '100x50' -> 5000 ; '12000 SF' -> 12000 ; '1.5 AC' -> 65340 ;
  // anything else -> 0.0. First-match-wins, like the reference's regex chain.
  // ---------------------------------------------------------------------
  val SqftPerAcre = 43560.0

  def acresToSqft(acres: Column): Column = acres * lit(SqftPerAcre)

  private val lotDim  = "^\\s*(\\d+(?:\\.\\d+)?)\\s*[xX]\\s*(\\d+(?:\\.\\d+)?)\\s*$"
  private val lotSf   = "(?i)^\\s*(\\d+(?:\\.\\d+)?)\\s*SF\\.?\\s*$"
  private val lotAc   = "(?i)^\\s*(\\d+(?:\\.\\d+)?)\\s*AC(?:RES?)?\\.?\\s*$"

  def lotSizeSqft(c: Column): Column =
    when(c.rlike(lotDim),
         regexp_extract(c, lotDim, 1).cast(DoubleType) *
           regexp_extract(c, lotDim, 2).cast(DoubleType))
      .when(c.rlike(lotSf), regexp_extract(c, lotSf, 1).cast(DoubleType))
      .when(c.rlike(lotAc), regexp_extract(c, lotAc, 1).cast(DoubleType) * lit(SqftPerAcre))
      .otherwise(lit(0.0))

  // ---------------------------------------------------------------------
  // F18 — APN / zero-pad normalization (GSMLS.py:694-754, 2316-2324)
  // town pads to width 4, the block/lot/qualifier segments to width 5 ->
  // 'TTTT-BBBBB-QQQQQ-LLLLL-QQQQQ' (missing qualifiers default '00000').
  // ---------------------------------------------------------------------
  def zeroPad(c: Column, width: Int): Column = lpad(c.cast(StringType), width, "0")

  def apnNormalize(town: Column, block: Column, lot: Column,
                   qual1: Column = lit("0"), qual2: Column = lit("0")): Column =
    concat_ws("-",
      zeroPad(town, 4), zeroPad(block, 5), zeroPad(coalesce(qual1, lit("0")), 5),
      zeroPad(lot, 5), zeroPad(coalesce(qual2, lit("0")), 5))

  // ---------------------------------------------------------------------
  // F19 — address normalization (GSMLS.py:131-151)
  // strip '*', collapse NBSP/whitespace, trim, drop trailing '.0' from
  // street numbers, zip 4->5 pad.
  // ---------------------------------------------------------------------
  def normalizeAddressPart(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\\*\\u00a0]", " "), "\\s+", " "))

  def dropDotZero(c: Column): Column = regexp_replace(c, "\\.0$", "")
  def padZip(c: Column): Column      = lpad(c.cast(StringType), 5, "0")

  // ---------------------------------------------------------------------
  // F20 — municipality suffix strip (GSMLS.py:2177-2179)
  // ---------------------------------------------------------------------
  def stripMunicipalitySuffix(c: Column): Column =
    trim(regexp_replace(c, "\\s+(Boro|Twp|City|Town|Village)$", ""))

  // ---------------------------------------------------------------------
  // F21 — regex tuple extraction (GSMLS.py:883,909-911; RealEstateImages.py:605)
  // ---------------------------------------------------------------------
  def extractLat(c: Column): Column = regexp_extract(c, "navigate\\(([^,]*),([^)]*)\\)", 1)
  def extractLng(c: Column): Column = regexp_extract(c, "navigate\\(([^,]*),([^)]*)\\)", 2)

  /** Parse the stringified python dict `{'cap': 'url', ...}` IMAGES column
    * into a map — RealEstateImages.py:605,649. */
  def parseImagesDict(c: Column): Column = {
    val pairs = regexp_extract_all(c, lit("'([^']+)'\\s*:\\s*'([^']+)'"), lit(0))
    map_from_entries(transform(pairs, p => struct(
      regexp_extract(p, "'([^']+)'\\s*:\\s*'([^']+)'", 1).as("key"),
      regexp_extract(p, "'([^']+)'\\s*:\\s*'([^']+)'", 2).as("value"))))
  }

  // ---------------------------------------------------------------------
  // F22 — first-match classifier bank (RealEstateImages.py:36-60,655-680)
  // Config-driven: Seq(label -> pattern), first match wins, default label.
  // ---------------------------------------------------------------------
  def firstMatchClassify(c: Column, rules: Seq[(String, String)], default: String): Column =
    coalesce((rules.map { case (label, pat) =>
      when(c.rlike(pat), lit(label))
    } :+ lit(default)): _*)

  /** Room-caption routing table (subset mirroring RealEstateImages.py:36-60). */
  val homeSections: Seq[(String, String)] = Seq(
    "Bathroom"    -> "(?i)bath",
    "Kitchen"     -> "(?i)kitchen",
    "Bedroom"     -> "(?i)bed\\s?room|master|br\\b",
    "LivingRoom"  -> "(?i)living|family room|great room",
    "DiningRoom"  -> "(?i)dining",
    "Basement"    -> "(?i)basement",
    "Garage"      -> "(?i)garage",
    "Exterior"    -> "(?i)exterior|front|back ?yard|deck|patio|pool",
    "Alternates"  -> "(?i)alternate|floor ?plan|aerial"
  )

  // ---------------------------------------------------------------------
  // F23 — filename/path synthesis (RealEstateImages.py:147-164)
  // ---------------------------------------------------------------------
  def imagePath(dir: Column, section: Column, condition: Column,
                address: Column, seq: Column): Column =
    concat_ws("/", dir, section, condition,
      concat(address, lit(" - "), section, lit("_"), seq.cast(StringType), lit(".png")))

  // ---------------------------------------------------------------------
  // F26 — tolerant cast (Kafka_GSMLSConsumer.py:477-483)
  // pandas `astype` under `except: pass` keeps the whole column on failure;
  // Spark nulls per value. Parity choice (SURVEY §7.4(2)): per-value
  // null-then-fallback.
  // ---------------------------------------------------------------------
  def tolerantCast(c: Column, to: DataType, fallback: Column): Column =
    coalesce(c.try_cast(to), fallback)   // try_cast: null (not ANSI error) on failure

  // ---------------------------------------------------------------------
  // F27 — sentinel fillna (Kafka_GSMLSConsumer.py:316-491)
  // ---------------------------------------------------------------------
  object Sentinels {
    val TaxId    = "0000-00000-0000-00000-0000"
    val DateStr  = "00/00/0000 00:00:00"
    val LatLong  = "0E-20"
    val Unknown  = "Unknown"
    val NoneStr  = "None"
    val AgentId  = "000000"
    val LotSize  = "0x0"
    val Zip      = "00000"
  }

  def fillSentinels(df: DataFrame, fills: Map[String, Any]): DataFrame =
    df.na.fill(fills.filter { case (k, _) => df.columns.contains(k) })
}

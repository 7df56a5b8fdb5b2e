package graft.gsmls

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Cleaning
import graft.gsmls.Schemas._

/** The GSMLS cleaning pipeline — SURVEY §7.1 module 3.
  *
  * The reference chains 13 ordered pandas `.pipe` stages per property
  * type (Kafka_GSMLSConsumer.py:1016-1102); here each stage is a pure
  * `DataFrame => DataFrame` of column expressions, composed in the same
  * fixed order (order matters: fillNa precedes every predicate on
  * sentinels, combineListingRemarks precedes fixerUpper — SURVEY
  * §7.4(3)). Every stage applies only to columns present, so per-type
  * subsets compose from the same stage functions.
  *
  * All stages are shuffle-free projections: at 100 TB the whole pipeline
  * is embarrassingly parallel and fuses into one whole-stage-codegen
  * pass over the scan.
  */
object Pipeline {
  type Stage = DataFrame => DataFrame

  private def whenHas(df: DataFrame, c: String)(f: DataFrame => DataFrame): DataFrame =
    if (df.columns.contains(c)) f(df) else df

  // ------------------------------------------------------------------
  // Stage 1 — fill_na_values (Kafka_GSMLSConsumer.py:316-491): cast the
  // whole frame to string (the reference's astype('string')) and fill
  // the per-type sentinel defaults.
  // ------------------------------------------------------------------
  def fillNaValues(pt: PropType): Stage = df =>
    Cleaning.fillSentinels(
      df.select(df.columns.map(c => col(c).cast(StringType).as(c)): _*),
      fillNa(pt))

  // ------------------------------------------------------------------
  // Stage 2 — standard_cleaning (Kafka_GSMLSConsumer.py:1106-1182) +
  // baths_empty patch (:29-42). Literal rules use substring replace,
  // regex rules use regexp_replace, in declared order.
  // ------------------------------------------------------------------
  private val starStripCols = Seq("ACRES", "BLOCKID", "COUNTY", "COUNTYCODE", "LOTID",
    "LOTSIZE", "OWNERNAME", "STREETNAME", "TAXID", "TOWNCODE", "ZIPCODE")
  private val assessCols = Seq("ASSESSAMOUNTBLDG", "ASSESSTOTAL", "ASSESSAMOUNTLAND", "APPFEE")

  def standardCleaning(pt: PropType): Stage = df0 => {
    var df = df0
    for (c <- starStripCols if df.columns.contains(c))
      df = df.withColumn(c, replace(col(c), lit("*"), lit("")))
    df = whenHas(df, "SP/LP%")(_.withColumn("SP/LP%", replace(col("SP/LP%"), lit("%"), lit(""))))
    df = whenHas(df, "RP/LP%")(_.withColumn("RP/LP%", replace(col("RP/LP%"), lit("%"), lit(""))))
    df = whenHas(df, "TOWN")(_.withColumn("TOWN",
      regexp_replace(col("TOWN"), "\\.?\\*?\\(\\d{4}\\*?\\)", "")))
    for (c <- assessCols if df.columns.contains(c))
      df = df.withColumn(c, replace(col(c), lit("00:00:00"), lit("0.0")))
    df = whenHas(df, "WATER_SHORT") { d =>
      Seq("Assoctn", "Private", "Public", "Well").foldLeft(d)((a, w) =>
        a.withColumn("WATER_SHORT", regexp_replace(col("WATER_SHORT"), s"^$w(,\\w+)?", w)))
    }
    // baths_empty: BATHSTOTAL == 0 -> BATHSFULLTOTAL (P10 row-subset patch)
    if (Seq(RES, MUL, RNT).contains(pt) &&
        df.columns.contains("BATHSTOTAL") && df.columns.contains("BATHSFULLTOTAL"))
      df = df.withColumn("BATHSTOTAL",
        when(col("BATHSTOTAL").try_cast(DoubleType) === 0.0, col("BATHSFULLTOTAL"))
          .otherwise(col("BATHSTOTAL")))
    df
  }

  // ------------------------------------------------------------------
  // Stage 3 — convert_lot_size (Kafka_GSMLSConsumer.py:222-243 + :494-519):
  // free-text LOTSIZE -> sqft, falling back to ACRES * 43560.
  // ------------------------------------------------------------------
  def convertLotSize: Stage = df =>
    if (!df.columns.contains("LOTSIZE")) df
    else {
      val base = Cleaning.lotSizeSqft(col("LOTSIZE"))
      val acres = if (df.columns.contains("ACRES"))
        col("ACRES").try_cast(DoubleType) else lit(null).cast(DoubleType)
      df.withColumn("LOTSIZE (SQFT)",
        when(base === 0.0 && coalesce(acres, lit(0.0)) > 0.0, Cleaning.acresToSqft(acres))
          .otherwise(base))
    }

  // ------------------------------------------------------------------
  // Stage 4 — calculate_dates (Kafka_GSMLSConsumer.py:46-90): YEAR/MONTH
  // string parse (works on sentinel dates), coercing timestamp parse,
  // day-interval metrics, pct -100 shift, renames.
  // ------------------------------------------------------------------
  def calculateDates(pt: PropType): Stage = df0 => {
    var df = df0
    val anchor = pt match {
      case RNT => "RENTEDDATE"
      case TAX => "SALEDATE"
      case _   => "CLOSEDDATE"
    }
    if (pt != TAX && df.columns.contains(anchor)) {
      df = df.withColumn("YEAR", Cleaning.parseYear(col(anchor)))
        .withColumn("MONTH", Cleaning.parseMonth(col(anchor)))
    }
    val dateCols = pt match {
      case RNT => Seq("RENTEDDATE")
      case TAX => Seq("PRIORSALEDATE", "SALEDATE")
      case _   => Seq("LISTDATE", "CLOSEDDATE", "PENDINGDATE", "ANTICCLOSEDDATE")
    }
    for (c <- dateCols if df.columns.contains(c))
      df = df.withColumn(c, Cleaning.parseDateCoerce(col(c)))
    if (Seq(RES, MUL, LND).contains(pt)) {
      if (df.columns.contains("CLOSEDDATE") && df.columns.contains("PENDINGDATE"))
        df = df.withColumn("DAYS_TO_CLOSE",
          Cleaning.daysBetween(col("CLOSEDDATE"), col("PENDINGDATE")).cast(LongType))
      if (df.columns.contains("CLOSEDDATE") && df.columns.contains("ANTICCLOSEDDATE"))
        df = df.withColumn("ANTIC_CLOSEDATE_DIFF",
          Cleaning.daysBetween(col("CLOSEDDATE"), col("ANTICCLOSEDDATE")).cast(LongType))
      df = whenHas(df, "SP/LP%")(_.withColumn("SP/LP%",
        col("SP/LP%").try_cast(DoubleType) - 100.0))
    }
    if (pt == RNT)
      df = whenHas(df, "RP/LP%")(_.withColumn("RP/LP%",
        col("RP/LP%").try_cast(DoubleType) - 100.0))
    if (pt == TAX && df.columns.contains("SALEDATE") && df.columns.contains("PRIORSALEDATE"))
      df = df.withColumn("PREVOWN_POSS_TIME (YRS)",
        Cleaning.yearsBetween(col("SALEDATE"), col("PRIORSALEDATE")))
    if (df.columns.contains("OWNERNAME"))
      df = df.withColumnRenamed("OWNERNAME", "SELLERNAME")
    if (pt == RES && df.columns.contains("SUBPROPTYPE"))
      df = df.withColumnRenamed("SUBPROPTYPE", "SUBPROPTYPE_SFH")
    df
  }

  // ------------------------------------------------------------------
  // Stage 5 — change_datatypes (Kafka_GSMLSConsumer.py:93-128): per-value
  // try_cast to the per-type target types.
  // ------------------------------------------------------------------
  def changeDatatypes(pt: PropType): Stage = df => {
    val casts = typedCasts(pt).filter { case (c, _) => df.columns.contains(c) }
    df.withColumns(casts.map { case (c, t) => c -> col(c).try_cast(t) })
  }

  // ------------------------------------------------------------------
  // Stage 6 — combine_listing_remarks (Kafka_GSMLSConsumer.py:143-149).
  // ------------------------------------------------------------------
  def combineListingRemarks: Stage = df =>
    if (!Seq("REMARKSPUBLIC", "REMARKSAGENT", "SHOWSPECIAL").forall(df.columns.contains)) df
    else df.withColumn("LISTING_REMARKS",
      Cleaning.concatNaRep(". ", "_",
        col("REMARKSPUBLIC"), col("REMARKSAGENT"), col("SHOWSPECIAL")))

  // ------------------------------------------------------------------
  // Stage 7 — sub_property_type (Kafka_GSMLSConsumer.py:1185-1218).
  // ------------------------------------------------------------------
  def subPropertyType: Stage = df =>
    if (!df.columns.contains("STYLEPRIMARY_SHORT")) df
    else df.withColumn("SUBPROPTYPE_SFH",
      Cleaning.subPropTypeSfh(col("STYLEPRIMARY_SHORT"),
        if (df.columns.contains("STYLE_SHORT")) col("STYLE_SHORT") else lit(null)))

  // ------------------------------------------------------------------
  // Stage 8 — parse_property_attr (Kafka_GSMLSConsumer.py:617-885):
  // dict-driven multi-hot expansion.
  // ------------------------------------------------------------------
  def parsePropertyAttr: Stage = df => Cleaning.multiHot(df, attrDict)

  // ------------------------------------------------------------------
  // Stage 9 — investment_label (Kafka_GSMLSConsumer.py:590-597).
  // ------------------------------------------------------------------
  def investmentLabel: Stage = df =>
    whenHas(df, "SELLERNAME")(_.withColumn("INVESTMENT_SALE",
      Cleaning.regexFlag(col("SELLERNAME"), Cleaning.investmentSellerPattern)))

  // ------------------------------------------------------------------
  // Stage 10 — fixer_upper (Kafka_GSMLSConsumer.py:522-587): CONDITION +
  // escalate-only distress flags with short-sale negation (SURVEY §7.4(5)).
  // ------------------------------------------------------------------
  def fixerUpper: Stage = df =>
    whenHas(df, "LISTING_REMARKS") { d =>
      val r = col("LISTING_REMARKS")
      d.withColumn("CONDITION",
          when(Cleaning.fixerUpperFlag(r), lit("Fixer Upper")).otherwise(lit("Unknown")))
        .withColumn("BANK_OWNED", Cleaning.bankOwnedFlag(r))
        .withColumn("SHORT_SALE", Cleaning.shortSaleFlag(r))
        .withColumn("POTENTIAL_INVESTMENT",
          Cleaning.fixerUpperFlag(r) || Cleaning.shortSaleFlag(r))
        .withColumn("DISTRESSED_SALE", Cleaning.distressedFlag(r))
    }

  // ------------------------------------------------------------------
  // Stage 11 — original_lp_diff (Kafka_GSMLSConsumer.py:605-614).
  // ------------------------------------------------------------------
  def originalLpDiff: Stage = df0 => {
    var df = df0
    if (df.columns.contains("LISTPRICE") && df.columns.contains("ORIGLISTPRICE"))
      df = df.withColumn("OLP/LP%",
        Cleaning.pctDelta(col("LISTPRICE"), col("ORIGLISTPRICE")))
    if (df.columns.contains("SALESPRICE") && df.columns.contains("ORIGLISTPRICE"))
      df = df.withColumn("SP/OLP%",
        Cleaning.pctDelta(col("SALESPRICE"), col("ORIGLISTPRICE")))
    df
  }

  // ------------------------------------------------------------------
  // Stage 12 — reorder_columns (Kafka_GSMLSConsumer.py:929-1013): select
  // the authoritative per-type order (present columns only); also applies
  // the sink-prep drops implicitly (dropped columns are not in the list).
  // ------------------------------------------------------------------
  def reorderColumns(pt: PropType): Stage = df => {
    val order = finalColumns(pt).filter(df.columns.contains)
    df.select(order.map(col): _*)
  }

  // ------------------------------------------------------------------
  // Stage 13 — escape_illegal_char (Kafka_GSMLSConsumer.py:287-313).
  // ------------------------------------------------------------------
  def escapeIllegalChar(pt: PropType): Stage = df =>
    Cleaning.stripControlChars(df, escapeColumns(pt))

  // ------------------------------------------------------------------
  // Per-type compositions (Kafka_GSMLSConsumer.py:1016-1102). Exact
  // stage subsets and order per type.
  // ------------------------------------------------------------------
  private def compose(stages: Seq[Stage]): Stage =
    df => stages.foldLeft(df)((d, s) => s(d))

  val resPropertyCleaning: Stage = compose(Seq(
    fillNaValues(RES), standardCleaning(RES), convertLotSize, calculateDates(RES),
    changeDatatypes(RES), combineListingRemarks, subPropertyType, parsePropertyAttr,
    investmentLabel, fixerUpper, originalLpDiff, reorderColumns(RES), escapeIllegalChar(RES)))

  val mulPropertyCleaning: Stage = compose(Seq(
    fillNaValues(MUL), standardCleaning(MUL), convertLotSize, calculateDates(MUL),
    changeDatatypes(MUL), combineListingRemarks, parsePropertyAttr, investmentLabel,
    fixerUpper, originalLpDiff, reorderColumns(MUL), escapeIllegalChar(MUL)))

  val lndPropertyCleaning: Stage = compose(Seq(
    fillNaValues(LND), standardCleaning(LND), convertLotSize, calculateDates(LND),
    changeDatatypes(LND), combineListingRemarks, parsePropertyAttr, investmentLabel,
    originalLpDiff, reorderColumns(LND), escapeIllegalChar(LND)))

  val rntPropertyCleaning: Stage = compose(Seq(
    fillNaValues(RNT), standardCleaning(RNT), calculateDates(RNT), changeDatatypes(RNT),
    parsePropertyAttr, reorderColumns(RNT), escapeIllegalChar(RNT)))

  val taxPropertyCleaning: Stage = compose(Seq(
    fillNaValues(TAX), standardCleaning(TAX), calculateDates(TAX), parsePropertyAttr,
    reorderColumns(TAX), escapeIllegalChar(TAX)))

  def forType(pt: PropType): Stage = pt match {
    case RES => resPropertyCleaning
    case MUL => mulPropertyCleaning
    case LND => lndPropertyCleaning
    case RNT => rntPropertyCleaning
    case TAX => taxPropertyCleaning
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.gsmls.Pipeline

/** End-to-end GSMLS cleaning-pipeline parity: synthesize MLS-shaped RES
  * rows deterministically from `orders`, run the full 13-stage
  * `resPropertyCleaning` composition, and project one observable column
  * per stage. The oracle SQL mirrors the synthesis and every stage
  * transformation, so a pass proves the composed pipeline (ordering
  * included), not just the individual functions.
  */
object PipelineQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val qPipelineRes: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    val k = col("o_orderkey")
    val fmt = "MM/dd/yyyy HH:mm:ss"
    val syn = o.select(
      k.cast(StringType).as("MLSNUM"),
      concat(lit("Town"), (col("o_custkey") % 25).cast(StringType),
        when(k % 3 === 0, lit(".(1234)")).otherwise(lit(""))).as("TOWN"),
      when(k % 7 === 0, lit("Garden Homes LLC")).otherwise(lit("John* Smith")).as("OWNERNAME"),
      when(k % 4 === 0, lit(null).cast(StringType))
        .otherwise(concat((lit(95) + k % 10).cast(StringType), lit("%"))).as("SP/LP%"),
      when(k % 5 === 0, lit("needs work, fixer upper special"))
        .when(k % 5 === 1, lit("NOT A SHORT SALE, move right in"))
        .when(k % 5 === 2, lit("short sale subject to bank approval"))
        .when(k % 5 === 3, lit(null).cast(StringType))
        .otherwise(lit("charming colonial")).as("REMARKSPUBLIC"),
      when(k % 2 === 0, lit(null).cast(StringType)).otherwise(lit("agent notes")).as("REMARKSAGENT"),
      lit(null).cast(StringType).as("SHOWSPECIAL"),
      when(k % 4 === 0, lit("100x50")).when(k % 4 === 1, lit("12000 SF"))
        .when(k % 4 === 2, lit(null).cast(StringType)).otherwise(lit("IRR")).as("LOTSIZE"),
      when(k % 2 === 0, lit("1.5")).otherwise(lit("0.0")).as("ACRES"),
      when(k % 3 === 0, lit("0.0")).otherwise(lit("2.0")).as("BATHSTOTAL"),
      lit("1.0").as("BATHSFULLTOTAL"),
      floor(col("o_totalprice")).cast(LongType).cast(StringType).as("ORIGLISTPRICE"),
      floor(col("o_totalprice") * 0.95).cast(LongType).cast(StringType).as("LISTPRICE"),
      floor(col("o_totalprice") * 0.9).cast(LongType).cast(StringType).as("SALESPRICE"),
      when(k % 5 === 0, lit(null).cast(StringType))
        .otherwise(date_format(col("o_orderdate"), fmt)).as("CLOSEDDATE"),
      date_format(date_sub(col("o_orderdate"), 45), fmt).as("PENDINGDATE"),
      date_format(date_add(col("o_orderdate"), 10), fmt).as("ANTICCLOSEDDATE"),
      date_format(date_sub(col("o_orderdate"), 120), fmt).as("LISTDATE"),
      when(k % 6 === 0, lit("OneFloor")).when(k % 6 === 1, lit("HighRise"))
        .otherwise(lit("Colonial")).as("STYLEPRIMARY_SHORT"),
      when(k % 8 === 0, lit("TwnEndUn,Ranch")).otherwise(lit("Ranch")).as("STYLE_SHORT"),
      lit("U").as("SUBPROPTYPE"),
      when(k % 3 === 0, lit("Wood,Tile")).when(k % 3 === 1, lit("Carpet"))
        .otherwise(lit(null).cast(StringType)).as("FLOORS_SHORT"),
      when(k % 9 === 0, lit("00:00:00")).otherwise((k % 100000).cast(StringType)).as("ASSESSTOTAL"),
      (col("o_custkey") % 500).cast(StringType).as("TOWNCODE"),
      when(k % 4 === 0, lit("Public,Well")).otherwise(lit("Well")).as("WATER_SHORT"))
    Pipeline.resPropertyCleaning(syn).select(
      col("MLSNUM").as("mlsnum"),
      col("TOWN").as("town"),
      col("SELLERNAME").as("sellername"),
      col("SP/LP%").as("sp_lp_pct"),
      col("LISTING_REMARKS").as("listing_remarks"),
      col("CONDITION").as("condition"),
      col("SHORT_SALE").as("short_sale"),
      col("BANK_OWNED").as("bank_owned"),
      col("DISTRESSED_SALE").as("distressed_sale"),
      col("INVESTMENT_SALE").as("investment_sale"),
      col("SUBPROPTYPE_SFH").as("subproptype_sfh"),
      col("LOTSIZE (SQFT)").as("lot_sqft"),
      col("BATHSTOTAL").try_cast(DoubleType).as("bathstotal"),
      col("YEAR").as("yr"),
      col("MONTH").as("mon"),
      col("DAYS_TO_CLOSE").as("days_to_close"),
      col("OLP/LP%").as("olp_lp_pct"),
      col("SP/OLP%").as("sp_olp_pct"),
      col("ASSESSTOTAL").as("assesstotal"),
      col("WOOD_FLOORS").as("wood_floors"),
      col("PUBLIC_WATER").as("public_water"),
      // WELL_WATER observes the WATER_SHORT prefix normalization: raw
      // 'Public,Well' is normalized to 'Public' BEFORE the multi-hot
      // stage, so the Well flag must come out false on those rows.
      col("WELL_WATER").as("well_water"),
      col("LISTPRICE").as("listprice"))
  }

  /** TAX pipeline (6 stages: fill → standard → dates → attr → reorder →
    * escape): sentinel fills, '*' strip, coercing date parse, the W4
    * prior-sale interval, and control-char escape, end-to-end. */
  private val qPipelineTax: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    val k = col("o_orderkey")
    val fmt = "MM/dd/yyyy HH:mm:ss"
    val syn = o.select(
      k.cast(StringType).as("AUTOROW"),
      concat(lit("B"), (k % 900).cast(StringType),
        when(k % 3 === 0, lit("*")).otherwise(lit(""))).as("BLOCKID"),
      when(k % 6 === 0, concat(lit("MAIN"), lit("\t"), lit("ST")))
        .otherwise(lit("OAK AVE")).as("LOCSTREET"),
      when(k % 5 === 0, lit(null).cast(StringType))
        .otherwise(date_format(col("o_orderdate"), fmt)).as("SALEDATE"),
      when(k % 7 === 0, lit(null).cast(StringType))
        .otherwise(date_format(date_sub(col("o_orderdate"), 400), fmt)).as("PRIORSALEDATE"),
      floor(col("o_totalprice")).cast(LongType).cast(StringType).as("SALEPRICE"))
    graft.gsmls.Pipeline.taxPropertyCleaning(syn).select(
      col("AUTOROW").as("autorow"),
      col("BLOCKID").as("blockid"),
      col("LOCSTREET").as("locstreet"),
      col("SALEDATE").cast("timestamp_ntz").as("saledate"),
      col("PRIORSALEDATE").cast("timestamp_ntz").as("priorsaledate"),
      round(col("PREVOWN_POSS_TIME (YRS)"), 4).as("prevown_yrs"),
      col("SALEPRICE").try_cast(LongType).as("saleprice"))
  }

  /** RNT pipeline (7 stages): the rental branch — RENTEDDATE is the
    * YEAR/MONTH anchor, RP/LP% takes the -100 shift, baths patch and
    * typed casts apply, SUBDIVISION gets the control-char escape. */
  private val qPipelineRnt: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    val k = col("o_orderkey")
    val fmt = "MM/dd/yyyy HH:mm:ss"
    val syn = o.select(
      k.cast(StringType).as("MLSNUM"),
      when(k % 5 === 0, lit(null).cast(StringType))
        .otherwise(date_format(col("o_orderdate"), fmt)).as("RENTEDDATE"),
      when(k % 4 === 0, lit(null).cast(StringType))
        .otherwise(concat((lit(90) + k % 20).cast(StringType), lit("%"))).as("RP/LP%"),
      when(k % 3 === 0, lit("0.0")).otherwise(lit("2.0")).as("BATHSTOTAL"),
      lit("1.5").as("BATHSFULLTOTAL"),
      floor(col("o_totalprice") / 100).cast(LongType).cast(StringType).as("LP"),
      when(k % 6 === 0, concat(lit("Oak"), lit("\u0001"), lit("Park")))
        .otherwise(lit(null).cast(StringType)).as("SUBDIVISION"),
      when(k % 3 === 0, lit("Wood,Tile")).otherwise(lit("Carpet")).as("FLOORS_SHORT"))
    graft.gsmls.Pipeline.rntPropertyCleaning(syn).select(
      col("MLSNUM").as("mlsnum"),
      col("YEAR").as("yr"),
      col("MONTH").as("mon"),
      col("RP/LP%").as("rp_lp_pct"),
      col("BATHSTOTAL").try_cast(DoubleType).as("bathstotal"),
      col("LP").as("lp"),
      col("SUBDIVISION").as("subdivision"),
      col("WOOD_FLOORS").as("wood_floors"))
  }

  /** MUL pipeline (12 stages = RES minus sub_property_type): multi-unit
    * income casts, remarks/fixer/investment, lp-diff, dates. */
  private val qPipelineMul: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    val k = col("o_orderkey")
    val fmt = "MM/dd/yyyy HH:mm:ss"
    val syn = o.select(
      k.cast(StringType).as("MLSNUM"),
      when(k % 7 === 0, lit("Shore Rentals Inc")).otherwise(lit("Jane Doe")).as("OWNERNAME"),
      when(k % 5 === 0, lit("fixer upper, investor special"))
        .otherwise(lit("well maintained duplex")).as("REMARKSPUBLIC"),
      lit(null).cast(StringType).as("REMARKSAGENT"),
      lit(null).cast(StringType).as("SHOWSPECIAL"),
      when(k % 4 === 0, lit(null).cast(StringType))
        .otherwise((k % 90000).cast(StringType)).as("INCOMEGROSSOPERATING"),
      (lit(2) + k % 3).cast(StringType).as("NUMUNITS"),
      floor(col("o_totalprice")).cast(LongType).cast(StringType).as("ORIGLISTPRICE"),
      floor(col("o_totalprice") * 0.97).cast(LongType).cast(StringType).as("LISTPRICE"),
      floor(col("o_totalprice") * 0.93).cast(LongType).cast(StringType).as("SALESPRICE"),
      when(k % 5 === 0, lit(null).cast(StringType))
        .otherwise(date_format(col("o_orderdate"), fmt)).as("CLOSEDDATE"),
      date_format(date_sub(col("o_orderdate"), 30), fmt).as("PENDINGDATE"))
    graft.gsmls.Pipeline.mulPropertyCleaning(syn).select(
      col("MLSNUM").as("mlsnum"),
      col("SELLERNAME").as("sellername"),
      col("INVESTMENT_SALE").as("investment_sale"),
      col("CONDITION").as("condition"),
      col("INCOMEGROSSOPERATING").as("income_gross"),
      col("NUMUNITS").as("numunits"),
      col("YEAR").as("yr"),
      col("DAYS_TO_CLOSE").as("days_to_close"),
      col("OLP/LP%").as("olp_lp_pct"),
      col("LISTING_REMARKS").as("listing_remarks"))
  }

  /** LND pipeline (11 stages = MUL minus fixer_upper): no distress
    * flags, but lot-size conversion and investment label still apply. */
  private val qPipelineLnd: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    val k = col("o_orderkey")
    val fmt = "MM/dd/yyyy HH:mm:ss"
    val syn = o.select(
      k.cast(StringType).as("MLSNUM"),
      when(k % 3 === 0, lit("Pinelands Group")).otherwise(lit("A Farmer")).as("OWNERNAME"),
      when(k % 4 === 0, lit("5 AC")).when(k % 4 === 1, lit("200x400"))
        .otherwise(lit(null).cast(StringType)).as("LOTSIZE"),
      when(k % 2 === 0, lit("3.0")).otherwise(lit("0.0")).as("ACRES"),
      lit(null).cast(StringType).as("REMARKSPUBLIC"),
      lit(null).cast(StringType).as("REMARKSAGENT"),
      lit(null).cast(StringType).as("SHOWSPECIAL"),
      floor(col("o_totalprice") * 0.5).cast(LongType).cast(StringType).as("ORIGLISTPRICE"),
      floor(col("o_totalprice") * 0.45).cast(LongType).cast(StringType).as("LISTPRICE"),
      when(k % 5 === 0, lit(null).cast(StringType))
        .otherwise(date_format(col("o_orderdate"), fmt)).as("CLOSEDDATE"))
    graft.gsmls.Pipeline.lndPropertyCleaning(syn).select(
      col("MLSNUM").as("mlsnum"),
      col("SELLERNAME").as("sellername"),
      col("INVESTMENT_SALE").as("investment_sale"),
      col("LOTSIZE (SQFT)").as("lot_sqft"),
      col("YEAR").as("yr"),
      col("MONTH").as("mon"),
      col("OLP/LP%").as("olp_lp_pct"),
      col("LISTING_REMARKS").as("listing_remarks"))
  }

  def queries: Map[String, Q] = Map(
    "q_pipeline_res" -> qPipelineRes,
    "q_pipeline_tax" -> qPipelineTax,
    "q_pipeline_rnt" -> qPipelineRnt,
    "q_pipeline_mul" -> qPipelineMul,
    "q_pipeline_lnd" -> qPipelineLnd)

  def oracleSql: Map[String, String] = Map(
    "q_pipeline_mul" ->
      """WITH syn AS (SELECT
           CAST(o_orderkey AS VARCHAR) AS mlsnum,
           CASE WHEN o_orderkey % 7 = 0 THEN 'Shore Rentals Inc' ELSE 'Jane Doe' END AS ownername,
           CASE WHEN o_orderkey % 5 = 0 THEN 'fixer upper, investor special'
                ELSE 'well maintained duplex' END AS remarkspublic,
           CASE WHEN o_orderkey % 4 = 0 THEN NULL
                ELSE CAST(o_orderkey % 90000 AS VARCHAR) END AS income_raw,
           CAST(2 + o_orderkey % 3 AS VARCHAR) AS numunits,
           CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS olp_raw,
           CAST(CAST(floor(o_totalprice * 0.97) AS BIGINT) AS VARCHAR) AS lp_raw,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') END AS closeddate_raw,
           strftime(CAST(o_orderdate AS DATE) - 30, '%m/%d/%Y %H:%M:%S') AS pendingdate
         FROM orders),
         f AS (SELECT *,
           coalesce(closeddate_raw, '00/00/0000 00:00:00') AS closeddate,
           remarkspublic || '. None. None' AS lr
         FROM syn)
         SELECT mlsnum, ownername AS sellername,
           coalesce(regexp_matches(ownername, '(?i)llc|investment|builders|inc|corp|group'), false) AS investment_sale,
           CASE WHEN regexp_matches(lr, '(?i)fixer\s?upper|handyman|tlc|as[- ]is|needs? work|bring your tools|investor special')
                THEN 'Fixer Upper' ELSE 'Unknown' END AS condition,
           TRY_CAST(coalesce(income_raw, '0.0') AS DOUBLE) AS income_gross,
           numunits,
           CAST(substring(string_split(closeddate, '/')[3], 1, 4) AS BIGINT) AS yr,
           date_diff('day', try_strptime(pendingdate, '%m/%d/%Y %H:%M:%S'),
                     try_strptime(closeddate, '%m/%d/%Y %H:%M:%S')) AS days_to_close,
           round((TRY_CAST(lp_raw AS BIGINT) - TRY_CAST(olp_raw AS BIGINT))
                 / TRY_CAST(olp_raw AS BIGINT) * 100, 0) AS olp_lp_pct,
           lr AS listing_remarks
         FROM f""",
    "q_pipeline_lnd" ->
      """WITH syn AS (SELECT
           CAST(o_orderkey AS VARCHAR) AS mlsnum,
           CASE WHEN o_orderkey % 3 = 0 THEN 'Pinelands Group' ELSE 'A Farmer' END AS ownername,
           CASE WHEN o_orderkey % 4 = 0 THEN '5 AC'
                WHEN o_orderkey % 4 = 1 THEN '200x400' ELSE NULL END AS lotsize_raw,
           CASE WHEN o_orderkey % 2 = 0 THEN '3.0' ELSE '0.0' END AS acres,
           CAST(CAST(floor(o_totalprice * 0.5) AS BIGINT) AS VARCHAR) AS olp_raw,
           CAST(CAST(floor(o_totalprice * 0.45) AS BIGINT) AS VARCHAR) AS lp_raw,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') END AS closeddate_raw
         FROM orders),
         f AS (SELECT *,
           coalesce(lotsize_raw, '0x0') AS lotsize,
           coalesce(closeddate_raw, '00/00/0000 00:00:00') AS closeddate
         FROM syn),
         s AS (SELECT *,
           CASE WHEN regexp_matches(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$')
                THEN CAST(regexp_extract(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 1) AS DOUBLE)
                   * CAST(regexp_extract(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 2) AS DOUBLE)
                WHEN regexp_matches(lotsize, '(?i)^\s*(\d+(?:\.\d+)?)\s*AC(?:RES?)?\.?\s*$')
                THEN CAST(regexp_extract(lotsize, '(?i)^\s*(\d+(?:\.\d+)?)\s*AC(?:RES?)?\.?\s*$', 1) AS DOUBLE) * 43560.0
                ELSE 0.0 END AS lot_base
         FROM f)
         SELECT mlsnum, ownername AS sellername,
           coalesce(regexp_matches(ownername, '(?i)llc|investment|builders|inc|corp|group'), false) AS investment_sale,
           CASE WHEN lot_base = 0.0 AND coalesce(TRY_CAST(acres AS DOUBLE), 0.0) > 0.0
                THEN TRY_CAST(acres AS DOUBLE) * 43560.0 ELSE lot_base END AS lot_sqft,
           CAST(substring(string_split(closeddate, '/')[3], 1, 4) AS BIGINT) AS yr,
           CAST(string_split(closeddate, '/')[1] AS BIGINT) AS mon,
           round((TRY_CAST(lp_raw AS BIGINT) - TRY_CAST(olp_raw AS BIGINT))
                 / TRY_CAST(olp_raw AS BIGINT) * 100, 0) AS olp_lp_pct,
           'None. None. None' AS listing_remarks
         FROM s""",
    "q_pipeline_rnt" ->
      """WITH syn AS (SELECT
           CAST(o_orderkey AS VARCHAR) AS mlsnum,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') END AS renteddate_raw,
           CASE WHEN o_orderkey % 4 = 0 THEN NULL
                ELSE CAST(90 + o_orderkey % 20 AS VARCHAR) || '%' END AS rplp_raw,
           CASE WHEN o_orderkey % 3 = 0 THEN '0.0' ELSE '2.0' END AS baths_raw,
           '1.5' AS bathsfull,
           CAST(CAST(floor(o_totalprice / 100) AS BIGINT) AS VARCHAR) AS lp_raw,
           CASE WHEN o_orderkey % 6 = 0 THEN 'Oak' || chr(1) || 'Park' ELSE NULL END AS subdivision_raw,
           CASE WHEN o_orderkey % 3 = 0 THEN 'Wood,Tile' ELSE 'Carpet' END AS floors
         FROM orders),
         filled AS (SELECT mlsnum,
           coalesce(renteddate_raw, '00/00/0000 00:00:00') AS renteddate,
           coalesce(rplp_raw, '0') AS rplp,
           baths_raw, bathsfull, lp_raw,
           coalesce(subdivision_raw, 'Unknown') AS subdivision_s,
           floors
         FROM syn)
         SELECT mlsnum,
           CAST(substring(string_split(renteddate, '/')[3], 1, 4) AS BIGINT) AS yr,
           CAST(string_split(renteddate, '/')[1] AS BIGINT) AS mon,
           TRY_CAST(replace(rplp, '%', '') AS DOUBLE) - 100.0 AS rp_lp_pct,
           TRY_CAST(CASE WHEN TRY_CAST(baths_raw AS DOUBLE) = 0.0
                         THEN bathsfull ELSE baths_raw END AS DOUBLE) AS bathstotal,
           TRY_CAST(lp_raw AS BIGINT) AS lp,
           regexp_replace(subdivision_s, '[\x00-\x1f]', '', 'g') AS subdivision,
           coalesce(list_contains(string_split(floors, ','), 'Wood'), false) AS wood_floors
         FROM filled""",
    "q_pipeline_tax" ->
      """WITH syn AS (SELECT
           CAST(o_orderkey AS VARCHAR) AS autorow,
           'B' || CAST(o_orderkey % 900 AS VARCHAR) ||
             (CASE WHEN o_orderkey % 3 = 0 THEN '*' ELSE '' END) AS blockid_raw,
           CASE WHEN o_orderkey % 6 = 0 THEN 'MAIN' || chr(9) || 'ST'
                ELSE 'OAK AVE' END AS locstreet_raw,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') END AS saledate_raw,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE strftime(CAST(o_orderdate AS DATE) - 400, '%m/%d/%Y %H:%M:%S') END AS priorsaledate_raw,
           CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS saleprice_raw
         FROM orders),
         filled AS (SELECT autorow,
           blockid_raw,
           locstreet_raw,
           coalesce(saledate_raw, '00/00/0000 00:00:00') AS saledate_s,
           coalesce(priorsaledate_raw, '00/00/0000 00:00:00') AS priorsaledate_s,
           saleprice_raw
         FROM syn),
         staged AS (SELECT autorow,
           replace(blockid_raw, '*', '') AS blockid,
           regexp_replace(locstreet_raw, '[\x00-\x1f]', '', 'g') AS locstreet,
           try_strptime(saledate_s, '%m/%d/%Y %H:%M:%S') AS saledate,
           try_strptime(priorsaledate_s, '%m/%d/%Y %H:%M:%S') AS priorsaledate,
           saleprice_raw
         FROM filled)
         SELECT autorow, blockid, locstreet, saledate, priorsaledate,
           round(date_diff('day', priorsaledate, saledate) / 365.25, 4) AS prevown_yrs,
           TRY_CAST(saleprice_raw AS BIGINT) AS saleprice
         FROM staged""",
    "q_pipeline_res" ->
      """WITH syn AS (SELECT
           CAST(o_orderkey AS VARCHAR) AS mlsnum,
           'Town' || CAST(o_custkey % 25 AS VARCHAR) ||
             (CASE WHEN o_orderkey % 3 = 0 THEN '.(1234)' ELSE '' END) AS town,
           CASE WHEN o_orderkey % 7 = 0 THEN 'Garden Homes LLC' ELSE 'John* Smith' END AS ownername,
           CASE WHEN o_orderkey % 4 = 0 THEN NULL
                ELSE CAST(95 + o_orderkey % 10 AS VARCHAR) || '%' END AS sp_lp_raw,
           CASE WHEN o_orderkey % 5 = 0 THEN 'needs work, fixer upper special'
                WHEN o_orderkey % 5 = 1 THEN 'NOT A SHORT SALE, move right in'
                WHEN o_orderkey % 5 = 2 THEN 'short sale subject to bank approval'
                WHEN o_orderkey % 5 = 3 THEN NULL
                ELSE 'charming colonial' END AS remarkspublic,
           CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE 'agent notes' END AS remarksagent,
           CAST(NULL AS VARCHAR) AS showspecial,
           CASE WHEN o_orderkey % 4 = 0 THEN '100x50'
                WHEN o_orderkey % 4 = 1 THEN '12000 SF'
                WHEN o_orderkey % 4 = 2 THEN NULL ELSE 'IRR' END AS lotsize,
           CASE WHEN o_orderkey % 2 = 0 THEN '1.5' ELSE '0.0' END AS acres,
           CASE WHEN o_orderkey % 3 = 0 THEN '0.0' ELSE '2.0' END AS bathstotal_raw,
           '1.0' AS bathsfulltotal,
           CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS origlistprice,
           CAST(CAST(floor(o_totalprice * 0.95) AS BIGINT) AS VARCHAR) AS listprice,
           CAST(CAST(floor(o_totalprice * 0.9) AS BIGINT) AS VARCHAR) AS salesprice,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') END AS closeddate,
           strftime(CAST(o_orderdate AS DATE) - 45, '%m/%d/%Y %H:%M:%S') AS pendingdate,
           strftime(CAST(o_orderdate AS DATE) + 10, '%m/%d/%Y %H:%M:%S') AS anticcloseddate,
           CASE WHEN o_orderkey % 6 = 0 THEN 'OneFloor'
                WHEN o_orderkey % 6 = 1 THEN 'HighRise' ELSE 'Colonial' END AS styleprimary,
           CASE WHEN o_orderkey % 8 = 0 THEN 'TwnEndUn,Ranch' ELSE 'Ranch' END AS style_short,
           CASE WHEN o_orderkey % 3 = 0 THEN 'Wood,Tile'
                WHEN o_orderkey % 3 = 1 THEN 'Carpet' ELSE NULL END AS floors_short,
           CASE WHEN o_orderkey % 9 = 0 THEN '00:00:00'
                ELSE CAST(o_orderkey % 100000 AS VARCHAR) END AS assesstotal_raw,
           CASE WHEN o_orderkey % 4 = 0 THEN 'Public,Well' ELSE 'Well' END AS water_raw
         FROM orders),
         -- stage 1: fillna sentinels
         filled AS (SELECT mlsnum, town, ownername,
           coalesce(sp_lp_raw, '0%') AS sp_lp_raw,
           coalesce(remarkspublic, 'None') AS remarkspublic,
           coalesce(remarksagent, 'None') AS remarksagent,
           coalesce(showspecial, 'None') AS showspecial,
           coalesce(lotsize, '0x0') AS lotsize,
           acres, bathstotal_raw, bathsfulltotal, origlistprice, listprice, salesprice,
           coalesce(closeddate, '00/00/0000 00:00:00') AS closeddate,
           pendingdate, anticcloseddate, styleprimary, style_short, floors_short,
           assesstotal_raw, water_raw
         FROM syn),
         -- stage 2: standard cleaning + baths patch
         cleaned AS (SELECT *,
           replace(ownername, '*', '') AS sellername,
           regexp_replace(town, '\.?\*?\(\d{4}\*?\)', '') AS town_c,
           replace(sp_lp_raw, '%', '') AS sp_lp_c,
           replace(assesstotal_raw, '00:00:00', '0.0') AS assesstotal_c,
           regexp_replace(water_raw, '^Public(,\w+)?', 'Public') AS water_c,
           CASE WHEN TRY_CAST(bathstotal_raw AS DOUBLE) = 0.0
                THEN bathsfulltotal ELSE bathstotal_raw END AS bathstotal_c
         FROM filled),
         -- stages 3-11
         staged AS (SELECT *,
           CASE WHEN (CASE
                  WHEN regexp_matches(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$')
                  THEN CAST(regexp_extract(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 1) AS DOUBLE)
                     * CAST(regexp_extract(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 2) AS DOUBLE)
                  WHEN regexp_matches(lotsize, '(?i)^\s*(\d+(?:\.\d+)?)\s*SF\.?\s*$')
                  THEN CAST(regexp_extract(lotsize, '(?i)^\s*(\d+(?:\.\d+)?)\s*SF\.?\s*$', 1) AS DOUBLE)
                  ELSE 0.0 END) = 0.0 AND coalesce(TRY_CAST(acres AS DOUBLE), 0.0) > 0.0
                THEN TRY_CAST(acres AS DOUBLE) * 43560.0
                ELSE (CASE
                  WHEN regexp_matches(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$')
                  THEN CAST(regexp_extract(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 1) AS DOUBLE)
                     * CAST(regexp_extract(lotsize, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 2) AS DOUBLE)
                  WHEN regexp_matches(lotsize, '(?i)^\s*(\d+(?:\.\d+)?)\s*SF\.?\s*$')
                  THEN CAST(regexp_extract(lotsize, '(?i)^\s*(\d+(?:\.\d+)?)\s*SF\.?\s*$', 1) AS DOUBLE)
                  ELSE 0.0 END) END AS lot_sqft,
           CAST(substring(string_split(closeddate, '/')[3], 1, 4) AS BIGINT) AS yr,
           CAST(string_split(closeddate, '/')[1] AS BIGINT) AS mon,
           date_diff('day',
             try_strptime(pendingdate, '%m/%d/%Y %H:%M:%S'),
             try_strptime(closeddate, '%m/%d/%Y %H:%M:%S')) AS days_to_close,
           TRY_CAST(sp_lp_c AS DOUBLE) - 100.0 AS sp_lp_pct,
           concat_ws('. ', remarkspublic, remarksagent, showspecial) AS listing_remarks,
           CASE WHEN styleprimary IN ('TwnIntUn','OneFloor','MultiFlr','TwnEndUn','FirstFlr','HighRise')
                  OR list_has_any(string_split(style_short, ','),
                       ['TwnIntUn','OneFloor','MultiFlr','TwnEndUn','FirstFlr','HighRise'])
                THEN 'CCT' ELSE 'SinglFam' END AS subproptype_sfh,
           coalesce(list_contains(string_split(floors_short, ','), 'Wood'), false) AS wood_floors,
           coalesce(list_contains(string_split(water_c, ','), 'Public'), false) AS public_water,
           coalesce(list_contains(string_split(water_c, ','), 'Well'), false) AS well_water,
           coalesce(regexp_matches(sellername, '(?i)llc|investment|builders|inc|corp|group'), false) AS investment_sale,
           round((TRY_CAST(listprice AS BIGINT) - TRY_CAST(origlistprice AS BIGINT))
                 / TRY_CAST(origlistprice AS BIGINT) * 100, 0) AS olp_lp_pct,
           round((TRY_CAST(salesprice AS BIGINT) - TRY_CAST(origlistprice AS BIGINT))
                 / TRY_CAST(origlistprice AS BIGINT) * 100, 0) AS sp_olp_pct
         FROM cleaned),
         flagged AS (SELECT *,
           regexp_matches(listing_remarks, '(?i)fixer\s?upper|handyman|tlc|as[- ]is|needs? work|bring your tools|investor special') AS f_fix,
           regexp_matches(listing_remarks, '(?i)bank[- ]owned|reo|foreclos|corporate owned') AS f_bank,
           (regexp_matches(listing_remarks, '(?i)short sale')
             AND NOT regexp_matches(listing_remarks, '(?i)not a short sale')) AS f_ss
         FROM staged)
         SELECT mlsnum, town_c AS town, sellername, sp_lp_pct, listing_remarks,
           CASE WHEN f_fix THEN 'Fixer Upper' ELSE 'Unknown' END AS condition,
           f_ss AS short_sale, f_bank AS bank_owned,
           (f_fix OR f_bank OR f_ss) AS distressed_sale,
           investment_sale, subproptype_sfh, lot_sqft,
           TRY_CAST(bathstotal_c AS DOUBLE) AS bathstotal,
           yr, mon, days_to_close, olp_lp_pct, sp_olp_pct,
           TRY_CAST(assesstotal_c AS DOUBLE) AS assesstotal,
           wood_floors, public_water, well_water,
           TRY_CAST(listprice AS BIGINT) AS listprice
         FROM flagged""")
}

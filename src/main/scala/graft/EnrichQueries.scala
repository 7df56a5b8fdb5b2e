package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Cleaning
import graft.operators.{Enrich, Relational}

/** J2 tax-enrichment composition, W2 time-of-possession, and F1 column
  * case normalization under the oracle. */
object EnrichQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** J2/J2a — listings synthesized from orders, tax table from customer;
    * the join is (towncode, locnum, 4-char street prefix) and the repair
    * bank patches YEARBUILT / ASSESSTOTAL / LATITUDE / TAXID from the
    * tax side exactly where the listing value is sentinel. */
  private val qJ2TaxEnrich: Q = (spark, dir) => {
    val k = col("o_orderkey")
    val listings = Tables.orders(spark, dir).select(
      k.as("o_orderkey"),
      (col("o_custkey") % 200).as("TOWNCODE"),
      (k % 10).as("LOCNUM"),
      when(k % 3 === 0, lit("MAPLE AVE")).when(k % 3 === 1, lit("OAK ST"))
        .otherwise(lit("ELM DR")).as("STREET"),
      when(k % 4 === 0, lit(0L)).otherwise(lit(1950L) + k % 70).as("YEARBUILT"),
      when(k % 5 === 0, lit(0.0)).otherwise((k % 9000).cast(DoubleType) + 100.0).as("ASSESSTOTAL"),
      when(k % 6 === 0, lit(Cleaning.Sentinels.LatLong))
        .otherwise(concat(lit("40."), (k % 10000).cast(StringType))).as("LATITUDE"),
      when(k % 7 === 0, lit(Cleaning.Sentinels.TaxId))
        .otherwise(concat(lit("T"), k.cast(StringType))).as("TAXID"))
    val c = col("c_custkey")
    val tax = Tables.customer(spark, dir).filter(c < 2000).select(
      (c % 200).as("CITYCODE"),
      floor(c / 200).cast(LongType).as("TAXLOCNUM"),
      when(c % 3 === 0, lit("MAPLE AVENUE")).when(c % 3 === 1, lit("OAK STREET"))
        .otherwise(lit("ELM DRIVE")).as("LOCSTREET"),
      (lit(1900L) + c % 120).as("TAX_YEAR"),
      ((c * 37) % 500000).cast(DoubleType).as("TAX_ASSESS"),
      concat(lit("40.7"), (c % 100).cast(StringType)).as("TAX_LAT"),
      (c % 100000).as("TAX_LOT"))
    Enrich.taxEnrich(listings, tax,
      Enrich.taxJoinCondition(
        col("TOWNCODE"), col("LOCNUM"), col("STREET"),
        col("CITYCODE"), col("TAXLOCNUM"), col("LOCSTREET")),
      Seq(
        Enrich.Repair("YEARBUILT", col("TAX_YEAR"), Seq(0L)),
        Enrich.Repair("ASSESSTOTAL", col("TAX_ASSESS"), Seq(0.0)),
        Enrich.Repair("LATITUDE", col("TAX_LAT"), Seq(Cleaning.Sentinels.LatLong)),
        Enrich.Repair("TAXID",
          Cleaning.apnNormalize(col("CITYCODE"), col("TAXLOCNUM"), col("TAX_LOT")),
          Seq(Cleaning.Sentinels.TaxId))))
      .select(col("o_orderkey"), col("YEARBUILT").as("yearbuilt"),
        col("ASSESSTOTAL").as("assesstotal"), col("LATITUDE").as("latitude"),
        col("TAXID").as("taxid"))
  }

  /** W2 — lag-based time-of-possession over per-key sale history
    * (GSMLS.py:1832-1867, 2028-2045). */
  private val qW2Top: Q = (spark, dir) =>
    Relational.timeOfPossession(
      Tables.orders(spark, dir), Seq("o_custkey"), "o_orderdate",
      tiebreak = Seq(col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("top_years"), 4).as("top_years"))

  /** F1 — column-name case normalization round-trip (GSMLS.py:1362, :1703). */
  private val qF1UpperCols: Q = (spark, dir) => {
    val up = Cleaning.upperColumns(Tables.nation(spark, dir))
    // prove the uppercase frame is the one being queried
    Cleaning.lowerColumns(up.select(col("N_NATIONKEY"), col("N_NAME")))
  }

  /** Skew-safe salted join: the salt spreads each hot fact key over 8
    * reducers and cancels out of the result — the oracle is the PLAIN
    * join, so a pass proves salting is semantics-preserving. */
  private val qJSalted: Q = (spark, dir) => {
    val fact = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
    val dim = Tables.orders(spark, dir).select(
      col("o_orderkey").as("okey"), col("o_totalprice"))
    Relational.saltedJoin(fact, dim, "okey", salts = 8)
      .select(col("okey"), col("l_linenumber"), col("l_quantity"), col("o_totalprice"))
  }

  /** Two-phase salted aggregation over the genuinely skewed
    * `event_type` key (a handful of distinct values for the whole
    * table). DECIMAL accumulation keeps the sum order-independent, so
    * the two-phase merge is value-exact vs the one-shot oracle. */
  private val qAggSalted: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
      .withColumn("value", col("value").cast(DecimalType(18, 6)))
    Relational.saltedSumCount(ev, Seq("event_type"), "value", salts = 32)
      .select(col("event_type"),
        col("value_sum").cast(DoubleType).as("value_sum"), col("n"))
  }

  def queries: Map[String, Q] = Map(
    "q_j2_tax_enrich" -> qJ2TaxEnrich,
    "q_w2_top"        -> qW2Top,
    "q_f1_upper_cols" -> qF1UpperCols,
    "q_j_salted"      -> qJSalted,
    "q_agg_salted"    -> qAggSalted)

  def oracleSql: Map[String, String] = Map(
    "q_j2_tax_enrich" ->
      """WITH listings AS (SELECT o_orderkey,
           o_custkey % 200 AS towncode,
           o_orderkey % 10 AS locnum,
           CASE WHEN o_orderkey % 3 = 0 THEN 'MAPLE AVE'
                WHEN o_orderkey % 3 = 1 THEN 'OAK ST' ELSE 'ELM DR' END AS street,
           CASE WHEN o_orderkey % 4 = 0 THEN 0 ELSE 1950 + o_orderkey % 70 END AS yearbuilt,
           CASE WHEN o_orderkey % 5 = 0 THEN 0.0
                ELSE CAST(o_orderkey % 9000 AS DOUBLE) + 100.0 END AS assesstotal,
           CASE WHEN o_orderkey % 6 = 0 THEN '0E-20'
                ELSE '40.' || CAST(o_orderkey % 10000 AS VARCHAR) END AS latitude,
           CASE WHEN o_orderkey % 7 = 0 THEN '0000-00000-0000-00000-0000'
                ELSE 'T' || CAST(o_orderkey AS VARCHAR) END AS taxid
         FROM orders),
         tax AS (SELECT
           c_custkey % 200 AS citycode,
           CAST(floor(c_custkey / 200) AS BIGINT) AS taxlocnum,
           CASE WHEN c_custkey % 3 = 0 THEN 'MAPLE AVENUE'
                WHEN c_custkey % 3 = 1 THEN 'OAK STREET' ELSE 'ELM DRIVE' END AS locstreet,
           1900 + c_custkey % 120 AS tax_year,
           CAST((c_custkey * 37) % 500000 AS DOUBLE) AS tax_assess,
           '40.7' || CAST(c_custkey % 100 AS VARCHAR) AS tax_lat,
           c_custkey % 100000 AS tax_lot
         FROM customer WHERE c_custkey < 2000),
         j AS (SELECT l.*, t.tax_year, t.tax_assess, t.tax_lat, t.citycode, t.taxlocnum, t.tax_lot
               FROM listings l LEFT JOIN tax t
                 ON l.towncode = t.citycode AND l.locnum = t.taxlocnum
                AND lower(l.street) LIKE lower(substring(t.locstreet, 1, 4)) || '%')
         SELECT o_orderkey,
           CASE WHEN yearbuilt = 0 THEN coalesce(tax_year, yearbuilt) ELSE yearbuilt END AS yearbuilt,
           CASE WHEN assesstotal = 0.0 THEN coalesce(tax_assess, assesstotal) ELSE assesstotal END AS assesstotal,
           CASE WHEN latitude = '0E-20' THEN coalesce(tax_lat, latitude) ELSE latitude END AS latitude,
           CASE WHEN taxid = '0000-00000-0000-00000-0000'
                THEN coalesce(
                  concat_ws('-', lpad(CAST(citycode AS VARCHAR), 4, '0'),
                                 lpad(CAST(taxlocnum AS VARCHAR), 5, '0'),
                                 lpad('0', 5, '0'),
                                 lpad(CAST(tax_lot AS VARCHAR), 5, '0'),
                                 lpad('0', 5, '0')), taxid)
                ELSE taxid END AS taxid
         FROM j""",
    "q_w2_top" ->
      """SELECT o_custkey, o_orderkey,
         round(coalesce(date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) / 365.25, 10.0), 4) AS top_years
         FROM orders""",
    "q_f1_upper_cols" ->
      "SELECT n_nationkey, n_name FROM nation",
    "q_j_salted" ->
      """SELECT l.l_orderkey AS okey, l.l_linenumber, l.l_quantity, o.o_totalprice
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
    "q_agg_salted" ->
      """SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
         count(*) AS n
         FROM events GROUP BY event_type""")
}

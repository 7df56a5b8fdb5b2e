package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Cleaning, Text}
import graft.operators.{Relational, Similarity}

/** Driver contract — one `queries` entry (plus DuckDB oracle SQL) per
  * implemented operator from SURVEY.md §2 and the training-data-pipeline
  * extension set. Column names are aliased identically in the Spark plan
  * and the oracle SQL (the driver's compare sorts columns by name).
  */
object SparkEntry {
  private type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1Agg(spark, "/root/testdata/sf0.001")

  // =====================================================================
  // Headline aggregations (bench workload)
  // =====================================================================

  /** TPC-H Q1-shaped pricing summary — SURVEY §2.4 A3/A4 family.
    * Sums accumulate in DECIMAL (exact, order-independent) and the final
    * aggregate is cast to DOUBLE so the serialized representation is
    * engine-portable (Spark widens decimal sums to (28,x), DuckDB to
    * (38,x) — same value, different type). One hash-shuffle on the
    * 6-value group key with map-side partial aggregation. */
  private val q1Agg: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-31"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        round(sum(col("l_quantity")) / count(lit(1)), 2).as("avg_qty"))
  }

  /** TPC-H Q3-shaped top-k revenue join: broadcast dim, two fact joins,
    * decimal revenue, TakeOrderedAndProject top 10. */
  private val q3TopkJoin: Q = (spark, dir) => {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") >= lit("1998-01-01"))
    val li   = Tables.lineitem(spark, dir).filter(col("l_shipdate") < lit("2000-06-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Hourly tumbling-window aggregation over the event stream (batch view
    * of ST-family semantics). Groups on the truncated TIMESTAMP (8-byte
    * shuffle key), formatting the string label only after the aggregate —
    * at 100× scale you don't want to shuffle 19-byte strings. */
  private val qEventsHourly: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
        col("event_type"), col("n"), col("sum_value"))
  }

  // =====================================================================
  // §2.2 Projections / filters / predicates
  // =====================================================================

  /** P1 — fixed projection. */
  private val qP1Project: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))

  /** P5 — conjunctive equality filter w/ YEAR+MONTH (GSMLS.py:1556-1572). */
  private val qP5FilterEq: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F" &&
              year(col("o_orderdate")) === 1998 && month(col("o_orderdate")) === 3)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** P7 — case-insensitive prefix predicate (GSMLS.py:942-953). */
  private val qP7PrefixIlike: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .filter(lower(col("p_name")).startsWith("sm"))
      .select(col("p_partkey"), col("p_name"))

  /** P6/P8-style JSON point extraction + range predicate over events.props
    * (F28 decode half) — real JSON-path access, not regex-on-JSON. */
  private val qEventsJson: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast(LongType))
      .filter(col("k_val") > 90)
      .select(col("event_id"), col("k_val"))

  // =====================================================================
  // §2.3 Joins
  // =====================================================================

  /** J1 — broadcast equi inner join chain (GSMLS.py:1370-1376). */
  private val qJ1JoinBroadcast: Q = (spark, dir) => {
    val ord = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
    Relational.enrichInner(ord, Tables.customer(spark, dir),
      col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("o_orderkey"), col("c_name"), col("n_name"))
  }

  /** J2/J2a — left-join enrichment + coalesce repair (GSMLS.py:153-273). */
  private val qJ2EnrichCoalesce: Q = (spark, dir) => {
    val dim = Tables.part(spark, dir).filter(col("p_size") > 5)
      .select(col("p_partkey"), col("p_retailprice"))
    Tables.lineitem(spark, dir)
      .join(dim, col("l_partkey") === col("p_partkey"), "left")
      .withColumn("price_fixed",
        when(col("p_retailprice").isNull || col("p_retailprice") <= 0, col("l_extendedprice"))
          .otherwise(col("p_retailprice")))
      .select(col("l_orderkey"), col("l_linenumber"), col("price_fixed"))
  }

  // =====================================================================
  // §2.4 Aggregations
  // =====================================================================

  /** A1 — scalar MAX/MIN/COUNT (GSMLS.py:1011). */
  private val qA1MaxScalar: Q = (spark, dir) =>
    Tables.orders(spark, dir).agg(
      max(col("o_orderkey")).as("max_key"),
      min(col("o_orderkey")).as("min_key"),
      count(lit(1)).as("n"))

  /** A2 — group-first dedup by key (Mongo $group/$first, RealEstateImages.py:554-557). */
  private val qA2GroupFirst: Q = (spark, dir) =>
    Relational.dedupKeepFirst(
      Tables.orders(spark, dir), Seq("o_custkey"),
      struct(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))

  /** A3 — conditional SUM over group (flood-zone coverage, GSMLS.py:1757-1770). */
  private val qA3ConditionalSum: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_linestatus") === "F", col("l_quantity")).otherwise(lit(0.0))).as("qty_f"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  /** A5 — order-dependent dedup keep='last' with explicit ordering column
    * (Kafka_GSMLSConsumer.py:196-219; SURVEY §7.4(1)). */
  private val qA5DedupKeepLast: Q = (spark, dir) =>
    Relational.dedupKeepLast(
      Tables.orders(spark, dir),
      Seq("o_custkey", "o_orderdate"), col("o_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))

  // =====================================================================
  // §2.5 Windows
  // =====================================================================

  /** W1 — lag over per-key sale history: days since previous + ToP years
    * with first-row default (GSMLS.py:1832-1867). */
  private val qW1Lag: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("days_since_prev",
        coalesce(datediff(col("o_orderdate"), col("prev_date")).cast(LongType), lit(-1L)))
      .withColumn("top_years",
        round(coalesce(datediff(col("o_orderdate"), col("prev_date")) / lit(365.25), lit(10.0)), 4))
      .select(col("o_custkey"), col("o_orderkey"), col("days_since_prev"), col("top_years"))
  }

  // =====================================================================
  // §2.6 Sorts / top-k
  // =====================================================================

  /** O1 — top-1 by composite order (GSMLS.py:995-999). */
  private val qO1Top1: Q = (spark, dir) =>
    Relational.topK(Tables.orders(spark, dir), 1,
      col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** O2 — top-2 composite desc sort (GSMLS.py:1006-1015). */
  private val qO2Top2Composite: Q = (spark, dir) =>
    Relational.topK(Tables.orders(spark, dir), 2,
      col("o_orderdate").desc, col("o_orderkey").desc)
      .select(col("o_orderkey"), col("o_orderdate"))

  // =====================================================================
  // §2.7 Set ops
  // =====================================================================

  /** U1 — UNION ALL of micro-batch frames (Kafka_GSMLSConsumer.py:196). */
  private val qU1UnionAll: Q = (spark, dir) => {
    val ord = Tables.orders(spark, dir)
    Relational.unionAll(Seq(
      ord.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_custkey")),
      ord.filter(year(col("o_orderdate")) === 1997 && month(col("o_orderdate")) === 1)
        .select(col("o_orderkey"), col("o_custkey"))))
  }

  /** S9 — Mongo work-queue aggregate: match-null → group-first → sort desc
    * (RealEstateImages.py:552-561). */
  private val qS9WorkQueue: Q = (spark, dir) => {
    val flagged = Tables.orders(spark, dir)
      .withColumn("done", when(col("o_orderkey") % 7 === 0, lit(null: String)).otherwise(lit("Yes")))
    Relational.pendingWorkQueue(flagged, "done", "o_custkey",
      struct(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
  }

  // =====================================================================
  // §2.8 Scalar functions
  // =====================================================================

  /** F3 — currency parse incl. '---' sentinel (GSMLS.py:916-928). */
  private val qF3Currency: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .withColumn("raw",
        when(col("p_partkey") % 10 === 0, lit("---"))
          .otherwise(concat(lit("$"), col("p_retailprice").cast(StringType))))
      .withColumn("parsed", Cleaning.parseCurrency(col("raw")))
      .select(col("p_partkey"), col("raw"), col("parsed"))

  /** F4 — null-safe concat with na_rep (Kafka_GSMLSConsumer.py:143-149). */
  private val qF4ConcatNaRep: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("lang_or_null", when(col("lang") === "en", lit(null: String)).otherwise(col("lang")))
      .withColumn("combined", Cleaning.concatNaRep(". ", "_", col("source"), col("lang_or_null")))
      .select(col("doc_id"), col("combined"))

  /** F5 — regex cleanup rules (Kafka_GSMLSConsumer.py:1106-1182). */
  private val qF5RegexClean: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("clean_hash", md5(regexp_replace(col("text"), "\\b(the|a)\\b", "<ART>")))
      .select(col("doc_id"), col("clean_hash"))

  /** F6 — control-char strip (Kafka_GSMLSConsumer.py:287-313). */
  private val qF6CtrlStrip: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("dirty", concat(col("text"), lit("\t\u0001")))
      .withColumn("len_dirty", length(col("dirty")).cast(LongType))
      .withColumn("len_clean", length(Cleaning.stripControlChars(col("dirty"))).cast(LongType))
      .select(col("doc_id"), col("len_dirty"), col("len_clean"))

  /** F7 — regex containment flag (INVESTMENT_SALE, Kafka_GSMLSConsumer.py:590-597). */
  private val qF7RegexFlag: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("has_kw", Cleaning.regexFlag(col("text"), "spark|vector"))
      .select(col("doc_id"), col("has_kw"))

  /** F8 — multi-hot attribute expansion (Kafka_GSMLSConsumer.py:617-885). */
  private val qF8MultiHot: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("has_spark",  Cleaning.tokenFlag(col("text"), "spark", " "))
      .withColumn("has_join",   Cleaning.tokenFlag(col("text"), "join", " "))
      .withColumn("has_window", Cleaning.tokenFlag(col("text"), "window", " "))
      .withColumn("has_vector", Cleaning.tokenFlag(col("text"), "vector", " "))
      .select(col("doc_id"), col("has_spark"), col("has_join"), col("has_window"), col("has_vector"))

  /** F9 — remarks classification with negation override + escalate-only
    * flags (Kafka_GSMLSConsumer.py:522-587; SURVEY §7.4(5)). */
  private val qF9Classify: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("has_slow", col("text").rlike("(?i)\\bslow\\b") && !col("text").rlike("(?i)not slow"))
      .withColumn("has_fast", col("text").rlike("(?i)\\bfast\\b"))
      .withColumn("condition",
        when(col("has_slow") && !col("has_fast"), lit("Fixer Upper"))
          .when(col("has_fast"), lit("Good"))
          .otherwise(lit("Unknown")))
      .select(col("doc_id"), col("has_slow"), col("has_fast"), col("condition"))

  /** F10 — membership-based reclassification (Kafka_GSMLSConsumer.py:1185-1218). */
  private val qF10Isin: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .withColumn("cls",
        when(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"), lit("CCT"))
          .otherwise(lit("SinglFam")))
      .select(col("p_partkey"), col("cls"))

  /** F11/F14/F25 — date part extraction: builtin + string-parse variants
    * (Kafka_GSMLSConsumer.py:888-895, GSMLS.py:798-811, 985-989). */
  private val qF11Dates: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .withColumn("date_str", date_format(col("o_orderdate"), "MM/dd/yyyy HH:mm:ss"))
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("y"),
        month(col("o_orderdate")).cast(LongType).as("m"),
        quarter(col("o_orderdate")).cast(LongType).as("qtr"),
        last_day(col("o_orderdate")).as("ld"),
        Cleaning.parseMonth(col("date_str")).as("pm"),
        Cleaning.parseYear(col("date_str")).as("py"))

  /** F12 — coercing date parse: null on failure (Kafka_GSMLSConsumer.py:51-86). */
  private val qF12DateCoerce: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .withColumn("date_raw",
        when(col("o_orderkey") % 5 === 0, lit(Cleaning.Sentinels.DateStr))
          .otherwise(date_format(col("o_orderdate"), "MM/dd/yyyy HH:mm:ss")))
      .withColumn("parsed", Cleaning.parseDateCoerce(col("date_raw")).cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("date_raw"), col("parsed"))

  /** F13 — date diffs (DAYS_TO_CLOSE family, Kafka_GSMLSConsumer.py:55-87). */
  private val qF13DateDiff: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        Cleaning.daysBetween(col("l_shipdate"), col("o_orderdate")).cast(LongType).as("ship_delay"))

  /** F15 — rounded percentage deltas (Kafka_GSMLSConsumer.py:58-82). */
  private val qF15PctDelta: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .withColumn("discounted", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .withColumn("sp_lp_pct", Cleaning.pctDelta(col("discounted"), col("l_extendedprice")))
      .select(col("l_orderkey"), col("l_linenumber"), col("sp_lp_pct"))

  /** F16/F17 — lot-size normalization: '100x50' / '12000 SF' / '1.5 AC' /
    * garbage→0.0 (Kafka_GSMLSConsumer.py:494-519). */
  private val qF17LotSize: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .withColumn("lot_raw",
        when(col("p_partkey") % 4 === 0,
             concat(col("p_size").cast(StringType), lit("x"), (col("p_size") + 10).cast(StringType)))
          .when(col("p_partkey") % 4 === 1, concat((col("p_size") * 100).cast(StringType), lit(" SF")))
          .when(col("p_partkey") % 4 === 2,
             concat(round(col("p_size") / 10.0, 1).cast(StringType), lit(" AC")))
          .otherwise(lit("n/a")))
      .withColumn("lot_sqft", Cleaning.lotSizeSqft(col("lot_raw")))
      .select(col("p_partkey"), col("lot_raw"), col("lot_sqft"))

  /** F18 — APN zero-pad normalization (GSMLS.py:694-754). */
  private val qF18Apn: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .withColumn("apn", Cleaning.apnNormalize(
        col("p_partkey") % 10000, col("p_size"), col("p_partkey") % 100))
      .select(col("p_partkey"), col("apn"))

  /** F19 — address normalization: strip junk, collapse whitespace, pad zip
    * (GSMLS.py:131-151). */
  private val qF19Address: Q = (spark, dir) =>
    Tables.customer(spark, dir)
      .withColumn("addr_raw", concat(lit("  "), col("c_name"), lit("*  ST  ")))
      .withColumn("addr", Cleaning.normalizeAddressPart(col("addr_raw")))
      .withColumn("zip", Cleaning.padZip(col("c_custkey") % 10000))
      .select(col("c_custkey"), col("addr"), col("zip"))

  /** F20 — municipality suffix strip (GSMLS.py:2177-2179). */
  private val qF20MuniSuffix: Q = (spark, dir) =>
    Tables.nation(spark, dir)
      .withColumn("town_raw", concat(col("n_name"),
        when(col("n_nationkey") % 3 === 0, lit(" Boro"))
          .when(col("n_nationkey") % 3 === 1, lit(" Twp"))
          .otherwise(lit(" City"))))
      .withColumn("town", Cleaning.stripMunicipalitySuffix(col("town_raw")))
      .select(col("n_nationkey"), col("town_raw"), col("town"))

  /** F21 — regex tuple extraction (lat/long from navigate(), GSMLS.py:883). */
  private val qF21Extract: Q = (spark, dir) =>
    Tables.customer(spark, dir)
      .withColumn("cust_num", regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast(LongType))
      .select(col("c_custkey"), col("cust_num"))

  /** F22 — first-match classifier bank (RealEstateImages.py:36-60). */
  private val qF22Classifier: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .withColumn("category", Cleaning.firstMatchClassify(col("p_name"), Seq(
        "Fastener" -> "(?i)bolt|screw|nut",
        "Widget"   -> "(?i)widget|gizmo|gadget",
        "Drive"    -> "(?i)gear|wheel|ring"), "Other"))
      .select(col("p_partkey"), col("category"))

  /** F26 — tolerant cast with fallback (Kafka_GSMLSConsumer.py:477-483;
    * SURVEY §7.4(2)). */
  private val qF26TolerantCast: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .withColumn("raw",
        when(col("p_partkey") % 5 === 0, col("p_size").cast(StringType)).otherwise(col("p_name")))
      .withColumn("val", Cleaning.tolerantCast(col("raw"), DoubleType, lit(-1.0)))
      .select(col("p_partkey"), col("raw"), col("val"))

  /** F27 — sentinel fillna (Kafka_GSMLSConsumer.py:316-491). */
  private val qF27FillNa: Q = (spark, dir) =>
    Cleaning.fillSentinels(
      Tables.customer(spark, dir)
        .withColumn("seg", when(col("c_mktsegment") === "BUILDING", lit(null: String))
          .otherwise(col("c_mktsegment")))
        .withColumn("bal", when(col("c_acctbal") < 0, lit(null: java.lang.Double))
          .otherwise(col("c_acctbal")))
        .select(col("c_custkey"), col("seg"), col("bal")),
      Map("seg" -> Cleaning.Sentinels.Unknown, "bal" -> 0.0))

  // =====================================================================
  // Registry
  // =====================================================================

  /** Merge the per-file registries, REFUSING silent shadowing: `++`
    * lets a later map override an earlier one's entry, which once
    * replaced an existing query (and its oracle) with an unrelated new
    * one of the same name — both halves stayed self-consistent, so
    * nothing reddened. Name queries uniquely or fail loudly. */
  private def mergedUnique[A](parts: Seq[Map[String, A]]): Map[String, A] = {
    val dups = parts.flatMap(_.keys).groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query names across registries: ${dups.toSeq.sorted.mkString(", ")}")
    parts.reduce(_ ++ _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = mergedUnique(Seq(Map(
    "q1_agg"               -> q1Agg,
    "q3_topk_join"         -> q3TopkJoin,
    "q_events_hourly"      -> qEventsHourly,
    "q_events_json"        -> qEventsJson,
    "q_p1_project"         -> qP1Project,
    "q_p5_filter_eq"       -> qP5FilterEq,
    "q_p7_prefix_ilike"    -> qP7PrefixIlike,
    "q_j1_join_broadcast"  -> qJ1JoinBroadcast,
    "q_j2_enrich_coalesce" -> qJ2EnrichCoalesce,
    "q_a1_max_scalar"      -> qA1MaxScalar,
    "q_a2_group_first"     -> qA2GroupFirst,
    "q_a3_conditional_sum" -> qA3ConditionalSum,
    "q_a5_dedup_keep_last" -> qA5DedupKeepLast,
    "q_w1_lag"             -> qW1Lag,
    "q_o1_top1"            -> qO1Top1,
    "q_o2_top2_composite"  -> qO2Top2Composite,
    "q_u1_union_all"       -> qU1UnionAll,
    "q_s9_work_queue"      -> qS9WorkQueue,
    "q_f3_currency"        -> qF3Currency,
    "q_f4_concat_narep"    -> qF4ConcatNaRep,
    "q_f5_regex_clean"     -> qF5RegexClean,
    "q_f6_ctrl_strip"      -> qF6CtrlStrip,
    "q_f7_regex_flag"      -> qF7RegexFlag,
    "q_f8_multi_hot"       -> qF8MultiHot,
    "q_f9_classify"        -> qF9Classify,
    "q_f10_isin"           -> qF10Isin,
    "q_f11_dates"          -> qF11Dates,
    "q_f12_date_coerce"    -> qF12DateCoerce,
    "q_f13_datediff"       -> qF13DateDiff,
    "q_f15_pct_delta"      -> qF15PctDelta,
    "q_f17_lot_size"       -> qF17LotSize,
    "q_f18_apn"            -> qF18Apn,
    "q_f19_address"        -> qF19Address,
    "q_f20_muni_suffix"    -> qF20MuniSuffix,
    "q_f21_extract"        -> qF21Extract,
    "q_f22_classifier"     -> qF22Classifier,
    "q_f26_tolerant_cast"  -> qF26TolerantCast,
    "q_f27_fill_na"        -> qF27FillNa
  ), ExtensionQueries.queries, MoreQueries.queries, PipelineQueries.queries,
    IoQueries.queries, EnrichQueries.queries, CurationQueries.queries,
    ScaleQueries.queries, LinkageQueries.queries, StatsQueries.queries, CurationE2E.queries,
    WarehouseQueries.queries, ReportQueries.queries))

  /** DuckDB-runnable oracle SQL, one per query, same column aliases. */
  def oracleSql: Map[String, String] = mergedUnique(Seq(Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order,
         round(sum(l_quantity) / count(*), 2) AS avg_qty
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_topk_join" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
           AND l.l_shipdate < TIMESTAMP '2000-06-01 00:00:00'
         GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
         ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10""",
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q_events_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
         FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90""",
    "q_p1_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
    "q_p5_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND year(o_orderdate) = 1998 AND month(o_orderdate) = 3""",
    "q_p7_prefix_ilike" ->
      "SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE 'sm%'",
    "q_j1_join_broadcast" ->
      """SELECT o.o_orderkey, c.c_name, n.n_name FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE o.o_orderstatus = 'P'""",
    "q_j2_enrich_coalesce" ->
      """SELECT l.l_orderkey, l.l_linenumber,
         CASE WHEN p.p_retailprice IS NULL OR p.p_retailprice <= 0
              THEN l.l_extendedprice ELSE p.p_retailprice END AS price_fixed
         FROM lineitem l
         LEFT JOIN (SELECT p_partkey, p_retailprice FROM part WHERE p_size > 5) p
           ON l.l_partkey = p.p_partkey""",
    "q_a1_max_scalar" ->
      "SELECT max(o_orderkey) AS max_key, min(o_orderkey) AS min_key, count(*) AS n FROM orders",
    "q_a2_group_first" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders) t WHERE rn = 1""",
    "q_a3_conditional_sum" ->
      """SELECT l_returnflag,
         sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END) AS qty_f,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_returnflag""",
    "q_a5_dedup_keep_last" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus FROM (
           SELECT o_custkey, o_orderkey, o_orderstatus,
                  row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
           FROM orders) t WHERE rn = 1""",
    "q_w1_lag" ->
      """SELECT o_custkey, o_orderkey,
         coalesce(date_diff('day', prev_date, o_orderdate), -1) AS days_since_prev,
         round(coalesce(date_diff('day', prev_date, o_orderdate) / 365.25, 10.0), 4) AS top_years
         FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                      lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
               FROM orders) t""",
    "q_o1_top1" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1",
    "q_o2_top2_composite" ->
      "SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2",
    "q_u1_union_all" ->
      """SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'P'
         UNION ALL
         SELECT o_orderkey, o_custkey FROM orders WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = 1""",
    "q_s9_work_queue" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders WHERE o_orderkey % 7 = 0) t WHERE rn = 1""",
    "q_f3_currency" ->
      """SELECT p_partkey,
         CASE WHEN p_partkey % 10 = 0 THEN '---' ELSE '$' || CAST(p_retailprice AS VARCHAR) END AS raw,
         CASE WHEN trim(CASE WHEN p_partkey % 10 = 0 THEN '---' ELSE '$' || CAST(p_retailprice AS VARCHAR) END) = '---' THEN 0.0
              ELSE CAST(regexp_replace(CASE WHEN p_partkey % 10 = 0 THEN '---' ELSE '$' || CAST(p_retailprice AS VARCHAR) END, '[$,]', '', 'g') AS DOUBLE) END AS parsed
         FROM part""",
    "q_f4_concat_narep" ->
      """SELECT doc_id,
         concat_ws('. ', coalesce(source, '_'),
                   coalesce(CASE WHEN lang = 'en' THEN NULL ELSE lang END, '_')) AS combined
         FROM documents""",
    "q_f5_regex_clean" ->
      """SELECT doc_id, md5(regexp_replace(text, '\b(the|a)\b', '<ART>', 'g')) AS clean_hash
         FROM documents""",
    "q_f6_ctrl_strip" ->
      """SELECT doc_id,
         CAST(length(text || chr(9) || chr(1)) AS BIGINT) AS len_dirty,
         CAST(length(regexp_replace(text || chr(9) || chr(1), '[\x00-\x1f]', '', 'g')) AS BIGINT) AS len_clean
         FROM documents""",
    "q_f7_regex_flag" ->
      "SELECT doc_id, coalesce(regexp_matches(text, '(?i)spark|vector'), false) AS has_kw FROM documents",
    "q_f8_multi_hot" ->
      """SELECT doc_id,
         coalesce(list_contains(string_split(text, ' '), 'spark'), false) AS has_spark,
         coalesce(list_contains(string_split(text, ' '), 'join'), false) AS has_join,
         coalesce(list_contains(string_split(text, ' '), 'window'), false) AS has_window,
         coalesce(list_contains(string_split(text, ' '), 'vector'), false) AS has_vector
         FROM documents""",
    "q_f9_classify" ->
      """SELECT doc_id,
         (regexp_matches(text, '(?i)\bslow\b') AND NOT regexp_matches(text, '(?i)not slow')) AS has_slow,
         regexp_matches(text, '(?i)\bfast\b') AS has_fast,
         CASE WHEN (regexp_matches(text, '(?i)\bslow\b') AND NOT regexp_matches(text, '(?i)not slow'))
                   AND NOT regexp_matches(text, '(?i)\bfast\b') THEN 'Fixer Upper'
              WHEN regexp_matches(text, '(?i)\bfast\b') THEN 'Good'
              ELSE 'Unknown' END AS condition
         FROM documents""",
    "q_f10_isin" ->
      """SELECT p_partkey,
         CASE WHEN p_brand IN ('Brand#1','Brand#2','Brand#3') THEN 'CCT' ELSE 'SinglFam' END AS cls
         FROM part""",
    "q_f11_dates" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(last_day(o_orderdate) AS DATE) AS ld,
         CAST(string_split(strftime(o_orderdate, '%m/%d/%Y %H:%M:%S'), '/')[1] AS BIGINT) AS pm,
         CAST(substring(string_split(strftime(o_orderdate, '%m/%d/%Y %H:%M:%S'), '/')[3], 1, 4) AS BIGINT) AS py
         FROM orders""",
    "q_f12_date_coerce" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN '00/00/0000 00:00:00'
              ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') END AS date_raw,
         try_strptime(CASE WHEN o_orderkey % 5 = 0 THEN '00/00/0000 00:00:00'
              ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') END, '%m/%d/%Y %H:%M:%S') AS parsed
         FROM orders""",
    "q_f13_datediff" ->
      """SELECT l.l_orderkey, l.l_linenumber,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS ship_delay
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
    "q_f15_pct_delta" ->
      """SELECT l_orderkey, l_linenumber,
         round((l_extendedprice * (1.0 - l_discount) - l_extendedprice) / l_extendedprice * 100, 0) AS sp_lp_pct
         FROM lineitem""",
    "q_f17_lot_size" ->
      """WITH t AS (SELECT p_partkey,
           CASE WHEN p_partkey % 4 = 0 THEN CAST(p_size AS VARCHAR) || 'x' || CAST(p_size + 10 AS VARCHAR)
                WHEN p_partkey % 4 = 1 THEN CAST(p_size * 100 AS VARCHAR) || ' SF'
                WHEN p_partkey % 4 = 2 THEN CAST(round(p_size / 10.0, 1) AS VARCHAR) || ' AC'
                ELSE 'n/a' END AS lot_raw FROM part)
         SELECT p_partkey, lot_raw,
           CASE WHEN regexp_matches(lot_raw, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$')
                THEN CAST(regexp_extract(lot_raw, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 1) AS DOUBLE)
                   * CAST(regexp_extract(lot_raw, '^\s*(\d+(?:\.\d+)?)\s*[xX]\s*(\d+(?:\.\d+)?)\s*$', 2) AS DOUBLE)
                WHEN regexp_matches(lot_raw, '(?i)^\s*(\d+(?:\.\d+)?)\s*SF\.?\s*$')
                THEN CAST(regexp_extract(lot_raw, '(?i)^\s*(\d+(?:\.\d+)?)\s*SF\.?\s*$', 1) AS DOUBLE)
                WHEN regexp_matches(lot_raw, '(?i)^\s*(\d+(?:\.\d+)?)\s*AC(?:RES?)?\.?\s*$')
                THEN CAST(regexp_extract(lot_raw, '(?i)^\s*(\d+(?:\.\d+)?)\s*AC(?:RES?)?\.?\s*$', 1) AS DOUBLE) * 43560.0
                ELSE 0.0 END AS lot_sqft
         FROM t""",
    "q_f18_apn" ->
      """SELECT p_partkey,
         concat_ws('-', lpad(CAST(p_partkey % 10000 AS VARCHAR), 4, '0'),
                        lpad(CAST(p_size AS VARCHAR), 5, '0'),
                        lpad('0', 5, '0'),
                        lpad(CAST(p_partkey % 100 AS VARCHAR), 5, '0'),
                        lpad('0', 5, '0')) AS apn
         FROM part""",
    "q_f19_address" ->
      """SELECT c_custkey,
         trim(regexp_replace(regexp_replace('  ' || c_name || '*' || chr(160) || ' ST  ', '[*' || chr(160) || ']', ' ', 'g'), '\s+', ' ', 'g')) AS addr,
         lpad(CAST(c_custkey % 10000 AS VARCHAR), 5, '0') AS zip
         FROM customer""",
    "q_f20_muni_suffix" ->
      """WITH t AS (SELECT n_nationkey, n_name ||
           CASE WHEN n_nationkey % 3 = 0 THEN ' Boro'
                WHEN n_nationkey % 3 = 1 THEN ' Twp'
                ELSE ' City' END AS town_raw FROM nation)
         SELECT n_nationkey, town_raw,
                trim(regexp_replace(town_raw, '\s+(Boro|Twp|City|Town|Village)$', '', 'g')) AS town
         FROM t""",
    "q_f21_extract" ->
      """SELECT c_custkey, CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num
         FROM customer""",
    "q_f22_classifier" ->
      """SELECT p_partkey,
         CASE WHEN regexp_matches(p_name, '(?i)bolt|screw|nut') THEN 'Fastener'
              WHEN regexp_matches(p_name, '(?i)widget|gizmo|gadget') THEN 'Widget'
              WHEN regexp_matches(p_name, '(?i)gear|wheel|ring') THEN 'Drive'
              ELSE 'Other' END AS category
         FROM part""",
    "q_f26_tolerant_cast" ->
      """WITH t AS (SELECT p_partkey,
           CASE WHEN p_partkey % 5 = 0 THEN CAST(p_size AS VARCHAR) ELSE p_name END AS raw FROM part)
         SELECT p_partkey, raw, coalesce(TRY_CAST(raw AS DOUBLE), -1.0) AS val FROM t""",
    "q_f27_fill_na" ->
      """SELECT c_custkey,
         coalesce(CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END, 'Unknown') AS seg,
         coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal
         FROM customer"""
  ), ExtensionQueries.oracleSql, MoreQueries.oracleSql, PipelineQueries.oracleSql,
    IoQueries.oracleSql, EnrichQueries.oracleSql, CurationQueries.oracleSql,
    ScaleQueries.oracleSql, LinkageQueries.oracleSql, StatsQueries.oracleSql, CurationE2E.oracleSql,
    WarehouseQueries.oracleSql, ReportQueries.oracleSql))
}

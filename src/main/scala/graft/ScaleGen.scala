package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator mirroring the driver's
  * testdata tables (TESTDATA.md schemas and value distributions), used
  * by [[ScaleProbe]] to MEASURE the scaling exponent of the headline
  * queries instead of arguing it.
  *
  * Row counts are `mult ×` the sf0.1 counts, so `mult = 1` produces an
  * sf0.1-equivalent and `mult = 10` the 10× probe dataset. Both ends of
  * a probe come from THIS generator (same layout policy, same file
  * sizing rule), so the measured t(10×)/t(1×) ratio reflects plan
  * scaling, not a layout confound against the driver's single-row-group
  * files.
  *
  * The generator is itself scale-shaped: every table is a pure
  * codegen'd projection over `spark.range` — column values derive from
  * `xxhash64(id, salt)` arithmetic, so generation is embarrassingly
  * parallel, reproducible at any partition count, and driver-side holds
  * nothing. The same program would generate 100 TB on a real cluster by
  * raising `mult`.
  *
  * Distribution fidelity to the driver's sf0.1 files (verified against
  * their DuckDB profiles):
  *  - lineitem/orders/part/supplier/customer: TPC-H-ish value ranges,
  *    uniform categorical mixes, FK integrity (l_orderkey ∈ orders,
  *    l_partkey ∈ part, …), exactly 4 lines per order (driver: avg 4).
  *  - documents: 10–100 words from the same 30-word vocabulary, 5%
  *    marked with a trailing " dup" token, ~0.16% exact copies of an
  *    earlier document (driver: 250/5000 dup-marked, 8/5000 copies).
  *  - embeddings: 64-dim unit-normalized vectors, labels 0–9.
  *  - events: 30 days of microsecond-jittered timestamps, 5 event
  *    types, user cardinality scaling with the data (driver: 1500 at
  *    sf0.1).
  */
object ScaleGen {
  // sf0.1 row counts per TESTDATA.md / the driver's files
  private val baseRows: Map[String, Long] = Map(
    "lineitem" -> 600000L, "orders" -> 150000L, "customer" -> 15000L,
    "part" -> 20000L, "supplier" -> 1000L, "events" -> 100000L,
    "documents" -> 5000L, "embeddings" -> 2000L)

  private def u(seed: Column, salt: Int, mod: Long): Column =
    pmod(xxhash64(seed, lit(salt)), lit(mod))

  /** Output file sizing: one file per ~250k rows, capped — the rule is
    * applied identically at every mult so both ends of a probe share
    * the layout policy. */
  private def filesFor(rows: Long): Int =
    math.max(1, math.min(64, (rows / 250000L).toInt))

  def lineitem(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("lineitem") * mult
    val nPart = baseRows("part") * mult
    val nSupp = baseRows("supplier") * mult
    spark.range(0, n, 1, filesFor(n) * 4).select(
      expr("id div 4").as("l_orderkey"),
      u(col("id"), 1, nPart).as("l_partkey"),
      u(col("id"), 2, nSupp).as("l_suppkey"),
      (pmod(col("id"), lit(4L)) + 1L).cast("int").as("l_linenumber"),
      (u(col("id"), 3, 50L) + 1L).cast("double").as("l_quantity"),
      round(lit(901.0) + u(col("id"), 4, 9910000L) / 100.0, 2).as("l_extendedprice"),
      (u(col("id"), 5, 11L) / lit(100.0)).as("l_discount"),
      (u(col("id"), 6, 9L) / lit(100.0)).as("l_tax"),
      element_at(array(lit("A"), lit("N"), lit("R")),
        (u(col("id"), 7, 3L) + 1L).cast("int")).as("l_returnflag"),
      element_at(array(lit("F"), lit("O")),
        (u(col("id"), 8, 2L) + 1L).cast("int")).as("l_linestatus"),
      expr("CAST(timestampadd(DAY, CAST(pmod(xxhash64(id, 9), 2500) AS INT), " +
        "TIMESTAMP_NTZ '1995-01-02 00:00:00') AS TIMESTAMP_NTZ)").as("l_shipdate"))
  }

  def orders(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("orders") * mult
    val nCust = baseRows("customer") * mult
    spark.range(0, n, 1, filesFor(n) * 4).select(
      col("id").as("o_orderkey"),
      u(col("id"), 11, nCust).as("o_custkey"),
      element_at(array(lit("O"), lit("P"), lit("F")),
        (u(col("id"), 12, 3L) + 1L).cast("int")).as("o_orderstatus"),
      round(lit(1000.0) + u(col("id"), 13, 49900000L) / 100.0, 2).as("o_totalprice"),
      expr("CAST(timestampadd(DAY, CAST(pmod(xxhash64(id, 14), 2400) AS INT), " +
        "TIMESTAMP_NTZ '1995-01-01 00:00:00') AS TIMESTAMP_NTZ)").as("o_orderdate"),
      element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW")),
        (u(col("id"), 15, 5L) + 1L).cast("int")).as("o_orderpriority"))
  }

  def customer(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("customer") * mult
    spark.range(0, n, 1, filesFor(n)).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      u(col("id"), 21, 25L).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u(col("id"), 22, 1100000L) / 100.0, 2).as("c_acctbal"),
      element_at(array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
        lit("HOUSEHOLD"), lit("MACHINERY")),
        (u(col("id"), 23, 5L) + 1L).cast("int")).as("c_mktsegment"))
  }

  def supplier(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("supplier") * mult
    spark.range(0, n, 1, filesFor(n)).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      u(col("id"), 31, 25L).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u(col("id"), 32, 1100000L) / 100.0, 2).as("s_acctbal"))
  }

  def part(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("part") * mult
    val adjs = array(Seq("blue", "cold", "hot", "large", "new", "old",
      "red", "small").map(lit): _*)
    val nouns = array(Seq("anvil", "bolt", "gear", "gizmo", "plate",
      "ring", "rod", "widget").map(lit): _*)
    spark.range(0, n, 1, filesFor(n)).select(
      col("id").as("p_partkey"),
      concat(element_at(adjs, (u(col("id"), 41, 8L) + 1L).cast("int")),
        lit(" "),
        element_at(nouns, (u(col("id"), 42, 8L) + 1L).cast("int"))).as("p_name"),
      concat(lit("Brand#"), (u(col("id"), 43, 25L) + 1L)).as("p_brand"),
      element_at(array(lit("ECONOMY"), lit("LARGE"), lit("MEDIUM"),
        lit("PROMO"), lit("SMALL"), lit("STANDARD")),
        (u(col("id"), 44, 6L) + 1L).cast("int")).as("p_type"),
      (u(col("id"), 45, 50L) + 1L).cast("int").as("p_size"),
      round(lit(900.0) + u(col("id"), 46, 1000L) / 10.0, 1).as("p_retailprice"))
  }

  def nation(spark: SparkSession): DataFrame =
    spark.range(0, 25, 1, 1).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5L)).cast("int").as("n_regionkey"))

  def region(spark: SparkSession): DataFrame =
    spark.range(0, 5, 1, 1).select(
      col("id").cast("int").as("r_regionkey"),
      element_at(array(lit("AFRICA"), lit("AMERICA"), lit("ASIA"),
        lit("EUROPE"), lit("MIDDLE EAST")),
        (col("id") + 1L).cast("int")).as("r_name"))

  def events(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("events") * mult
    val nUsers = 1500L * mult
    val spanMicros = 30L * 86400L * 1000000L
    spark.range(0, n, 1, filesFor(n) * 2).select(
      col("id").as("event_id"),
      expr(s"CAST(timestampadd(MICROSECOND, pmod(xxhash64(id, 51), ${spanMicros}L), " +
        "TIMESTAMP_NTZ '2024-01-01 00:00:00') AS TIMESTAMP_NTZ)").as("ts"),
      u(col("id"), 52, nUsers).as("user_id"),
      element_at(array(lit("click"), lit("error"), lit("purchase"),
        lit("signup"), lit("view")),
        (u(col("id"), 53, 5L) + 1L).cast("int")).as("event_type"),
      round(u(col("id"), 54, 56021L) / 100.0, 2).as("value"),
      concat(lit("{\"k\": "), u(col("id"), 55, 100L), lit("}")).as("props"))
  }

  /** The sf0.1 documents' 30-word vocabulary (profiled from the
    * driver's files — random word sequences over these tokens). */
  private val docVocab = Seq("spark", "window", "merge", "table", "column",
    "vector", "stream", "value", "data", "small", "join", "filter", "big",
    "group", "hash", "customer", "sort", "order", "slow", "line", "part",
    "fast", "row", "the", "agg", "key", "query", "a", "scan", "batch")

  def documents(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("documents") * mult
    val vocab = array(docVocab.map(lit): _*)
    // ~1 doc in 625 is an EXACT copy of a uniformly-chosen earlier doc
    // (driver: 8 copies / 5000); all text-determining draws key off the
    // copy seed so the pair is byte-identical. 1 in 20 docs (by seed)
    // carries the trailing " dup" marker (driver: 250/5000).
    val copySeed = when(pmod(col("id"), lit(625L)) === 624L && col("id") > 0L,
      pmod(xxhash64(col("id"), lit(61)), col("id")))
      .otherwise(col("id"))
    val len = lit(10L) + u(copySeed, 62, 91L)
    val body = array_join(
      transform(sequence(lit(0L), len - 1L),
        i => element_at(vocab, (pmod(xxhash64(copySeed, i), lit(30L)) + 1L).cast("int"))),
      " ")
    val text0 = when(u(copySeed, 63, 20L) === 0L,
      concat(body, lit(" dup"))).otherwise(body)
    spark.range(0, n, 1, filesFor(n)).select(
      col("id").as("doc_id"),
      text0.as("text"),
      when(u(col("id"), 64, 100L) < 41L, "en")
        .when(u(col("id"), 64, 100L) < 56L, "zh")
        .when(u(col("id"), 64, 100L) < 71L, "es")
        .when(u(col("id"), 64, 100L) < 86L, "fr")
        .otherwise("de").as("lang"),
      concat(lit("src"), u(col("id"), 65, 20L)).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def embeddings(spark: SparkSession, mult: Int): DataFrame = {
    val n = baseRows("embeddings") * mult
    val raw = transform(sequence(lit(0L), lit(63L)),
      j => (pmod(xxhash64(col("id"), j), lit(20001L)) - 10000L).cast("double") / 10000.0)
    spark.range(0, n, 1, filesFor(n)).select(
      col("id").as("vec_id"),
      transform(raw, x =>
        (x / sqrt(aggregate(raw, lit(0.0), (acc, v) => acc + v * v)))
          .cast("float")).as("embedding"),
      u(col("id"), 71, 10L).cast("int").as("label"))
  }

  /** `only` restricts generation to the named tables — the third-decade
    * (1000×) probes need only the table(s) a query reads, and writing
    * the full 1000× set (~19 GB) to measure a 1 GB embeddings query
    * would be pure waste. Empty = all tables. */
  def writeAll(spark: SparkSession, outDir: String, mult: Int,
               only: Set[String] = Set.empty): Unit = {
    def w(name: String, df: => DataFrame): Unit =
      if (only.isEmpty || only(name))
        df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    w("region", region(spark))
    w("nation", nation(spark))
    w("supplier", supplier(spark, mult))
    w("customer", customer(spark, mult))
    w("part", part(spark, mult))
    w("orders", orders(spark, mult))
    w("lineitem", lineitem(spark, mult))
    w("events", events(spark, mult))
    w("documents", documents(spark, mult))
    w("embeddings", embeddings(spark, mult))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/scaleprobe/gen1")
    val mult = if (args.length > 1) args(1).toInt else 10
    val only = if (args.length > 2)
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
    else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match the driver files' timestamp[us] parquet encoding (the
      // default here would emit NANOS, which the probe session's
      // nanosAsLong flag would then surface as LongType)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, outDir, mult, only)
    println(s"""{"scalegen":"$outDir","mult":$mult,"tables":"${if (only.isEmpty) "all" else only.toSeq.sorted.mkString(",")}"}""")
    spark.stop()
  }
}

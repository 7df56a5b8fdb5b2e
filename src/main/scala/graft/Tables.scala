package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * At cluster scale these would be DSv2 catalog tables (partitioned,
  * bucketed); here they are plain parquet scans — Catalyst still gets
  * filter pushdown + column pruning from the declarative plans built
  * on top of them.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Ingest fan-out for CPU-bound narrow pipelines: when the scan yields
    * fewer splits than the cluster's parallelism (the testdata tables are
    * single-row-group parquet files — one task no matter the core count),
    * redistribute before the heavy per-row work. A round-robin exchange
    * of a few MB buys full-width execution of the regex/date/cleaning
    * stages downstream; on a real 100 TB table the scan already yields
    * thousands of splits, the predicate is false, and no shuffle is
    * added.
    *
    * The parallelism probe counts the scan's leaf FILES (`inputFiles` —
    * pure catalog listing) rather than touching `df.rdd`, which would
    * eagerly force logical→physical→RDD conversion per load. Files
    * under-count partitions when a file is large enough to split, so a
    * second (still listing-only, ≤ target-1 getFileStatus calls) probe
    * estimates the splits the scan will actually produce at
    * `spark.sql.files.maxPartitionBytes` — a few huge splittable files
    * already carry the parallelism and are left alone. The estimate
    * deliberately ignores Spark's openCostInBytes/bytesPerCore refinement
    * and ASSUMES A SPLITTABLE FORMAT: a large gzip'd text file would be
    * credited with splits it can't deliver. All call sites load parquet
    * (splittable), where over-crediting only skips an optional shuffle.
    *
    * CONTRACT: non-file-backed plans (`inputFiles` empty — in-memory
    * relations, streaming sources) are returned UNCHANGED, never
    * force-shuffled: the heuristic can only reason about file scans. A
    * caller holding an in-memory corpus (e.g. a localCheckpointed frame)
    * that needs fan-out must `repartition` explicitly. */
  def fanOut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) df
    else {
      val maxPart = math.max(1L,
        org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes)
      val fs = new org.apache.hadoop.fs.Path(files.head)
        .getFileSystem(sc.hadoopConfiguration)
      val estSplits = files.map { f =>
        val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
        math.max(1L, (len + maxPart - 1) / maxPart)
      }.sum
      if (estSplits >= target) df else df.repartition(target)
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and plain timestamp[us] in others, so the loader adapts
    * to what the file actually carries instead of assuming one encoding:
    *
    *  - NANOS: Spark's vectorized reader rejects it outright, so the
    *    `nanosAsLong` legacy flag (set up front, idempotent, read at plan
    *    time) surfaces it as a `LongType` nanos-since-epoch, which we
    *    convert to a microsecond TIMESTAMP_NTZ by pure arithmetic on the
    *    NTZ epoch — no instant/timezone round-trip, so the wall-clock
    *    matches what DuckDB reads from the same parquet regardless of
    *    session timezone.
    *  - timestamp[us] (isAdjustedToUTC either way): arrives as a native
    *    timestamp type; a cast to TIMESTAMP_NTZ preserves the wall-clock
    *    under the UTC session timezone every entrypoint pins.
    *
    * Downstream consumers always see `ts: TIMESTAMP_NTZ` either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

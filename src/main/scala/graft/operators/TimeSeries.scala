package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Regular-grid time-series resampling with gap materialization and
  * forward fill — the pandas `resample(...).sum().ffill()` idiom
  * (the reference's pandas pipelines lean on positional continuity;
  * at scale the grid must be constructed, not assumed).
  *
  * Scale design: the raw stream collapses FIRST in one (key, bucket)
  * hash aggregation — map-side combine does the heavy lifting, and
  * everything after operates on the resampled relation, whose size is
  * calendar-bounded (span/step rows per key) regardless of raw event
  * volume. The dense grid comes from a per-key span aggregate exploded
  * through `sequence` — never a cross join against a driver-built
  * calendar table. The forward-fill window partitions by key alone,
  * which is safe for the same calendar-bound reason: a key's series
  * can't exceed span/step rows, so no partition grows with data scale.
  * (For second-granularity grids over years, split the window into
  * (key, epoch-chunk) partitions and carry the last value across
  * chunk boundaries with one extra join — same trick as the SCD2
  * timeline's bounded windows.)
  *
  * Value sums ride DECIMAL(18,4) so shard/partition addition order
  * cannot perturb them (the established events-table contract). */
object TimeSeries {
  /** Resample `df` onto a dense `stepSeconds` grid per `keyCol`:
    * one row per (key, bucket) between the key's first and last active
    * bucket, with `n_events` (0 on gaps), the bucket's exact decimal
    * sum as `v_sum` (null on gaps), and `v_ffill` carrying the last
    * non-null sum forward. `bucket_ts` is the bucket's start instant. */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, stepSeconds: Long): DataFrame =
    resampleFfillChunked(df, keyCol, tsCol, valCol, stepSeconds,
      chunkBuckets = 0)

  /** [[resampleFfill]] with the per-key window split into fixed
    * `chunkBuckets`-wide partitions plus a boundary carry — for grids
    * where span/step is too long for one partition (second-granularity
    * over years). The fill becomes two bounded windows: a LOCAL ffill
    * inside each (key, chunk), and a carry window over the per-chunk
    * "last non-null" summary rows — span/chunkBuckets rows per key,
    * i.e. the level-2 window operates on a relation `chunkBuckets`×
    * smaller than the grid. Gap rows before a chunk's first value take
    * the carry from the newest prior chunk that had one. Results are
    * identical to the single-window form for every chunking (spec-
    * pinned); `chunkBuckets = 0` selects the single window. */
  def resampleFfillChunked(df: DataFrame, keyCol: String, tsCol: String,
                           valCol: String, stepSeconds: Long,
                           chunkBuckets: Long): DataFrame = {
    val agg = df
      .groupBy(col(keyCol),
        floor(Relational.epochSeconds(df, tsCol) / stepSeconds)
          .cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valCol).cast(DecimalType(18, 4))).as("__v"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol),
        explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val joined = grid.join(agg, Seq(keyCol, "bucket"), "left")
    val filled =
      if (chunkBuckets <= 0) {
        val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
        joined.withColumn("__f", last(col("__v"), ignoreNulls = true).over(w))
      } else {
        val chunked = joined
          .withColumn("__chunk", floor(col("bucket") / chunkBuckets))
        val wLocal = Window.partitionBy(col(keyCol), col("__chunk"))
          .orderBy(col("bucket"))
        val local = chunked
          .withColumn("__lf", last(col("__v"), ignoreNulls = true).over(wLocal))
        // per-chunk summary: the newest value each chunk can hand on —
        // one row per (key, chunk), so the carry window is bounded
        val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // the chunk's hand-on value is its local ffill AT the last
        // bucket (null iff the chunk saw no value at all): max_by on
        // the unique bucket is deterministic and hash-aggregates
        val carry = local
          .groupBy(col(keyCol), col("__chunk"))
          .agg(max_by(col("__lf"), col("bucket")).as("__last"))
          .withColumn("__carry",
            last(col("__last"), ignoreNulls = true).over(wCarry))
          .select(col(keyCol), col("__chunk"), col("__carry"))
        local.join(carry, Seq(keyCol, "__chunk"))
          .withColumn("__f", coalesce(col("__lf"), col("__carry")))
      }
    filled.select(col(keyCol),
      timestamp_seconds(col("bucket") * stepSeconds).as("bucket_ts"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      col("__v").cast(DoubleType).as("v_sum"),
      col("__f").cast(DoubleType).as("v_ffill"))
  }
}

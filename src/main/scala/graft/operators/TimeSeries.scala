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
                    valCol: String, stepSeconds: Long): DataFrame = {
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
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol),
        timestamp_seconds(col("bucket") * stepSeconds).as("bucket_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("__v").cast(DoubleType).as("v_sum"),
        last(col("__v"), ignoreNulls = true).over(w)
          .cast(DoubleType).as("v_ffill"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-portable cardinality sketch: K-Minimum-Values (KMV).
  *
  * HLL (approx_count_distinct) answers the same question but its binary
  * sketch is engine-specific and unverifiable across systems. KMV keeps
  * the k smallest values of a uniform content hash; with h uniform on
  * [0, M), E[distinct] ≈ (k-1)·M / h_(k). Everything is md5-derived, so
  * two engines compute BIT-IDENTICAL sketches and estimates — the
  * property the rest of this engine's dedup stack relies on, extended
  * to cardinality estimation.
  *
  * Scale shape: the hash is a projection; per-group k-smallest is a
  * partial-aggregation-friendly pattern (each partition keeps its own
  * k minima before the exchange — the same reason TopK.topKPerKey
  * scales), expressed here as distinct + per-group bottom-k. Sketches
  * of disjoint shards MERGE by taking the k smallest of the union —
  * how a 100 TB estimate composes from per-partition sketches.
  */
object Sketch {

  private val mBits = 60
  private val mDouble = math.pow(2.0, mBits) // hash range size as double

  /** 60-bit uniform content hash (15 hex chars of md5). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Per-group KMV distinct-count estimate of `valueCol`.
    * Output: (groupCols…, n_kept, est_distinct). Groups with fewer than
    * k distinct values report their exact count (the sketch holds every
    * value, so "estimate" is exact there — standard KMV behavior). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                  k: Int): DataFrame = {
    val hashed = df.select((groupCols.map(col) :+ hash60(valueCol).as("__h")): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h").asc)
    val kept = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    kept.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__hk"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(round(lit((k - 1).toDouble) * lit(mDouble) / col("__hk"))
            .cast(LongType)))
      .drop("__hk")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deterministic distributed training of a linear quality classifier —
  * the CCNet/fastText-filter shape: learn surface-feature weights from
  * weak labels over the corpus, then score and gate documents with the
  * fitted model. Batch gradient descent where each round is ONE
  * map-side-combined aggregation over the corpus; the model (m+1
  * doubles) rides the driver between rounds exactly like the BPE
  * trainer's merge table — bounded by model size, never by data.
  *
  * Engine-parity-safe by construction, like the k-means/PQ trainers:
  * the activation is the HARD sigmoid clamp(0.5 + x/4, 0, 1) — pure
  * arithmetic, bit-identical in any engine, where exp() ULP drift
  * would poison a cross-engine replay — per-row gradient terms are
  * quantized to integers before summing (addition-order-free), and
  * weights round to 6 decimals per round, so a SQL oracle unrolling
  * the same rounds reproduces the fitted weights bit-for-bit.
  */
object Learn {
  /** Fit weights by `iters` rounds of full-batch GD at rate `lr` from
    * zero initialization. `features` are (name, expression) pairs;
    * `label` must evaluate to 0.0/1.0. Returns one row per feature
    * plus `__bias`, in declaration order.
    *
    * Scale shape: the featurized corpus is persisted once (feature
    * extraction — regex counts, token splits — is the expensive part
    * and must not re-run per round); each round then costs one scan
    * producing m+1 quantized sums that collapse map-side to one row.
    * Total: 1 featurize + iters cheap scans, zero shuffles beyond the
    * single-row aggregations. */
  /** Project `df` onto the numbered feature/label columns the GD step
    * consumes. */
  private[graft] def featurize(df: DataFrame, features: Seq[(String, Column)],
                               label: Column): DataFrame =
    df.select(
      features.zipWithIndex.map { case ((_, c), i) => c.cast(DoubleType).as(s"__f$i") } :+
        label.cast(DoubleType).as("__y"): _*)

  /** One full-batch GD step from weights `w` over a featurized frame of
    * `n` rows: ONE aggregation producing m+1 integer-quantized gradient
    * sums, then the 6-decimal driver-side update (BigDecimal HALF_UP —
    * the same rounding round(x, 6) applies in both engines). */
  private[graft] def gdStep(feats: DataFrame, m: Int, w: Array[Double],
                            lr: Double, n: Double): Array[Double] = {
    val margin = (0 until m).map(i => col(s"__f$i") * lit(w(i)))
      .reduceOption(_ + _).getOrElse(lit(0.0)) + lit(w(m))
    // hard sigmoid: exact arithmetic, no transcendental drift
    val p = greatest(lit(0.0), least(lit(1.0), margin * lit(0.25) + lit(0.5)))
    val err = p - col("__y")
    val sums = feats.agg(
      sum(round(err * lit(1e6)).cast(LongType)).as("gb"),
      (0 until m).map(i =>
        sum(round(err * col(s"__f$i") * lit(1e6)).cast(LongType)).as(s"g$i")): _*)
      .head()
    Array.tabulate(m + 1) { i =>
      val g = if (i < m) sums.getAs[Long](s"g$i") else sums.getAs[Long]("gb")
      BigDecimal(w(i) - lr * (g / 1e6) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Weight rows (feature, weight) in declaration order. */
  private[graft] def weightsDf(df: DataFrame, features: Seq[(String, Column)],
                               w: Array[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    (features.map(_._1) :+ "__bias").zip(w.toSeq).toDF("feature", "weight")
  }

  def logisticTrain(df: DataFrame, features: Seq[(String, Column)],
                    label: Column, lr: Double, iters: Int): DataFrame = {
    val m = features.size
    val feats = featurize(df, features, label)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.count().toDouble
    var w = Array.fill(m + 1)(0.0)
    for (_ <- 0 until iters) w = gdStep(feats, m, w, lr, n)
    feats.unpersist(blocking = false)
    weightsDf(df, features, w)
  }

  /** Score rows under a fitted weight row-set (the [[logisticTrain]]
    * output collected to a literal — m+1 values): the hard-sigmoid
    * probability, rounded to 6. Pure projection — the gate a corpus
    * filter applies at scan time. */
  def logisticScore(features: Seq[(String, Column)], weights: Map[String, Double]): Column = {
    val margin = features.map { case (name, c) =>
      c.cast(DoubleType) * lit(weights(name))
    }.reduceOption(_ + _).getOrElse(lit(0.0)) + lit(weights("__bias"))
    round(greatest(lit(0.0), least(lit(1.0), margin * lit(0.25) + lit(0.5))), 6)
  }
}

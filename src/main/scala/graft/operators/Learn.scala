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
  def logisticTrain(df: DataFrame, features: Seq[(String, Column)],
                    label: Column, lr: Double, iters: Int): DataFrame = {
    val m = features.size
    val feats = featurize(df, features, label)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.count().toDouble
    require(n > 0, "Learn.logisticTrain: empty training input")
    var w = Array.fill(m + 1)(0.0)
    for (_ <- 0 until iters) w = gdStep(feats, m, w, lr, n)
    feats.unpersist(blocking = false)
    weightsDf(df, features, w)
  }

  /** ROC AUC of a score column against 0/1 labels — the threshold-free
    * eval, computed as the Mann-Whitney rank-sum over the SCORE
    * HISTOGRAM: the corpus collapses to one row per distinct score
    * first (map-side combined), the tie-averaged ranks come from a
    * prefix-sum window over that bounded relation, and every term
    * stays an integer (ranks doubled to absorb the .5 tie averages)
    * until the single final division — so the result is exact in any
    * engine and any partitioning, and the only per-row work is one
    * aggregation. Returns one row (n_pos, n_neg, auc); auc is NaN when
    * either class is absent (the metric is undefined there — callers
    * gate on n_pos/n_neg, which the row carries for exactly that). */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = scored.groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(col(labelCol).cast(DoubleType)).cast(LongType).as("__np"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = h.withColumn("__below", coalesce(sum(col("__n")).over(w), lit(0L)))
      // doubled tie-averaged rank: 2·below + n + 1 (integer, exact)
      .withColumn("__r2", lit(2L) * col("__below") + col("__n") + lit(1L))
    ranked.agg(
      sum(col("__np")).as("n_pos"),
      (sum(col("__n")) - sum(col("__np"))).as("n_neg"),
      sum(col("__np") * col("__r2")).as("__s2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("__s2") - col("n_pos") * (col("n_pos") + 1)) /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Reliability table: scores bucketed into `bins`, each bin's count,
    * quantized mean score and observed positive rate — the calibration
    * check beside [[auc]]. One aggregation; integer sums throughout. */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int): DataFrame =
    scored.select(
      least(floor(col(scoreCol) * bins).cast(LongType), lit(bins - 1L)).as("bin"),
      round(col(scoreCol) * lit(1e6)).cast(LongType).as("__q"),
      col(labelCol).cast(DoubleType).cast(LongType).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__q")).cast(DoubleType) / count(lit(1)) / 1e6, 6).as("mean_score"),
        round(sum(col("__y")).cast(DoubleType) / count(lit(1)), 6).as("pos_rate"))

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

  // ---------------------------------------------------------------------
  // Multinomial Naive Bayes over tokens — the OTHER classic corpus
  // quality/language filter (fastText-style): where logisticTrain
  // learns weights for a handful of surface features, NB learns one
  // log-likelihood ratio PER TOKEN, so the model is the vocabulary
  // itself. Training is two aggregations (per-token class counts, then
  // the scalar totals); scoring is one vocabulary-bounded join + one
  // per-doc sum — no iteration, no driver-side state beyond nothing.
  //
  // Engine-parity discipline (the lmScore idiom): every log is
  // quantized to integer micro-units the moment it is computed —
  // qllr(w) = q(ln p(w|pos)) − q(ln p(w|neg)) with q(x) =
  // floor(x·1e6 + 0.5) — so all cross-token arithmetic is integer and
  // addition-order-free; the displayed score divides back once at the
  // end. Laplace add-one smoothing gives unseen tokens the CONSTANT
  // ratio q(ln 1/(totPos+V)) − q(ln 1/(totNeg+V)), which ships in the
  // 1-row consts relation instead of materializing the open vocabulary.
  //
  // Shape at 100 TB: the model table is vocabulary-bounded (same state
  // bound as BM25's term table) and joins the scoring corpus on the
  // token key — no broadcast forced, no skew hazard beyond what the
  // corpus' own token distribution carries; the consts scalar
  // broadcasts. Training's per-token aggregate combines map-side.
  // ---------------------------------------------------------------------
  /** Train NB from a token relation carrying the weak label: returns
    * (tokenLlr: w, qllr) and (consts: q_prior, q_unseen — 1 row).
    * `labelCol` must be boolean and constant within a document. */
  def nbTrain(toks: DataFrame, idCol: String, wCol: String,
              labelCol: Column): (DataFrame, DataFrame) = {
    def qlog(c: Column): Column =
      floor(log(c.cast(DoubleType)) * 1000000.0 + 0.5).cast(LongType)
    val perW = toks.groupBy(col(wCol)).agg(
      sum(when(labelCol, 1L).otherwise(0L)).as("__cp"),
      sum(when(labelCol, 0L).otherwise(1L)).as("__cn"))
    val consts = toks.agg(
        sum(when(labelCol, 1L).otherwise(0L)).as("__totp"),
        sum(when(labelCol, 0L).otherwise(1L)).as("__totn"),
        countDistinct(col(wCol)).as("__v"),
        countDistinct(when(labelCol, col(idCol))).as("__dp"),
        countDistinct(when(!labelCol, col(idCol))).as("__dn"))
      .select(col("__totp"), col("__totn"), col("__v"),
        // Add-one smoothing on the DOCUMENT counts too: a weak label
        // that degenerates to a single class (dp or dn = 0) must not
        // turn ln(0) into a silent null prior that nulls every score —
        // with the +1 the prior is finite and the classifier still
        // leans the right way, exactly like the token-count smoothing.
        (qlog(col("__dp") + 1) - qlog(col("__dn") + 1)).as("q_prior"),
        (qlog(lit(1L).cast(DoubleType) / (col("__totp") + col("__v"))) -
          qlog(lit(1L).cast(DoubleType) / (col("__totn") + col("__v"))))
          .as("q_unseen"))
    val tokenLlr = perW.crossJoin(broadcast(consts))
      .select(col(wCol),
        (qlog((col("__cp") + 1).cast(DoubleType) / (col("__totp") + col("__v"))) -
          qlog((col("__cn") + 1).cast(DoubleType) / (col("__totn") + col("__v"))))
          .as("qllr"))
    (tokenLlr, consts.select("q_prior", "q_unseen"))
  }

  /** Score a token relation under a trained model: per document the
    * token count, the quantized-sum NB log-odds (rounded to 4) and the
    * sign decision. Unseen tokens take the consts' smoothed ratio. */
  def nbScore(toks: DataFrame, idCol: String, wCol: String,
              tokenLlr: DataFrame, consts: DataFrame): DataFrame =
    toks.join(tokenLlr, Seq(wCol), "left")
      .crossJoin(broadcast(consts))
      .select(col(idCol),
        coalesce(col("qllr"), col("q_unseen")).as("__q"),
        col("q_prior"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        // No round(): the numerator is an exact integer (micro-units),
        // so integer/1e6 is ONE deterministic IEEE division both
        // engines reproduce bit-exactly — a round(x, 4) would instead
        // expose half-way doubles where Spark (HALF_UP on BigDecimal)
        // and DuckDB disagree (hit at sf0.01: -0.35305).
        ((first(col("q_prior")) + sum(col("__q"))).cast(DoubleType)
          / 1000000.0).as("nb_llr"),
        (first(col("q_prior")) + sum(col("__q")) > 0L).as("nb_positive"))
}

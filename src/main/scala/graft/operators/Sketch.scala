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

  /** KMV set-operation estimates between two strata — the reason to
    * keep a sketch instead of a scalar: sketches COMPOSE. Union sketch
    * = k smallest of the combined hash sets; intersection via the
    * standard ratio estimator |kU ∩ A ∩ B| / k × est(union). One row:
    * (est_a, est_b, est_union, est_inter). All arithmetic is on the
    * deterministic 60-bit hashes, so an independent SQL engine
    * reproduces the estimates bit-for-bit. */
  def kmvSetEstimates(df: DataFrame, stratumCol: String, valueCol: Column,
                      aKey: String, bKey: String, k: Int): DataFrame = {
    val hashed = df.filter(col(stratumCol).isin(aKey, bKey))
      .select(col(stratumCol).as("__s"), hash60(valueCol).as("__h"))
      .distinct()
    val w = Window.partitionBy(col("__s")).orderBy(col("__h").asc)
    val kept = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
    // union sketch: k smallest of the merged member hashes
    val unionK = kept.select(col("__h")).distinct()
      .orderBy(col("__h").asc).limit(k)
    def est(cnt: Column, hk: Column): Column =
      when(cnt < k, cnt)
        .otherwise(round(lit((k - 1).toDouble) * lit(mDouble) / hk).cast(LongType))
    val perSide = kept.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), max(col("__h")).as("__hk"))
      .select(col("__s"), est(col("__n"), col("__hk")).as("__e"))
    // members of the union sketch present in BOTH per-side sketches
    val inBoth = unionK.join(kept.filter(col("__s") === aKey), Seq("__h"))
      .join(kept.filter(col("__s") === bKey).select(col("__h")), Seq("__h"))
    val uAgg = unionK.agg(count(lit(1)).as("__un"), max(col("__h")).as("__uhk"))
      .select(est(col("__un"), col("__uhk")).as("__eu"), col("__un"))
    val both = inBoth.agg(count(lit(1)).as("__nb"))
    perSide.filter(col("__s") === aKey).select(col("__e").as("est_a"))
      .crossJoin(perSide.filter(col("__s") === bKey).select(col("__e").as("est_b")))
      .crossJoin(uAgg).crossJoin(both)
      .select(col("est_a"), col("est_b"), col("__eu").as("est_union"),
        round(col("__nb").cast(DoubleType) / least(col("__un"), lit(k.toLong)) * col("__eu"))
          .cast(LongType).as("est_inter"))
  }

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

  /** Histogram-interpolated quantile estimates — the single-pass,
    * fixed-memory alternative to exact sorted quantiles (Curation
    * .groupedQuantiles' shape): an equi-width histogram of `nBuckets`
    * cells over [lo, hi) per group, then linear interpolation inside
    * the cell containing rank p·n. Error is bounded by the cell width;
    * memory is `nBuckets` longs per group regardless of row count —
    * the property that matters at 100 TB, where the exact path's
    * per-group sort is the bottleneck. Out-of-range values clamp into
    * the edge cells.
    *
    * All arithmetic is fixed-order double math shared with the SQL
    * oracle formulation, so estimates hash-match across engines.
    * Output: (group, p, n, est) — one row per group × requested p. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: Column,
                         lo: Double, hi: Double, nBuckets: Int,
                         ps: Seq[Double]): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need hi > lo and at least one bucket")
    // p = 0 can never satisfy (cum - cnt) < p*n — the requested quantile
    // would silently vanish from the output; reject it up front
    require(ps.forall(p => p > 0.0 && p <= 1.0), s"quantiles must be in (0, 1], got $ps")
    val w = (hi - lo) / nBuckets
    val b = least(lit(nBuckets - 1),
      greatest(lit(0), floor((valueCol - lo) / w).cast(IntegerType)))
    val hist = df.groupBy(col(groupCol), b.as("b")).agg(count(lit(1)).as("cnt"))
    // group total = the running sum's final value — no second aggregation
    // over the input, so the source is scanned exactly once
    val cum = hist
      .withColumn("cum", sum("cnt").over(Window.partitionBy(groupCol).orderBy("b")))
      .withColumn("n", max("cum").over(Window.partitionBy(groupCol)))
    val target = col("p") * col("n")
    cum
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("cum") >= target && (col("cum") - col("cnt")) < target)
      .select(col(groupCol), col("p"), col("n"),
        round(lit(lo) + (col("b").cast(DoubleType)
          + (target - (col("cum") - col("cnt"))) / col("cnt")) * w, 4).as("est"))
  }

  // ---------------------------------------------------------------------
  // Count-min sketch — fixed-memory point-frequency estimation.
  //
  // The frequency-side partner of KMV: Misra-Gries (TopK.heavyHitters)
  // answers "which keys are hot"; count-min answers "how often is THIS
  // key" for any key, from d×w counters regardless of key cardinality.
  // Estimates only ever overcount (min over d rows of salted-hash
  // cells), and like KMV the hashes are md5-derived, so an independent
  // engine rebuilds the sketch bit-for-bit. Sketches of disjoint shards
  // merge by cellwise ADDITION — how a 100 TB stream's frequency table
  // composes from per-partition sketches (pinned in PropertySpec-style
  // merge test).
  // ---------------------------------------------------------------------

  /** Build the d×w counter relation (r, c, cnt): each input row
    * increments one cell per hash row, cell = salted 60-bit hash mod w.
    * The explode costs d× rows INTO the map-side combine, which
    * collapses them to ≤ d×w partials per partition — the shuffled
    * relation is sketch-sized, never input-sized. */
  /** NULL keys hash under an explicit sentinel — `concat_ws` would
    * silently drop a null operand and fold every null into the
    * salt-only cell while a SQL mirror's `||` yields NULL and never
    * matches the sketch (an undercount). The sentinel keeps build and
    * probe consistent in BOTH engines: mirror with
    * `coalesce(CAST(k AS VARCHAR), '')`. A null key thus shares the
    * empty-string key's cells — a collision, and CM collisions only
    * ever overcount, which the estimator already tolerates. */
  private def cmKey(keyCol: Column, r: Int): Column =
    concat_ws(":", lit(s"cm$r"),
      coalesce(keyCol.cast(StringType), lit("")))

  def cmSketch(df: DataFrame, keyCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "need positive depth and width")
    val entries = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(hash60(cmKey(keyCol, r)), lit(width.toLong)).as("c"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for the probe keys: est(key) = min over
    * the d cells the key hashes to (0 for a cell no key touched). The
    * sketch is d×w rows — it broadcasts; probing never shuffles the
    * stream the sketch was built from. */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                 depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(hash60(cmKey(col(keyCol), r)), lit(width.toLong)).as("c"))
    }
    probes.select(col(keyCol), explode(array(cells: _*)).as("e"))
      .select(col(keyCol), col("e.r").as("r"), col("e.c").as("c"))
      .join(broadcast(sketch), Seq("r", "c"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("est"))
  }
}

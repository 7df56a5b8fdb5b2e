package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality expectations — the gate a cleaning pipeline runs on its
  * own output (the reference's scattered domain checks through
  * Kafka_GSMLSConsumer.py's cleaning banks, made first-class; the
  * per-column statistics half lives in [[Curation.columnProfile]]).
  *
  * All row-level rules ride ONE aggregation — same scan, same map-side
  * partials — so a ten-rule report costs one pass. Output is long-form
  * (a row per rule) so reports append across tables and days.
  */
object Quality {

  /** Data-quality report over row-level expectations: for each named
    * rule, the number of rows violating it and a pass flag. A NULL
    * predicate counts as a violation (unknown is not acceptance —
    * `coalesce(pred, false)`), the same convention as a SQL CHECK
    * constraint the engine actually enforces. */
  def dqReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"rule names must be unique, got ${rules.map(_._1)}")
    // coalesce: sum over an EMPTY frame is NULL — an empty partition/day
    // must read as 0 violations / passed, not a null verdict.
    // Internal columns are keyed by rule INDEX, not name: a name holding a
    // dot or backtick would make col("__v_a.b") parse as a nested-field
    // reference; the user-facing name only ever appears as a literal.
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)), lit(0L))
        .as(s"__v_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col(s"__v_$i").as("n_violations"),
          (col(s"__v_$i") === 0L).as("passed"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Population-stability-index drift report between a reference and a
    * current snapshot of one numeric column — the dataset-shift monitor
    * a training pipeline runs before trusting new data. Both sides
    * bucket into the same fixed [lo, hi) grid (clamped edges), counts
    * Laplace-smoothed (+1 per bucket) so empty buckets contribute
    * finitely, per-bucket terms (p−q)·ln(p/q) ≥ 0.
    *
    * Engine parity: each term is quantized to an integer
    * (floor(x·1e9 + 0.5)) before the total sum, so `psi_total` is
    * independent of addition order. Scale shape: two map-side-combined
    * count aggregations (one scan per side) collapse to ≤ nBuckets
    * rows; everything after is arithmetic on that bounded relation —
    * the scans never join each other. Rule of thumb: psi_total < 0.1
    * stable, > 0.25 shifted. */
  def driftPsi(ref: DataFrame, cur: DataFrame, value: Column,
               lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need hi > lo and at least one bucket")
    val w = (hi - lo) / nBuckets
    def counts(df: DataFrame, as: String) = df.select(
      least(lit(nBuckets - 1), greatest(lit(0),
        floor((value.cast(DoubleType) - lo) / w))).cast(LongType).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(as))
    val spine = ref.sparkSession.range(nBuckets.toLong)
      .select(col("id").as("bucket"))
    // persisted: tot/terms/total each re-reference this relation, and
    // without the pin every reference would re-run BOTH snapshot scans —
    // the "one scan per side" claim must be structural, not an accident
    // of exchange reuse. ≤ nBuckets rows, so the cache is a few KB.
    val joined = spine
      .join(counts(ref, "n_ref"), Seq("bucket"), "left")
      .join(counts(cur, "n_cur"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = joined.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
    val p = (col("n_ref") + 1).cast(DoubleType) / (col("tr") + nBuckets).cast(DoubleType)
    val q = (col("n_cur") + 1).cast(DoubleType) / (col("tc") + nBuckets).cast(DoubleType)
    val terms = joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        floor((p - q) * log(p / q) * lit(1e9) + lit(0.5)).cast(LongType).as("__qt"))
    val total = terms.agg(sum("__qt").as("__tt"))
    terms.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        (col("__qt").cast(DoubleType) / 1e9).as("psi_term"),
        (col("__tt").cast(DoubleType) / 1e9).as("psi_total"))
  }

  /** Per-source go/no-go scorecard — the one table a data curator reads
    * before a training run: volume, mean quality, benchmark
    * contamination, exact-duplicate rate, and token-length drift (PSI
    * of the source's length distribution against the corpus-wide one),
    * with a pass verdict per source. Composes the [[dqReport]],
    * [[driftPsi]] and [[Curation.contaminationReport]] shapes into one
    * grouped report.
    *
    * Engine parity: per-doc quality is quantized (floor(q·1e4 + 0.5))
    * before the sum; PSI terms ride the same floor(x·1e9 + 0.5)
    * quantization as [[driftPsi]] — every reported number is a pure
    * function of integer counts, independent of addition order.
    *
    * Scale shape: one persisted projection of the corpus feeds the
    * per-source aggregate, the duplicate count, and both histogram
    * sides (scan once); contamination inherits contaminationReport's
    * broadcast-bench join; everything downstream of the aggregations
    * is arithmetic on |sources|·nBuckets rows. The corpus-sized cache
    * is released before returning — the |sources|-row report itself is
    * persisted and materialized instead (re-reads cost nothing).
    * Release the report via [[Similarity.release]] / `unpersist()` when
    * done; no corpus-sized cache survives this call. */
  def sourceScorecard(docs: DataFrame, idCol: String, sourceCol: String,
                      textCol: String, qualityCol: Column, nTokCol: Column,
                      bench: DataFrame, shingleN: Int, minShared: Long,
                      bucketTokens: Int = 32, nBuckets: Int = 20,
                      minMeanQ: Double = 0.6, maxContamRate: Double = 0.08,
                      maxPsi: Double = 0.25): DataFrame = {
    require(nBuckets > 0 && bucketTokens > 0, "need positive bucket geometry")
    val base = docs.select(col(idCol), col(sourceCol), col(textCol),
        floor(qualityCol * 10000.0 + 0.5).cast(LongType).as("__q"),
        least(lit(nBuckets - 1L),
          (nTokCol.cast(LongType) / lit(bucketTokens.toLong)).cast(LongType)).as("__b"),
        md5(col(textCol)).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perSrc = base.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__q")).as("__qs"),
      count_distinct(col("__h")).as("__nh"))
    val contam = Curation.contaminationReport(
        base.select(col(idCol), col(textCol)), bench, idCol, textCol, shingleN, minShared)
      .join(base.select(col(idCol), col(sourceCol)), Seq(idCol))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_contam"))
    val bCounts = base.groupBy(col(sourceCol), col("__b")).agg(count(lit(1)).as("__c"))
    val gCounts = base.groupBy(col("__b")).agg(count(lit(1)).as("__cg"))
    val gTot = base.agg(count(lit(1)).as("__ng"))
    val spine = perSrc.select(col(sourceCol), col("n_docs"))
      .crossJoin(broadcast(
        docs.sparkSession.range(nBuckets.toLong).select(col("id").as("__b"))))
    val p = (col("__cg") + 1).cast(DoubleType) / (col("__ng") + nBuckets).cast(DoubleType)
    val q = (col("__c") + 1).cast(DoubleType) / (col("n_docs") + nBuckets).cast(DoubleType)
    val psi = spine
      .join(bCounts, Seq(sourceCol, "__b"), "left").na.fill(0L, Seq("__c"))
      .join(broadcast(gCounts), Seq("__b"), "left").na.fill(0L, Seq("__cg"))
      .crossJoin(broadcast(gTot))
      .select(col(sourceCol),
        floor((p - q) * log(p / q) * lit(1e9) + lit(0.5)).cast(LongType).as("__qt"))
      .groupBy(col(sourceCol)).agg(sum(col("__qt")).as("__psiq"))
    val meanQ = round(col("__qs").cast(DoubleType) / 10000.0 / col("n_docs"), 4)
    val contamRate =
      round(coalesce(col("n_contam"), lit(0L)).cast(DoubleType) / col("n_docs"), 4)
    val dupRate = round((col("n_docs") - col("__nh")).cast(DoubleType) / col("n_docs"), 4)
    val psiLen = round(col("__psiq").cast(DoubleType) / 1e9, 6)
    val out = perSrc.join(psi, Seq(sourceCol))
      .join(contam, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"),
        meanQ.as("mean_q"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        contamRate.as("contam_rate"),
        dupRate.as("dup_rate"),
        psiLen.as("psi_len"),
        (meanQ >= minMeanQ && contamRate <= maxContamRate && psiLen <= maxPsi)
          .as("passed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    base.unpersist(blocking = false)
    out
  }

  /** Robust outlier report per group: median, MAD (median absolute
    * deviation), and the count of rows whose deviation exceeds
    * k·1.4826·MAD — the robust z-score gate (1.4826 makes MAD a
    * consistent σ estimator under normality), which a mean/stddev gate
    * cannot do because the outliers it hunts corrupt the mean itself.
    *
    * Engine parity: the flag compares integer-quantized deviations
    * (floor(x·1e6 + 0.5)) against the integer-quantized threshold, so
    * the verdict never rides a raw double comparison. Exact `percentile`
    * (the default) is the correctness anchor (both engines interpolate
    * at rank p·(n−1)); `approx = true` switches both median passes to
    * `approx_percentile` — the scale path when a group's values no
    * longer fit an exact aggregation buffer (same trade as the grouped
    * quantiles query): constant sketch state per group at the given
    * `accuracy` (rank error ≤ 1/accuracy), identical report schema.
    * `approx_percentile` returns a RANK ELEMENT rather than
    * interpolating, so on even-sized groups the reported median can
    * sit one inter-element gap below the exact value — the outlier
    * verdict is what the spec pins as agreeing, and on odd-sized
    * groups the medians coincide too.
    *
    * Scale shape: the projected input is persisted and scanned twice
    * (median pass, deviation pass); the per-group median/MAD relations
    * are |groups| rows and broadcast into the row-level joins. The
    * |groups|-row report is persisted and materialized before the
    * corpus-sized projection cache is released — release the report
    * itself via [[Similarity.release]] / `unpersist()` when done; no
    * corpus-sized cache survives this call. */
  def robustOutliers(df: DataFrame, groupCol: String, value: Column,
                     k: Double = 3.0, approx: Boolean = false,
                     accuracy: Int = 10000): DataFrame = {
    require(k > 0.0, s"need a positive cutoff multiplier, got $k")
    require(accuracy >= 1, s"need a positive sketch accuracy, got $accuracy")
    def median(c: String) =
      if (approx) expr(s"approx_percentile($c, 0.5, $accuracy)")
      else expr(s"percentile($c, 0.5)")
    val proj = df.select(col(groupCol), value.cast(DoubleType).as("__x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = proj.groupBy(col(groupCol))
      .agg(median("__x").cast(DoubleType).as("__med"))
    val dev = proj.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), col("__med"), abs(col("__x") - col("__med")).as("__dev"))
    val mad = dev.groupBy(col(groupCol))
      .agg(median("__dev").cast(DoubleType).as("__mad"))
    val out = dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(
          floor(col("__dev") * 1e6 + 0.5).cast(LongType) >
            floor(lit(k * 1.4826) * col("__mad") * 1e6 + 0.5).cast(LongType),
          1L).otherwise(0L)).as("n_outliers"),
        round(first(col("__med")), 4).as("med"),
        round(first(col("__mad")), 4).as("mad"))
    val materialized = out
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    materialized.count()
    proj.unpersist(blocking = false)
    materialized
  }

  /** Key-distribution skew diagnostic per group: row count, distinct
    * keys, the heaviest key's row count, its share (basis points), and
    * the skew factor ×100 (heaviest key ÷ mean rows-per-key) — the
    * probe a pipeline runs BEFORE shuffling on a key, deciding between
    * a plain hash join, salting, or an AQE skew hint. All-integer
    * arithmetic end to end, so the report is exactly reproducible: the
    * ratio numerators are formed in DECIMAL(38,0) (as [[corrOls]] does
    * for its moments) because `max_key_rows * n_keys * 100` can exceed
    * Long for a group holding both a heavy key and many distinct keys
    * (~1e8 rows on the top key × ~1e9 keys already wraps), and the
    * integral division of decimals is exact.
    *
    * Scale shape: a two-level aggregation — (group, key) counts with
    * map-side combine, then a per-group rollup — never a window over
    * raw rows; the output is |groups| rows. */
  def skewReport(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(col(groupCol), col(keyCol)).agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__c")).as("max_key_rows"))
      .select(col(groupCol), col("n_rows"), col("n_keys"), col("max_key_rows"),
        expr("CAST(max_key_rows AS DECIMAL(38,0)) * 10000 div n_rows")
          .as("top_share_bp"),
        expr("CAST(max_key_rows AS DECIMAL(38,0)) * n_keys * 100 div n_rows")
          .as("skew_x100"))

  /** Grouped Pearson correlation + OLS slope/intercept from EXACT
    * integer moments — the relationship probe beside [[robustOutliers]]'
    * dispersion probe. Inputs are scaled to integers by the caller
    * (`scaleX`/`scaleY`, e.g. 100 for 2-decimal currency — exact by
    * construction); the five moments (Σx, Σy, Σxy, Σx², Σy²) are summed
    * as DECIMAL(38,0), which is EXACT and addition-order-independent —
    * the trap this operator exists to avoid is `corr()`/`covar_pop()`
    * accumulating doubles, whose low bits depend on partitioning, so
    * two runs of the same query can hash-differ. The final formula is a
    * fixed IEEE double expression over those exact integers (identical
    * in any engine), rounded to 6.
    *
    * Correlation is invariant under the positive scaling; the slope is
    * reported in ORIGINAL units (rescaled by scaleX/scaleY). Groups
    * with zero variance in either column report NULL corr/beta (a
    * vertical or horizontal point cloud has no correlation), matching
    * SQL `corr()` semantics.
    *
    * Scale shape: ONE map-side-combined aggregation — five sums and a
    * count per group, constant state per group, one scan, one shuffle
    * of |groups| rows. */
  def corrOls(df: DataFrame, groupCol: String, x: Column, y: Column,
              scaleX: Long = 1L, scaleY: Long = 1L): DataFrame = {
    require(scaleX >= 1 && scaleY >= 1, "scales must be positive integers")
    val dec = DecimalType(38, 0)
    val xi = floor(x.cast(DoubleType) * scaleX + 0.5).cast(LongType)
    val yi = floor(y.cast(DoubleType) * scaleY + 0.5).cast(LongType)
    val m = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(xi.cast(dec)).as("sx"),
      sum(yi.cast(dec)).as("sy"),
      // per-row products in decimal, not long: two 10-digit scaled values
      // would silently wrap a long product
      sum(xi.cast(dec) * yi.cast(dec)).as("sxy"),
      sum(xi.cast(dec) * xi.cast(dec)).as("sxx"),
      sum(yi.cast(dec) * yi.cast(dec)).as("syy"))
    def d(c: Column) = c.cast(DoubleType)
    val covN = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varXN = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varYN = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val corr = when(varXN > 0.0 && varYN > 0.0,
      round(covN / sqrt(varXN * varYN), 6))
    // slope on the scaled integers is beta·scaleX/scaleY in original units
    val beta = when(varXN > 0.0,
      covN / varXN * (scaleX.toDouble / scaleY.toDouble))
    val alpha = when(varXN > 0.0,
      round((d(col("sy")) / scaleY - beta * d(col("sx")) / scaleX) / d(col("n")), 6))
    m.select(col(groupCol), col("n"),
      corr.as("corr"), round(beta, 6).as("beta"), alpha.as("alpha"))
  }

  /** Gopher WITHIN-document repetition signals (Rae et al. 2021 §A1.1)
    * — the self-repetition family [[graft.functions.Text.gopherRules]]'
    * surface rules do not cover, and the standard gate (Gopher /
    * RefinedWeb / FineWeb lineage) against boilerplate-heavy and
    * looping-generation documents. Per document:
    *
    *  - `dup_line_frac` / `dup_line_char_frac`: occurrences beyond the
    *    first of each repeated line (split on \n, trimmed, empties
    *    dropped), as a fraction of lines resp. line characters;
    *  - `top_{2,3,4}gram_char_frac`: characters covered by ALL
    *    occurrences of the most frequent word n-gram ÷ document chars
    *    (0 when no n-gram repeats — one occurrence is not repetition);
    *  - `dup_{5..10}gram_char_frac`: characters covered by all
    *    occurrences of every n-gram appearing more than once ÷
    *    document chars;
    *  - `passed`: the conjunction at Gopher's published thresholds
    *    (0.30/0.20 lines, 0.20/0.18/0.16 top, 0.15 down to 0.10 dup).
    *
    * Overlapping n-gram occurrences each contribute their full
    * character span (a pure aggregation; Gopher's positional
    * no-double-count mask needs per-document sequential state, which
    * would serialize the hot path) — so dup fractions can exceed 1 on
    * degenerate loops, which the ≤-threshold gate handles unchanged.
    * Engine parity: every coverage term is an integer (count × gram
    * length) divided once by the integer char count and rounded to 6
    * decimals BEFORE the threshold comparison, so verdicts are exact
    * in any engine and partitioning.
    *
    * Scale shape: three map-only derivations of (id, text) feed two
    * aggregations keyed on (id[, n], item) — both map-side combinable,
    * shuffles carry one row per distinct line/gram, never positions.
    * The 9-way n-gram expansion happens array-side in one projection
    * (no join against a sizes relation), ~9 rows per word. */
  def repetitionReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val w = regexp_extract_all(lower(col("__t")),
      lit(graft.functions.Text.wordPattern), lit(0))
    // all (n, gram) pairs of one document in a single array projection:
    // per position a length-n slice (short tails filtered), joined by
    // single spaces so gram length counts separators exactly once
    def gramsOf(n: Int): Column = transform(
      filter(transform(w, (_, i) => slice(w, i + 1, lit(n))), a => size(a) === n),
      a => struct(lit(n).as("n"), array_join(a, " ").as("g")))
    val base = docs.select(col(idCol), col(textCol).as("__t"),
      length(col(textCol)).cast(DoubleType).as("__nc"))
    val lineStats = base.select(col(idCol),
        explode(filter(transform(split(col("__t"), "\n"), l => trim(l)),
          l => l =!= "")).as("__l"))
      .groupBy(col(idCol), col("__l")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        round((sum(col("c")) - count(lit(1))).cast(DoubleType) / sum(col("c")), 6)
          .as("dup_line_frac"),
        round(sum((col("c") - 1L) * length(col("__l"))).cast(DoubleType) /
          sum(col("c") * length(col("__l"))), 6).as("dup_line_char_frac"))
    val counts = base.select(col(idCol),
        explode(flatten(array((topNs ++ dupNs).map(gramsOf): _*))).as("__gr"))
      .select(col(idCol), col("__gr.n").as("__n"), col("__gr.g").as("__g"))
      .groupBy(col(idCol), col("__n"), col("__g")).agg(count(lit(1)).as("c"))
    // ONE aggregation over the gram counts: the struct-max orders by
    // count first, coverage second, so it lands on the most frequent
    // gram with ties resolved to the widest coverage — deterministic
    // under any partitioning, and the gram pipeline is never re-scanned
    // for a separate max-count relation. A gram occurring once is not
    // repetition: a count-1 maximum yields coverage 0, else the longest
    // unique 2-gram of a SHORT clean doc would fail the gate.
    val per = counts.groupBy(col(idCol), col("__n"))
      .agg(
        max(struct(col("c"),
          (col("c") * length(col("__g"))).as("cov"))).as("__top"),
        sum(when(col("c") > 1L, col("c") * length(col("__g"))).otherwise(0L))
          .as("__dupcov"))
      .select(col(idCol), col("__n"),
        when(col("__top.c") > 1L, col("__top.cov")).otherwise(lit(0L))
          .as("__topcov"),
        col("__dupcov"))
    val pivotAggs =
      topNs.map(n => max(when(col("__n") === n, col("__topcov"))).as(s"__top$n")) ++
      dupNs.map(n => max(when(col("__n") === n, col("__dupcov"))).as(s"__dup$n"))
    val pivoted = per.groupBy(col(idCol)).agg(pivotAggs.head, pivotAggs.tail: _*)
    val lf = coalesce(col("dup_line_frac"), lit(0.0))
    val lcf = coalesce(col("dup_line_char_frac"), lit(0.0))
    def frac(c: String) =
      round(coalesce(col(c).cast(DoubleType) / col("__nc"), lit(0.0)), 6)
    val topFracs = topNs.map(n => frac(s"__top$n"))
    val dupFracs = dupNs.map(n => frac(s"__dup$n"))
    val topThresholds = Seq(0.20, 0.18, 0.16)
    val dupThresholds = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)
    val passed = (Seq(lf <= 0.30, lcf <= 0.20) ++
      topFracs.zip(topThresholds).map { case (f, t) => f <= t } ++
      dupFracs.zip(dupThresholds).map { case (f, t) => f <= t }).reduce(_ && _)
    base.select(col(idCol), col("__nc"))
      .join(lineStats, Seq(idCol), "left")
      .join(pivoted, Seq(idCol), "left")
      .select(col(idCol) +: lf.as("dup_line_frac") +:
        lcf.as("dup_line_char_frac") +:
        (topNs.zip(topFracs).map { case (n, f) => f.as(s"top_${n}gram_char_frac") } ++
         dupNs.zip(dupFracs).map { case (n, f) => f.as(s"dup_${n}gram_char_frac") } :+
         passed.as("passed")): _*)
  }

  /** Uniqueness expectation — not expressible as a row predicate:
    * violations = rows beyond the first per key (n - n_distinct over
    * the key tuple, nulls grouped like any other value — STRICTER than
    * SQL `count(*) - count(DISTINCT k)`, which ignores null keys; pair
    * this with a count-distinct oracle form only on non-null keys).
    * Emitted in the same (rule, n_violations, passed) shape so it
    * unions with [[dqReport]] into one report. */
  def dqUnique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg((sum(col("__c")) - count(lit(1))).as("__v"))
      .select(lit(name).as("rule"),
        coalesce(col("__v"), lit(0L)).cast(LongType).as("n_violations"),
        coalesce(col("__v") === 0L, lit(true)).as("passed"))
  }

  /** Cohen's kappa between two labelers of the same rows — the
    * chance-corrected agreement every annotation/labeling pipeline
    * reports before trusting a heuristic or a model as an annotator
    * (agreement alone flatters majority-class labelers; kappa subtracts
    * the agreement their marginals would produce by luck).
    *
    * ONE corpus scan: the (pred, gold) confusion cells aggregate with
    * map-side combine to a ≤|labels|² relation; n, the diagonal, and
    * both marginals derive from that bounded table, so every later step
    * is broadcast-scalar arithmetic. All integer fixed-point:
    * po_bp = agree·10⁴ div n, pe_bp = Σ_l row_l·col_l·10⁴ div n², and
    * kappa_bp = (po−pe)·10⁴ div (10⁴−pe) with the SIGN carried
    * explicitly (sign·(abs·10⁴ div denom)) because Spark's `div`
    * truncates toward zero while DuckDB's `//` floors — on a negative
    * kappa the two disagree unless the division is kept non-negative.
    * Degenerate pe = 10⁴ (both labelers constant and equal) reads as
    * kappa 10⁴. n·10⁴ and n² must fit a Long — n ≤ ~3·10⁹ rows; larger
    * corpora rescale the quantum.
    * Output (one row): n, n_agree, po_bp, pe_bp, kappa_bp. */
  def cohenKappa(df: DataFrame, predCol: Column, goldCol: Column): DataFrame = {
    val cells = df.select(predCol.as("__p"), goldCol.as("__g"))
      .groupBy(col("__p"), col("__g")).agg(count(lit(1)).as("__c"))
    val rowM = cells.groupBy(col("__p")).agg(sum(col("__c")).as("__rc"))
    val colM = cells.groupBy(col("__g")).agg(sum(col("__c")).as("__gc"))
    val peNum = rowM.join(colM, col("__p") === col("__g"))
      .agg(coalesce(sum(col("__rc") * col("__gc")), lit(0L)).as("__pe_num"))
    val base = cells.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n"),
      // Plain `===`, not `<=>`: the DuckDB oracle's `p = g` treats a
      // null label pair as NON-agreement, and this must match it if a
      // caller ever feeds nullable labels (none does today). Null
      // comparison → null → `when` falls to otherwise(0).
      coalesce(sum(when(col("__p") === col("__g"), col("__c")).otherwise(0L)),
        lit(0L)).as("n_agree"))
    base.crossJoin(broadcast(peNum))
      .withColumn("po_bp", expr("n_agree * 10000 div n"))
      .withColumn("pe_bp", expr("__pe_num * 10000 div (n * n)"))
      .withColumn("kappa_bp",
        when(col("pe_bp") >= 10000L, lit(10000L)).otherwise(
          when(col("po_bp") >= col("pe_bp"), lit(1L)).otherwise(lit(-1L)) *
            expr("abs(po_bp - pe_bp) * 10000 div (10000 - pe_bp)")))
      .select(col("n"), col("n_agree"), col("po_bp"), col("pe_bp"), col("kappa_bp"))
  }

  /** Log2-bucketed histogram of a positive integer measure per key —
    * the doc-length panel of a data card (token/char counts span 4+
    * orders of magnitude; linear buckets waste the panel). The bucket
    * id is `length(bin(len))` = floor(log2)+1 — STRING length of the
    * binary representation, identical integer-exact semantics in Spark
    * and DuckDB, where a float log2 would diverge at the powers of two.
    * One map-side-combined aggregation; output ≤ |keys|·64 rows. */
  def lenHistogram(df: DataFrame, keyCol: String, lenCol: Column): DataFrame =
    df.select(col(keyCol), lenCol.cast(LongType).as("__len"))
      .groupBy(col(keyCol), length(bin(col("__len"))).cast(LongType).as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__len")).as("sum_len"),
        min(col("__len")).as("min_len"),
        max(col("__len")).as("max_len"))

  /** Per-key vocabulary panel over an exploded (key, token) relation:
    * total tokens, vocabulary size, hapax count (frequency-1 types —
    * the long-tail health signal), and the share of the top-`topK`
    * tokens in basis points (the boilerplate-concentration signal).
    *
    * Scale shape: ONE (key, token) aggregation partial-combines the
    * corpus to the vocabulary relation; the panel aggregates and the
    * top-k both run on that bounded relation — the top-k through the
    * [[TopK.topKPerKey]] UDAF (map-side ≤ k rows per key, no
    * vocabulary-wide sort), with the deterministic tie-break (count
    * desc, then md5-hash of the token asc) that a SQL oracle
    * reproduces exactly. */
  def vocabStats(toks: DataFrame, keyCol: String, tokCol: String,
                 topK: Int): DataFrame = {
    val freq = toks.groupBy(col(keyCol), col(tokCol))
      .agg(count(lit(1)).as("__cnt"))
    val panel = freq.groupBy(col(keyCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__cnt") === 1L, 1L).otherwise(0L)).as("hapax"))
    val keyed = freq.withColumn("__tid",
      conv(substring(md5(col(tokCol)), 1, 15), 16, 10).cast(LongType))
    val top = TopK.topKPerKey(keyed, Seq(keyCol), "__tid", "__cnt", topK)
      .groupBy(col(keyCol))
      .agg(sum(col("__cnt").cast(LongType)).as("__topsum"))
    panel.join(top, Seq(keyCol))
      .withColumn("top_share_bp", expr("__topsum * 10000 div n_tokens"))
      .select(col(keyCol), col("n_tokens"), col("vocab"), col("hapax"),
        col("top_share_bp"))
  }

  /** k-anonymity report over a quasi-identifier tuple: one row per
    * equivalence class with its population and whether it meets `k` —
    * the classes below k are the re-identification risk (and the
    * suppression/generalization work-list) a privacy review needs
    * BEFORE a table with person-level rows feeds a training corpus.
    * ONE map-side-combined aggregation; output = |classes| rows. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_n"))
      .withColumn("meets_k", col("class_n") >= k)
  }

  /** Referential-integrity + coverage check for one FK edge, as a
    * single long-form row that unions across edges into the DQ report:
    * child rows whose key has no parent (ORPHANS — must be zero when
    * integrity holds) and parents no child references (UNMATCHED —
    * the coverage signal: customers who never ordered, parts never
    * sold). Scale shape: the child collapses to its per-key row counts
    * FIRST (map-side combine), so both anti-joins run key-relation vs
    * key-relation — the fact table never shuffles twice. */
  def refCoverage(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): DataFrame = {
    val childKeys = child.groupBy(col(childKey).as("__k"))
      .agg(count(lit(1)).as("__n"))
    val parentKeys = parent.select(col(parentKey).as("__k")).distinct()
    val orphans = childKeys.join(parentKeys, Seq("__k"), "left_anti")
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_orphans"))
    val unmatched = parentKeys.join(childKeys, Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_unmatched_parents"))
    val nChild = child.agg(count(lit(1)).as("n_child"))
    val nParent = parent.agg(count(lit(1)).as("n_parents"))
    nChild.crossJoin(broadcast(orphans))
      .crossJoin(broadcast(nParent)).crossJoin(broadcast(unmatched))
      .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"),
        col("n_parents"), col("n_unmatched_parents"),
        (col("n_orphans") === 0L).as("integrity_ok"))
  }

  /** Gini coefficient of a per-key activity distribution (e.g. events
    * per user) in basis points — the engagement-inequality number a
    * data card reports (gini 0 = uniform, → 10⁴ = one key owns
    * everything). Standard rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) /
    * (n·Σx) over ascending-sorted x. Engine parity: every term is an
    * integer and the one division happens once in IEEE double with
    * floor(·10⁴+0.5) quantization.
    *
    * Scale shape (the Learn.auc move): the corpus collapses to per-key
    * counts (map-side combine), the counts collapse AGAIN to a
    * count-value histogram (__x, __f), and Σᵢ i·xᵢ comes in closed form
    * per value group — keys with equal count x occupy ranks c+1..c+f
    * (c = keys below), so their rank-sum is c·f + f(f+1)/2 regardless
    * of intra-group order, giving the SAME integer as a (count asc,
    * key asc) row_number without ever ranking the |keys| relation. The
    * only window is a prefix sum over the histogram, which is provably
    * bounded: d distinct positive counts satisfy d(d+1)/2 ≤ Σx, so
    * d ≤ √(2·n_total) — ~1.4 M rows at a 10¹² -event corpus, vs the
    * 10⁸⁺ keys the old single-partition rank window would have pulled
    * through one task. Output one row: (n_keys, n_total, gini_bp). */
  def giniIndex(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__x"))
    val hist = counts.groupBy(col("__x")).agg(count(lit(1)).as("__f"))
    val below = Window.orderBy(col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val grouped = hist
      .withColumn("__c", coalesce(sum(col("__f")).over(below), lit(0L)))
      // f·(f+1) is even, so `div 2` is exact; Spark `div` keeps it Long.
      .withColumn("__gs", expr("__x * (__c * __f + (__f * (__f + 1)) div 2)"))
    grouped.agg(sum(col("__f")).as("n_keys"),
        sum(col("__x") * col("__f")).as("n_total"),
        sum(col("__gs")).as("__s1"))
      .select(col("n_keys"), col("n_total"),
        floor((lit(2L) * col("__s1") - (col("n_keys") + 1L) * col("n_total"))
            .cast(DoubleType)
          / (col("n_keys") * col("n_total")).cast(DoubleType)
          * 10000.0 + 0.5).cast(LongType).as("gini_bp"))
  }
}

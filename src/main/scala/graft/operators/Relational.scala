package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Relational operators — SURVEY.md §2.2–§2.7.
  *
  * All shapes are declarative DataFrame plans so Catalyst picks the
  * physical strategy; scale notes per operator below.
  */
object Relational {

  // ---------------------------------------------------------------------
  // A5 — order-dependent dedup, keep='last' (Kafka_GSMLSConsumer.py:196-219).
  //
  // pandas drop_duplicates(keep='last') relies on arrival order; Spark has
  // no row order, so the caller MUST supply an explicit ordering column
  // (kafka offset / SCRAPED_DATE / monotonically increasing batch id) —
  // SURVEY §7.4(1). Implemented as a window row_number, which shuffles
  // once on the natural key; at 100 TB the same plan holds (hash
  // partition by key, per-partition sort) and AQE handles skewed keys.
  // ---------------------------------------------------------------------
  def dedupKeepLast(df: DataFrame, keys: Seq[String], orderCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** keep='first' variant (Mongo $group/$first — RealEstateImages.py:554-557). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ---------------------------------------------------------------------
  // S9 — Mongo aggregate equivalent: $match(not exists) -> $group first by
  // key -> $replaceRoot -> $sort desc (RealEstateImages.py:552-561).
  // ---------------------------------------------------------------------
  def pendingWorkQueue(df: DataFrame, doneFlag: String, key: String, order: Column): DataFrame =
    dedupKeepFirst(df.filter(col(doneFlag).isNull), Seq(key), order)
      .orderBy(col(key).desc)

  // ---------------------------------------------------------------------
  // J1 — equi inner join with small build side (GSMLS.py:1370-1376).
  // geo side is per-municipality tiny -> broadcast hash join, no shuffle
  // of the big probe side.
  // ---------------------------------------------------------------------
  def enrichInner(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "inner")

  def enrichInner(fact: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    fact.join(broadcast(dim), cond, "inner")

  // ---------------------------------------------------------------------
  // J2/J2a — set-based re-expression of the reference's per-row tax-probe
  // loop (GSMLS.py:153-273): LEFT JOIN on the probe key, then
  // coalesce-style column repair. At 100 TB the dim is no longer
  // broadcastable -> sort-merge join on the key with AQE skew handling;
  // the repair stays pure projection.
  // ---------------------------------------------------------------------
  def enrichLeft(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(dim, keys, "left")

  /** Overwrite `target` from `source` when `target` is null / sentinel /
    * non-positive — fix_tax_assessment_data-family (GSMLS.py:757-866). */
  def coalesceRepair(df: DataFrame, target: String, source: Column,
                     badValues: Seq[Any] = Seq(0, 0.0)): DataFrame =
    df.withColumn(target,
      when(col(target).isNull || col(target).isin(badValues: _*),
           coalesce(source, col(target)))
        .otherwise(col(target)))

  // ---------------------------------------------------------------------
  // W1/W2 — lag over per-key history (GSMLS.py:1832-1867, 2028-2045).
  // Time-of-possession: years between consecutive sales of the same
  // property; first row falls back to a default.
  // ---------------------------------------------------------------------
  def timeOfPossession(df: DataFrame, keys: Seq[String], dateCol: String,
                       default: Double = 10.0,
                       tiebreak: Seq[Column] = Seq.empty): DataFrame = {
    // explicit tiebreak: same-date rows would otherwise lag
    // nondeterministically (SURVEY §7.4(1) applies to windows too)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(dateCol) +: tiebreak): _*)
    df.withColumn("top_years",
      coalesce(datediff(col(dateCol), lag(col(dateCol), 1).over(w)) / lit(365.25),
               lit(default)))
  }

  // ---------------------------------------------------------------------
  // O1/O2 — top-k by composite order (GSMLS.py:995-1015). Spark plans
  // TakeOrderedAndProject: no global sort, per-partition heap + driver
  // merge — the right plan at any scale for small k.
  // ---------------------------------------------------------------------
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame = df.orderBy(order: _*).limit(k)

  // ---------------------------------------------------------------------
  // U1 — union-by-name of heterogeneous batches (Kafka_GSMLSConsumer.py:196).
  // ---------------------------------------------------------------------
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  // ---------------------------------------------------------------------
  // Skew handling — the explicit fallbacks for when AQE can't help:
  // a broadcast isn't possible (dim too big) and runtime skew-join
  // splitting doesn't apply (e.g. the hot key feeds an aggregation).
  // Both are deterministic (content-hash salt), so results are
  // reproducible and oracle-checkable.
  // ---------------------------------------------------------------------

  /** Skew-safe equi inner join: spread each hot fact key over `salts`
    * sub-keys (content-hash salt on the fact side; dim side replicated
    * `salts`×). One hot key then lands on `salts` reducers instead of
    * one. Dim replication costs |dim|×salts rows — use only when the
    * dim is too big to broadcast but far smaller than the fact. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val salt = pmod(hash(fact.columns.map(col): _*), lit(salts))
    val saltedFact = fact.withColumn("__salt", salt)
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase (salted) aggregation for low-cardinality hot group keys:
    * phase 1 aggregates on (keys, salt) — spreading each hot key over
    * `salts` reducers — phase 2 merges the partials. sum/count merge by
    * sum; avg = merged sum / merged count. Map-side partial aggregation
    * already does this within a task; the salt does it across tasks. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int): DataFrame = {
    val salt = pmod(hash(df.columns.map(col): _*), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("value_sum"), sum(col("__pcnt")).as("n"))
  }

  // ---------------------------------------------------------------------
  // As-of join — each left row picks the latest right row strictly
  // before it (per key): the time-series enrichment primitive (last
  // quote before a trade, last click before a purchase, last assessment
  // before a sale).
  //
  // Spark-first shape: instead of a range join (BroadcastNestedLoop or
  // an O(n·m) per-key explosion), TAG both sides, UNION them, and take
  // `last(payload ignoring nulls)` over a per-key time-ordered window.
  // That is ONE hash-shuffle on the key + one per-partition sort for
  // both inputs together — the same plan a sort-merge join would need,
  // but with no pairwise matching step, and it holds at any key
  // cardinality. Ordering is (time, side, tiebreak) with left rows
  // BEFORE right rows at equal times, so a right row at exactly t is
  // not visible to a left row at t (strict <); among equal-time right
  // rows the largest tiebreak wins, deterministically.
  //
  // Left columns and `payload` (right-side) columns must be disjoint;
  // both sides must carry `keys` and `timeCol`.
  // ---------------------------------------------------------------------
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, payload: Seq[String],
               tiebreak: String): DataFrame = {
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == timeCol)
    val l = left.withColumn("__side", lit(0))
      .withColumn("__tb", lit(null).cast(LongType))
    val lPadded = payload.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = right.withColumn("__side", lit(1))
      .withColumn("__tb", col(tiebreak).cast(LongType))
    val rPadded = leftOnly.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lPadded.unionByName(rPadded.select(lPadded.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 0).drop("__side", "__tb")
  }

  // ---------------------------------------------------------------------
  // Range join — point-in-interval matching without a nested loop.
  //
  // Spark plans a bare `p >= lo AND p < hi` join as BroadcastNestedLoop
  // (O(n·m) comparisons, driver-memory-bound build side). The scalable
  // shape BUCKETIZES the value axis: every interval is exploded to the
  // buckets it overlaps, points map to one bucket, and the join becomes
  // an EQUI-join on bucket id (one hash shuffle) with the exact
  // containment predicate as a post-filter. Cost is |intervals| ×
  // (span/bucketWidth) replicated rows — pick bucketWidth near the
  // typical interval length so most intervals land in 1-2 buckets.
  // Works for any orderable numeric axis (prices, epochs, offsets).
  // ---------------------------------------------------------------------
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast(LongType))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast(LongType),
        floor(col(hiCol) / bucketWidth).cast(LongType))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  // ---------------------------------------------------------------------
  // Sessionization — split each key's event stream into sessions at
  // inactivity gaps > `gapSeconds`: session id = running count of gap
  // breaks in time order. One hash-shuffle on the key + per-partition
  // sort (the same plan any per-key window needs); sessions never span
  // keys, so a 100 TB event log sessionizes in parallel across users.
  // The tiebreak column makes same-timestamp events deterministic.
  // ---------------------------------------------------------------------
  def sessionize(df: DataFrame, keys: Seq[String], timeCol: String,
                 gapSeconds: Long, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(tiebreak).asc)
    // Gap = difference of per-row FLOOR epoch seconds (== second-boundary
    // crossings), not "complete seconds between instants" — the two
    // disagree by 1 on fractional-second timestamps and only the former
    // is what SQL engines' date_diff('second', …) computes.
    val prev = lag(epochSeconds(df, timeCol), 1).over(w)
    val isBreak = when(prev.isNull ||
      epochSeconds(df, timeCol) - prev > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  // ---------------------------------------------------------------------
  // SCD2 timeline — type-2 slowly-changing-dimension history from a
  // versioned event/row stream: per key, collapse consecutive rows with
  // an unchanged state into one validity interval [valid_from, valid_to)
  // and mark the open interval current. The history-preserving
  // counterpart of dedupKeepLast (SCD1), and the CHANGE-DETECTION
  // complement of [[scd2]]: scd2 emits a version row per change event
  // (every row is assumed a real change), while this operator suppresses
  // no-op deliveries — the shape a dimension needs when the tracked
  // attribute changes far less often than rows arrive. Pair with
  // asOfJoin to enrich facts at their event time.
  //
  // Plan: ONE hash-shuffle on the key; both windows (LAG change
  // detection, LEAD interval close) sort over the same partitioning so
  // the exchange is reused, and the second sorts only the (collapsed,
  // smaller) change rows. No join, no second shuffle — a 100 TB
  // version log becomes its dimension history in a single pass per key
  // partition. Null-safe state compare; the tiebreak column makes
  // same-timestamp versions deterministic.
  // ---------------------------------------------------------------------
  def scd2Timeline(df: DataFrame, keys: Seq[String], stateCol: String,
                   timeCol: String, tiebreak: String,
                   carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(tiebreak).asc)
    val changes = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      // first row per key, or a genuine state change; the row_number
      // guard (not __prev.isNull) keeps a leading NULL state distinct
      // from "no previous row", and <=> collapses null-to-null runs
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
    val w2 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(tiebreak).asc)
    // `carry` columns ride along from each run's OPENING row (the
    // streaming maintainer carries the tiebreak this way)
    changes
      .withColumn("valid_to", lead(col(timeCol), 1).over(w2))
      .select(keys.map(col) ++ carry.map(col) :+ col(stateCol).as("state") :+
        col(timeCol).as("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

  /** Floor epoch seconds of a time column, timezone-free: TIMESTAMP_NTZ
    * diffs arithmetically against the NTZ epoch (no instant round-trip,
    * so the value matches what any engine reads from the same parquet
    * regardless of session timezone); other orderable types cast. */
  def epochSeconds(df: DataFrame, timeCol: String): Column =
    df.schema(timeCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr(s"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `$timeCol`)")
      case _ => col(timeCol).cast(LongType)
    }

  // ---------------------------------------------------------------------
  // S6 prep — pre-validation split replacing the reference's per-row
  // DataError salvage (Kafka_GSMLSConsumer.py:1232-1254): rows failing the
  // predicate go to a quarantine sink instead of silently dropping
  // mid-batch — SURVEY §7.4(7).
  // ---------------------------------------------------------------------
  /** Snapshot reconciliation: full-outer diff of two keyed tables into
    * inserted / deleted / changed / unchanged rows (the incremental-
    * refresh audit, and the change feed a downstream consumer applies).
    * One shuffle on the key; comparisons are null-safe. */
  def tableDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
                compareCols: Seq[String]): DataFrame = {
    val b = before.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__b"): _*)
    val a = after.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__a"): _*)
    b.join(a, keys, "full_outer")
      .withColumn("status",
        when(col("__b").isNull, lit("inserted"))
          .when(col("__a").isNull, lit("deleted"))
          .when(compareCols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
            .foldLeft(lit(false))(_ || _), lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__b", "__a")
  }

  /** Slowly-changing-dimension type 2: each change event becomes a
    * version row with a [valid_from, valid_to) interval — valid_to =
    * the next change's timestamp, open (null) for the current row.
    * One window per key (hash-shuffle + per-partition sort); ties on
    * the change column order deterministically by `tiebreak`. See
    * [[scd2Timeline]] for the change-detection variant that collapses
    * consecutive unchanged states instead of versioning every row. */
  def scd2(df: DataFrame, keys: Seq[String], changeCol: String,
           tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(changeCol).asc, col(tiebreak).asc)
    df.withColumn("valid_from", col(changeCol))
      .withColumn("valid_to", lead(col(changeCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("is_current", col("valid_to").isNull)
  }

  def validSplit(df: DataFrame, valid: Column): (DataFrame, DataFrame) =
    (df.filter(valid), df.filter(!coalesce(valid, lit(false))))

  /** Ordered event funnel: for each entity, the first time it reached
    * each stage, where stage i+1 must occur strictly after stage i and
    * within `windowSeconds` of it. Output: one row per entity with a
    * `t_<stage>` timestamp per stage (null once the chain breaks) and
    * `stage` = number of stages completed.
    *
    * Each stage is one filtered aggregation joined to the previous
    * stage's per-entity row — k shuffles on the entity key for a
    * k-stage funnel, with the per-entity frames orders of magnitude
    * smaller than the event stream. No window over the full event
    * history: the sort-heavy "sessionize then pattern-match" plan is
    * avoided entirely. */
  def funnel(events: DataFrame, entityCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             windowSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(col(entityCol)).distinct()
    val tCols = stages.map(s => s"t_$s")
    // per-stage frames: s_i(entity, t_i) = min event time of stage i
    // after (and within the window of) the entity's t_{i-1}
    val stageFrames = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (st, i)) =>
        val ev = events.filter(col(typeCol) === st)
          .select(col(entityCol), col(tsCol).as("__t"))
        val gated = prev match {
          case None => ev
          case Some(p) =>
            ev.join(p.select(col(entityCol), col(tCols(i - 1)).as("__p")), entityCol)
              .filter(col("__t") > col("__p") &&
                col("__t") <= col("__p") + expr(s"INTERVAL $windowSeconds SECONDS"))
        }
        Some(gated.groupBy(col(entityCol)).agg(min(col("__t")).as(tCols(i))))
    }.flatten
    val joined = stageFrames.foldLeft(base)((acc, s) => acc.join(s, Seq(entityCol), "left"))
    // fold earliest stage first so the LAST stage lands outermost:
    // when(t_purchase, 3).otherwise(when(t_click, 2).otherwise(...))
    val stage = tCols.zipWithIndex.foldLeft(lit(0)) {
      case (els, (tc, i)) => when(col(tc).isNotNull, lit(i + 1)).otherwise(els)
    }
    joined.withColumn("stage", stage.cast(LongType))
  }

  /** Blocked fuzzy match (record linkage): each dirty record joins the
    * clean dictionary within its block, keeps candidates within
    * `maxDist` edit distance, and picks the best match (min distance,
    * ties to the lexicographically first candidate).
    *
    * The block key bounds the quadratic: candidates = |block| per
    * record, not |dictionary|. The dictionary side is broadcast — at
    * corpus scale the dirty stream never shuffles, making this a
    * map-side join plus a per-record top-1. */
  def blockedFuzzyMatch(dirty: DataFrame, idCol: String, nameCol: String,
                        clean: DataFrame, cleanNameCol: String,
                        blockOf: Column => Column, maxDist: Int): DataFrame = {
    val d = dirty.select(col(idCol), col(nameCol).as("__dn"),
      blockOf(col(nameCol)).as("__blk"))
    val c = clean.select(col(cleanNameCol).as("__cn"),
      blockOf(col(cleanNameCol)).as("__blk")).distinct()
    val cand = d.join(broadcast(c), "__blk")
      .withColumn("dist", levenshtein(col("__dn"), col("__cn")).cast(LongType))
      .filter(col("dist") <= maxDist)
    cand.withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("dist").asc, col("__cn").asc)))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__dn").as("name"), col("__cn").as("matched"), col("dist"))
  }
}

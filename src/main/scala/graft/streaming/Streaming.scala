package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.util.LongAccumulator

import graft.operators.Relational

/** Structured Streaming re-expression of the reference's consumer loop
  * (SURVEY §2.9): poll → union → dedup keep-last → clean → two sinks,
  * with checkpointed offsets replacing manual Kafka commits.
  *
  * Reference: Kafka_GSMLSConsumer.py:152-219 (poll loop; 10 empty polls
  * → drain ≈ Trigger.AvailableNow), :250 (manual commit after success ≈
  * checkpoint), :196-219 (per-batch natural-key dedup keep='last'),
  * :897-926 + :1278-1279 (fan-out re-publish of an image projection).
  */
object Streaming {

  // ---------------------------------------------------------------------
  // S5 — Kafka sink envelope (GSMLS.py:1347-1413): one message per row,
  // value = the whole row as JSON, key = a business column. The
  // reference chunks whole-DataFrame JSON blobs into ≤500-row messages;
  // row-granularity messages make chunking unnecessary and keep the
  // producer embarrassingly parallel.
  // ---------------------------------------------------------------------
  /** JSON codec options: microsecond timestamp precision (the default
    * millisecond format silently loses precision on round-trip). */
  private val jsonOpts = Map(
    "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  def kafkaEnvelope(df: DataFrame, keyCol: Column): DataFrame =
    df.select(
      keyCol.cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*), jsonOpts).as("value"))

  /** S4 decode half (Kafka_GSMLSConsumer.py:180-181): parse the JSON
    * `value` back into typed columns. Malformed messages surface as a
    * null struct (PERMISSIVE) — filterable into a quarantine sink. */
  def parseEnvelope(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value").cast("string"), schema, jsonOpts).as("row"))
      .select(col("row.*"))

  /** S4 — Kafka streaming source (standard DSv2 options). Requires the
    * spark-sql-kafka connector on the classpath at deploy time; kept as
    * the single place the topic wiring lives. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()

  /** File-based streaming source over parquet (the landing-zone analog;
    * also how tests replay micro-batches deterministically). */
  def parquetSource(spark: SparkSession, path: String, schema: StructType,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  // ---------------------------------------------------------------------
  // ST1/ST2/ST3/ST5 — the consume loop. Each micro-batch:
  //   1. dedup keep-last within the batch on the natural key (ST3) —
  //      requires an explicit ordering column (SURVEY §7.4(1));
  //   2. apply the cleaning stages (pure column expressions);
  //   3. append to the primary sink and optionally a fan-out projection
  //      to a second sink (ST5) — both inside one foreachBatch so a
  //      batch commits atomically with the checkpoint (ST2).
  // Because append mode can re-deliver a key across batches (the
  // reference has the same at-least-once semantics), readers take the
  // batch view through `dedupedView` for exactly-once-per-key results.
  // ---------------------------------------------------------------------
  final case class StreamConfig(
      keys: Seq[String],
      orderCol: String,
      primaryPath: String,
      checkpointPath: String,
      fanOut: Option[(DataFrame => DataFrame, String)] = None,
      rowCounter: Option[LongAccumulator] = None)

  def runAvailableNow(src: DataFrame, clean: DataFrame => DataFrame,
                      cfg: StreamConfig): Unit = {
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", cfg.checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        cfg.rowCounter.foreach(_.add(batch.count()))  // A4 running counts
        val deduped = Relational.dedupKeepLast(batch, cfg.keys, col(cfg.orderCol))
        val cleaned = clean(deduped)
        cleaned.write.mode("append").parquet(cfg.primaryPath)
        cfg.fanOut.foreach { case (project, path) =>
          project(cleaned).write.mode("append").parquet(path)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Exactly-once-per-key batch view of an append-mode sink: global
    * keep-last dedup over everything delivered so far. Associative with
    * the per-batch dedup, so replays/overlaps collapse correctly. */
  def dedupedView(spark: SparkSession, path: String,
                  keys: Seq[String], orderCol: String): DataFrame =
    Relational.dedupKeepLast(spark.read.parquet(path), keys, col(orderCol))

  /** ST3 full strength — cross-trigger keep-one dedup INSIDE the engine:
    * `dropDuplicatesWithinWatermark` holds per-key state in the streaming
    * state store, so a key re-delivered in a later micro-batch is dropped
    * by the engine itself (the reference resolves re-scrape overlap at
    * consume time, Kafka_GSMLSConsumer.py:196-219), not collapsed
    * afterwards in a batch view. State is bounded by the watermark: at
    * streaming scale the store holds only keys inside the lateness
    * horizon, never the full delivery history — the reason this variant,
    * not an unbounded dropDuplicates, is the 100 TB operator. */
  def runStatefulDedup(src: DataFrame, keys: Seq[String], tsCol: String,
                       watermarkDelay: String, sinkPath: String,
                       checkpointPath: String): Unit = {
    val q = src.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .option("path", sinkPath)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
    q.awaitTermination()
  }

  // ---------------------------------------------------------------------
  // Custom keyed state via flatMapGroupsWithState — the API for state
  // machines the built-in stateful operators can't express (the
  // reference's consumer keeps per-county progress dicts across polls,
  // Kafka_GSMLSConsumer.py:130-138). Demonstrated as per-key running
  // (count, sum): state lives in the streaming state store, carries
  // ACROSS micro-batches through the checkpoint, and each trigger emits
  // the updated totals for keys seen in that batch. Emissions are
  // monotone, so the final per-key value is the max over emissions —
  // and must equal the plain batch aggregation over everything
  // delivered (the oracle). Per-key state is two longs: bounded by key
  // cardinality, not delivery history, so the operator holds at
  // streaming scale.
  // ---------------------------------------------------------------------
  def runRunningTotals(src: DataFrame, sinkPath: String,
                       checkpointPath: String): Unit = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = src.sparkSession
    import spark.implicits._
    val ds = src.select(col("dkey").cast("string"), col("amt").cast("long"))
      .as[(String, Long)]
    val stated = ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[(Long, Long)]) =>
          var (c, s) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { t => c += 1; s += t._2 }
          state.update((c, s))
          Iterator((key, c, s))
      }
    stated.toDF("dkey", "n", "total").writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .option("path", sinkPath)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
      .awaitTermination()
  }

  // ---------------------------------------------------------------------
  // ST22 — streaming sessionization: the incremental form of the gap
  // sessionizer (batch: session_window / Relational.sessionize), built
  // on flatMapGroupsWithState with EVENT-TIME TIMEOUT — the state-
  // eviction mechanism none of the other stateful operators need: a
  // session has no natural closing row, so something must fire when
  // the watermark proves no merging event can still arrive. Per-key
  // state is ONE open session (start, last-event time, count — three
  // longs): bounded by the number of keys with an open session inside
  // the watermark horizon, never by delivery history — timed-out
  // sessions are emitted and REMOVED, so an idle key costs nothing.
  //
  // Semantics match the native session_window exactly: an event merges
  // into the open session iff ts < last + gap (strict; an event exactly
  // gap after its predecessor starts a NEW session), emitted windows
  // are [first, last + gap). A session closes two ways: a same-key
  // event arrives beyond the gap (emitted in that batch), or the
  // watermark passes last + gap (emitted by the timeout callback). If
  // the open session is already behind the watermark when its batch
  // ends, it is emitted immediately instead of stored — storing it
  // would demand a timeout timestamp in the past, which the state API
  // (correctly) rejects; no mergeable event can be on the way, because
  // anything older than the watermark that should have merged is late
  // by the delivery contract.
  //
  // Delivery contract: per-key time-ordered across triggers within the
  // watermark delay (within one trigger any order — the batch sorts);
  // state arithmetic is epoch MICROSECONDS, so merge decisions carry
  // the full timestamp precision (timeout timestamps are millisecond
  // API granularity, which only affects WHEN a closed session flushes,
  // never which events merged). The drained result equals the batch
  // session_window over all deliveries — the oracle replays it so.
  // ---------------------------------------------------------------------
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  def runStreamingSessionize(src: DataFrame, keyCol: String, tsCol: String,
                             gapMs: Long, watermarkDelay: String,
                             sinkPath: String, checkpointPath: String): Unit = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = src.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L
    // the engine requires TIMESTAMP (not NTZ) event time; the session
    // timezone is UTC throughout this library, so the cast preserves
    // the wall-clock value and the NTZ cast on output restores it
    // `__t` stays in the projection: the watermark rides its column
    // metadata, and event-time timeout requires a watermarked column in
    // scope at the stateful operator
    val ds = src
      .withColumn("__t", col(tsCol).cast("timestamp"))
      .withWatermark("__t", watermarkDelay)
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col("__t")).as("us"), col("__t"))
      .as[(Long, Long, java.sql.Timestamp)]
    val sessions = ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          def out(s: OpenSession) = (key, s.startUs, s.lastUs + gapUs, s.n)
          if (!rows.hasNext && state.hasTimedOut) {
            val s = state.get; state.remove(); Iterator(out(s))
          } else {
            val ts = rows.map(_._2).toArray.sorted
            var closed = List.empty[OpenSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t < s.lastUs + gapUs =>
                  cur = Some(OpenSession(s.startUs, math.max(s.lastUs, t), s.n + 1))
                case Some(s) =>
                  closed ::= s
                  cur = Some(OpenSession(t, t, 1L))
                case None => cur = Some(OpenSession(t, t, 1L))
              }
            }
            cur.foreach { s =>
              // CEILING division to ms: the session truly expires at
              // lastUs+gapUs MICROseconds, but the timeout API is ms.
              // Floor (lastUs/1000 + gapMs) fires up to 999us early for
              // sub-ms timestamps — an on-time event landing in that
              // window would find its session already flushed and start
              // a spurious new one. Rounding UP keeps the timeout at or
              // after the true expiry instant (late flush only shifts
              // WHEN the row emits, never which events merged).
              val timeoutMs = (s.lastUs + gapUs + 999L) / 1000L
              if (timeoutMs <= state.getCurrentWatermarkMs()) {
                closed ::= s // already expired per event time — flush now
                state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(timeoutMs)
              }
            }
            closed.reverse.iterator.map(out)
          }
      }
    sessions.toDF(keyCol, "__sus", "__eus", "n_events")
      .select(col(keyCol),
        timestamp_micros(col("__sus")).cast("timestamp_ntz").as("session_start"),
        timestamp_micros(col("__eus")).cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .option("path", sinkPath)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
      .awaitTermination()
  }

  // ---------------------------------------------------------------------
  // Stream-stream inner join — both sides are unbounded; the engine
  // buffers each side in the state store and emits matches as rows
  // arrive. The event-time range condition + watermarks are what make
  // this viable at scale: state for a side is evictable once the
  // watermark passes its joinable horizon, so the store holds a bounded
  // time slice of each stream, never the full history. For an INNER
  // join every match is emitted during the drain regardless of
  // watermark, so the result equals the batch join over the same
  // deliveries (the oracle).
  // ---------------------------------------------------------------------
  // For OUTER variants the null side emits only once the GLOBAL
  // watermark (min across both inputs) passes the row's joinable
  // horizon — which is why outer stream-stream joins REQUIRE the
  // event-time range in the condition: it bounds how long a row must
  // wait before the engine can prove no match will arrive. The
  // watermark lags one trigger, so a drain flushes pending nulls only
  // on a SUBSEQUENT trigger — callers advance it by delivering a
  // watermark-pushing sentinel and draining again (the q_st20 harness
  // shape); a live stream gets this for free from ongoing data.
  def runStreamStreamJoin(left: DataFrame, right: DataFrame,
                          joinExpr: Column, watermarkDelay: String,
                          leftTs: String, rightTs: String,
                          sinkPath: String, checkpointPath: String,
                          joinType: String = "inner"): Unit = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r, joinExpr, joinType).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .option("path", sinkPath)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
      .awaitTermination()
  }

  // ---------------------------------------------------------------------
  // Streaming MERGE — an incrementally-maintained keyed snapshot (the
  // materialized-view / Delta "MERGE INTO" pattern) on plain parquet.
  //
  // State layout is a mini merge-on-read table: each micro-batch writes
  // a new version directory containing ONLY the key-hash buckets it
  // touched (merged with those buckets' prior contents, keep-last by
  // the order column); untouched buckets are never rewritten — the
  // current snapshot of a bucket is its newest version directory. Per-
  // batch write cost is therefore proportional to the CHANGED slice of
  // the key space, not the table size — the property that makes a
  // keyed 100 TB snapshot maintainable by a stream of small deltas.
  //
  // The bucket->version mapping lives in a MANIFEST: each batch writes
  // its bucket data to v<id>, then commits by writing a one-file
  // manifest parquet (bucket, version) to m<id>. A version is visible
  // iff its manifest committed (parquet _SUCCESS) — a crash between the
  // data write and the manifest write leaves the version invisible, so
  // readers never see a partial batch. Readers take the NEWEST
  // committed manifest; no directory-walk over versions is ever needed.
  //
  // Compaction (`compactEvery` > 0): every K-th batch folds the whole
  // prior snapshot plus the batch into its own version (all buckets),
  // so the manifest collapses to a single version. GC runs at the START
  // of each batch against the newest manifest committed BEFORE this
  // batch — by then that manifest's batch has its checkpoint committed
  // (batch N only starts after N-1 committed), so dropping versions it
  // does not reference can never break a replay. Version count is
  // therefore bounded by ~compactEvery, not by stream lifetime.
  // ---------------------------------------------------------------------
  def runIncrementalMerge(src: DataFrame, keys: Seq[String], orderCol: String,
                          buckets: Int, stateRoot: String,
                          checkpointPath: String,
                          compactEvery: Int = 0): Unit = {
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        gcMergeState(spark, stateRoot, id)
        val bucketed = batch.withColumn("__bucket",
          pmod(hash(keys.map(col): _*), lit(buckets)))
        val changed = bucketed.select(col("__bucket")).distinct()
          .collect().map(_.getInt(0)).toSet // <= `buckets` values, never rows
        // newest manifest committed strictly before this batch: excludes
        // anything a retried attempt of this same batch left behind
        // (mode=overwrite makes the retry itself idempotent)
        val manifest = readLatestManifest(spark, stateRoot, id)
        val compact = compactEvery > 0 && id > 0 && id % compactEvery == 0
        val priorBuckets =
          if (compact) manifest // fold EVERY bucket into this version
          else manifest.filter { case (b, _) => changed(b) }
        val prior = readBuckets(spark, stateRoot, priorBuckets)
        val all = prior.map(_.unionByName(bucketed)).getOrElse(bucketed)
        Relational.dedupKeepLast(all, keys, col(orderCol))
          .write.partitionBy("__bucket").mode("overwrite")
          .parquet(s"$stateRoot/v$id")
        val entries =
          if (compact) (manifest.keySet ++ changed).map(_ -> id).toMap
          else manifest ++ changed.map(_ -> id)
        writeManifest(spark, stateRoot, id, entries)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Current snapshot of an incremental-merge state dir: per bucket of
    * the newest committed manifest, read the version it points at.
    *
    * CONCURRENCY CONTRACT: the returned frame is lazy — it binds file
    * paths from the manifest read NOW but scans them at action time. If
    * the stream advances meanwhile, a later batch's GC may delete a
    * superseded version this snapshot references (FileNotFoundException
    * at scan). Materialize (write/collect/localCheckpoint) before the
    * stream's next batch, or read only quiescent state dirs — the
    * drivers in this repo all drain the stream to completion first. For
    * a truly concurrent external reader, pin snapshots by keeping N
    * manifests out of GC reach. */
  def mergedSnapshot(spark: SparkSession, stateRoot: String): DataFrame =
    snapshotBefore(spark, stateRoot, Long.MaxValue)

  /** Time-travel read: the snapshot as of batch `asOfBatch` — resolved
    * through the newest manifest committed at or below that batch id,
    * exactly how a reader at that point in time would have bound it.
    * The travel horizon is what GC has retained: versions superseded
    * before the newest manifest are dropped at the next batch start, so
    * only the most recent committed state is guaranteed reachable on a
    * live stream; pause the stream (or widen GC) to keep history. Same
    * laziness contract as [[mergedSnapshot]]. */
  def mergedSnapshotAt(spark: SparkSession, stateRoot: String,
                       asOfBatch: Long): DataFrame =
    snapshotBefore(spark, stateRoot,
      if (asOfBatch == Long.MaxValue) Long.MaxValue else asOfBatch + 1)

  private def snapshotBefore(spark: SparkSession, stateRoot: String,
                             beforeId: Long): DataFrame =
    readBuckets(spark, stateRoot, readLatestManifest(spark, stateRoot, beforeId))
      .map(_.drop("__bucket"))
      .getOrElse(spark.emptyDataFrame)

  /** Read a manifest slice `bucket -> version` as ONE scan per live
    * version: version dirs are `partitionBy("__bucket")`, so the isin
    * filter partition-prunes at the file level. O(distinct versions)
    * read plans instead of O(buckets) — per-bucket `spark.read` calls
    * each pay a listing + footer round-trip and union into a plan whose
    * analysis cost grows with the bucket count, which dominated
    * per-trigger latency long before the data did. The returned frame
    * carries `__bucket` (partition column, IntegerType). */
  private def readBuckets(spark: SparkSession, stateRoot: String,
                          slice: Map[Int, Long]): Option[DataFrame] =
    slice.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, entries) =>
      spark.read.option("basePath", s"$stateRoot/v$v")
        .parquet(s"$stateRoot/v$v")
        .filter(col("__bucket").isin(entries.keys.toSeq: _*))
    }.reduceOption(_ unionByName _)

  /** Commit batch `id`: write the full bucket->version mapping as a
    * one-file parquet manifest. The parquet _SUCCESS marker IS the
    * commit point for the whole batch. */
  private def writeManifest(spark: SparkSession, stateRoot: String, id: Long,
                            entries: Map[Int, Long]): Unit = {
    import spark.implicits._
    entries.toSeq.sorted.toDF("bucket", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/m$id")
  }

  /** bucket -> version from the newest manifest committed below
    * `beforeId`; empty when no batch has committed yet. */
  private def readLatestManifest(spark: SparkSession, stateRoot: String,
                                 beforeId: Long): Map[Int, Long] =
    latestManifestId(spark, stateRoot, beforeId) match {
      case Some(mid) =>
        spark.read.parquet(s"$stateRoot/m$mid")
          .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      case None => Map.empty
    }

  private def latestManifestId(spark: SparkSession, stateRoot: String,
                               beforeId: Long): Option[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(stateRoot)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return None
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .flatMap { mp =>
        mp.getName match {
          case n if n.startsWith("m") =>
            n.drop(1).toLongOption.filter(v => v < beforeId &&
              fs.exists(new org.apache.hadoop.fs.Path(mp, "_SUCCESS")))
          case _ => None
        }
      }.sorted.lastOption
  }

  /** Drop state superseded before batch `id`: everything older than the
    * newest manifest committed before this batch, except the versions
    * that manifest still references. Safe under replay — only the
    * CURRENT batch can ever be replayed, and it reads exactly that
    * manifest. */
  private def gcMergeState(spark: SparkSession, stateRoot: String,
                           id: Long): Unit =
    latestManifestId(spark, stateRoot, id).foreach { mid =>
      val referenced = readLatestManifest(spark, stateRoot, id).values.toSet
      val rootPath = new org.apache.hadoop.fs.Path(stateRoot)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath).foreach { p =>
        val dead = p.getName match {
          case n if n.startsWith("v") =>
            n.drop(1).toLongOption.exists(v => v < mid && !referenced(v))
          case n if n.startsWith("m") =>
            n.drop(1).toLongOption.exists(_ < mid)
          case _ => false
        }
        if (dead) fs.delete(p, true)
      }
    }

  // ---------------------------------------------------------------------
  // ST12 — streaming semantic dedup: the incremental form of
  // Similarity.semanticDedup. The quantizer is FIXED (trained offline,
  // broadcast-sized, passed explicitly like the batch overload); the
  // cross-trigger state is the per-cell exemplar set, persisted as a
  // parquet side table the way the incremental merge persists its
  // snapshot. Per micro-batch: assign arrivals to cells, elect a
  // first-arrival exemplar for cells that have none (delivery order
  // (seqCol, idCol) — deterministic under replay), score every arrival
  // against its cell's one exemplar, keep exemplars plus arrivals below
  // the threshold. The exemplar relation is ≤ |cells| rows and
  // broadcasts into the scoring join; per-batch work is O(batch)
  // cosines — semanticDedup's scale shape, arriving one trigger at a
  // time. The within-batch election window sorts a micro-batch, which
  // is trigger-bounded, never corpus-sized.
  //
  // Delivery semantics: like the other foreachBatch sinks here, the
  // survivor sink is at-least-once — a crash between the sink append
  // and the checkpoint commit re-emits that batch's survivors on
  // restart (the exemplar side table is replay-safe: re-claimed cells
  // produce no new exemplar rows). Readers take the exactly-once view
  // with a dropDuplicates on the id column, the dedupedView pattern.
  // ---------------------------------------------------------------------
  def runStreamingSemanticDedup(src: DataFrame, idCol: String, vecCol: String,
                                seqCol: String, cent: DataFrame, threshold: Double,
                                exemplarPath: String, sinkPath: String,
                                checkpointPath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Similarity
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // persisted: the assignment aggregation feeds the exemplar
        // election AND the scoring join (two separate write actions) —
        // without the pin each action re-runs the |batch|×|cent| cosine
        // argmax; batch-sized cache, released before the trigger ends
        val withCell = Similarity
          .ivfAssignTo(batch.select(col(idCol), col(vecCol)), idCol, vecCol, cent)
          .join(batch.select(col(idCol), col(seqCol)), Seq(idCol))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val exDir = new org.apache.hadoop.fs.Path(exemplarPath)
        val fs = exDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // a pre-created but never-written state dir means "no exemplars
        // yet" — gate on data files, not directory existence
        val existingOpt =
          if (fs.exists(exDir) &&
              fs.listStatus(exDir).exists(_.getPath.getName.startsWith("part-")))
            Some(spark.read.parquet(exemplarPath))
          else None
        val unclaimed = existingOpt match {
          case Some(ex) => withCell.join(ex.select(col("cell")), Seq("cell"), "left_anti")
          case None     => withCell
        }
        val newEx = unclaimed
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("cell")).orderBy(col(seqCol), col(idCol))))
          .filter(col("__rn") === 1)
          .select(col("cell"), col(idCol).as("ex_id"), col(vecCol).as("ex_vec"))
        newEx.write.mode("append").parquet(exemplarPath)
        val allEx = existingOpt.map(_.unionByName(newEx)).getOrElse(newEx)
        val cos = round(
          Similarity.dotOf(batch, col(vecCol), col("ex_vec"))
            / (Similarity.normOf(batch, col(vecCol))
               * Similarity.normOf(batch, col("ex_vec"))), 6)
        withCell.join(broadcast(allEx), Seq("cell"))
          .withColumn("cos_ex", cos)
          .filter(col(idCol) === col("ex_id") || col("cos_ex") < threshold)
          .select(col(idCol), col("cell"), col("cos_ex"),
            (col(idCol) === col("ex_id")).as("is_ex"))
          .write.mode("append").parquet(sinkPath)
        withCell.unpersist(blocking = false)
        ()
      }
      .start()
    q.awaitTermination()
  }

  // ---------------------------------------------------------------------
  // ST13 — incremental source scorecard: the streaming form of
  // Quality.sourceScorecard, completing the batch/streaming symmetry the
  // dedup tier has. Every scorecard ingredient is mergeable, so the
  // cross-trigger state is a set of INTEGER accumulators, not documents:
  //   - per-source (n_docs, Σ quantized quality, n_contaminated) and
  //     per-(source, length-bucket) counts — versioned like the
  //     incremental merge (a replayed batch overwrites its own version
  //     directory, so at-least-once redelivery cannot double-count);
  //   - the distinct (source, content-hash) set for the exact-dup rate —
  //     append-only with an anti-join gate, so replays and cross-batch
  //     duplicates are no-ops.
  // A document's contamination verdict depends only on its own shingles
  // vs the static (broadcast) benchmark set, so it is batch-local.
  // Per-trigger cost is O(batch) + O(|sources|·nBuckets) state rewrite;
  // the final report is a pure function of the same integers the batch
  // operator aggregates, so the drained scorecard equals
  // Quality.sourceScorecard over everything delivered — the oracle.
  // ---------------------------------------------------------------------
  def runIncrementalScorecard(src: DataFrame, idCol: String, sourceCol: String,
                              textCol: String, qualityCol: Column, nTokCol: Column,
                              benchShingles: DataFrame, shingleN: Int,
                              minShared: Long, bucketTokens: Int, nBuckets: Int,
                              stateRoot: String, checkpointPath: String): Unit = {
    import org.apache.spark.sql.types.LongType
    import graft.operators.Similarity
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        // persisted: the projection feeds the contamination join, both
        // accumulator deltas, and the hash delta — batch-sized cache,
        // released before the trigger ends
        val base = batch.select(col(idCol), col(sourceCol), col(textCol),
            floor(qualityCol * 10000.0 + 0.5).cast(LongType).as("__q"),
            least(lit(nBuckets - 1L),
              (nTokCol.cast(LongType) / lit(bucketTokens.toLong)).cast(LongType))
              .as("__b"),
            md5(col(textCol)).as("__h"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val flagged = Similarity
          .shingles(base.select(col(idCol), col(textCol)), idCol, textCol, shingleN)
          .join(broadcast(benchShingles), Seq("shingle"))
          .groupBy(col(idCol)).agg(count(lit(1)).as("__ns"))
          .filter(col("__ns") >= minShared)
          .select(col(idCol), lit(1L).as("__c"))
        val srcDelta = base
          .join(flagged, Seq(idCol), "left")
          .groupBy(col(sourceCol)).agg(
            count(lit(1)).as("n_docs"),
            sum(col("__q")).as("qs"),
            coalesce(sum(col("__c")), lit(0L)).as("n_contam"))
        val bktDelta = base.groupBy(col(sourceCol), col("__b"))
          .agg(count(lit(1)).as("c"))
        val (srcAll, bktAll) = latestScorecardDir(spark, stateRoot, id) match {
          case Some(dir) =>
            (spark.read.parquet(s"$dir/src").unionByName(srcDelta)
               .groupBy(col(sourceCol)).agg(
                 sum(col("n_docs")).as("n_docs"), sum(col("qs")).as("qs"),
                 sum(col("n_contam")).as("n_contam")),
             spark.read.parquet(s"$dir/bkt").unionByName(bktDelta)
               .groupBy(col(sourceCol), col("__b")).agg(sum(col("c")).as("c")))
          case None => (srcDelta, bktDelta)
        }
        srcAll.write.mode("overwrite").parquet(s"$stateRoot/v$id/src")
        bktAll.write.mode("overwrite").parquet(s"$stateRoot/v$id/bkt")
        val hDir = s"$stateRoot/hashes"
        val hPath = new org.apache.hadoop.fs.Path(hDir)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bh = base.select(col(sourceCol), col("__h")).distinct()
        val newH =
          if (fs.exists(hPath) &&
              fs.listStatus(hPath).exists(_.getPath.getName.startsWith("part-")))
            bh.join(spark.read.parquet(hDir), Seq(sourceCol, "__h"), "left_anti")
          else bh
        // materialize BEFORE appending to the directory the anti-join
        // reads, so the write job never lists its own new files
        val newHp = newH.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        newHp.count()
        newHp.write.mode("append").parquet(hDir)
        newHp.unpersist(blocking = false)
        base.unpersist(blocking = false)
        ()
      }
      .start()
    q.awaitTermination()
  }

  // ---------------------------------------------------------------------
  // ST14 — streaming LSH near-dup dedup: the incremental form of the
  // MinHash-LSH pipeline (how a corpus is deduplicated as it is
  // INGESTED, not after the fact). Cross-trigger state is a POSTINGS
  // store: one row per (doc, band) carrying the band bucket key AND the
  // doc's full k-slot signature, written `partitionBy` a hash of the
  // band key into `storeBuckets` directories. Per micro-batch: shingle
  // + sign the arrivals, compute their postings, and read back ONLY the
  // store partitions those postings hash into — the probe is a
  // partition-pruned file-level scan of the touched slice, never a scan
  // of the whole delivery history. Occupancy (the bucket cap, applied
  // to the delivery prefix AT THIS TRIGGER) and the earlier-vs-arrival
  // pairing both run inside the touched slice; a band bucket's full
  // history colocates in its store partition, so the pruned read sees
  // everything the cap and the pairing need. Denormalizing the
  // signature into the posting makes the jaccard estimate (fraction of
  // agreeing minhash slots) a projection on the pair join itself — no
  // second join against a corpus-wide signature table. Drop an arrival
  // when any EARLIER doc — prior triggers, or same trigger with a
  // smaller id — shares a surviving bucket with estimate >= threshold.
  // First occurrence wins, and the comparison set is all earlier
  // ARRIVALS (kept or dropped), so the policy is non-recursive and
  // exactly recomputable set-wise — the oracle replays the same prefix
  // logic in SQL.
  //
  // Scale shape: the store is numBands rows × k longs per ever-seen doc
  // (still orders smaller than the corpus text); per-trigger reads are
  // partition-pruned to the batch's touched buckets, so trigger cost is
  // O(batch + touched-slice), not O(corpus); the pair join is capped
  // per bucket. The store append anti-joins the pruned slice by id, so
  // a crash-replayed batch re-appends nothing and recomputes the same
  // occupancy (its first append is already in the slice it reads).
  // ---------------------------------------------------------------------
  def runStreamingLshDedup(src: DataFrame, idCol: String, textCol: String,
                           seqCol: String, shingleN: Int, numHashes: Int,
                           rowsPerBand: Int, maxBucketSize: Int,
                           threshold: Double, sigPath: String,
                           sinkPath: String, checkpointPath: String,
                           storeBuckets: Int = 64): Unit = {
    import graft.operators.Similarity
    val mhCols = (0 until numHashes).map(i => s"mh$i")
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val sigB = Similarity
          .minhashSignature(
            Similarity.shingles(batch.select(col(idCol), col(textCol)),
              idCol, textCol, shingleN), idCol, numHashes)
          .join(batch.select(col(idCol), col(seqCol)), Seq(idCol))
        val postB = Similarity
          .bandKeys(sigB.select(col(idCol) +: mhCols.map(col): _*),
            idCol, numHashes, rowsPerBand)
          .join(sigB, Seq(idCol))
          .withColumn("__pbucket",
            pmod(hash(col("band_key")), lit(storeBuckets)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        postB.count()
        val touched = postB.select(col("__pbucket")).distinct()
          .collect().map(_.getInt(0)).toSeq // <= storeBuckets values
        val sigDir = new org.apache.hadoop.fs.Path(sigPath)
        val fs = sigDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // the probe read: file-level partition pruning to touched buckets
        val priorSlice =
          if (fs.exists(sigDir) && fs.listStatus(sigDir)
                .exists(_.getPath.getName.startsWith("__pbucket=")))
            Some(spark.read.parquet(sigPath)
              .filter(col("__pbucket").isin(touched: _*)))
          else None
        // minus the batch's own ids, so a crash-replay (store appended,
        // checkpoint not committed) sees the first run's prefix exactly
        val bIds = postB.select(col(idCol)).distinct()
        val prior = priorSlice.map(_.join(bIds, Seq(idCol), "left_anti"))
        val allPost = prior.map(_.unionByName(postB)).getOrElse(postB)
        // occupancy at THIS trigger: every posting delivered so far in
        // the touched buckets (untouched buckets can't pair with the
        // batch, so their occupancy is irrelevant this trigger)
        val oversized = allPost.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__bsz")).filter(col("__bsz") > maxBucketSize)
          .select(col("band"), col("band_key"))
        val earlier = allPost.join(oversized, Seq("band", "band_key"), "left_anti")
          .select(col("band") +: col("band_key") +:
            col(idCol).as("id_a") +: col(seqCol).as("__sq_a") +:
            mhCols.map(c => col(c).as(s"a_$c")): _*)
        val later = postB.join(oversized, Seq("band", "band_key"), "left_anti")
          .select(col("band") +: col("band_key") +:
            col(idCol).as("id_b") +: col(seqCol).as("__sq_b") +:
            mhCols.map(c => col(c).as(s"b_$c")): _*)
        val matches = (0 until numHashes).map(i =>
          when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0)).reduce(_ + _)
        val drops = earlier.join(later, Seq("band", "band_key"))
          .filter(col("__sq_a") < col("__sq_b") ||
            (col("__sq_a") === col("__sq_b") && col("id_a") < col("id_b")))
          .filter(round(matches.cast(org.apache.spark.sql.types.DoubleType) /
            numHashes, 4) >= threshold)
          .select(col("id_b").as(idCol)).distinct()
        batch.select(col(idCol), col(seqCol))
          .join(drops, Seq(idCol), "left_anti")
          .write.mode("append").parquet(sinkPath)
        // append ALL batch postings (kept or dropped docs) — the
        // comparison set is arrivals, and the id anti-join against the
        // pruned slice makes replays no-ops
        val newPost = priorSlice match {
          case Some(p) =>
            postB.join(p.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
          case None => postB
        }
        // one exchange on the store partition key: each write task holds
        // whole buckets, so a trigger appends <= storeBuckets files, not
        // tasks × buckets
        val newPostP = newPost.repartition(col("__pbucket"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        newPostP.count() // materialize before appending to the dir it reads
        newPostP.write.mode("append").partitionBy("__pbucket").parquet(sigPath)
        newPostP.unpersist(blocking = false)
        postB.unpersist(blocking = false)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Final report over the drained state — mirrors
    * [[graft.operators.Quality.sourceScorecard]]'s arithmetic term for
    * term (quantized quality mean, Laplace-smoothed PSI with
    * floor(x·1e9 + 0.5) terms, exact-dup rate from the distinct-hash
    * set), so the streaming result is bit-identical to the batch
    * operator over the same deliveries. */
  def scorecardSnapshot(spark: SparkSession, stateRoot: String, sourceCol: String,
                        nBuckets: Int, minMeanQ: Double = 0.6,
                        maxContamRate: Double = 0.08,
                        maxPsi: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val dir = latestScorecardDir(spark, stateRoot, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed scorecard state under $stateRoot"))
    val perSrc = spark.read.parquet(s"$dir/src")
    val bCounts = spark.read.parquet(s"$dir/bkt")
    val nh = spark.read.parquet(s"$stateRoot/hashes")
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__nh"))
    val gCounts = bCounts.groupBy(col("__b")).agg(sum(col("c")).as("__cg"))
    val gTot = perSrc.agg(sum(col("n_docs")).as("__ng"))
    val spine = perSrc.select(col(sourceCol), col("n_docs"))
      .crossJoin(broadcast(
        spark.range(nBuckets.toLong).select(col("id").as("__b"))))
    val p = (col("__cg") + 1).cast(DoubleType) / (col("__ng") + nBuckets).cast(DoubleType)
    val q = (col("c") + 1).cast(DoubleType) / (col("n_docs") + nBuckets).cast(DoubleType)
    val psi = spine
      .join(bCounts, Seq(sourceCol, "__b"), "left").na.fill(0L, Seq("c"))
      .join(broadcast(gCounts), Seq("__b"), "left").na.fill(0L, Seq("__cg"))
      .crossJoin(broadcast(gTot))
      .select(col(sourceCol),
        floor((p - q) * log(p / q) * lit(1e9) + lit(0.5)).cast(LongType).as("__qt"))
      .groupBy(col(sourceCol)).agg(sum(col("__qt")).as("__psiq"))
    val meanQ = round(col("qs").cast(DoubleType) / 10000.0 / col("n_docs"), 4)
    val contamRate = round(col("n_contam").cast(DoubleType) / col("n_docs"), 4)
    val dupRate = round((col("n_docs") - col("__nh")).cast(DoubleType) / col("n_docs"), 4)
    val psiLen = round(col("__psiq").cast(DoubleType) / 1e9, 6)
    perSrc.join(psi, Seq(sourceCol)).join(nh, Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), meanQ.as("mean_q"),
        col("n_contam"), contamRate.as("contam_rate"),
        dupRate.as("dup_rate"), psiLen.as("psi_len"),
        (meanQ >= minMeanQ && contamRate <= maxContamRate && psiLen <= maxPsi)
          .as("passed"))
  }

  /** Newest fully-committed scorecard version directory below
    * `beforeId` (both state tables must carry _SUCCESS — a crashed
    * mid-write version is invisible, same contract as the incremental
    * merge). */
  private def latestScorecardDir(spark: SparkSession, stateRoot: String,
                                 beforeId: Long): Option[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(stateRoot)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return None
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .flatMap { vp =>
        vp.getName match {
          case n if n.startsWith("v") =>
            n.drop(1).toLongOption.filter { v =>
              v < beforeId &&
              fs.exists(new org.apache.hadoop.fs.Path(vp, "src/_SUCCESS")) &&
              fs.exists(new org.apache.hadoop.fs.Path(vp, "bkt/_SUCCESS"))
            }.map(v => (v, vp.toString))
          case _ => None
        }
      }
      .sortBy(_._1).lastOption.map(_._2)
  }

  // ---------------------------------------------------------------------
  // ST6 — resume work-list (GSMLS.py:991-1047, 2375-2381): the full work
  // grid minus what the event log already records — a left anti join,
  // not a driver loop.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // ST16 — streaming SCD2: incrementally maintain the type-2 state
  // timeline of [[graft.operators.Relational.scd2Timeline]] as versioned
  // rows ARRIVE. Cross-trigger state is the OPEN run per key — (state,
  // valid_from, opening tiebreak), one row per key, bounded by key
  // cardinality like ST12's exemplar store, never by delivery history.
  // Per micro-batch: prepend the touched keys' open runs to the batch as
  // pseudo-rows (their valid_from predates every arrival under the
  // delivery contract), run the SAME window logic as the batch operator,
  // emit intervals that CLOSED at this trigger to closed/v<id>
  // (overwrite — a replayed batch rewrites its own dir, idempotent), and
  // rewrite only the TOUCHED key-hash buckets of the open-run store.
  //
  // The open store reuses the incremental merge's layout verbatim
  // (opens/v<id> partitioned by __bucket + a m<id> manifest, GC at batch
  // start): a micro-batch rewrites the buckets its keys hash into —
  // prior bucket contents for untouched keys carried over, new open runs
  // merged in — and commits by manifest; untouched buckets keep their
  // old version dirs, byte for byte. Per-trigger write cost is therefore
  // O(touched slice of the key space), never O(total keys), and never a
  // single-file rewrite of the whole store.
  //
  // Delivery contract: per-key STRICTLY increasing in `timeCol` across
  // triggers (the kafka-partition event-time contract; within one
  // trigger any order — the tiebreak settles equal timestamps there).
  // An equal-timestamp arrival in a LATER trigger is a contract
  // violation too: the maintainer only retains each run's opening row,
  // so a cross-trigger tie could order differently than the batch
  // operator seeing all deliveries at once. The maintainer never
  // retracts an emitted interval; a contract-violating row — older than
  // its key's open run — is detected (`timeCol` < open valid_from) and
  // routed to quarantine/v<id> instead of silently corrupting the
  // timeline, mirroring the S6 ingestion quarantine. Under the contract
  // the drained snapshot is EXACTLY the batch operator over all
  // deliveries — the oracle replays it that way.
  //
  // Scale shape: per-trigger shuffle is batch + touched open runs (one
  // row per touched key); closed history is append-only per trigger and
  // never rewritten (tiny per-trigger deltas, hence coalesce(1)); the
  // open store rewrite is touched buckets only, manifest-committed.
  // ---------------------------------------------------------------------
  def runStreamingScd2(src: DataFrame, keys: Seq[String], stateCol: String,
                       timeCol: String, tiebreak: String,
                       stateRoot: String, checkpointPath: String,
                       buckets: Int = 32): Unit = {
    import graft.operators.Relational
    val opensRoot = s"$stateRoot/opens"
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        gcMergeState(spark, opensRoot, id)
        val cols = keys ++ Seq(stateCol, timeCol, tiebreak)
        val b = batch.select(cols.map(col): _*)
          .withColumn("__bucket", pmod(hash(keys.map(col): _*), lit(buckets)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val changed = b.select(col("__bucket")).distinct()
          .collect().map(_.getInt(0)).toSet // <= `buckets` values, never rows
        val manifest = readLatestManifest(spark, opensRoot, id)
        // prior open runs in the buckets this batch touches — the only
        // slice of the store this trigger ever reads or rewrites, one
        // partition-pruned scan per live version
        val prior = readBuckets(spark, opensRoot,
          manifest.filter { case (bk, _) => changed(bk) })
        val bKeys = b.select(keys.map(col): _*).distinct()
        val openForBatch = prior.map(_.join(bKeys, keys, "left_semi"))
        // late-data gate: a row older than its key's open run violates
        // the delivery contract — quarantine it (diagnostics keep the
        // open run's valid_from it collided with); overwrite per version
        // dir makes a replayed batch idempotent, like closed/. The join
        // is persisted because both the quarantine and survivor filters
        // (and through them the timeline) action it.
        val joined = openForBatch.map { of =>
          b.join(
            of.select(keys.map(col) :+
              col("valid_from").as("__open_from"): _*),
            keys, "left")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        joined.foreach { j =>
          j.filter(col("__open_from").isNotNull &&
              col(timeCol) < col("__open_from"))
            .drop("__bucket")
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$stateRoot/quarantine/v$id")
        }
        val good = joined.map(
          _.filter(col("__open_from").isNull ||
              col(timeCol) >= col("__open_from"))
            .drop("__open_from"))
          .getOrElse(b)
        val openRows = openForBatch.map(_.select(
          keys.map(col) :+ col("state").as(stateCol) :+
            col("valid_from").as(timeCol) :+ col("__tie").as(tiebreak) :+
            col("__bucket"): _*))
        val all = openRows.map(_.unionByName(good)).getOrElse(good)
        // persisted: the closed emission and the new-opens rewrite both
        // action the timeline — without the persist each one replays the
        // prior scan + late-gate join + window pass
        val tl = Relational.scd2Timeline(all, keys, stateCol, timeCol,
          tiebreak, carry = Seq(tiebreak, "__bucket"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tl.filter(col("valid_to").isNotNull)
          .select(keys.map(col) :+ col("state") :+ col("valid_from") :+
            col("valid_to") :+ col("is_current"): _*)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$stateRoot/closed/v$id")
        val newOpens = tl.filter(col("valid_to").isNull)
          .select(keys.map(col) :+ col("state") :+ col("valid_from") :+
            col(tiebreak).as("__tie") :+ col("__bucket"): _*)
        // carry over the touched buckets' other keys, then commit the
        // touched buckets as this batch's version via the manifest
        prior.map(_.join(bKeys, keys, "left_anti"))
          .map(_.unionByName(newOpens)).getOrElse(newOpens)
          .write.partitionBy("__bucket").mode("overwrite")
          .parquet(s"$opensRoot/v$id")
        writeManifest(spark, opensRoot, id, manifest ++ changed.map(_ -> id))
        tl.unpersist(blocking = false)
        joined.foreach(_.unpersist(blocking = false))
        b.unpersist(blocking = false)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drained ST16 state as one timeline: every closed interval ever
    * emitted plus the current open runs — equals the batch
    * [[graft.operators.Relational.scd2Timeline]] over all CONTRACT-
    * CONFORMING deliveries (quarantined rows are excluded by both
    * sides; read them via [[scd2Quarantine]]). Quiescent-state reader,
    * like [[scorecardSnapshot]]. */
  def scd2Snapshot(spark: SparkSession, stateRoot: String): DataFrame = {
    val opensRoot = s"$stateRoot/opens"
    val manifest = readLatestManifest(spark, opensRoot, Long.MaxValue)
    if (manifest.isEmpty) throw new IllegalStateException(
      s"no committed scd2 state under $stateRoot")
    val opens0 = readBuckets(spark, opensRoot, manifest).get
    val opens = opens0.drop("__tie", "__bucket")
      .withColumn("valid_to",
        lit(null).cast(opens0.schema("valid_from").dataType))
      .withColumn("is_current", lit(true))
    val closedRoot = new org.apache.hadoop.fs.Path(s"$stateRoot/closed")
    val fs = closedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val closed =
      if (!fs.exists(closedRoot)) None
      else fs.listStatus(closedRoot).filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.startsWith("v") &&
          fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(p => spark.read.parquet(p.toString))
        .reduceOption(_ unionByName _)
    closed.map(_.unionByName(opens, allowMissingColumns = false))
      .getOrElse(opens)
  }

  /** Every row [[runStreamingScd2]] quarantined as a delivery-contract
    * violation (arrival older than its key's open run), with the
    * `__open_from` it collided with. Empty frame with no schema if the
    * stream never quarantined (the dirs are written per offending
    * trigger only). */
  def scd2Quarantine(spark: SparkSession, stateRoot: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$stateRoot/quarantine")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.startsWith("v") &&
          fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(_.toString)
    dirs.map(spark.read.parquet(_)).reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)
  }

  /** Newest `v<id>` child of `root` with a parquet _SUCCESS marker and
    * id strictly below `beforeId` — the shared commit-dir convention of
    * the incremental state family. */
  private def latestVersionDir(spark: SparkSession, root: String,
                               beforeId: Long): Option[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return None
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .flatMap { vp =>
        vp.getName match {
          case n if n.startsWith("v") =>
            n.drop(1).toLongOption.filter(v => v < beforeId &&
              fs.exists(new org.apache.hadoop.fs.Path(vp, "_SUCCESS")))
              .map(v => (v, vp.toString))
          case _ => None
        }
      }
      .sortBy(_._1).lastOption.map(_._2)
  }

  def resumeWorkList(allWork: DataFrame, eventLog: DataFrame, keys: Seq[String]): DataFrame =
    allWork.join(eventLog.select(keys.map(col): _*).distinct(), keys, "left_anti")

  // ---------------------------------------------------------------------
  // ST7 — source rate partitioning (GSMLS.py:2124-2158 detect,
  // 2210-2309 split): the reference recursively splits a search date
  // range when it returns >500 rows. Set-based form: one count
  // aggregation at the finest granularity plus window roll-ups, then
  // each range picks the coarsest granularity whose count fits the cap
  // (year if the year fits, else quarter, else month — the finest
  // level is kept even when still oversized, like the reference's
  // terminal week split).
  // ---------------------------------------------------------------------
  def partitionDateRanges(df: DataFrame, tsCol: String, maxRows: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = df.groupBy(
        year(col(tsCol)).as("y"), quarter(col(tsCol)).as("q"), month(col(tsCol)).as("m"))
      .agg(count(lit(1)).as("n"))
    val g = m
      .withColumn("ny", sum(col("n")).over(Window.partitionBy(col("y"))))
      .withColumn("nq", sum(col("n")).over(Window.partitionBy(col("y"), col("q"))))
    g.select(
        when(col("ny") <= maxRows, lit("year"))
          .when(col("nq") <= maxRows, lit("quarter"))
          .otherwise(lit("month")).as("granularity"),
        when(col("ny") <= maxRows, col("y").cast("string"))
          .when(col("nq") <= maxRows, concat(col("y").cast("string"), lit("Q"), col("q").cast("string")))
          .otherwise(concat(col("y").cast("string"), lit("-"), lpad(col("m").cast("string"), 2, "0")))
          .as("cell"),
        when(col("ny") <= maxRows, col("ny"))
          .when(col("nq") <= maxRows, col("nq"))
          .otherwise(col("n")).as("n"))
      .distinct()
  }

  // ---------------------------------------------------------------------
  // ST19 — streaming ANN index maintenance: new vectors are routed and
  // coded against FIXED offline-trained quantizers (coarse cells + PQ
  // codebooks) as they arrive, and appended to a cell-partitioned codes
  // store. Vector ids are immutable, so the store is append-only — no
  // merge, no rewrite, no GC pressure: each trigger writes ONLY its own
  // batch, into `indexRoot/batch=<id>/cell=<c>/` via DYNAMIC partition
  // overwrite — a replayed trigger rewrites exactly its own batch=<id>
  // partitions and touches nothing else, the same crash-safety argument
  // as the merge manifest without needing one.
  //
  // Scale shape per trigger: one broadcast of each quantizer, one scan
  // of the batch, zero contact with existing state — trigger cost is
  // O(batch), independent of index size. At query time the probe list
  // prunes the scan to nprobe cell directories (static partition
  // pruning at file-index time) and scoring reads codes only — the
  // same ADC plan as Pq.ivfPqTopK, off the incrementally-built store.
  // ---------------------------------------------------------------------
  /** Drain `src` (vector deliveries) into the codes store: per batch,
    * coarse-assign + PQ-code each vector and write
    * `(id, codes)` partitioned by coarse cell under `indexRoot/b<id>/`.
    *
    * `autoCompactSupersededPerCell` closes [[annIndexTopK]]'s cross-cell
    * staleness contract automatically: after the drain, one
    * column-pruned scan of the store's own (id, batch, cell) stamps
    * counts superseded rows PER CELL — each one is a row a
    * narrow probe could wrongly serve — and if any cell holds at least
    * the threshold, [[compactAnnIndex]] runs. The check is post-drain,
    * not per-trigger, so trigger cost stays O(batch); the check itself
    * costs one id-keyed aggregation over the compressed codes relation
    * (the same first scan compaction would do anyway). Default
    * `Long.MaxValue` = never, the pure append-only regime for
    * deployments whose updates are same-cell or absent. */
  def runStreamingAnnIndex(src: DataFrame, idCol: String, vecCol: String,
                           coarse: DataFrame, books: DataFrame, subLen: Int,
                           indexRoot: String, checkpointPath: String,
                           autoCompactSupersededPerCell: Long = Long.MaxValue): Unit = {
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val routed = graft.operators.Similarity
            .ivfAssignTo(batch, idCol, vecCol, coarse)
            .withColumnRenamed("cell", "ivf_cell")
          graft.operators.Pq
            .assign(routed, idCol, vecCol, books, subLen, carry = Seq("ivf_cell"))
            .groupBy(col(idCol), col("ivf_cell"))
            .agg(transform(
              array_sort(collect_list(struct(col("sub"), col("cell")))),
              e => e.getField("cell")).as("codes"))
            .select(col(idCol).as("id"), col("ivf_cell").as("cell"),
              col("codes"), lit(id).as("batch"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", "cell")
            .parquet(indexRoot)
        }
        ()
      }
      .start()
    q.awaitTermination()
    if (autoCompactSupersededPerCell != Long.MaxValue &&
        Option(new java.io.File(indexRoot).listFiles())
          .exists(_.exists(_.getName.startsWith("batch=")))) {
      val spark = src.sparkSession
      // Superseded rows attributed to the cell HOLDING the stale copy —
      // exactly the rows a probe of only that cell would wrongly serve.
      // Same-cell re-deliveries are excluded: annIndexTopK already
      // resolves those latest-batch-wins inside the probed partition,
      // so they carry zero staleness hazard and must not trigger a
      // full-store rewrite. Only a row whose id has MOVED to a
      // different cell since (old cell probed alone → stale code
      // served) counts toward the threshold.
      val store = spark.read.parquet(indexRoot)
        .select(col("id"), col("batch"), col("cell"))
      val latest = store.groupBy(col("id"))
        .agg(max(struct(col("batch"), col("cell"))).as("__l"))
        .select(col("id"), col("__l.batch").as("__maxb"),
          col("__l.cell").as("__lcell"))
      val worstCell = store.join(latest, Seq("id"))
        .filter(col("batch") < col("__maxb") && col("cell") =!= col("__lcell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("__n"))
        .agg(coalesce(max(col("__n")), lit(0L)).as("__w"))
        .head.getLong(0)
      if (worstCell >= autoCompactSupersededPerCell)
        compactAnnIndex(spark, indexRoot)
    }
  }

  /** ADC top-k off the streamed store: probe cells resolve from the
    * coarse quantizer (nprobe ids — a bounded driver-side collect, like
    * the merge manifest), the store scan partition-prunes to those cell
    * directories, and the broadcast distance table scores the codes.
    * Equals [[graft.operators.Pq.ivfPqTopK]] over everything delivered.
    *
    * Re-delivered ids (vector UPDATES — a later batch re-coding the
    * same id) resolve latest-batch-wins: per (id, subspace) the code
    * from the highest batch survives via a packed-long `max` (batch·B +
    * code, both bounded — the same mutable-buffer HashAggregate idiom
    * as the assignment argmin, never a window or sort), so a stale
    * row can neither double a score nor shadow the update.
    *
    * CONTRACT: the resolution sees only PROBED partitions. An update
    * that moves an id to a different coarse cell leaves the stale row
    * in the old cell's partitions — correct whenever both or neither
    * cell is probed, but a probe hitting ONLY the old cell scores the
    * stale code. [[runStreamingAnnIndex]]'s
    * `autoCompactSupersededPerCell` threshold closes the window
    * automatically at drain time (per-cell superseded counts from the
    * store's own batch stamps gate [[compactAnnIndex]]); a deployment
    * that leaves it off runs periodic compaction itself. Same-cell
    * updates need nothing either way. */
  def annIndexTopK(spark: SparkSession, indexRoot: String,
                   coarse: DataFrame, books: DataFrame, subLen: Int,
                   query: Seq[Double], nprobe: Int, k: Int): DataFrame = {
    val probes = coarse
      .withColumn("__qcos",
        round(graft.operators.Similarity.cosine(col("cvec"),
          graft.operators.Similarity.vecLit(query)), 6))
      .orderBy(col("__qcos").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid")).collect().map(_.getLong(0)).toSeq
    val dt = books.select(col("sub").as("__dtsub"), col("cid").as("__dtcid"),
      round(graft.operators.Pq.distanceTable(query, subLen), 6).as("d2q"))
    val b = 1L << 30 // codes are PQ cids (< 2^30 by Pq's checked contract)
    spark.read.parquet(indexRoot)
      .filter(col("cell").isin(probes: _*))
      .select(col("id"), col("batch"), posexplode(col("codes")).as(Seq("sub", "code")))
      .groupBy(col("id"), col("sub"))
      .agg(max(col("batch") * b + col("code")).as("__bp"))
      .select(col("id"), col("sub"), pmod(col("__bp"), lit(b)).as("code"))
      .join(broadcast(dt),
        col("sub") === col("__dtsub") && col("code") === col("__dtcid"))
      .groupBy(col("id"))
      .agg((sum(round(col("d2q") * 1e6)
        .cast(org.apache.spark.sql.types.LongType)) / 1e6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // ST21 — streaming model training (mini-batch SGD): each micro-batch
  // advances the linear model by ONE hard-sigmoid GD step computed over
  // that batch alone, and commits the updated weights as a versioned
  // m+1-row parquet. State is the MODEL — bounded by feature count,
  // never by data or delivery history — and a replayed trigger
  // recomputes the same step from the same predecessor version and
  // overwrites its own w<id> dir (idempotent, no manifest needed: the
  // newest version below the replayed id is by construction the one the
  // original attempt read, since batch N only starts after N-1's
  // checkpoint commit). Per-trigger cost: one aggregation over the
  // batch. ORDER SENSITIVITY is inherent to SGD and therefore part of
  // the operator contract: the fitted weights depend on delivery order,
  // which the checkpoint pins.
  // ---------------------------------------------------------------------
  def runStreamingSgd(src: DataFrame,
                      features: Seq[(String, Column)], label: Column,
                      lr: Double, stateRoot: String,
                      checkpointPath: String): Unit = {
    val m = features.size
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val prev = sgdWeightVersions(stateRoot).filter(_ < id).sorted.lastOption
          val w = prev match {
            case None => Array.fill(m + 1)(0.0)
            case Some(v) =>
              val rows = spark.read.parquet(s"$stateRoot/w$v")
                .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
              (features.map(_._1) :+ "__bias").map(rows).toArray
          }
          val feats = graft.operators.Learn.featurize(batch, features, label)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = feats.count().toDouble
          val w2 = graft.operators.Learn.gdStep(feats, m, w, lr, n)
          feats.unpersist(blocking = false)
          graft.operators.Learn.weightsDf(batch, features, w2)
            .coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/w$id")
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  // ---------------------------------------------------------------------
  // ST23 — streaming mixture control (adaptive data reweighting): each
  // micro-batch measures its own per-stratum excess loss and advances
  // the mixture weights by ONE multiplicative-weights step — the
  // streaming form of [[graft.operators.Curation.reweightMixture]], so a
  // training run's data mix adapts to the quality it actually receives.
  // State is the |strata|-row weight simplex, versioned exactly like the
  // SGD model (w<id> dirs; a replayed trigger recomputes the same step
  // from the same predecessor and overwrites itself — idempotent). The
  // first delivery seeds the simplex uniform over ITS strata (the
  // stratum universe is pinned by delivery 0, documented contract);
  // strata absent from a later batch carry zero excess loss, i.e. keep
  // their weight through that round up to renormalization. Strata
  // FIRST seen after delivery 0 are ignored by that contract — each
  // trigger now logs them and writes their names to
  // `stateRoot/dropped<id>`, so the case is observable in production
  // instead of silent. Order sensitivity is inherent (as with SGD) and
  // pinned by the checkpoint.
  // ---------------------------------------------------------------------
  def runStreamingReweight(src: DataFrame, stratumCol: String, qqCol: Column,
                           etaDen: Long, lossScale: Long,
                           stateRoot: String, checkpointPath: String): Unit = {
    import org.apache.spark.sql.types.LongType
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val losses = batch
            .select(col(stratumCol), qqCol.cast(LongType).as("__qq"))
            .groupBy(col(stratumCol))
            .agg((lit(lossScale)
              - floor(sum(col("__qq")).cast("double") / count(lit(1)) + 0.5)
                  .cast(LongType)).as("loss_u"))
          val prev = sgdWeightVersions(stateRoot).filter(_ < id).sorted.lastOption match {
            case Some(v) => spark.read.parquet(s"$stateRoot/w$v")
            case None =>
              graft.operators.Curation.normalizeBp(
                losses.select(col(stratumCol)).distinct()
                  .withColumn("__raw", lit(1L)),
                stratumCol, "__raw")
          }
          // Observability for the pinned-universe contract: a stratum
          // first appearing AFTER delivery 0 is dropped by the
          // prev-left-join below and never gains weight — documented
          // semantics (and what the oracle mirrors), but previously
          // UNOBSERVABLE in production. Count and name such strata per
          // trigger (an anti-join of two ≤|strata|-row relations; empty
          // on the seeding trigger by construction) and persist them
          // beside the state, so a new domain arriving mid-run surfaces
          // in the log and on disk instead of at eval time.
          val dropped = losses
            .join(prev.select(col(stratumCol)), Seq(stratumCol), "left_anti")
            .select(col(stratumCol)).collect().map(_.get(0).toString).sorted
          if (dropped.nonEmpty) {
            System.err.println(s"[streaming-reweight] trigger $id: " +
              s"${dropped.length} stratum/strata outside the delivery-0 " +
              s"universe ignored: ${dropped.mkString(",")}")
            spark.createDataFrame(dropped.toSeq.map(Tuple1(_)))
              .toDF(stratumCol)
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$stateRoot/dropped$id")
          }
          val scale = etaDen * lossScale
          val next = graft.operators.Curation.normalizeBp(
            prev.join(losses, Seq(stratumCol), "left")
              .withColumn("__raw",
                expr(s"w_bp * ($scale + coalesce(loss_u, 0)) div $scale"))
              .drop("loss_u", "w_bp"),
            stratumCol, "__raw")
          next.coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/w$id")
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  // ---------------------------------------------------------------------
  // ST24 — streaming decayed per-stratum rates: each trigger decays the
  // carried activity counter by a rational factor (decayNum/decayDen in
  // integer floor arithmetic — exp() decay is not correctly rounded
  // across engines, a num/den recurrence is exact everywhere) and adds
  // the batch's row counts: the "what has the feed sent LATELY" panel an
  // ingestion pipeline alarms on, where a plain total can never fall.
  // State is the |strata|-row counter table, versioned like the SGD
  // model (w<id> dirs; a replayed trigger recomputes the same step —
  // idempotent). Unlike ST23's delivery-0-pinned simplex, new strata
  // JOIN the state here (full-outer): a rate monitor exists precisely to
  // surface domains that start arriving mid-run.
  // ---------------------------------------------------------------------
  def runStreamingDecay(src: DataFrame, stratumCol: String,
                        decayNum: Long, decayDen: Long,
                        stateRoot: String, checkpointPath: String): Unit = {
    require(decayDen > 0 && decayNum >= 0 && decayNum < decayDen,
      s"need 0 <= decayNum < decayDen, got $decayNum/$decayDen")
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val counts = batch.groupBy(col(stratumCol))
            .agg(count(lit(1)).as("__n"))
          val next = sgdWeightVersions(stateRoot).filter(_ < id).sorted.lastOption match {
            case Some(v) =>
              spark.read.parquet(s"$stateRoot/w$v")
                .join(counts, Seq(stratumCol), "full_outer")
                .selectExpr(stratumCol,
                  s"coalesce(decayed, 0) * $decayNum div $decayDen" +
                    " + coalesce(__n, 0) AS decayed",
                  "coalesce(raw_total, 0) + coalesce(__n, 0) AS raw_total")
            case None =>
              counts.select(col(stratumCol), col("__n").as("decayed"),
                col("__n").as("raw_total"))
          }
          next.coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/w$id")
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def sgdWeightVersions(stateRoot: String): Seq[Long] =
    Option(new java.io.File(stateRoot).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("w"))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("w").toLong).toOption)
      .toSeq

  /** The newest committed model. */
  def sgdWeights(spark: SparkSession, stateRoot: String): DataFrame = {
    val vs = sgdWeightVersions(stateRoot)
    require(vs.nonEmpty,
      s"sgdWeights: no committed model under $stateRoot (drain first)")
    spark.read.parquet(s"$stateRoot/w${vs.max}")
  }

  /** Offline maintenance for the streamed codes store: drop every
    * superseded row (older deliveries of re-delivered ids — including
    * cross-cell stale rows, closing [[annIndexTopK]]'s probe contract)
    * while keeping each surviving row's ORIGINAL batch stamp.
    *
    * Crash-safety without a manifest, in three one-way steps:
    * 1. survivors (latest batch per id, via one id-keyed aggregation +
    *    one co-partitioned join — an offline job's two scans) are
    *    staged to a sibling directory: the live store is untouched;
    * 2. staged partitions dynamically overwrite their originals —
    *    every partition holding ≥1 survivor is rewritten to exactly
    *    its survivors under Spark's job-level commit;
    * 3. wholly-superseded batch/cell partition dirs (no survivors, so
    *    step 2 never touched them) and the staging dir are deleted.
    * A crash after any step leaves only EXTRA stale rows, never
    * missing ones — and stale rows are exactly what latest-wins reads
    * already resolve; re-running compaction converges. */
  def compactAnnIndex(spark: SparkSession, indexRoot: String): Unit = {
    require(Option(new java.io.File(indexRoot).listFiles())
        .exists(_.exists(_.getName.startsWith("batch="))),
      s"compactAnnIndex: no batch partitions under $indexRoot (drain first)")
    val staging = indexRoot + "__compact"
    val store = spark.read.parquet(indexRoot)
    val latest = store.groupBy(col("id")).agg(max(col("batch")).as("batch"))
    store.join(latest, Seq("id", "batch"))
      .write.mode("overwrite").partitionBy("batch", "cell").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "cell").parquet(indexRoot)
    val surviving = spark.read.parquet(staging)
      .select(col("batch"), col("cell")).distinct()
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
    }
    Option(new java.io.File(indexRoot).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("batch=")).foreach { bDir =>
        val b = bDir.getName.stripPrefix("batch=")
        Option(bDir.listFiles).getOrElse(Array.empty)
          .filter(_.getName.startsWith("cell=")).foreach { cDir =>
            if (!surviving((b, cDir.getName.stripPrefix("cell=")))) del(cDir)
          }
        if (Option(bDir.listFiles).forall(_.isEmpty)) del(bDir)
      }
    del(new java.io.File(staging))
  }
}

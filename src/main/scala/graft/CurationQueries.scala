package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text
import graft.operators.{Curation, Quality, Relational, Similarity}

/** Corpus-curation and time-series queries with DuckDB oracles:
  * duplicate-cluster resolution, benchmark decontamination,
  * deterministic stratified sampling, token-budget shard packing,
  * per-stratum quality tiers, and the as-of join.
  *
  * The duplicate-cluster oracle is an INDEPENDENT formulation
  * (recursive-CTE transitive closure) of what Spark computes by
  * iterated label propagation — a pass proves the algorithm, not just
  * that two copies of the same code agree.
  */
object CurationQueries {
  private type Q = (SparkSession, String) => DataFrame

  private[graft] val shingleN = 3          // must match ExtensionQueries.shingleCte
  private[graft] val decontamN = 5         // n-gram width for decontamination
  private[graft] val decontamMinShared = 3 // flag docs sharing >= this many n-grams
  private[graft] val benchMod = 25         // doc_id % benchMod == benchRem -> benchmark set
  private[graft] val benchRem = 7
  private val sampleSalt = "round5"
  private val curveFloor = 0.5             // loosest dedup cut for the curve
  private val curveBps = Seq(5000L, 7000L, 9000L)
  private[graft] val shardBudget = 2000L   // tokens per training shard
  private[graft] val packWindowTokens = 512L // tokens per training window
  private val nTiers = 4
  private val srcMinMeanQ = 0.68    // source gate: mean-quality floor...
  private val srcMinDocs = 5L       // ...and minimum corpus presence
  private val orderSalt = "ord18"   // training-order shuffle seed
  private val orderEpochs = 2
  private val orderShards = 16
  private val currEpochs = 4        // curriculum anneal: 0.55 -> 0.75
  private val currQ0 = 0.55
  private val currQ1 = 0.75
  private val srcCapK = 20          // per-domain cap: best-K docs kept
  private val clusterSplitSalt = "csplit6"
  private val orderE2eSalt = "orde2e" // terminal shard-order seed
  private val reweightRounds = 3      // MW domain-reweighting rounds
  private val reweightEtaDen = 2L     // eta = 1/2 in loss fixed-point
  private val lenBucketWidth = 32L    // token-length bucket (matches q_len_hist)
  private val lenBatchB = 8           // docs per training batch
  private val wfBudget = 40000L       // waterfill: token budget...
  private val wfMaxEpochs = 1         // ...under the no-repeat cap
  private val wfRounds = 3

  // =====================================================================
  // Spark queries
  // =====================================================================

  /** Duplicate-cluster resolution: near-dup PAIRS from the LSH-gated
    * jaccard stage -> transitive CLUSTERS via connected components, so
    * exactly one representative per template family survives even when
    * A~B and B~C but A~C was never scored. Every document gets a
    * component id (its cluster's minimum doc_id; singletons map to
    * themselves). */
  private val qDupComponents: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    Curation.connectedComponents(docs, "doc_id", pairs)
  }

  /** Triangle census of the near-dup graph: how clique-like the
    * template families are ([[graft.operators.Graph.triangleStats]]) —
    * a high clustering coefficient says connected components merge
    * genuine families; a low one says the transitive closure chains
    * through weak ties and the canonical-per-cluster step is lossy. */
  private val qGraphTriangles: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    val out = graft.operators.Graph.triangleStats(pairs, "id_a", "id_b")
    Similarity.release(pairs)
    out
  }

  /** 2-core of the near-dup graph: the documents sitting in CYCLES of
    * similarity — the hard kernel of each template family that
    * survives after chains of weak ties peel away
    * ([[graft.operators.Graph.kCore]]). The oracle unrolls six peel
    * rounds, comfortably past this graph's peeling depth (the same
    * fixed-unroll convergence contract as the k-means and GD oracles). */
  private val qKcore: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    val out = graft.operators.Graph.kCore(pairs, "id_a", "id_b", k = 2)
    Similarity.release(pairs)
    out
  }

  /** Split-leakage report: near-duplicate pairs (the exact LSH →
    * jaccard gate of q_sim_lsh_jaccard) that cross the deterministic
    * 90/5/5 split of q_split — a test document with a near-dup in
    * train inflates eval scores exactly like benchmark contamination
    * does, so this is the dedup-before-split go/no-go check. */
  private val qSplitLeakage: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    Curation.splitLeakage(pairs,
      docs.select(col("doc_id"), ScaleQueries.splitColumn.as("split")),
      "doc_id", "split")
  }

  /** Benchmark decontamination: training docs sharing >= 3 distinct
    * 5-grams with the (broadcast) benchmark slice are flagged with
    * their overlap count. */
  private val qDecontaminate: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val bench = docs.filter(col("doc_id") % benchMod === benchRem)
    val corpus = docs.filter(col("doc_id") % benchMod =!= benchRem)
    Curation.contaminationReport(corpus, bench, "doc_id", "text",
      decontamN, decontamMinShared)
  }

  /** Deterministic stratified sample: per-source keep rates in basis
    * points (even-numbered sources 3000bp = 30%, odd 1000bp = 10%),
    * gated by a salted content hash — reproducible across engines,
    * runs, and partitionings. */
  private val qStratSample: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val rates = spark.createDataFrame(
      (0 until 20).map(i => (s"src$i", if (i % 2 == 0) 3000L else 1000L)))
      .toDF("source", "rate_bp")
    Curation.stratifiedSample(docs, "source", col("doc_id"), rates, sampleSalt)
      .select(col("doc_id"), col("source"))
  }

  /** Token-budget shard packing: per-source exclusive running token
    * total in doc_id order, shard = total div 2000. */
  private val qShardPack: Q = (spark, dir) =>
    Curation.packShards(Tables.fanOut(Tables.documents(spark, dir)),
        "source", "doc_id", Text.tokenCount(col("text")), shardBudget)
      .select(col("doc_id"), col("source"), col("n_tok"), col("shard"))

  /** Context-window sequence packing: per-source 512-token training
    * windows with documents splitting across boundaries — the pack
    * manifest a loader assembles windows from (see
    * [[graft.operators.Curation.packWindows]]). */
  private val qPackWindows: Q = (spark, dir) =>
    Curation.packWindows(Tables.fanOut(Tables.documents(spark, dir)),
        "source", "doc_id", Text.tokenCount(col("text")), packWindowTokens)
      .select(col("source"), col("doc_id"), col("n_tok"), col("window"),
        col("doc_tok_start"), col("win_tok_start"), col("seg_tokens"))

  /** Per-source quality quartiles (equal-depth, deterministic ties). */
  private val qQualityTiers: Q = (spark, dir) =>
    Curation.qualityTiers(
        Tables.fanOut(Tables.documents(spark, dir))
          .select(col("doc_id"), col("source"),
            Text.qualityScore(col("text")).as("q")),
        "source", "doc_id", col("q"), nTiers)
      .select(col("doc_id"), col("source"), col("q"),
        col("tier").cast(LongType).as("tier"))

  /** Source-level gate: keep only documents from sources whose mean
    * quality clears 0.68 and that carry at least 5 docs — the
    * domain-blocklist move, derived from the data instead of a list. */
  private val qSourceFilter: Q = (spark, dir) =>
    Curation.sourceFilter(
      Tables.fanOut(Tables.documents(spark, dir))
        .select(col("doc_id"), col("source"),
          Text.qualityScore(col("text")).as("q")),
      "source", col("q"), srcMinMeanQ, srcMinDocs)

  /** Per-source Wilson ranking: lower 95% bound of the quality-gate
    * pass rate per source — the trust metric that keeps a tiny source
    * at a perfect raw rate from outranking a large one
    * ([[Curation.sourceWilson]]). Pass = quality score above the
    * corpus-typical cut. */
  private val qSourceWilson: Q = (spark, dir) =>
    Curation.sourceWilson(
      Tables.fanOut(Tables.documents(spark, dir))
        .select(col("source"), Text.qualityScore(col("text")).as("q")),
      "source", col("q") >= 0.5)

  /** Per-source go/no-go scorecard: mean quality, benchmark
    * contamination, exact-dup rate, and token-length PSI vs the
    * corpus-wide distribution, one row per source — the report a
    * curator reads before a training run. Corpus = the non-benchmark
    * slice (the docs that would actually be trained on). */
  private val qSourceScorecard: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    Quality.sourceScorecard(
      docs.filter(col("doc_id") % benchMod =!= benchRem),
      "doc_id", "source", "text",
      Text.qualityScore(col("text")), Text.tokenCount(col("text")),
      docs.filter(col("doc_id") % benchMod === benchRem),
      decontamN, decontamMinShared)
  }

  /** Near-dup cluster-size histogram: how big the template families
    * are — the dedup audit a curator reads to distinguish a corpus of
    * singletons from one dominated by a few giant boilerplate clusters
    * (and to sanity-check the bucket caps aren't splitting real
    * clusters). Reuses the connected-components relation; two bounded
    * aggregations on top. */
  private val qDupSizeHist: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    Curation.connectedComponents(docs, "doc_id", pairs)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
  }

  /** Dedup threshold-sensitivity curve: pair and affected-document
    * counts at jaccard cuts 0.50/0.70/0.90 from ONE pair materialization
    * (computed at the loosest cut) — the tune-the-threshold sweep
    * without a full LSH chain per candidate value, the q_recall_curve
    * move applied to dedup. Thresholds ride integer basis points so the
    * report is engine-exact. */
  private val qDedupThresholdCurve: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, threshold = curveFloor)
    val th = spark.range(1).select(
      explode(array(curveBps.map(lit): _*)).as("bp"))
    val pp = broadcast(th).join(pairs, col("jaccard") >= col("bp") / 10000.0)
    val np = pp.groupBy(col("bp")).agg(count(lit(1)).as("n_pairs"))
    val nd = pp.select(col("bp"), explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
      .groupBy(col("bp")).agg(count(lit(1)).as("n_docs"))
    np.join(nd, Seq("bp"))
      .select(col("bp").as("threshold_bp"), col("n_pairs"), col("n_docs"))
  }

  /** ST13 — incremental source scorecard: the corpus arrives in three
    * out-of-order micro-batch deliveries (doc_id residues 2, 0, 1);
    * cross-trigger state is the mergeable integer accumulators plus the
    * distinct content-hash set. The drained snapshot must equal the
    * BATCH scorecard over everything delivered — the oracle is
    * literally q_source_scorecard's. Delivery order cannot matter: every
    * merge is a commutative integer sum or a set union. */
  private val qSt13IncrScorecard: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val corpus = docs.filter(col("doc_id") % benchMod =!= benchRem)
    val bench = docs.filter(col("doc_id") % benchMod === benchRem)
    val benchSh = Similarity.shingles(bench, "doc_id", "text", decontamN)
      .select(col("shingle")).distinct()
    val in = graft.io.TempDirs.registered("graft-q-st13-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st13-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st13-ckpt").toString
    Seq(2L, 0L, 1L).foreach { r =>
      corpus.filter(pmod(col("doc_id"), lit(3L)) === r)
        .coalesce(1).write.mode("append").parquet(in)
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, corpus.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runIncrementalScorecard(src, "doc_id", "source",
      "text", Text.qualityScore(col("text")), Text.tokenCount(col("text")),
      benchSh, decontamN, decontamMinShared, bucketTokens = 32, nBuckets = 20,
      stateRoot = state, checkpointPath = ckpt)
    graft.streaming.Streaming.scorecardSnapshot(spark, state, "source", nBuckets = 20)
  }

  /** ST23 — streaming mixture control: three deliveries (doc_id % 3 =
    * 0, 1, 2, mtime-pinned order), each advancing the mixture-weight
    * simplex by one multiplicative-weights step from the per-source
    * excess loss measured on THAT batch — adaptive data mixing while
    * training runs ([[graft.streaming.Streaming.runStreamingReweight]]).
    * The drained weights must equal the batch replay: the oracle
    * re-derives the uniform seed and all three MW rounds in SQL. */
  private val qSt23StreamReweight: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("text"))
    val in = graft.io.TempDirs.registered("graft-q-st23-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st23-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st23-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(0L, 1L, 2L).zipWithIndex.foreach { case (r, s) =>
      docs.filter(pmod(col("doc_id"), lit(3L)) === r)
        .coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, docs.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingReweight(src, "source",
      floor(Text.qualityScore(col("text")) * 10000.0 + 0.5),
      reweightEtaDen, 10000L, state, ckpt)
    graft.streaming.Streaming.sgdWeights(spark, state)
  }

  /** As-of join: every purchase event picks the latest strictly-prior
    * click of the same user (null payload when no click precedes). */
  private val qAsofJoin: Q = (spark, dir) => {
    val ev = Tables.fanOut(Tables.events(spark, dir))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    Relational.asofJoin(purchases, clicks, Seq("user_id"), "ts",
        payload = Seq("click_id", "click_value"), tiebreak = "click_id")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("purchase_value"), col("click_id"), col("click_value"))
  }

  /** PII redaction over deterministically synthesized contact lines
    * (the corpus itself is PII-free, so each doc gets an email, a
    * phone, and an SSN appended — the redaction must scrub exactly
    * those and leave the prefix intact). */
  private val qTRedact: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"),
        Text.redactPii(concat(
          substring(col("text"), 1, 40),
          lit(" reach me at "), col("source"), lit("@example.com or (973) 555-"),
          lpad((col("doc_id") % 10000).cast(StringType), 4, "0"),
          lit(" ssn 123-45-6789"))).as("redacted"))

  /** One-pass column profile of the orders table. */
  private val qProfile: Q = (spark, dir) =>
    Curation.columnProfile(Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_totalprice"))

  /** Bucketed co-located join — the demonstration that the "bucket big
    * joins" scale claim actually executes shuffle-free: both sides are
    * written bucketed by the join key into the session catalog, and the
    * merge-hinted join plans with NO Exchange between the scans and the
    * join (BucketedJoinSpec pins that property). Sums aggregate in
    * DECIMAL so the result is addition-order-independent and
    * hash-comparable across engines. At 100 TB this is the layout for
    * repeated joins on a stable key: pay the bucketed write once, skip
    * the fact-table shuffle on every subsequent join. */
  private val qJBucketed: Q = (spark, dir) => {
    val buckets = 8
    // A fresh session's in-memory catalog forgets managed tables but their
    // warehouse directories survive — drop both the entry AND the location
    // or the next session's overwrite fails with LOCATION_ALREADY_EXISTS.
    Seq("graft_bkt_orders", "graft_bkt_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("o_price"))
      .write.mode("overwrite").bucketBy(buckets, "o_custkey")
      .saveAsTable("graft_bkt_orders")
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").bucketBy(buckets, "c_custkey")
      .saveAsTable("graft_bkt_customer")
    spark.table("graft_bkt_orders")
      .join(spark.table("graft_bkt_customer").hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        // Spark widens sum(DECIMAL(18,2)) to (28,2), DuckDB to (38,2):
        // byte-identical values, different hash class at the driver.
        // Emit the proven double convention instead (WarehouseQueries).
        round(sum(col("o_price")).cast(DoubleType), 2).as("revenue"))
  }

  /** Aggregate-reuse over the SAME saved bucketed layout as
    * [[qJBucketed]]: a groupBy on the bucket key consumes the bucketed
    * scan's hash clustering directly — zero Exchange, pinned in
    * BucketedJoinSpec. Together the pair proves the one-time bucketed
    * write pays off for BOTH workload shapes a stable key carries at
    * 100 TB: co-located joins and shuffle-free aggregations. */
  private val qJBucketedAgg: Q = (spark, dir) => {
    val buckets = 8
    val t = "graft_bkt_orders_agg"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("o_price"))
      .write.mode("overwrite").bucketBy(buckets, "o_custkey")
      .saveAsTable(t)
    spark.table(t)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_price")).cast(DoubleType), 2).as("revenue"))
  }

  /** Sessionization: 30-minute inactivity gap splits each user's event
    * stream; session ids are running break counts in (ts, event_id)
    * order. */
  private val qSessionize: Q = (spark, dir) =>
    Relational.sessionize(Tables.fanOut(Tables.events(spark, dir)),
        Seq("user_id"), "ts", gapSeconds = 1800L, tiebreak = "event_id")
      .select(col("event_id"), col("user_id"), col("ts"), col("session_id"))

  /** SCD2 state timeline: each user's event_type stream collapsed into
    * type-2 validity intervals — consecutive same-state events merge
    * into one [valid_from, valid_to) run, the open run is current. The
    * history-preserving counterpart of the keep-last merge (SCD1). */
  private val qScd2Timeline: Q = (spark, dir) =>
    Relational.scd2Timeline(Tables.fanOut(Tables.events(spark, dir)),
        Seq("user_id"), stateCol = "event_type", timeCol = "ts",
        tiebreak = "event_id")
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"), col("is_current"))

  /** ST16 — streaming SCD2: three per-key time-ordered deliveries
    * (ts-tercile split; equal timestamps co-deliver because the split
    * cuts on the ts value itself) drain through the open-run
    * maintainer. Runs continue, close, and open ACROSS triggers, yet
    * the drained snapshot must equal the batch scd2Timeline over all
    * deliveries — the oracle replays exactly that, so the query proves
    * the incremental maintenance emits each interval exactly once. */
  private val qSt16StreamScd2: Q = (spark, dir) => {
    val ev = Tables.fanOut(Tables.events(spark, dir))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val in = graft.io.TempDirs.registered("graft-q-st16-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st16-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st16-ckpt").toString
    val tsl = expr(
      "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    val Array(a, b) = ev.select(tsl.as("tsl")).stat
      .approxQuantile("tsl", Array(1.0 / 3, 2.0 / 3), 0.0)
    val seen = scala.collection.mutable.Set[String]()
    Seq(tsl <= a, tsl > a && tsl <= b, tsl > b).zipWithIndex.foreach {
      case (pred, s) =>
        ev.filter(pred).coalesce(1).write.mode("append").parquet(in)
        // pin strictly increasing mtimes per delivery (FileStreamSource
        // orders by modification time)
        new java.io.File(in).listFiles().foreach { f =>
          if (!seen.contains(f.getName)) {
            if (f.getName.startsWith("part-"))
              f.setLastModified(1700000000000L + s * 60000L)
            seen += f.getName
          }
        }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, ev.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingScd2(src, Seq("user_id"),
      "event_type", "ts", "event_id", state, ckpt)
    graft.streaming.Streaming.scd2Snapshot(spark, state)
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"), col("is_current"))
  }

  /** Late-data quarantine witness for the streaming SCD2 maintainer:
    * tranche by event_id — DELIBERATELY not time-ordered, so later
    * tranches carry rows older than their key's open run (the
    * re-scrape overlap shape). Those rows must land in the quarantine
    * store with the open run's valid_from they collided with, and
    * nothing else. The oracle replays the two gated triggers
    * sequentially in SQL: open-run state after each prefix via the
    * same change-point window, late set = next tranche's rows older
    * than their key's open run, state update over pseudo-rows ∪ the
    * surviving rows — the exact maintainer recurrence, unrolled. */
  private val qSt18LateQuarantine: Q = (spark, dir) => {
    val ev = Tables.fanOut(Tables.events(spark, dir))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val in = graft.io.TempDirs.registered("graft-q-st18-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st18-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st18-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    (0 until 3).foreach { s =>
      ev.filter(pmod(col("event_id"), lit(3L)) === s.toLong)
        .coalesce(1).write.mode("append").parquet(in)
      // pin strictly increasing mtimes per delivery (FileStreamSource
      // orders by modification time)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, ev.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingScd2(src, Seq("user_id"),
      "event_type", "ts", "event_id", state, ckpt)
    graft.streaming.Streaming.scd2Quarantine(spark, state)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("__open_from").as("open_from"))
  }

  /** ST22 — streaming sessionization: three ts-tercile deliveries (the
    * q_st16 time-ordered shape) drain through the event-time-timeout
    * sessionizer, then two far-future single-row sentinel deliveries
    * push the watermark past every real session's gap so the timeout
    * path — not just the new-event-beyond-gap path — demonstrably
    * emits (sessions spanning tercile boundaries close via gap breaks;
    * idle tails close via timeout). All five files ride ONE drain at
    * maxFilesPerTrigger=1: the watermark a sentinel batch establishes
    * applies from the NEXT trigger, so sentinel A arms and sentinel B
    * fires. Sentinel users are negative ids, filtered from the result;
    * their own sessions never close, which is the point — open state
    * is not emitted, only proven-complete sessions are. The oracle is
    * the batch gap-replay (strict >= gap break, [first, last+gap)
    * windows) over exactly the real events. */
  private val qSt22StreamSessionize: Q = (spark, dir) => {
    val ev = Tables.fanOut(Tables.events(spark, dir))
      .select(col("user_id"), col("ts"))
    val in = graft.io.TempDirs.registered("graft-q-st22-in").toString
    val out = graft.io.TempDirs.registered("graft-q-st22-out").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st22-ckpt").toString
    val tsl = expr(
      "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    val Array(a, b) = ev.select(tsl.as("tsl")).stat
      .approxQuantile("tsl", Array(1.0 / 3, 2.0 / 3), 0.0)
    val far = ev.agg(max(col("ts"))).head.getAs[java.time.LocalDateTime](0)
    val deliveries: Seq[DataFrame] = Seq(
      ev.filter(tsl <= a), ev.filter(tsl > a && tsl <= b), ev.filter(tsl > b),
      spark.range(1).select(lit(-1L).as("user_id"),
        lit(far.plusDays(1)).as("ts")),
      spark.range(1).select(lit(-2L).as("user_id"),
        lit(far.plusDays(2)).as("ts")))
    val seen = scala.collection.mutable.Set[String]()
    deliveries.zipWithIndex.foreach { case (d, s) =>
      d.coalesce(1).write.mode("append").parquet(in)
      // pin strictly increasing mtimes per delivery (FileStreamSource
      // orders by modification time)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, ev.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingSessionize(src, "user_id", "ts",
      gapMs = 30L * 60 * 1000, watermarkDelay = "0 seconds", out, ckpt)
    spark.read.parquet(out)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
  }

  /** Event-type pivot: one row per user, one count column per type.
    * Explicit pivot values keep the plan a single pass (no distinct-
    * values pre-query); absent cells coalesce to 0 to match COUNT
    * semantics. */
  private val qPivotEvents: Q = (spark, dir) => {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val pivoted = Tables.fanOut(Tables.events(spark, dir))
      .groupBy(col("user_id")).pivot("event_type", types).count()
    types.foldLeft(pivoted)((d, t) =>
      d.withColumn(t, coalesce(col(t), lit(0L))))
  }

  /** Unpivot (pandas melt) — the pivot's inverse: lineitem's measure
    * columns to long (id, metric, val) form via the native `unpivot`
    * operator. Plans as a pure map-side Expand: each row emits one
    * output row per metric with NO shuffle and no per-metric re-scan,
    * so the reshape costs exactly one pass at any scale. */
  private val qUnpivotMeasures: Q = (spark, dir) =>
    Tables.fanOut(Tables.lineitem(spark, dir))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "val")

  /** 7-day rolling average purchase value per user. The window sums
    * integer CENTS (exact, addition-order independent — engines disagree
    * on float summation order inside sliding frames) and divides at the
    * end. Range frame over epoch seconds so both engines bound the
    * window identically. */
  private val qRollingAvg: Q = (spark, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__sec"))
      .rangeBetween(-7L * 86400L, 0L)
    val ev = Tables.fanOut(Tables.events(spark, dir))
      .filter(col("event_type") === "purchase")
    ev
      .withColumn("__sec", Relational.epochSeconds(ev, "ts"))
      .withColumn("__cents", round(col("value") * 100).cast(LongType))
      .withColumn("avg_7d",
        round(sum(col("__cents")).over(w) / lit(100.0) / count(lit(1)).over(w), 4))
      .select(col("event_id"), col("user_id"), col("ts"), col("avg_7d"))
  }

  /** 15-minute-grid resample + forward fill over the events stream —
    * the pandas `resample().sum().ffill()` idiom with the dense grid
    * constructed distributively ([[graft.operators.TimeSeries]]):
    * half the buckets at this rate are genuine gaps, so the ffill
    * path is exercised, not decorative. */
  private val qTsGapfill: Q = (spark, dir) =>
    graft.operators.TimeSeries.resampleFfill(
      Tables.fanOut(Tables.events(spark, dir)),
      "event_type", "ts", "value", stepSeconds = 900L)
      .select(col("event_type"),
        date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").as("bucket_str"),
        col("n_events"), col("v_sum"), col("v_ffill"))

  /** Native session_window aggregation — Spark's built-in session
    * operator (streaming-capable: the same expression works under
    * withWatermark in a stream). Semantics differ from [[qSessionize]]
    * at the boundary: windows are [ts, ts+gap) in raw MICROSECONDS, so
    * an event exactly gap after its predecessor starts a NEW session
    * (diff >= gap breaks), while the gap-sessionizer breaks only on
    * diff > gap in whole seconds. The oracle mirrors with interval
    * arithmetic on raw timestamps, not second diffs. */
  private val qSessionWindow: Q = (spark, dir) =>
    Tables.fanOut(Tables.events(spark, dir))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Per-key top-k via the typed Aggregator UDAF: map-side partial
    * k-buffers shrink each key to <= k rows BEFORE the exchange — the
    * row_number window (the oracle's formulation) would shuffle and
    * sort every row. Top-2 orders per customer by price. */
  private val qTopkUdaf: Q = (spark, dir) =>
    graft.operators.TopK.topKPerKey(
      Tables.fanOut(Tables.orders(spark, dir)),
      Seq("o_custkey"), "o_orderkey", "o_totalprice", k = 2)

  /** Custom keyed streaming state (flatMapGroupsWithState): per-key
    * running (count, sum) through the state store, drained one landing
    * file per micro-batch so the second trigger MUST continue from
    * checkpointed state — the final totals (max over the monotone
    * emissions) equal the batch aggregation over everything delivered,
    * which is the oracle. */
  private val qStRunningState: Q = (spark, dir) => {
    def syn(src: DataFrame): DataFrame = src.select(
      (col("o_custkey") % 50).cast(StringType).as("dkey"),
      floor(col("o_totalprice")).cast(LongType).as("amt"))
    val in = graft.io.TempDirs.registered("graft-q-strs-in").toString
    val out = graft.io.TempDirs.registered("graft-q-strs-out").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-strs-ckpt").toString
    val o = Tables.orders(spark, dir)
    val d1 = syn(o)
    d1.coalesce(1).write.mode("append").parquet(in)
    syn(o.filter(col("o_orderkey") % 4 === 0)).coalesce(1).write.mode("append").parquet(in)
    val src = graft.streaming.Streaming.parquetSource(spark, in, d1.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runRunningTotals(src, out, ckpt)
    spark.read.parquet(out).groupBy(col("dkey"))
      .agg(max(col("n")).as("n"), max(col("total")).as("total"))
  }

  /** Bucketized range join: orders whose price falls in a customer's
    * [acctbal, acctbal+500) window. The oracle states the raw
    * inequality join; the Spark plan is the bucket equi-join (one hash
    * shuffle) — never a BroadcastNestedLoop. */
  private val qRangeJoin: Q = (spark, dir) => {
    val intervals = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal").as("lo"),
        (col("c_acctbal") + 500.0).as("hi"))
    Relational.rangeJoin(
        Tables.fanOut(Tables.orders(spark, dir))
          .select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", intervals, "lo", "hi", bucketWidth = 500.0)
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Mixture sampling: even-numbered sources target 2000 tokens, odd
    * 500 — each stratum is hash-gated down to min(1, target/available)
    * in basis points. */
  private val qMixSample: Q = (spark, dir) => {
    val targets = spark.createDataFrame(
      (0 until 20).map(i => (s"src$i", if (i % 2 == 0) 2000L else 500L)))
      .toDF("source", "target_tokens")
    Curation.mixtureSample(Tables.fanOut(Tables.documents(spark, dir)),
        "source", col("doc_id"), Text.tokenCount(col("text")), targets, "mix5")
      .select(col("doc_id"), col("source"))
  }

  /** Temperature-scaled mixture plan: per-source sqrt-weighted (tau=0.5)
    * basis-point weights, largest-remainder normalized, over a 1M-token
    * budget — the multilingual temperature-sampling rule as a table. */
  private val qTempMixture: Q = (spark, dir) =>
    Curation.temperatureTargets(Tables.fanOut(Tables.documents(spark, dir)),
      "source", Text.tokenCount(col("text")), 0.5, 1000000L)

  /** Terminal-stage E2E — the pipeline AFTER curation selects a corpus,
    * ending where the training loader takes over: deterministic 90/5/5
    * split → temperature-scaled mixture targets over the TRAIN slice
    * (tau = 0.5, 1M-token budget) → epochized up-sampling (every copy
    * tagged with its epoch) → context-window packing of the epochized
    * stream, per source, in (epoch, doc) order. The pack id packs
    * (epoch, doc_id) into one long (doc_id < 2^40) so windows fill
    * epoch-by-epoch — the order a multi-epoch run consumes data.
    * Composition cost on top of the proven stages: one broadcast of
    * the |sources|-row plan; the corpus shuffles exactly once (the
    * per-source pack window). Output = the full window-pack manifest. */
  private val qMixtureE2e: Q = (spark, dir) => {
    val packB = 1L << 40
    val train = Tables.fanOut(Tables.documents(spark, dir))
      .filter(ScaleQueries.splitColumn === "train")
      .select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).as("toks"))
    val targets = Curation.temperatureTargets(train, "source", col("toks"),
        0.5, 1000000L)
      .select("source", "target_tokens")
    val epoched = Curation.epochize(train, "source", col("doc_id"),
        col("toks"), targets, "mixe2e")
      .withColumn("pack_id", col("epoch") * lit(packB) + col("doc_id"))
    Curation.packWindows(epoched, "source", "pack_id", col("toks"),
        packWindowTokens)
      .select(col("source"),
        expr(s"pack_id div ${packB}L").as("epoch"),
        pmod(col("pack_id"), lit(packB)).as("doc_id"),
        col("n_tok"), col("window"),
        col("doc_tok_start"), col("win_tok_start"), col("seg_tokens"))
  }

  /** Cross-source near-dup matrix: for every unordered SOURCE pair, the
    * count and strength of near-duplicate pairs straddling them — the
    * provenance-contamination map that shows which domains mirror each
    * other's content (same-source dups are expected and excluded; a hot
    * cross-source cell means one crawl re-hosts another). Pure reuse of
    * [[Curation.splitLeakage]] keyed on `source` instead of the split. */
  private val qDupMatrix: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    Curation.splitLeakage(pairs,
        docs.select(col("doc_id"), col("source")), "doc_id", "source")
      .select(col("split_lo").as("source_lo"), col("split_hi").as("source_hi"),
        col("n_pairs"), col("max_sim"), col("mean_sim"))
  }

  /** Train→val n-gram coverage: the fraction of each source's distinct
    * validation 3-grams that also occur anywhere in the train split —
    * the generalization-gap data metric (coverage near 10000 bp means
    * val mostly re-tests memorized surface forms; low coverage means a
    * genuinely novel eval slice). One gram-keyed join between two
    * distinct-gram relations; coverage lands as an integer bp ratio. */
  private val qNgramCoverage: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .withColumn("split", ScaleQueries.splitColumn)
    val trainG = Similarity.shingles(docs.filter(col("split") === "train"),
        "doc_id", "text", shingleN)
      .select(col("shingle")).distinct()
    val valG = Similarity.shingles(docs.filter(col("split") === "val"),
        "doc_id", "text", shingleN)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("shingle")).distinct()
    valG.join(trainG.withColumn("__hit", lit(1L)), Seq("shingle"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_val_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_covered"))
      .withColumn("coverage_bp", expr("n_covered * 10000 div n_val_grams"))
  }

  /** Waterfill mixture solve: τ=0.5 temperature targets under the
    * no-repeat cap (target ≤ available) — small sources cap at their
    * availability and the surplus redistributes to sources with
    * headroom across 3 rounds ([[Curation.waterfillTargets]]). */
  private val qMixSolve: Q = (spark, dir) =>
    Curation.waterfillTargets(Tables.fanOut(Tables.documents(spark, dir)),
      "source", Text.tokenCount(col("text")), 0.5, wfBudget, wfMaxEpochs,
      wfRounds)

  /** Length-bucketed batching: fixed-size training batches formed
    * within 32-token length buckets, with the per-batch padding report
    * ([[Curation.lenBatches]]) — each member pads only to its own
    * batch max, the dynamic-batching alternative to padding every
    * batch to a global context length. */
  private val qLenBatching: Q = (spark, dir) =>
    Curation.lenBatches(Tables.fanOut(Tables.documents(spark, dir)),
      "doc_id", Text.tokenCount(col("text")), lenBucketWidth, lenBatchB)

  /** Packing-efficiency report: per-source window count, packed tokens,
    * padding waste, and fill rate (bp), aggregated from the ACTUAL pack
    * manifest ([[Curation.packWindows]] output). The oracle is an
    * INDEPENDENT closed form — sequential packing pads only each
    * source's tail window, so n_windows = ⌈T/L⌉ and pad = n_windows·L −
    * T from token totals alone; agreement proves the manifest conserves
    * every token and splits exactly at window boundaries. */
  private val qPackStats: Q = (spark, dir) => {
    val L = packWindowTokens
    Curation.packWindows(Tables.fanOut(Tables.documents(spark, dir)),
        "source", "doc_id", Text.tokenCount(col("text")), L)
      .groupBy(col("source"), col("window"))
      .agg(sum(col("seg_tokens")).as("__fill"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("__fill")).as("n_tokens"),
        (count(lit(1)) * L - sum(col("__fill"))).as("pad_tokens"),
        expr(s"sum(__fill) * 10000 div (count(1) * $L)").as("fill_bp"))
  }

  /** DoReMi-flavored domain reweighting: per-source excess loss (1 −
    * mean quality, ×1e4 integers) drives 3 multiplicative-weights
    * rounds from uniform — persistently lossy domains gain training
    * weight, the data-mixing counterpart of temperature scaling
    * ([[Curation.reweightMixture]]; pure integer MW, no exp/ln). */
  private val qDomainReweight: Q = (spark, dir) => {
    val losses = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("source"),
        floor(Text.qualityScore(col("text")) * 10000.0 + 0.5)
          .cast(LongType).as("__qq"))
      .groupBy(col("source"))
      .agg((lit(10000L)
        - floor(sum(col("__qq")).cast(DoubleType) / count(lit(1)) + 0.5)
            .cast(LongType)).as("loss_u"))
    Curation.reweightMixture(losses, "source", col("loss_u"),
      reweightRounds, reweightEtaDen, 10000L)
  }

  /** The data product's LAST mile: the mixture E2E's packed training
    * windows, shuffled into physically ordered shards. The loader's unit
    * is the (source, window) pair; each unit gets a seeded md5 key, a
    * shard, and a dense position — what a shard writer materializes as
    * files. Composes two proven chains ([[qMixtureE2e]],
    * [[Curation.trainOrder]]); the oracle composes their proven SQL the
    * same way. The units relation is |windows| ≈ corpus-tokens/512 ≪
    * corpus, so the distinct + order exchanges move window STUBS, never
    * documents. */
  private val qOrderE2e: Q = (spark, dir) => {
    val units = qMixtureE2e(spark, dir)
      .select(concat_ws(":", col("source"), col("window")).as("unit"))
      .distinct()
    Curation.trainOrder(units, "unit", orderE2eSalt, 1, orderShards)
      .select(col("unit"), col("epoch"), col("shard"), col("pos"))
  }

  /** Epochized materialization: even sources target 8000 tokens (>
    * available, so docs repeat across ~5 epochs), odd 500 (a fractional
    * epoch — only hash-gated rows survive). One row per (doc, epoch). */
  private val qEpochize: Q = (spark, dir) => {
    val targets = spark.createDataFrame(
      (0 until 20).map(i => (s"src$i", if (i % 2 == 0) 8000L else 500L)))
      .toDF("source", "target_tokens")
    Curation.epochize(Tables.fanOut(Tables.documents(spark, dir)),
        "source", col("doc_id"), Text.tokenCount(col("text")), targets, "ep7")
      .select(col("doc_id"), col("source"), col("epoch"))
  }

  /** Context-window chunking: 8-token chunks, 4-token overlap, one row
    * per chunk (md5 + length pin the exact chunk text). */
  private val qTChunk: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"),
        posexplode(Text.chunkTokens(col("text"), 8, 4)).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
        md5(col("chunk")).as("chunk_md5"),
        length(col("chunk")).cast(LongType).as("chunk_len"))

  /** The dedup endgame: near-dup pairs → transitive clusters → keep the
    * HIGHEST-QUALITY member of each cluster (not the lowest id — the
    * curation-correct canonical choice). Output one row per cluster
    * with its representative, quality, and member count. */
  private val qDupCanonical: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    val comp = Curation.connectedComponents(docs, "doc_id", pairs)
    val scored = docs.select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
    val joined = scored.join(comp, "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(col("q").desc, col("doc_id").asc)
    val keep = joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val counts = comp.groupBy(col("component")).agg(count(lit(1)).as("n_members"))
    keep.join(counts, "component")
      .select(col("component"), col("doc_id"), col("q"), col("n_members"))
  }

  /** ST9 — stream-stream inner join through the real engine: purchase
    * and click streams (separate landing dirs, separate watermarks)
    * joined per user on an event-time range (click within the hour
    * before the purchase). State on each side is watermark-bounded;
    * for an inner join every match emits during the drain, so the
    * result equals the batch range join over the same rows — the
    * oracle. */
  private val qStStreamJoin: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    // watermarks require TIMESTAMP (not NTZ); the session runs UTC, so
    // the cast preserves the wall clock and only ids leave the stream
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").cast("timestamp").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").cast("timestamp").as("c_ts"))
    val pIn = graft.io.TempDirs.registered("graft-q-st9-p").toString
    val cIn = graft.io.TempDirs.registered("graft-q-st9-c").toString
    val out = graft.io.TempDirs.registered("graft-q-st9-out").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st9-ckpt").toString
    purchases.coalesce(1).write.mode("overwrite").parquet(pIn)
    clicks.coalesce(1).write.mode("overwrite").parquet(cIn)
    val pSrc = graft.streaming.Streaming.parquetSource(spark, pIn, purchases.schema, 1)
    val cSrc = graft.streaming.Streaming.parquetSource(spark, cIn, clicks.schema, 1)
    graft.streaming.Streaming.runStreamStreamJoin(
      pSrc, cSrc,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"),
      "2 hours", "p_ts", "c_ts", out, ckpt)
    spark.read.parquet(out)
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"))
  }

  /** ST20 — stream-stream LEFT OUTER join: purchases joined to the
    * clicks that preceded them within an hour, where a purchase with NO
    * qualifying click must still emit, null-padded — and the engine may
    * emit that null only once the GLOBAL watermark proves no matching
    * click can ever arrive. The harness advances the watermark past all
    * real rows with far-future sentinel deliveries (negative keys,
    * which can never join real rows) and drains twice — the watermark
    * lags one trigger, so the flush lands in the second drain; a live
    * stream gets both for free from ongoing data. Oracle is the plain
    * batch LEFT JOIN over the real rows. */
  private val qStStreamOuterJoin: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").cast("timestamp").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").cast("timestamp").as("c_ts"))
    val pIn = graft.io.TempDirs.registered("graft-q-st20-p").toString
    val cIn = graft.io.TempDirs.registered("graft-q-st20-c").toString
    val out = graft.io.TempDirs.registered("graft-q-st20-out").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st20-ckpt").toString
    def sentinel(df: DataFrame, key: Long, plusDays: Int): DataFrame = {
      val far = ev.agg(max(col("ts")).cast("timestamp")).head.getTimestamp(0)
      val cols = df.columns
      df.sparkSession.range(1).select(
        lit(key).as(cols(0)), lit(key).as(cols(1)),
        (lit(far) + expr(s"INTERVAL $plusDays DAYS")).as(cols(2)))
    }
    // delivery 1: all real rows; delivery 2: watermark-pushing sentinels
    purchases.coalesce(1).write.mode("append").parquet(pIn)
    clicks.coalesce(1).write.mode("append").parquet(cIn)
    Seq(pIn, cIn).foreach(d => new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("part-")).foreach(_.setLastModified(1700000000000L)))
    sentinel(purchases, -1L, 1).coalesce(1).write.mode("append").parquet(pIn)
    sentinel(clicks, -1L, 1).coalesce(1).write.mode("append").parquet(cIn)
    Seq(pIn, cIn).foreach(d => new java.io.File(d).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.lastModified > 1700000000000L)
      .foreach(_.setLastModified(1700000060000L)))
    // both delivery files fit one trigger: the null flush needs only the
    // across-DRAIN watermark lag, not per-file triggers
    def drain(): Unit = graft.streaming.Streaming.runStreamStreamJoin(
      graft.streaming.Streaming.parquetSource(spark, pIn, purchases.schema,
        maxFilesPerTrigger = 2),
      graft.streaming.Streaming.parquetSource(spark, cIn, clicks.schema,
        maxFilesPerTrigger = 2),
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"),
      "2 hours", "p_ts", "c_ts", out, ckpt, joinType = "left_outer")
    drain()
    // second sentinel wave + drain: the watermark from wave 1 applies to
    // these triggers and flushes every pending null-padded purchase
    sentinel(purchases, -2L, 2).coalesce(1).write.mode("append").parquet(pIn)
    sentinel(clicks, -2L, 2).coalesce(1).write.mode("append").parquet(cIn)
    Seq(pIn, cIn).foreach(d => new java.io.File(d).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.lastModified > 1700000060000L)
      .foreach(_.setLastModified(1700000120000L)))
    drain()
    spark.read.parquet(out)
      .filter(col("p_user") >= 0)
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"))
  }

  /** Exact-count sample: exactly 5 docs per source by salted-hash
    * order (eval-set construction; binomial gates can't hit quotas). */
  private val qExactSample: Q = (spark, dir) =>
    Curation.exactSample(Tables.fanOut(Tables.documents(spark, dir)),
        "source", col("doc_id"), n = 5, salt = "ex5")
      .select(col("doc_id"), col("source"))

  /** Merge-upsert (incremental refresh): a delta batch overlays the
    * snapshot, latest version per key wins, pure inserts pass through —
    * dedup-keep-last over a union, the set-based MERGE. The snapshot is
    * the orders table; the delta re-prices every 10th order (version 2)
    * and inserts new keys above the max. */
  private val qMergeUpsert: Q = (spark, dir) => {
    val snap = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        lit(1L).as("version"))
    val delta = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("k"), (col("o_totalprice") * 2).as("price"),
        lit(2L).as("version"))
      .unionByName(
        Tables.orders(spark, dir).filter(col("o_orderkey") % 1000 === 1)
          .select((col("o_orderkey") + 10000000L).as("k"),
            col("o_totalprice").as("price"), lit(2L).as("version")))
    Relational.dedupKeepLast(snap.unionByName(delta), Seq("k"), col("version"))
  }

  /** The flagship end-to-end corpus-preparation pipeline: near-dup
    * clusters keep their highest-quality member → language + quality
    * gate → 64-token context-window chunking → token-budget shard
    * packing. Every stage is an operator proven separately; this query
    * proves the composition under ONE oracle. Plan shape: the LSH/CC
    * stage is the only iterative part; gating and chunking are fused
    * projections over the join, and packing is one window per source. */
  private val qPrepareCorpus: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    val comp = Curation.connectedComponents(docs, "doc_id", pairs)
    val scored = docs.select(col("doc_id"), col("source"), col("text"),
      Text.langId(col("text")).as("lang"), Text.qualityScore(col("text")).as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(col("q").desc, col("doc_id").asc)
    val keep = scored.join(comp, "doc_id")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val gated = keep.filter(col("lang") === "en" && col("q") >= 0.3)
    val chunked = gated.select(col("doc_id"), col("source"),
        posexplode(Text.chunkTokens(col("text"), 64, 0)).as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_uid", col("doc_id") * 10000 + col("chunk_idx"))
    Curation.packShards(chunked, "source", "chunk_uid",
        size(split(col("chunk"), "\\s+")), 1000L)
      .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
        col("source"), col("n_tok"), col("shard"))
  }

  /** KMV distinct-3-gram sketch per source (k=64, ~1300 true distinct
    * per source so the estimator branch is genuinely exercised), exact
    * count alongside for accuracy inspection — the estimate is
    * deterministic (md5 hashes), so the oracle recomputes the identical
    * sketch, unlike HLL whose binary sketch is engine-private. */
  private val qKmvDistinct: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val sh = docs.select(col("source"),
      explode(array_distinct(
        if (spark.catalog.functionExists("word_shingles"))
          expr("word_shingles(text, 3)")
        else Similarity.shinglesArray(col("text"), 3))).as("s"))
    graft.operators.Sketch.kmvDistinct(sh, Seq("source"), col("s"), 64)
      .join(sh.groupBy(col("source"))
        .agg(count_distinct(col("s")).as("n_exact")), "source")
  }

  /** KMV set-operation estimates between two sources' 3-gram sets —
    * sketches compose: union = merge of minima, intersection via the
    * ratio estimator. */
  private val qKmvSetOps: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val sh = docs.select(col("source"),
      explode(array_distinct(
        if (spark.catalog.functionExists("word_shingles"))
          expr("word_shingles(text, 3)")
        else Similarity.shinglesArray(col("text"), 3))).as("s"))
    graft.operators.Sketch.kmvSetEstimates(sh, "source", col("s"),
      "src0", "src1", 64)
  }

  /** Quality-weighted sample: keep probability = quality score (soft
    * filtering instead of a hard threshold). */
  private val qWeightedSample: Q = (spark, dir) =>
    Curation.weightedSample(
        Tables.fanOut(Tables.documents(spark, dir))
          .select(col("doc_id"), col("source"), Text.qualityScore(col("text")).as("q")),
        col("doc_id"), col("q"), "wq5")
      .select(col("doc_id"), col("source"), col("q"))

  /** Per-domain cap — keep the `srcCapK` highest-quality documents per
    * source (tie: lowest doc_id), the CommonCrawl-style move that stops
    * one boilerplate-heavy domain from dominating the corpus. Runs
    * through [[graft.operators.TopK.topKPerKey]], the UDAF formulation:
    * map-side partial aggregation reduces every source to ≤ k rows
    * BEFORE the exchange, so the corpus never key-shuffles — the
    * row_number window this replaces would shuffle and sort every row
    * just to keep k. */
  private val qSourceCap: Q = (spark, dir) =>
    graft.operators.TopK.topKPerKey(
      Tables.fanOut(Tables.documents(spark, dir))
        .select(col("doc_id"), col("source"),
          Text.qualityScore(col("text")).as("q")),
      Seq("source"), "doc_id", "q", k = srcCapK)

  /** Leakage-free split: assignment hashed on the dedup COMPONENT, not
    * the doc — every near-duplicate family lands whole in one split, so
    * the cross-split contamination q_split_leakage measures is ZERO by
    * construction (same component ⇒ same hash ⇒ same split). The cure
    * for what q_split_leakage diagnoses; doc-level rates stay ~90/5/5
    * because components are small relative to the corpus. */
  private val qSplitByCluster: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      shingleN, ExtensionQueries.minhashN, ExtensionQueries.rowsPerBand,
      ExtensionQueries.lshBucketCap, ExtensionQueries.jaccardThreshold)
    Curation.connectedComponents(docs, "doc_id", pairs)
      .select(col("doc_id"), col("component"),
        clusterSplitCol(col("component")).as("split"))
  }

  /** 90/5/5 split case over a CLUSTER id — the same hash family as
    * [[ScaleQueries.splitColumn]] under a distinct salt, keyed on the
    * component so near-dup families can't straddle a split boundary. */
  private def clusterSplitCol(c: Column): Column = {
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"$clusterSplitSalt:"), c.cast(StringType))), 1, 15), 16, 10)
        .cast(LongType), lit(10000L))
    when(bucket < 9000L, lit("train"))
      .when(bucket < 9500L, lit("val"))
      .otherwise(lit("test"))
  }

  /** Seeded training-order shuffle: one independent permutation per
    * epoch, hash-sharded — the terminal "where does each example land,
    * and when is it seen" step a shard writer executes after curation
    * ([[Curation.trainOrder]]; GSMLS.py randomizes training frames with
    * `sample(frac=1, random_state=...)` — same contract, shuffle-shaped).
    * The only corpus exchange is the (epoch, shard) hash partition. */
  private val qTrainOrder: Q = (spark, dir) =>
    Curation.trainOrder(Tables.fanOut(Tables.documents(spark, dir)),
      "doc_id", orderSalt, orderEpochs, orderShards)

  /** Quality-annealed curriculum budget report: epoch thresholds rise
    * linearly 0.55 -> 0.75, one corpus scan for all epochs
    * ([[Curation.curriculumAnneal]]). */
  private val qCurriculumAnneal: Q = (spark, dir) =>
    Curation.curriculumAnneal(
      Tables.fanOut(Tables.documents(spark, dir))
        .select(col("doc_id"), col("source"),
          Text.qualityScore(col("text")).as("q"),
          Text.tokenCount(col("text")).as("n")),
      "doc_id", "source", col("q"), col("n"), currEpochs, currQ0, currQ1)

  def queries: Map[String, Q] = Map(
    "q_train_order"    -> qTrainOrder,
    "q_curriculum_anneal" -> qCurriculumAnneal,
    "q_source_cap"     -> qSourceCap,
    "q_split_by_cluster" -> qSplitByCluster,
    "q_order_e2e"      -> qOrderE2e,
    "q_domain_reweight" -> qDomainReweight,
    "q_pack_stats"     -> qPackStats,
    "q_st23_stream_reweight" -> qSt23StreamReweight,
    "q_len_batching"   -> qLenBatching,
    "q_mix_solve"      -> qMixSolve,
    "q_ngram_coverage" -> qNgramCoverage,
    "q_dup_matrix"     -> qDupMatrix,
    "q_weighted_sample" -> qWeightedSample,
    "q_kmv_setops"     -> qKmvSetOps,
    "q_kmv_distinct"   -> qKmvDistinct,
    "q_prepare_corpus" -> qPrepareCorpus,
    "q_merge_upsert"   -> qMergeUpsert,
    "q_exact_sample"   -> qExactSample,
    "q_st9_stream_join" -> qStStreamJoin,
    "q_st20_stream_outer_join" -> qStStreamOuterJoin,
    "q_dup_canonical"  -> qDupCanonical,
    "q_t_chunk"        -> qTChunk,
    "q_mix_sample"     -> qMixSample,
    "q_temp_mixture"   -> qTempMixture,
    "q_mixture_e2e"    -> qMixtureE2e,
    "q_epochize"       -> qEpochize,
    "q_range_join"     -> qRangeJoin,
    "q_st8_running_state" -> qStRunningState,
    "q_topk_udaf"      -> qTopkUdaf,
    "q_sessionize"     -> qSessionize,
    "q_scd2_timeline"  -> qScd2Timeline,
    "q_st16_stream_scd2" -> qSt16StreamScd2,
    "q_st18_late_quarantine" -> qSt18LateQuarantine,
    "q_st22_stream_sessionize" -> qSt22StreamSessionize,
    "q_session_window" -> qSessionWindow,
    "q_ts_gapfill"     -> qTsGapfill,
    "q_pivot_events"   -> qPivotEvents,
    "q_unpivot_measures" -> qUnpivotMeasures,
    "q_rolling_avg"    -> qRollingAvg,
    "q_dup_components" -> qDupComponents,
    "q_graph_triangles" -> qGraphTriangles,
    "q_kcore"          -> qKcore,
    "q_split_leakage"  -> qSplitLeakage,
    "q_decontaminate"  -> qDecontaminate,
    "q_strat_sample"   -> qStratSample,
    "q_shard_pack"     -> qShardPack,
    "q_pack_windows"   -> qPackWindows,
    "q_quality_tiers"  -> qQualityTiers,
    "q_source_filter"  -> qSourceFilter,
    "q_source_wilson"  -> qSourceWilson,
    "q_source_scorecard" -> qSourceScorecard,
    "q_st13_incr_scorecard" -> qSt13IncrScorecard,
    "q_dup_size_hist" -> qDupSizeHist,
    "q_dedup_threshold_curve" -> qDedupThresholdCurve,
    "q_asof_join"      -> qAsofJoin,
    "q_t_redact"       -> qTRedact,
    "q_profile"        -> qProfile,
    "q_j_bucketed"     -> qJBucketed,
    "q_j_bucketed_agg" -> qJBucketedAgg
  )

  // =====================================================================
  // Oracle SQL (DuckDB 1.0)
  // =====================================================================

  /** Distinct (doc_id, 5-gram) pairs — the decontamination shingle CTE.
    * Window starts i in 1..len-n+1 -> range upper is len-n+2. */
  private val shingle5Cte =
    s"""tk5 AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       |sh5 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+${decontamN - 1}], ' ') AS shingle
       |        FROM tk5, unnest(range(1, greatest(len(t)-${decontamN - 2}, 1))) AS u(i)
       |        WHERE array_to_string(t[i:i+${decontamN - 1}], ' ') <> '')""".stripMargin

  /** Quality-score expression over a `documents`-shaped relation —
    * mirrors Text.qualityScore (same formula as the q_t_quality oracle). */
  private val qualityCte =
    s"""qf AS (SELECT doc_id, source,
       |    len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) AS alpha_ratio,
       |    ${ExtensionQueries.hitsExpr("en")} / greatest(len(string_split_regex(text, '\\s+')), 1) AS en_ratio,
       |    len(string_split_regex(text, '\\s+')) AS n_tok,
       |    length(regexp_replace(text, '\\s+', '', 'g')) / CAST(greatest(len(string_split_regex(text, '\\s+')), 1) AS DOUBLE) AS mean_tok_len,
       |    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) AS punct_ratio
       |  FROM documents),
       |scored AS (SELECT doc_id, source,
       |    round(alpha_ratio * 0.4
       |      + least(en_ratio * 4.0, 1.0) * 0.3
       |      + (CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 0.2 ELSE 0.0 END)
       |      + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 0.1 ELSE 0.0 END)
       |      - punct_ratio * 0.4, 4) AS q
       |  FROM qf)""".stripMargin

  /** Shared by q_source_scorecard and its streaming form
    * q_st13_incr_scorecard: the drained incremental state is a pure
    * function of the same integer accumulators, so both queries
    * answer to the identical batch recomputation. */
  private lazy val sourceScorecardSql: String =
    s"""WITH $qualityCte,
          $shingle5Cte,
          corpus AS (SELECT d.doc_id, d.source,
              CAST(floor(s.q * 10000.0 + 0.5) AS BIGINT) AS qq,
              least(19, CAST(len(string_split_regex(d.text, '\\s+')) // 32 AS BIGINT)) AS b,
              md5(d.text) AS h
            FROM documents d JOIN scored s ON d.doc_id = s.doc_id
            WHERE d.doc_id % $benchMod <> $benchRem),
          pr AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(qq) AS BIGINT) AS qs, count(DISTINCT h) AS nh
                 FROM corpus GROUP BY source),
          bsh AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % $benchMod = $benchRem),
          cd AS (SELECT s.doc_id FROM sh5 s JOIN bsh ON s.shingle = bsh.shingle
                 WHERE s.doc_id % $benchMod <> $benchRem
                 GROUP BY s.doc_id HAVING count(*) >= $decontamMinShared),
          nc AS (SELECT c.source, count(*) AS n_contam
                 FROM cd JOIN corpus c ON cd.doc_id = c.doc_id GROUP BY c.source),
          bc AS (SELECT source, b, count(*) AS c FROM corpus GROUP BY source, b),
          gc AS (SELECT b, count(*) AS cg FROM corpus GROUP BY b),
          gt AS (SELECT count(*) AS ng FROM corpus),
          spine AS (SELECT p.source, p.n_docs, u.b FROM pr p, unnest(range(0, 20)) AS u(b)),
          terms AS (SELECT sp.source,
              CAST(floor(((CAST(coalesce(gc.cg, 0) + 1 AS DOUBLE) / CAST(gt.ng + 20 AS DOUBLE)
                           - CAST(coalesce(bc.c, 0) + 1 AS DOUBLE) / CAST(sp.n_docs + 20 AS DOUBLE))
                          * ln((CAST(coalesce(gc.cg, 0) + 1 AS DOUBLE) / CAST(gt.ng + 20 AS DOUBLE))
                               / (CAST(coalesce(bc.c, 0) + 1 AS DOUBLE) / CAST(sp.n_docs + 20 AS DOUBLE))))
                         * 1000000000.0 + 0.5) AS BIGINT) AS qt
            FROM spine sp LEFT JOIN bc ON sp.source = bc.source AND sp.b = bc.b
                          LEFT JOIN gc ON sp.b = gc.b, gt),
          ps AS (SELECT source, CAST(sum(qt) AS BIGINT) AS psiq FROM terms GROUP BY source)
          SELECT pr.source, pr.n_docs,
            round(CAST(qs AS DOUBLE) / 10000.0 / pr.n_docs, 4) AS mean_q,
            CAST(coalesce(nc.n_contam, 0) AS BIGINT) AS n_contam,
            round(CAST(coalesce(nc.n_contam, 0) AS DOUBLE) / pr.n_docs, 4) AS contam_rate,
            round(CAST(pr.n_docs - nh AS DOUBLE) / pr.n_docs, 4) AS dup_rate,
            round(CAST(psiq AS DOUBLE) / 1000000000.0, 6) AS psi_len,
            (round(CAST(qs AS DOUBLE) / 10000.0 / pr.n_docs, 4) >= 0.6
             AND round(CAST(coalesce(nc.n_contam, 0) AS DOUBLE) / pr.n_docs, 4) <= 0.08
             AND round(CAST(psiq AS DOUBLE) / 1000000000.0, 6) <= 0.25) AS passed
          FROM pr JOIN ps ON pr.source = ps.source
          LEFT JOIN nc ON pr.source = nc.source"""

  /** Shared by the batch timeline and its streaming maintainer — both
    * must produce the exact same SCD2 history over the events table. */
  private val scd2TimelineSql: String =
    """WITH seq AS (SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       FROM events),
       chg AS (SELECT user_id, event_type, ts, event_id FROM seq
         WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
       SELECT user_id, event_type AS state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
           AS is_current
       FROM chg"""

  /** One largest-remainder normalization round in SQL: `inTbl(source,
    * <carry...>, r)` → `outTbl(source, <carry...>, w)` with Σw = 10000 —
    * the oracle mirror of [[Curation]]'s normalizeBp, unrolled per MW
    * round (batch reweighting carries `loss_u`; the streaming form
    * carries nothing because each round has its own loss table). */
  private def reweightNormSql(inTbl: String, outTbl: String,
                              carry: Seq[String] = Seq("loss_u")): String = {
    val c = ("source" +: carry).mkString(", ")
    s"""n_$outTbl AS (SELECT $c, r,
          (r * 10000) // (sum(r) OVER ()) AS fl,
          (r * 10000) % (sum(r) OVER ()) AS rem
        FROM $inTbl),
        r_$outTbl AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
          10000 - sum(fl) OVER () AS short FROM n_$outTbl),
        $outTbl AS (SELECT $c,
          fl + CASE WHEN rk <= short THEN 1 ELSE 0 END AS w FROM r_$outTbl)"""
  }

  /** The full unrolled MW chain: uniform init, then `reweightRounds`
    * rounds of w ← normalize(w·(scale+loss)/scale). */
  private lazy val reweightCtes: String = {
    val scale = reweightEtaDen * 10000L
    val steps = (0 to reweightRounds).map { t =>
      if (t == 0)
        s"""p0 AS (SELECT source, loss_u, CAST(1 AS BIGINT) AS r FROM ls),
            ${reweightNormSql("p0", "w0")}"""
      else
        s"""p$t AS (SELECT source, loss_u,
              (w * ($scale + loss_u)) // $scale AS r FROM w${t - 1}),
            ${reweightNormSql(s"p$t", s"w$t")}"""
    }.mkString(",\n        ")
    s"""ls AS (SELECT source,
          10000 - CAST(floor(CAST(sum(CAST(floor(q * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
            / count(*) + 0.5) AS BIGINT) AS loss_u
        FROM scored GROUP BY 1),
        $steps"""
  }

  /** ST23 oracle: the batch replay of the streaming MW control loop —
    * per-residue loss tables, a uniform seed over delivery-0 strata,
    * then one MW step per delivery in delivery order. Shares
    * [[reweightNormSql]] so the normalization can never drift from the
    * batch reweighting oracle. */
  private lazy val streamReweightOracle: String = {
    val scale = reweightEtaDen * 10000L
    def lossCte(r: Int) =
      s"""b$r AS (SELECT source,
          10000 - CAST(floor(CAST(sum(CAST(floor(q * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
            / count(*) + 0.5) AS BIGINT) AS loss_u
        FROM scored WHERE doc_id % 3 = $r GROUP BY 1)"""
    def step(inW: String, lossTbl: String, outP: String, outW: String) =
      s"""$outP AS (SELECT u.source,
            (u.w * ($scale + coalesce(b.loss_u, 0))) // $scale AS r
          FROM $inW u LEFT JOIN $lossTbl b ON u.source = b.source),
          ${reweightNormSql(outP, outW, carry = Nil)}"""
    s"""WITH $qualityCte,
        ${lossCte(0)},
        ${lossCte(1)},
        ${lossCte(2)},
        i0 AS (SELECT source, CAST(1 AS BIGINT) AS r FROM b0),
        ${reweightNormSql("i0", "u0", carry = Nil)},
        ${step("u0", "b0", "p0", "w0")},
        ${step("w0", "b1", "p1", "w1")},
        ${step("w1", "b2", "p2", "w2")}
        SELECT source, CAST(w AS BIGINT) AS w_bp FROM w2"""
  }

  /** Mixture-E2E oracle, split for reuse: the CTE chain (train split →
    * τ=0.5 temperature targets → epochize → pack) and its final SELECT,
    * shared verbatim by q_mixture_e2e and the terminal q_order_e2e so
    * the composed oracle can never drift from the proven stage chain. */
  private lazy val mixtureE2eCtes: String =
    s"""tr AS (SELECT doc_id, source,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
           FROM documents
           WHERE (${ScaleQueries.splitCaseSql}) = 'train'),
         avail AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS a
           FROM tr GROUP BY source),
         q AS (SELECT source, a,
           CAST(round(sqrt(CAST(a AS DOUBLE)) * 1000000) AS BIGINT) AS rawq
           FROM avail),
         tot AS (SELECT CAST(sum(rawq) AS BIGINT) AS totq FROM q),
         scaled AS (SELECT source, a,
             (rawq * 10000) // totq AS floor_bp,
             (rawq * 10000) % totq AS rem
           FROM q, tot),
         ranked AS (SELECT source, a, floor_bp,
             row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
             (SELECT CAST(10000 - sum(floor_bp) AS BIGINT) FROM scaled) AS short
           FROM scaled),
         tgt AS (SELECT source, a,
             ((floor_bp + CASE WHEN rk <= short THEN 1 ELSE 0 END) * 1000000) // 10000
               AS tgt
           FROM ranked),
         pl AS (SELECT source,
             tgt // a AS full_copies,
             ((tgt % a) * 10000) // a AS frac_bp
           FROM tgt),
         ep AS (SELECT d.doc_id, d.source, d.n_tok,
             unnest(range(full_copies + CASE WHEN
               CAST('0x' || substring(md5('mixe2e' || ':' || d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < frac_bp
               THEN 1 ELSE 0 END)) AS epoch
           FROM tr d JOIN pl ON d.source = pl.source),
         pk AS (SELECT doc_id, source, epoch, n_tok,
             epoch * 1099511627776 + doc_id AS pack_id
           FROM ep WHERE n_tok > 0),
         p AS (SELECT doc_id, source, epoch, n_tok,
             CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY pack_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prev
           FROM pk),
         e AS (SELECT doc_id, source, epoch, n_tok, prev,
             unnest(range(prev // $packWindowTokens,
               (prev + n_tok - 1) // $packWindowTokens + 1)) AS win
           FROM p)"""

  private lazy val mixtureE2eSelect: String =
    s"""SELECT source, epoch, doc_id, n_tok, win AS window,
           greatest(0, win * $packWindowTokens - prev) AS doc_tok_start,
           greatest(prev, win * $packWindowTokens)
             - win * $packWindowTokens AS win_tok_start,
           least(n_tok, (win + 1) * $packWindowTokens - prev)
             - greatest(0, win * $packWindowTokens - prev) AS seg_tokens
         FROM e"""

  def oracleSql: Map[String, String] = Map(
    // Independent formulation: transitive closure over the symmetrized
    // near-dup edges, component = min reachable id. Spark's label
    // propagation must converge to exactly this relation.
    "q_dup_size_hist" ->
      s"""WITH RECURSIVE ${ExtensionQueries.lshJaccardCtes},
          edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
                    UNION SELECT id_b, id_a FROM lsh_pairs),
          reach(src, dst) AS (SELECT a, b FROM edges
                    UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
          comp AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src),
          lbl AS (SELECT least(d.doc_id, coalesce(c.mn, d.doc_id)) AS component
                  FROM documents d LEFT JOIN comp c ON c.src = d.doc_id),
          cs AS (SELECT component, count(*) AS sz FROM lbl GROUP BY 1)
          SELECT sz, count(*) AS n_clusters FROM cs GROUP BY 1""",
    "q_dedup_threshold_curve" ->
      s"""WITH ${ExtensionQueries.lshJaccardCtesFrom("documents", threshold = 0.5)},
          th AS (SELECT unnest([5000, 7000, 9000]::BIGINT[]) AS bp),
          pp AS (SELECT th.bp, p.id_a, p.id_b, p.jaccard
                 FROM th JOIN lsh_pairs p ON p.jaccard >= th.bp / 10000.0),
          np AS (SELECT bp, count(*) AS n_pairs FROM pp GROUP BY 1),
          nd AS (SELECT bp, count(*) AS n_docs FROM (
                   SELECT DISTINCT bp, id FROM (
                     SELECT bp, id_a AS id FROM pp
                     UNION ALL SELECT bp, id_b FROM pp)) GROUP BY 1)
          SELECT np.bp AS threshold_bp, np.n_pairs, nd.n_docs
          FROM np JOIN nd ON np.bp = nd.bp""",
    "q_dup_components" ->
      s"""WITH RECURSIVE ${ExtensionQueries.lshJaccardCtes},
          edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
                    UNION SELECT id_b, id_a FROM lsh_pairs),
          reach(src, dst) AS (SELECT a, b FROM edges
                    UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
          comp AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src)
          SELECT d.doc_id, least(d.doc_id, coalesce(c.mn, d.doc_id)) AS component
          FROM documents d LEFT JOIN comp c ON c.src = d.doc_id""",
    "q_split_leakage" ->
      s"""WITH ${ExtensionQueries.lshJaccardCtes},
          sp AS (SELECT doc_id, ${ScaleQueries.splitCaseSql} AS split
                 FROM documents)
          SELECT least(sa.split, sb.split) AS split_lo,
                 greatest(sa.split, sb.split) AS split_hi,
                 count(*) AS n_pairs,
                 round(max(p.jaccard), 4) AS max_sim,
                 round(CAST(sum(CAST(floor(p.jaccard * 1e4 + 0.5) AS BIGINT))
                     AS BIGINT) / 1e4 / count(*), 4) AS mean_sim
          FROM lsh_pairs p
            JOIN sp sa ON p.id_a = sa.doc_id
            JOIN sp sb ON p.id_b = sb.doc_id
          WHERE sa.split <> sb.split
          GROUP BY 1, 2""",
    "q_decontaminate" ->
      s"""WITH $shingle5Cte,
          bsh AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % $benchMod = $benchRem)
          SELECT s.doc_id, count(*) AS n_shared
          FROM sh5 s JOIN bsh ON s.shingle = bsh.shingle
          WHERE s.doc_id % $benchMod <> $benchRem
          GROUP BY s.doc_id
          HAVING count(*) >= $decontamMinShared""",
    "q_strat_sample" ->
      s"""SELECT doc_id, source FROM documents
          WHERE CAST('0x' || substring(md5('$sampleSalt' || ':' || source || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000
              < (CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0 THEN 3000 ELSE 1000 END)""",
    "q_shard_pack" ->
      s"""WITH t AS (SELECT doc_id, source,
            CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
          FROM documents)
          SELECT doc_id, source, n_tok,
            CAST(floor(CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / $shardBudget) AS BIGINT) AS shard
          FROM t""",
    // window-boundary arithmetic mirrored integer-for-integer: prev =
    // exclusive running total, windows prev//L .. (prev+n-1)//L, each
    // segment's doc/window offsets and length from max/min clamps
    "q_pack_windows" ->
      s"""WITH t AS (SELECT doc_id, source,
            CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
          FROM documents),
          p AS (SELECT doc_id, source, n_tok,
            CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prev
          FROM t WHERE n_tok > 0),
          e AS (SELECT doc_id, source, n_tok, prev,
            unnest(range(prev // $packWindowTokens,
              (prev + n_tok - 1) // $packWindowTokens + 1)) AS win
          FROM p)
          SELECT source, doc_id, n_tok, win AS window,
            greatest(0, win * $packWindowTokens - prev) AS doc_tok_start,
            greatest(prev, win * $packWindowTokens)
              - win * $packWindowTokens AS win_tok_start,
            least(n_tok, (win + 1) * $packWindowTokens - prev)
              - greatest(0, win * $packWindowTokens - prev) AS seg_tokens
          FROM e""",
    "q_quality_tiers" ->
      s"""WITH $qualityCte
          SELECT doc_id, source, q,
            ntile($nTiers) OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS tier
          FROM scored""",
    "q_source_filter" ->
      s"""WITH $qualityCte,
          stats AS (SELECT source, count(*) AS src_n_docs,
              round(CAST(sum(CAST(round(q * 10000) AS BIGINT)) AS DOUBLE)
                / count(*) / 10000.0, 4) AS src_mean_q
            FROM scored GROUP BY 1)
          SELECT s.source, s.doc_id, s.q, t.src_n_docs, t.src_mean_q
          FROM scored s JOIN stats t USING (source)
          WHERE t.src_mean_q >= $srcMinMeanQ AND t.src_n_docs >= $srcMinDocs""",
    "q_source_scorecard" -> sourceScorecardSql,
    "q_st13_incr_scorecard" -> sourceScorecardSql,
    "q_t_redact" ->
      s"""SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(
            substring(text, 1, 40) || ' reach me at ' || source || '@example.com or (973) 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ssn 123-45-6789',
            '${Text.ssnPattern}', '<SSN>', 'g'),
            '${Text.emailPattern}', '<EMAIL>', 'g'),
            '${Text.phonePattern}', '<PHONE>', 'g') AS redacted
          FROM documents""",
    "q_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
            count(DISTINCT $c) AS n_distinct,
            CAST(min($c) AS DOUBLE) AS min_d, CAST(max($c) AS DOUBLE) AS max_d
            FROM orders"""
      Seq("o_orderkey", "o_custkey", "o_totalprice").map(one).mkString("\nUNION ALL\n")
    },
    "q_weighted_sample" ->
      s"""WITH $qualityCte
          SELECT doc_id, source, q FROM scored
          WHERE CAST('0x' || substring(md5('wq5' || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000
              < CAST(round(least(greatest(q, 0.0), 1.0) * 10000) AS BIGINT)""",
    "q_kmv_setops" ->
      """WITH tkk AS (SELECT doc_id, source, string_split_regex(text, '\s+') AS t FROM documents),
         shh AS (SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS s
                 FROM tkk, unnest(range(1, greatest(len(t)-1, 1))) AS u(i)
                 WHERE array_to_string(t[i:i+2], ' ') <> ''),
         hsh AS (SELECT DISTINCT source AS g,
           CAST('0x' || substring(md5(s), 1, 15) AS BIGINT) AS h
           FROM shh WHERE source IN ('src0', 'src1')),
         kept AS (SELECT g, h FROM (
           SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h ASC) AS rn
           FROM hsh) WHERE rn <= 64),
         uk AS (SELECT h FROM (SELECT DISTINCT h FROM kept) ORDER BY h ASC LIMIT 64),
         pse AS (SELECT g,
           CASE WHEN n < 64 THEN n
                ELSE CAST(round(63.0 * 1152921504606846976.0 / hk) AS BIGINT) END AS e
           FROM (SELECT g, count(*) AS n, max(h) AS hk FROM kept GROUP BY g)),
         uae AS (SELECT
           CASE WHEN un < 64 THEN un
                ELSE CAST(round(63.0 * 1152921504606846976.0 / uhk) AS BIGINT) END AS eu, un
           FROM (SELECT count(*) AS un, max(h) AS uhk FROM uk)),
         ib AS (SELECT count(*) AS nb FROM uk
                JOIN (SELECT h FROM kept WHERE g = 'src0') a ON uk.h = a.h
                JOIN (SELECT h FROM kept WHERE g = 'src1') b ON uk.h = b.h)
         SELECT (SELECT e FROM pse WHERE g = 'src0') AS est_a,
                (SELECT e FROM pse WHERE g = 'src1') AS est_b,
                uae.eu AS est_union,
                CAST(round(CAST(ib.nb AS DOUBLE) / least(uae.un, 64) * uae.eu) AS BIGINT) AS est_inter
         FROM uae, ib""",
    "q_kmv_distinct" ->
      """WITH tkk AS (SELECT doc_id, source, string_split_regex(text, '\s+') AS t FROM documents),
         shh AS (SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS s
                 FROM tkk, unnest(range(1, greatest(len(t)-1, 1))) AS u(i)
                 WHERE array_to_string(t[i:i+2], ' ') <> ''),
         hsh AS (SELECT DISTINCT source,
           CAST('0x' || substring(md5(s), 1, 15) AS BIGINT) AS h FROM shh),
         kept AS (SELECT source, h FROM (
           SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
           FROM hsh) WHERE rn <= 64),
         sk AS (SELECT source, count(*) AS n_kept, max(h) AS hk FROM kept GROUP BY source),
         ex AS (SELECT source, count(DISTINCT s) AS n_exact FROM shh GROUP BY source)
         SELECT sk.source, sk.n_kept,
           CASE WHEN sk.n_kept < 64 THEN sk.n_kept
                ELSE CAST(round(63.0 * 1152921504606846976.0 / hk) AS BIGINT) END AS est_distinct,
           ex.n_exact
         FROM sk JOIN ex ON sk.source = ex.source""",
    "q_prepare_corpus" -> {
      val hits = Seq("en", "de", "fr", "es", "zh")
        .map(l => s"${ExtensionQueries.hitsExpr(l)} AS h_$l").mkString(",\n            ")
      s"""WITH RECURSIVE ${ExtensionQueries.lshJaccardCtes},
          edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
                    UNION SELECT id_b, id_a FROM lsh_pairs),
          reach(src, dst) AS (SELECT a, b FROM edges
                    UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
          cmin AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src),
          comp AS (SELECT d.doc_id, least(d.doc_id, coalesce(c.mn, d.doc_id)) AS component
                   FROM documents d LEFT JOIN cmin c ON c.src = d.doc_id),
          lh AS (SELECT doc_id,
            $hits
          FROM documents),
          lang AS (SELECT doc_id,
            CASE WHEN h_en = mx AND mx > 0 THEN 'en'
                 WHEN h_de = mx AND mx > 0 THEN 'de'
                 WHEN h_fr = mx AND mx > 0 THEN 'fr'
                 WHEN h_es = mx AND mx > 0 THEN 'es'
                 WHEN h_zh = mx AND mx > 0 THEN 'zh'
                 ELSE 'und' END AS lang
          FROM (SELECT *, greatest(h_en, h_de, h_fr, h_es, h_zh) AS mx FROM lh)),
          $qualityCte,
          j AS (SELECT d.doc_id, d.source, d.text, l.lang, s.q, c.component
                FROM documents d
                JOIN lang l ON l.doc_id = d.doc_id
                JOIN scored s ON s.doc_id = d.doc_id
                JOIN comp c ON c.doc_id = d.doc_id),
          k AS (SELECT doc_id, source, text FROM (
                  SELECT *, row_number() OVER (PARTITION BY component
                    ORDER BY q DESC, doc_id ASC) AS rn FROM j)
                WHERE rn = 1 AND lang = 'en' AND q >= 0.3),
          tk2 AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS t FROM k),
          ch AS (SELECT doc_id, source, CAST(s // 64 AS BIGINT) AS chunk_idx,
                   array_to_string(t[s+1:s+64], ' ') AS chunk
                 FROM (SELECT doc_id, source, t, unnest(range(0, len(t), 64)) AS s
                       FROM tk2 WHERE len(t) > 0)),
          cht AS (SELECT doc_id, source, chunk_idx,
                   CAST(len(string_split_regex(chunk, '\\s+')) AS BIGINT) AS n_tok,
                   doc_id * 10000 + chunk_idx AS uid
                  FROM ch)
          SELECT doc_id, chunk_idx, source, n_tok,
            CAST(floor(CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY uid
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / 1000) AS BIGINT) AS shard
          FROM cht"""
    },
    "q_merge_upsert" ->
      """WITH u AS (
           SELECT o_orderkey AS k, o_totalprice AS price, 1 AS version FROM orders
           UNION ALL
           SELECT o_orderkey, o_totalprice * 2, 2 FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_totalprice, 2 FROM orders WHERE o_orderkey % 1000 = 1)
         SELECT k, price, CAST(version AS BIGINT) AS version FROM (
           SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
           FROM u) WHERE rn = 1""",
    "q_exact_sample" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source, row_number() OVER (PARTITION BY source
             ORDER BY CAST('0x' || substring(md5('ex5' || ':' || source || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
                      doc_id ASC) AS rn
           FROM documents) WHERE rn <= 5""",
    "q_st9_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id
         FROM events p JOIN events c
           ON p.event_type = 'purchase' AND c.event_type = 'click'
          AND p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts""",
    "q_st20_stream_outer_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id
         FROM events p LEFT JOIN events c
           ON c.event_type = 'click'
          AND p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
         WHERE p.event_type = 'purchase'""",
    "q_dup_canonical" ->
      s"""WITH RECURSIVE ${ExtensionQueries.lshJaccardCtes},
          edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
                    UNION SELECT id_b, id_a FROM lsh_pairs),
          reach(src, dst) AS (SELECT a, b FROM edges
                    UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
          cmin AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src),
          comp AS (SELECT d.doc_id, least(d.doc_id, coalesce(c.mn, d.doc_id)) AS component
                   FROM documents d LEFT JOIN cmin c ON c.src = d.doc_id),
          $qualityCte,
          j AS (SELECT s.doc_id, s.q, c.component
                FROM scored s JOIN comp c ON s.doc_id = c.doc_id),
          k AS (SELECT component, doc_id, q FROM (
                  SELECT *, row_number() OVER (PARTITION BY component
                    ORDER BY q DESC, doc_id ASC) AS rn FROM j) WHERE rn = 1),
          n AS (SELECT component, count(*) AS n_members FROM comp GROUP BY component)
          SELECT k.component, k.doc_id, k.q, n.n_members
          FROM k JOIN n ON k.component = n.component""",
    "q_t_chunk" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
         st AS (SELECT doc_id, t, unnest(range(0, len(t), 4)) AS s FROM tk WHERE len(t) > 0)
         SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_idx,
           md5(array_to_string(t[s+1:s+8], ' ')) AS chunk_md5,
           CAST(length(array_to_string(t[s+1:s+8], ' ')) AS BIGINT) AS chunk_len
         FROM st""",
    "q_temp_mixture" ->
      """WITH avail AS (SELECT source,
           CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS avail_tokens
           FROM documents GROUP BY source),
         q AS (SELECT source, avail_tokens,
           CAST(round(sqrt(CAST(avail_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS rawq
           FROM avail),
         tot AS (SELECT CAST(sum(rawq) AS BIGINT) AS totq FROM q),
         scaled AS (SELECT source, avail_tokens,
             (rawq * 10000) // totq AS floor_bp,
             (rawq * 10000) % totq AS rem
           FROM q, tot),
         ranked AS (SELECT source, avail_tokens, floor_bp,
             row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
             (SELECT CAST(10000 - sum(floor_bp) AS BIGINT) FROM scaled) AS short
           FROM scaled)
         SELECT source, avail_tokens,
           floor_bp + CASE WHEN rk <= short THEN 1 ELSE 0 END AS weight_bp,
           ((floor_bp + CASE WHEN rk <= short THEN 1 ELSE 0 END) * 1000000) // 10000
             AS target_tokens
         FROM ranked""",
    // split → temperature targets (sqrt path, quantized micro-units,
    // largest-remainder to 10000 bp) → epochize (md5-gated fractional
    // tail) → window pack over pack_id = epoch·2^40 + doc_id: each CTE
    // mirrors its standalone proven oracle, composed over the train
    // slice only.
    "q_mixture_e2e" -> s"WITH $mixtureE2eCtes\n         $mixtureE2eSelect",
    "q_order_e2e" ->
      s"""WITH $mixtureE2eCtes,
         mix AS ($mixtureE2eSelect),
         units AS (SELECT DISTINCT source || ':' || CAST("window" AS VARCHAR) AS unit
                   FROM mix),
         ku AS (SELECT unit,
             CAST('0x' || substring(md5('$orderE2eSalt' || ':0:' || unit), 1, 15)
               AS BIGINT) AS k
           FROM units)
         SELECT unit, CAST(0 AS BIGINT) AS epoch, k % $orderShards AS shard,
           CAST(row_number() OVER (PARTITION BY k % $orderShards
             ORDER BY k, unit) AS BIGINT) AS pos
         FROM ku""",
    "q_epochize" ->
      """WITH t AS (SELECT doc_id, source,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         avail AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS a FROM t GROUP BY source),
         pl AS (SELECT source,
             tgt // a AS full_copies,
             ((tgt % a) * 10000) // a AS frac_bp
           FROM (SELECT source, a,
             CAST(CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0 THEN 8000 ELSE 500 END AS BIGINT) AS tgt
             FROM avail))
         SELECT d.doc_id, d.source,
           unnest(range(full_copies + CASE WHEN
             CAST('0x' || substring(md5('ep7' || ':' || d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < frac_bp
             THEN 1 ELSE 0 END)) AS epoch
         FROM t d JOIN pl ON d.source = pl.source""",
    "q_mix_sample" ->
      """WITH avail AS (SELECT source,
           CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS a
           FROM documents GROUP BY source),
         fr AS (SELECT source,
           least(10000, CAST(floor(CAST(t AS DOUBLE) * 10000.0 / a) AS BIGINT)) AS bp
           FROM (SELECT source, a,
             CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0 THEN 2000 ELSE 500 END AS t
             FROM avail))
         SELECT d.doc_id, d.source
         FROM documents d JOIN fr ON d.source = fr.source
         WHERE CAST('0x' || substring(md5('mix5' || ':' || d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < bp""",
    "q_range_join" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
         FROM customer JOIN orders
           ON o_totalprice >= c_acctbal AND o_totalprice < c_acctbal + 500""",
    "q_st8_running_state" ->
      """WITH delivered AS (
           SELECT CAST(o_custkey % 50 AS VARCHAR) AS dkey,
                  CAST(floor(o_totalprice) AS BIGINT) AS amt
           FROM orders
           UNION ALL
           SELECT CAST(o_custkey % 50 AS VARCHAR),
                  CAST(floor(o_totalprice) AS BIGINT)
           FROM orders WHERE o_orderkey % 4 = 0)
         SELECT dkey, count(*) AS n, CAST(sum(amt) AS BIGINT) AS total
         FROM delivered GROUP BY dkey""",
    "q_topk_udaf" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rank
           FROM orders) WHERE rank <= 2""",
    "q_sessionize" ->
      """WITH x AS (SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                THEN 1 ELSE 0 END AS brk
           FROM events)
         SELECT event_id, user_id, ts,
           CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         FROM x""",
    "q_scd2_timeline" -> scd2TimelineSql,
    // the streaming maintainer must land on the identical timeline
    "q_st16_stream_scd2" -> scd2TimelineSql,
    // sequential replay of the maintainer's late-row gate: open-run
    // state after each delivered prefix (change-point window, last run
    // wins), late = next tranche's rows older than their key's open
    // run, state update over pseudo-rows ∪ survivors — unrolled twice
    "q_st18_late_quarantine" ->
      """WITH ev AS (SELECT user_id AS k, event_type AS st, ts, event_id AS eid,
             event_id % 3 AS tr FROM events),
         t0 AS (SELECT k, st, ts, eid FROM ev WHERE tr = 0),
         t1 AS (SELECT k, st, ts, eid FROM ev WHERE tr = 1),
         t2 AS (SELECT k, st, ts, eid FROM ev WHERE tr = 2),
         s1 AS (
           SELECT k, st, ts, eid FROM (
             SELECT k, st, ts, eid,
               row_number() OVER (PARTITION BY k ORDER BY ts DESC, eid DESC) AS rno
             FROM (
               SELECT k, st, ts, eid,
                 (row_number() OVER w = 1 OR st IS DISTINCT FROM lag(st) OVER w) AS chg
               FROM t0
               WINDOW w AS (PARTITION BY k ORDER BY ts ASC, eid ASC))
             WHERE chg)
           WHERE rno = 1),
         late1 AS (SELECT t1.k, t1.st, t1.ts, t1.eid, s1.ts AS open_from
                   FROM t1 JOIN s1 ON t1.k = s1.k WHERE t1.ts < s1.ts),
         g1 AS (SELECT k, st, ts, eid FROM t1
                WHERE eid NOT IN (SELECT eid FROM late1)),
         u1 AS (SELECT k, st, ts, eid FROM s1
                UNION ALL SELECT k, st, ts, eid FROM g1),
         s2 AS (
           SELECT k, st, ts, eid FROM (
             SELECT k, st, ts, eid,
               row_number() OVER (PARTITION BY k ORDER BY ts DESC, eid DESC) AS rno
             FROM (
               SELECT k, st, ts, eid,
                 (row_number() OVER w = 1 OR st IS DISTINCT FROM lag(st) OVER w) AS chg
               FROM u1
               WINDOW w AS (PARTITION BY k ORDER BY ts ASC, eid ASC))
             WHERE chg)
           WHERE rno = 1),
         late2 AS (SELECT t2.k, t2.st, t2.ts, t2.eid, s2.ts AS open_from
                   FROM t2 JOIN s2 ON t2.k = s2.k WHERE t2.ts < s2.ts)
         SELECT k AS user_id, st AS event_type, ts, eid AS event_id, open_from
         FROM (SELECT * FROM late1 UNION ALL SELECT * FROM late2)""",
    // the drained streaming sessionizer must land on the identical
    // session set the batch gap-replay produces (q_session_window's
    // strict-boundary formulation, plus the per-session event count)
    "q_st22_stream_sessionize" ->
      """WITH x AS (SELECT user_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts) + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
           FROM events),
         s AS (SELECT user_id, ts,
           sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM x)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
         FROM s GROUP BY user_id, sid""",
    "q_session_window" ->
      """WITH x AS (SELECT user_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts) + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
           FROM events),
         s AS (SELECT user_id, ts,
           sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM x)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
         FROM s GROUP BY user_id, sid""",
    "q_pivot_events" ->
      """SELECT user_id,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error
         FROM events GROUP BY user_id""",
    "q_unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
                l_quantity AS val FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
         FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""",
    "q_source_wilson" ->
      s"""WITH $qualityCte,
          a AS (SELECT source, count(*) AS n_docs,
                  CAST(sum(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
                FROM scored GROUP BY 1)
          SELECT source, n_docs, n_pass,
            round(n_pass / CAST(n_docs AS DOUBLE), 6) AS pass_rate,
            round((n_pass / CAST(n_docs AS DOUBLE)
                   + (1.96 * 1.96) / (2.0 * CAST(n_docs AS DOUBLE))
                   - 1.96 * sqrt((n_pass / CAST(n_docs AS DOUBLE))
                       * (1.0 - n_pass / CAST(n_docs AS DOUBLE)) / CAST(n_docs AS DOUBLE)
                       + (1.96 * 1.96) / (4.0 * CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))))
                  / (1.0 + (1.96 * 1.96) / CAST(n_docs AS DOUBLE)), 6) AS wilson_lower
          FROM a""",
    "q_graph_triangles" ->
      s"""WITH ${ExtensionQueries.lshJaccardCtes},
          eg AS (SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
                 FROM lsh_pairs WHERE id_a <> id_b),
          dg AS (SELECT x, count(*) AS d FROM (
                   SELECT u AS x FROM eg UNION ALL SELECT v FROM eg)
                 GROUP BY 1),
          t AS (SELECT count(*) AS n_triangles
                FROM eg e1 JOIN eg e2 ON e1.v = e2.u
                           JOIN eg e3 ON e3.u = e1.u AND e3.v = e2.v),
          agg AS (SELECT (SELECT count(*) FROM dg) AS n_nodes,
                         (SELECT count(*) FROM eg) AS n_edges,
                         (SELECT sum(d * (d - 1)) FROM dg) AS w2)
          SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
                 CAST(n_edges AS BIGINT) AS n_edges,
                 CAST(n_triangles AS BIGINT) AS n_triangles,
                 CASE WHEN w2 > 0
                      THEN round(6.0 * n_triangles / w2, 6)
                      ELSE 0.0 END AS clustering_coeff
          FROM agg, t""",
    "q_kcore" ->
      s"""WITH ${ExtensionQueries.lshJaccardCtesFrom("documents", materializePairs = true)},
          ke0 AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
                  FROM lsh_pairs WHERE id_a <> id_b),
          kd1 AS (SELECT x, count(*) AS d FROM (
                     SELECT u AS x FROM ke0 UNION ALL SELECT v FROM ke0)
                   GROUP BY 1),
          kk1 AS (SELECT x FROM kd1 WHERE d >= 2),
          ke1 AS MATERIALIZED (SELECT e.u, e.v FROM ke0 e
                     JOIN kk1 a ON e.u = a.x JOIN kk1 b ON e.v = b.x),
          kd2 AS (SELECT x, count(*) AS d FROM (
                     SELECT u AS x FROM ke1 UNION ALL SELECT v FROM ke1)
                   GROUP BY 1),
          kk2 AS (SELECT x FROM kd2 WHERE d >= 2),
          ke2 AS MATERIALIZED (SELECT e.u, e.v FROM ke1 e
                     JOIN kk2 a ON e.u = a.x JOIN kk2 b ON e.v = b.x),
          kd3 AS (SELECT x, count(*) AS d FROM (
                     SELECT u AS x FROM ke2 UNION ALL SELECT v FROM ke2)
                   GROUP BY 1),
          kk3 AS (SELECT x FROM kd3 WHERE d >= 2),
          ke3 AS MATERIALIZED (SELECT e.u, e.v FROM ke2 e
                     JOIN kk3 a ON e.u = a.x JOIN kk3 b ON e.v = b.x),
          kd4 AS (SELECT x, count(*) AS d FROM (
                     SELECT u AS x FROM ke3 UNION ALL SELECT v FROM ke3)
                   GROUP BY 1),
          kk4 AS (SELECT x FROM kd4 WHERE d >= 2),
          ke4 AS MATERIALIZED (SELECT e.u, e.v FROM ke3 e
                     JOIN kk4 a ON e.u = a.x JOIN kk4 b ON e.v = b.x),
          kd5 AS (SELECT x, count(*) AS d FROM (
                     SELECT u AS x FROM ke4 UNION ALL SELECT v FROM ke4)
                   GROUP BY 1),
          kk5 AS (SELECT x FROM kd5 WHERE d >= 2),
          ke5 AS MATERIALIZED (SELECT e.u, e.v FROM ke4 e
                     JOIN kk5 a ON e.u = a.x JOIN kk5 b ON e.v = b.x),
          kd6 AS (SELECT x, count(*) AS d FROM (
                     SELECT u AS x FROM ke5 UNION ALL SELECT v FROM ke5)
                   GROUP BY 1),
          kk6 AS (SELECT x FROM kd6 WHERE d >= 2),
          ke6 AS MATERIALIZED (SELECT e.u, e.v FROM ke5 e
                     JOIN kk6 a ON e.u = a.x JOIN kk6 b ON e.v = b.x)
          SELECT x AS node, count(*) AS core_degree FROM (
            SELECT u AS x FROM ke6 UNION ALL SELECT v FROM ke6)
          GROUP BY 1""",
    "q_ts_gapfill" ->
      """WITH agg AS (
           SELECT event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) // 900 AS bucket,
                  count(*) AS n_events,
                  sum(CAST(value AS DECIMAL(18,4))) AS v
           FROM events GROUP BY 1, 2),
         span AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
                  FROM agg GROUP BY 1),
         grid AS (SELECT event_type, unnest(range(b0, b1 + 1)) AS bucket
                  FROM span)
         SELECT g.event_type,
                strftime(make_timestamp(g.bucket * 900 * 1000000),
                         '%Y-%m-%d %H:%M:%S') AS bucket_str,
                coalesce(n_events, 0) AS n_events,
                CAST(v AS DOUBLE) AS v_sum,
                CAST(last_value(v IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS v_ffill
         FROM grid g LEFT JOIN agg USING (event_type, bucket)""",
    "q_rolling_avg" ->
      """WITH p AS (SELECT event_id, user_id, ts,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
           CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase')
         SELECT event_id, user_id, ts,
           round(sum(cents) OVER w / 100.0 / count(*) OVER w, 4) AS avg_7d
         FROM p WINDOW w AS (PARTITION BY user_id ORDER BY sec
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""",
    "q_j_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_j_bucketed_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
         FROM orders GROUP BY o_custkey""",
    "q_asof_join" ->
      s"""WITH l AS (SELECT event_id, user_id, ts, value AS purchase_value
            FROM events WHERE event_type = 'purchase'),
          r0 AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
            FROM events WHERE event_type = 'click'),
          r AS (SELECT user_id, ts, click_id, click_value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY click_id DESC) AS rn
            FROM r0) WHERE rn = 1)
          SELECT l.event_id, l.user_id, l.ts, l.purchase_value, r.click_id, r.click_value
          FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts < l.ts""",
    "q_train_order" ->
      s"""WITH ep AS (SELECT doc_id, CAST(u.e AS BIGINT) AS epoch
            FROM documents, unnest(range(0, $orderEpochs)) AS u(e)),
          k AS (SELECT doc_id, epoch,
              CAST('0x' || substring(md5('$orderSalt' || ':' || CAST(epoch AS VARCHAR)
                || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS k
            FROM ep)
          SELECT doc_id, epoch, k % $orderShards AS shard,
            CAST(row_number() OVER (PARTITION BY epoch, k % $orderShards
              ORDER BY k, doc_id) AS BIGINT) AS pos
          FROM k""",
    "q_curriculum_anneal" ->
      s"""WITH $qualityCte,
          toks AS (SELECT doc_id,
              CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n
            FROM documents),
          base AS (SELECT s.doc_id, s.source,
              CAST(floor(s.q * 10000.0 + 0.5) AS BIGINT) AS qq, t.n
            FROM scored s JOIN toks t USING (doc_id)),
          eps(epoch, thr) AS (VALUES ${
            Curation.annealSchedule(currEpochs, currQ0, currQ1)
              .map { case (e, t) => s"(CAST($e AS BIGINT), CAST($t AS BIGINT))" }
              .mkString(", ")})
          SELECT e.epoch, round(CAST(e.thr AS DOUBLE) / 10000.0, 4) AS thr_q,
            b.source, count(*) AS n_docs, CAST(sum(b.n) AS BIGINT) AS n_tok,
            CAST(floor(CAST(sum(b.qq) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mean_qq
          FROM base b JOIN eps e ON b.qq >= e.thr
          GROUP BY 1, 2, 3""",
    "q_pack_stats" ->
      s"""WITH t AS (SELECT source,
            CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
          FROM documents),
          s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tot
                FROM t WHERE n_tok > 0 GROUP BY 1)
          SELECT source,
            (tot + $packWindowTokens - 1) // $packWindowTokens AS n_windows,
            tot AS n_tokens,
            ((tot + $packWindowTokens - 1) // $packWindowTokens) * $packWindowTokens
              - tot AS pad_tokens,
            (tot * 10000) // (((tot + $packWindowTokens - 1) // $packWindowTokens)
              * $packWindowTokens) AS fill_bp
          FROM s""",
    "q_st23_stream_reweight" -> streamReweightOracle,
    "q_dup_matrix" ->
      s"""WITH ${ExtensionQueries.lshJaccardCtes},
          sp AS (SELECT doc_id, source FROM documents)
          SELECT least(sa.source, sb.source) AS source_lo,
                 greatest(sa.source, sb.source) AS source_hi,
                 count(*) AS n_pairs,
                 round(max(p.jaccard), 4) AS max_sim,
                 round(CAST(sum(CAST(floor(p.jaccard * 1e4 + 0.5) AS BIGINT))
                     AS BIGINT) / 1e4 / count(*), 4) AS mean_sim
          FROM lsh_pairs p
            JOIN sp sa ON p.id_a = sa.doc_id
            JOIN sp sb ON p.id_b = sb.doc_id
          WHERE sa.source <> sb.source
          GROUP BY 1, 2""",
    "q_ngram_coverage" ->
      s"""WITH tk AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS t,
            ${ScaleQueries.splitCaseSql} AS split
          FROM documents),
          shv AS (SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS g
            FROM tk, unnest(range(1, greatest(len(t)-1, 1))) AS u(i)
            WHERE split = 'val' AND array_to_string(t[i:i+2], ' ') <> ''),
          sht AS (SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS g
            FROM tk, unnest(range(1, greatest(len(t)-1, 1))) AS u(i)
            WHERE split = 'train' AND array_to_string(t[i:i+2], ' ') <> '')
          SELECT v.source, count(*) AS n_val_grams,
            CAST(sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
            (CAST(sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000)
              // count(*) AS coverage_bp
          FROM shv v LEFT JOIN sht t ON v.g = t.g
          GROUP BY 1""",
    "q_mix_solve" -> {
      def round(k: Int) =
        s"""t$k AS (SELECT
              CAST(coalesce(sum(rawq) FILTER (WHERE asg < cap), 0) AS BIGINT) AS totq,
              $wfBudget - CAST(sum(asg) AS BIGINT) AS rem FROM a${k - 1}),
            a$k AS (SELECT source, avail, rawq, cap,
              least(cap, asg + CASE WHEN asg < cap AND totq > 0
                THEN (rem * rawq) // totq ELSE 0 END) AS asg
            FROM a${k - 1}, t$k)"""
      s"""WITH av AS (SELECT source,
            CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS avail
          FROM documents GROUP BY 1),
          a0 AS (SELECT source, avail,
            CAST(round(sqrt(CAST(avail AS DOUBLE)) * 1000000) AS BIGINT) AS rawq,
            avail * $wfMaxEpochs AS cap, CAST(0 AS BIGINT) AS asg
          FROM av),
          ${(1 to wfRounds).map(round).mkString(",\n          ")}
          SELECT source, avail AS avail_tokens, cap AS cap_tokens,
            asg AS target_tokens, asg = cap AS capped,
            (SELECT $wfBudget - CAST(sum(asg) AS BIGINT) FROM a$wfRounds) AS unassigned
          FROM a$wfRounds"""
    },
    "q_len_batching" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok
          FROM documents),
          b AS (SELECT doc_id, tok, tok // $lenBucketWidth AS bucket,
            row_number() OVER (PARTITION BY tok // $lenBucketWidth
              ORDER BY tok ASC, doc_id ASC) AS rn
          FROM t)
          SELECT bucket, (rn - 1) // $lenBatchB AS batch,
            count(*) AS n_docs, max(tok) AS batch_max,
            CAST(sum(tok) AS BIGINT) AS n_tokens,
            max(tok) * count(*) - CAST(sum(tok) AS BIGINT) AS pad_tokens
          FROM b GROUP BY 1, 2""",
    "q_domain_reweight" ->
      s"""WITH $qualityCte,
          $reweightCtes
          SELECT source, loss_u, CAST(w AS BIGINT) AS w_bp
          FROM w$reweightRounds""",
    "q_source_cap" ->
      s"""WITH $qualityCte
          SELECT source, doc_id, q, rank FROM (
            SELECT source, doc_id, q,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY q DESC, doc_id ASC) AS BIGINT) AS rank
            FROM scored) WHERE rank <= $srcCapK""",
    "q_split_by_cluster" ->
      s"""WITH RECURSIVE ${ExtensionQueries.lshJaccardCtes},
          edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
                    UNION SELECT id_b, id_a FROM lsh_pairs),
          reach(src, dst) AS (SELECT a, b FROM edges
                    UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
          comp AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src),
          lbl AS (SELECT d.doc_id,
                    least(d.doc_id, coalesce(c.mn, d.doc_id)) AS component
                  FROM documents d LEFT JOIN comp c ON c.src = d.doc_id)
          SELECT doc_id, component,
            CASE WHEN CAST('0x' || substring(md5('$clusterSplitSalt:'
                   || CAST(component AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9000
                 THEN 'train'
                 WHEN CAST('0x' || substring(md5('$clusterSplitSalt:'
                   || CAST(component AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9500
                 THEN 'val'
                 ELSE 'test' END AS split
          FROM lbl"""
  )
}

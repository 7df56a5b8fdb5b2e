package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text
import graft.operators.Similarity

/** Training-data-pipeline extension queries (dedup / similarity / text
  * analysis) with DuckDB oracle SQL. The heavier oracle statements
  * (minhash bands, 64-bit simhash bit sums, dot-product folds) are
  * generated from the same constants the Spark plans use, so both sides
  * stay in lockstep by construction.
  */
object ExtensionQueries {
  private type Q = (SparkSession, String) => DataFrame

  // Deterministic 64-dim query vector for the ANN queries: multiples of
  // 0.1 in [-0.9, 0.9], exactly representable in SQL literals.
  val queryVec: Seq[Double] = (0 until 64).map(d => ((d * 37 % 19) - 9) / 10.0)
  private val numPlanes = 8
  private val bitextMinMarginBp = 10200L // mined-pair margin floor: 1.02

  /** Memoized embeddings-table row count per (dir, listing fingerprint)
    * — the one scalar the adaptive-plane queries need BEFORE plan
    * construction (the plane count shapes the expression tree, so it
    * cannot ride the plan). Parquet count(*) reads footer metadata
    * only; the memo makes it once per (JVM, dataset) — a production
    * deployment reads the same number from catalog statistics. The
    * fingerprint keys on (name, length, mtime) of the file tree, so a
    * dataset regenerated at the same path within one JVM re-counts
    * instead of serving a stale plane count. */
  private val embCountMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def embeddingsCount(spark: SparkSession, dir: String): Long =
    embCountMemo.computeIfAbsent(
      dir + "|" + graft.io.TempDirs.listingFingerprint(s"$dir/embeddings.parquet"),
      _ => Long.box(Tables.embeddings(spark, dir).count())).longValue()

  /** Corpus-derived hyperplane count for the embed-LSH blocked
    * self-joins ([[Similarity.adaptivePlanes]]): equals `numPlanes` (8)
    * through n = 8192 — every correctness/bench scale, so oracles and
    * floors at sf0.01/sf0.1 are bit-identical to the fixed-plane form —
    * then gains a plane per doubling, which is what keeps blocked
    * candidates ~n·32 instead of n²/256 at probe/production scale. */
  private def adaptivePlanesFor(spark: SparkSession, dir: String): Int =
    Similarity.adaptivePlanes(embeddingsCount(spark, dir))
  /** Degenerate-bucket cap for the embed-LSH self-joins: 32× the
    * ladder's ~32 target occupancy, so it NEVER binds on a healthy
    * corpus (pinned by the recall-parity spec at both test scales and
    * non-binding at the measured 1000× decade, occupancy ~30) and
    * bounds the candidate relation at buckets·cap² under pathological
    * skew (hubs, collapsed models, zero vectors). */
  private[graft] val embedLshBucketCap = 1024
  private val topicBalanceN = 5          // members kept per k-means cell
  private val topicBalanceSalt = "tb5"
  private[graft] val minhashN = 16
  private[graft] val rowsPerBand = 4
  private[graft] val lshBucketCap = 100
  private[graft] val jaccardThreshold = 0.8
  private val shingleFreqCap = 1000L
  // Canonical Manku-style config: 16-bit chunks, Hamming <= 3. The chunk
  // value space (65536) controls candidate volume — 8-bit chunks (256
  // values) made buckets ~= corpus/256 and the verify stage quadratic
  // enough to dominate the whole bench at sf0.1 (23s); 16-bit chunks cut
  // candidates by orders of magnitude and the <=3 band is where actual
  // near-dups live (>=5 is fingerprint noise).
  private val simhashChunks = 4      // 16-bit chunks of the 64-bit fingerprint
  private val simhashMaxHamming = 3  // pigeonhole: < simhashChunks
  private[graft] val semThreshold = 0.95    // semantic-dedup cosine-to-exemplar cut
  private val pqM = 4                // PQ subspaces (64 dims -> 4 x 16)
  private val mmMinTokens = 10       // cross-modal curation token floor

  // =====================================================================
  // Spark queries
  // =====================================================================

  /** Token counting: whitespace + BPE-ish regex (Text ops T-token). */
  private val qTTokens: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"),
        Text.tokenCount(col("text")).cast(LongType).as("n_ws"),
        Text.bpeTokenCount(col("text")).cast(LongType).as("n_bpe"))

  /** Language ID via stopword-hit argmax with declaration-order ties. */
  private val qTLangId: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))

  /** Composite quality score. */
  private val qTQuality: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), Text.qualityScore(col("text")).as("q"))

  /** Order-insensitive bag-of-words fingerprint. */
  private val qTFingerprint: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))

  /** Exact content-hash dedup groups. */
  private val qSimExactDedup: Q = (spark, dir) =>
    Similarity.exactDedup(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text")

  /** MinHash signatures (16 hashes over distinct 3-shingles). */
  private val qSimMinhash: Q = (spark, dir) =>
    Similarity.minhashSignature(
      Similarity.shingles(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text", 3),
      "doc_id", minhashN)

  /** Estimated jaccard on LSH candidate pairs from signature agreement —
    * the no-reverify scoring path (k-long signature join instead of the
    * shingle-relation joins). */
  private val qSimMinhashEst: Q = (spark, dir) => {
    val sh = Similarity.shingles(Tables.fanOut(Tables.documents(spark, dir)),
      "doc_id", "text", 3)
    // six consumers (cap agg, two self-join sides, two estimate joins):
    // persist the tiny signature relation; the harness clears caches
    // after each query.
    val sig = Similarity.minhashSignature(sh, "doc_id", minhashN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val pairs = Similarity.lshCandidatePairs(sig, "doc_id", minhashN,
      rowsPerBand, lshBucketCap)
    Similarity.minhashJaccardEstimate(pairs, sig, "doc_id", minhashN)
  }

  /** Estimator calibration: the |signature-estimate − exact jaccard|
    * error histogram over the LSH candidate pairs — the measure-don't-
    * guess eval a user runs before choosing the no-reverify estimator
    * path over the exact verify (k=16 signatures: sd ≈ √(J(1−J)/16) ≈
    * 0.1, so mass should sit in the low percent-buckets). One shingle pass
    * and one signature pass feed BOTH scorers; candidates are persisted
    * once for the two joins; zero-overlap candidates score exact 0 via
    * the left join.
    *
    * Release contract: the intermediates (shingles, signatures,
    * candidates) are unpersisted here; the returned k-row histogram
    * stays persisted and is released by the caller (the harness clears
    * caches after each query). */
  private val qMinhashCalibration: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val sh = Similarity.shingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = Similarity.minhashSignature(sh, "doc_id", minhashN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val cands = Similarity.lshCandidatePairs(sig, "doc_id", minhashN,
        rowsPerBand, lshBucketCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands.count()
    val est = Similarity.minhashJaccardEstimate(cands, sig, "doc_id", minhashN)
    val exact = Similarity.jaccardForPairs(cands, sh, "doc_id", threshold = 0.0)
    val out = est.join(exact, Seq("id_a", "id_b"), "left")
      .select(floor(abs(col("jaccard_est") - coalesce(col("jaccard"), lit(0.0)))
        * 100).cast(LongType).as("err_bucket"))
      .groupBy(col("err_bucket")).agg(count(lit(1)).as("n_pairs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    Seq(cands, sig, sh).foreach(Similarity.release)
    out
  }

  /** LSH candidate near-duplicate pairs (4 bands × 4 rows, bucket cap). */
  private val qSimLshPairs: Q = (spark, dir) =>
    Similarity.minhashLsh(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text",
      shingleN = 3, numHashes = minhashN, rowsPerBand = rowsPerBand,
      maxBucketSize = lshBucketCap)

  /** 64-bit SimHash fingerprints. */
  private val qSimSimhash: Q = (spark, dir) =>
    Similarity.simhashFingerprint(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text")

  /** SimHash near-dup pairs: 8-bit chunk blocking (pigeonhole over
    * Hamming <= 7), exact Hamming verify inside blocks. */
  private val qSimSimhashPairs: Q = (spark, dir) =>
    Similarity.simhashNearDupPairs(Tables.fanOut(Tables.documents(spark, dir)),
      "doc_id", "text", maxHamming = simhashMaxHamming, chunks = simhashChunks,
      maxBucketSize = lshBucketCap)

  /** Within-document repetition: duplicated-3-gram fraction (a
    * MassiveText-style quality signal; 0.0 for docs below shingle
    * width). */
  private val qTRepetition: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val arr =
      if (spark.catalog.functionExists("word_shingles"))
        expr("word_shingles(text, 3)")
      else Similarity.shinglesArray(col("text"), 3)
    docs.select(col("doc_id"),
      when(size(arr) > 0,
        round(lit(1.0) - size(array_distinct(arr)).cast(DoubleType) / size(arr), 4))
        .otherwise(lit(0.0)).as("repetition"))
  }

  /** Exact n-gram Jaccard pairs above threshold (shingle-freq capped). */
  private val qSimJaccard: Q = (spark, dir) =>
    Similarity.ngramJaccardPairs(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text",
      n = 3, threshold = jaccardThreshold, maxShingleFreq = shingleFreqCap)

  /** LSH-gated exact jaccard: banding prunes the pair space, exact
    * jaccard verifies survivors — the documented corpus-scale dedup
    * composition, end-to-end under the oracle. */
  private val qSimLshJaccard: Q = (spark, dir) =>
    Similarity.lshJaccard(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text",
      shingleN = 3, numHashes = minhashN, rowsPerBand = rowsPerBand,
      maxBucketSize = lshBucketCap, threshold = jaccardThreshold)

  /** End-to-end curation composition — the LLM-pipeline analog of E2:
    * language filter → quality gate → exact content dedup (keep lowest
    * id) → per-source corpus stats. Filters and projections stay on the
    * scan; the only shuffles are the dedup's content-hash exchange and
    * the final small aggregation. */
  private val qCurate: Q = (spark, dir) => {
    val enriched = Tables.fanOut(Tables.documents(spark, dir)).select(
      col("doc_id"), col("source"), col("text"),
      Text.langId(col("text")).as("lang"),
      Text.qualityScore(col("text")).as("q"),
      Text.tokenCount(col("text")).as("n_tok"))
    val gated = enriched.filter(col("lang") === "en" && col("q") >= 0.3)
    val kept = graft.operators.Relational.dedupKeepFirst(
      gated.withColumn("ch", md5(col("text"))), Seq("ch"), col("doc_id"))
    kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("n_tokens"))
  }

  /** Brute-force cosine top-10 against the constant query vector. */
  private val qSimCosineTopk: Q = (spark, dir) =>
    Similarity.bruteForceTopK(Tables.fanOut(Tables.embeddings(spark, dir)), "vec_id", "embedding",
      Similarity.vecLit(queryVec), 10)

  private val matryoshkaDims = Seq(8, 16, 32, 64)

  /** Matryoshka recall curve: recall@10 of prefix-dim cosine top-10
    * (dims 8/16/32/64) against the full-dim ground truth — the
    * memory/quality trade-off eval for truncatable embeddings
    * (Kusupati et al., MRL). A 100 TB ANN deployment that can serve at
    * dim 16 stores and shuffles 4× less than dim 64; this query
    * measures what that truncation costs in recall. Each dim is one
    * map-side `slice` + TakeOrderedAndProject over the corpus — no
    * per-dim shuffle, and the bounded top-10 lists join broadcast. */
  private val qEmbedMatryoshka: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Similarity.vecLit(queryVec), 10)
    matryoshkaDims.map { d =>
      val trunc = emb.select(col("vec_id"),
        slice(col("embedding"), 1, d).as("embedding"))
      val cand = Similarity.bruteForceTopK(trunc, "vec_id", "embedding",
        Similarity.vecLit(queryVec.take(d)), 10)
      Similarity.recallAtK(cand, truth, "vec_id", 10)
        .select(lit(d.toLong).as("dim"), col("n_hits"), col("recall"))
    }.reduce(_ union _)
  }

  /** Hyperplane-LSH ANN top-10 with Hamming-radius-1 multi-probe. */
  private val qSimAnnLsh: Q = (spark, dir) =>
    Similarity.lshAnnTopK(Tables.fanOut(Tables.embeddings(spark, dir)), "vec_id", "embedding",
      queryVec, numPlanes, 10, probeRadius = 1)

  /** IVF ANN top-10: deterministic coarse centroids, 3-cell probe. */
  private val qSimIvfAnn: Q = (spark, dir) =>
    Similarity.ivfAnnTopK(Tables.fanOut(Tables.embeddings(spark, dir)), "vec_id", "embedding",
      queryVec, centroidStep = 50, nprobe = 3, k = 10)

  /** Recall@10 of the IVF probe against brute-force cosine ground
    * truth — the index-quality eval: how much of the true top-10 the
    * 3-cell probe recovers. */
  private val qAnnRecall: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    Similarity.recallAtK(
      Similarity.ivfAnnTopK(emb, "vec_id", "embedding", queryVec,
        centroidStep = 50, nprobe = 3, k = 10),
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        Similarity.vecLit(queryVec), 10),
      "vec_id", 10)
  }

  /** Semantic benchmark decontamination: every corpus vector scored by
    * max cosine against the (broadcast) benchmark slice — the
    * paraphrase-leakage companion to the n-gram `contaminationReport`
    * (see [[graft.operators.Curation.semanticContamination]]). Bench =
    * the same doc_id residue class the curation pipeline holds out. */
  private[graft] val semDecontamThreshold = 0.32
  private val qSemanticDecontam: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val isBench = pmod(col("vec_id"), lit(CurationQueries.benchMod.toLong)) ===
      CurationQueries.benchRem.toLong
    graft.operators.Curation.semanticContamination(
      emb.filter(!isBench), "vec_id", "embedding",
      emb.filter(isBench), semDecontamThreshold)
  }

  /** PRODUCTION-SHAPE decontamination probe: the corpus scales with the
    * dataset but the benchmark is pinned to the 1×-dataset residue slice
    * (vec_id < fixedBenchCap — the sf0.1 embeddings row count), the way
    * a real eval suite stays fixed while the training corpus grows.
    * q_semantic_decontam's own probe bench is a residue class GROWING
    * with n, so its measured exponent (p≈0.93) is the synthetic-bench
    * artifact, not the production cost model; this variant measures the
    * fixed-bench shape the SCALE.md linearity claim is actually about.
    * At the oracle scales (≤2000 vectors) the cap is non-binding, so
    * the result equals q_semantic_decontam's there — the cap only bites
    * at probe scales. */
  private[graft] val fixedBenchCap = 2000L
  private val qSemanticDecontamFixedbench: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val isBench = pmod(col("vec_id"), lit(CurationQueries.benchMod.toLong)) ===
      CurationQueries.benchRem.toLong
    graft.operators.Curation.semanticContamination(
      emb.filter(!isBench), "vec_id", "embedding",
      emb.filter(isBench && col("vec_id") < fixedBenchCap),
      semDecontamThreshold)
  }

  /** Embedding-cosine near-dup pairs, bucket-blocked self-join. The
    * plane count derives from the corpus size ([[adaptivePlanesFor]]):
    * fixed blocking is asymptotically quadratic; a plane per corpus
    * doubling keeps the candidate relation ~n·targetPerBucket. */
  private val qSimEmbedDedup: Q = (spark, dir) =>
    Similarity.embedNearDupPairs(Tables.fanOut(Tables.embeddings(spark, dir)), "vec_id", "embedding",
      adaptivePlanesFor(spark, dir), queryVec.length, threshold = 0.4,
      bucketCap = embedLshBucketCap)

  /** Margin-based bitext mining over the embedding corpus: even labels
    * are side A, odd labels side B (the two "languages"); mined pairs
    * are per-A argmax-margin candidates clearing the margin floor
    * ([[Similarity.bitextMarginMine]] — Artetxe & Schwenk's ratio
    * margin over LSH-blocked candidates, all-integer arithmetic).
    * Plane count is corpus-derived ([[adaptivePlanesFor]]) — the r18
    * probe measured the fixed-plane candidate relation going 7.5× in
    * the second decade; the log2(n) ladder is the engineered fix. */
  private val qBitextMargin: Q = (spark, dir) =>
    Similarity.bitextMarginMine(Tables.fanOut(Tables.embeddings(spark, dir)),
      "vec_id", "embedding", col("label") % 2,
      adaptivePlanesFor(spark, dir), queryVec.length,
      bitextMinMarginBp, bucketCap = embedLshBucketCap)

  /** Multi-probe near-dup pairs: Hamming-radius-1 bucket expansion on
    * one side of the blocked self-join recovers boundary-crossing
    * neighbours the same-bucket block misses. */
  private val qSimEmbedProbed: Q = (spark, dir) =>
    Similarity.embedNearDupPairsProbed(Tables.fanOut(Tables.embeddings(spark, dir)),
      "vec_id", "embedding", numPlanes, queryVec.length, threshold = 0.4)

  /** JL random projection of the corpus embeddings to numPlanes dims,
    * exploded to (vec_id, j, proj) scalars for the cell compare. The
    * projection matrix is the LSH's Rademacher family, so this is the
    * un-signed half of the bucket computation made first-class. */
  private val qEmbedProject: Q = (spark, dir) =>
    Similarity.randomProjection(Tables.fanOut(Tables.embeddings(spark, dir)),
      "embedding", numPlanes, queryVec.length)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "proj")))
      .select(col("vec_id"), col("j").cast(LongType).as("j"),
        round(col("proj"), 6).as("proj"))

  /** IVF cell-occupancy report: vectors per cell and quantized mean
    * norm — the index-health check run before trusting an IVF layout
    * (skewed cells → probe cost skews with them). Aggregates the
    * broadcast-assign relation straight down to |cells| rows; the mean
    * rides an integer-quantized norm sum, so it is addition-order
    * independent. */
  private val qIvfCells: Q = (spark, dir) => {
    val assigned = Similarity.ivfAssign(
      Tables.fanOut(Tables.embeddings(spark, dir)), "vec_id", "embedding",
      centroidStep = 50)
    val qn = floor(
      Similarity.normOf(assigned, col("embedding")) * 1e6 + 0.5)
      .cast(LongType)
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(qn).as("__qs"))
      .select(col("cell"), col("n"),
        round(col("__qs").cast(DoubleType) / 1e6 / col("n"), 4).as("mean_norm"))
  }

  /** Per-cell canonical vector — the member nearest its centroid with
    * the cell population: semantic dedup's keep-one-exemplar step on
    * the vector side, as a max aggregation (no corpus window sort). */
  private val qCellReps: Q = (spark, dir) =>
    Similarity.cellRepresentatives(
      Tables.fanOut(Tables.embeddings(spark, dir)), "vec_id", "embedding",
      centroidStep = 50)

  /** Topic-balanced selection: the trained k-means cells act as topic
    * strata and every cell contributes exactly 5 members (salted-hash
    * order) — the cluster-balanced sampling move that stops one dense
    * region of embedding space from dominating a curated subset
    * (diversity-aware selection, the sampling sibling of SemDeDup's
    * keep-one-exemplar). Same trained quantizer as q_sim_ivf_kmeans,
    * same exact-N machinery as q_exact_sample — composition, one
    * corpus assignment, one per-cell window over cell-local rows. */
  private val qTopicBalance: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      centroidStep = 50, iters = 2)
    val assigned = Similarity.ivfAssignTo(emb, "vec_id", "embedding", cent)
      .select(col("vec_id"), col("cell"))
    graft.operators.Curation.exactSample(assigned, "cell", col("vec_id"),
      n = topicBalanceN, salt = topicBalanceSalt)
      .select(col("vec_id"), col("cell"))
  }

  private[graft] val outlierCosFloorU = 250000L // cos 0.25 in ×1e6 units
  private[graft] val hardNegAnchorMod = 10L
  private[graft] val hardNegK = 3

  /** Per-cell label purity of the trained quantizer — the clustering-
    * quality eval an embedding model answers to: if k-means cells mix
    * labels, the embedding space does not separate the classes and
    * every cell-based curation step (topic balance, semantic dedup)
    * inherits that blur. Majority label per cell via the packed-argmax
    * idiom (count·1024 + complemented label — a map-side max, never a
    * window); purity = majority share in bp. */
  private val qClusterPurity: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      centroidStep = 50, iters = 2)
    Similarity.labelPurity(
      Similarity.ivfAssignTo(emb, "vec_id", "embedding", cent)
        .select(col("vec_id"), col("cell"))
        .join(emb.select(col("vec_id"), col("label")), Seq("vec_id")),
      "cell", "label")
  }

  /** Embedding-space outliers: every vector's cosine to its OWN trained
    * centroid, flagged below a fixed floor — the semantic-garbage gate
    * (OCR noise, wrong-modality rows) that catches what text heuristics
    * cannot see. One broadcast-assign pass; the flag is a projection. */
  private val qEmbedOutliers: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    Similarity.embedOutliers(emb, "vec_id", "embedding",
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        centroidStep = 50, iters = 2),
      outlierCosFloorU)
  }

  /** Hard-negative mining for contrastive training: per anchor (every
    * `hardNegAnchorMod`-th vector), the top-k highest-cosine vectors of
    * a DIFFERENT label inside the anchor's adaptive-prefix LSH bucket —
    * near misses are the negatives that teach a margin. Same-bucket
    * blocking keeps candidates ~n·targetPerBucket/mod at any corpus
    * size (the adaptive-plane ladder again); the top-k rides the
    * bounded TopK UDAF, map-side ≤ k rows per anchor. */
  private val qHardNegatives: Q = (spark, dir) =>
    Similarity.hardNegatives(Tables.fanOut(Tables.embeddings(spark, dir)),
      "vec_id", "embedding", "label", hardNegAnchorMod,
      adaptivePlanesFor(spark, dir), queryVec.length, hardNegK)

  /** Semantic dedup over the embedding corpus: survivors of the
    * keep-one-exemplar-per-neighborhood pass (members below 0.95
    * cosine to their cell's representative, plus the representatives).
    * Runs the PRODUCTION path — a trained bounded-k quantizer (2 Lloyd
    * iterations from the every-50th seed, same training as
    * q_sim_ivf_kmeans) passed explicitly, so the rep broadcast is O(k),
    * not O(corpus/step). */
  private val qSemanticDedup: Q = (spark, dir) =>
    trainedSemanticSurvivors(Tables.fanOut(Tables.embeddings(spark, dir)))

  /** Trained-quantizer semantic-dedup survivors — ONE definition shared
    * by q_semantic_dedup and q_curate_multimodal, so the training
    * constants cannot drift from the shared `semanticDedupCtes` oracle
    * chain. */
  private def trainedSemanticSurvivors(emb: DataFrame): DataFrame = {
    val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      centroidStep = 50, iters = 2)
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      cent, threshold = semThreshold)
    Similarity.release(cent)
    out
  }

  /** Cross-modal curation capstone: a document survives only when BOTH
    * modalities pass — its text clears the token floor AND its
    * embedding survives semantic dedup. The doc table joins the
    * survivor relation on the shared id; at scale the text gate is a
    * pure projection and the vector gate never shuffles the corpus
    * after assignment, so the composition inherits both scale shapes. */
  private val qCurateMultimodal: Q = (spark, dir) => {
    val surv = trainedSemanticSurvivors(Tables.fanOut(Tables.embeddings(spark, dir)))
    Tables.fanOut(Tables.documents(spark, dir))
      .join(surv, col("doc_id") === col("vec_id"))
      .withColumn("n_tok", Text.tokenCount(col("text")).cast(LongType))
      .filter(col("n_tok") >= mmMinTokens)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cell"))
  }

  /** Product-quantization ADC top-10: 4 subspaces × 16 dims, per-
    * subspace codebooks trained by two deterministic Lloyd rounds from
    * every-50th seeds, query scored against the codes alone via the
    * broadcast distance table ([[graft.operators.Pq]]). */
  private val qSimPqAdc: Q = (spark, dir) =>
    graft.operators.Pq.adcTopK(Tables.fanOut(Tables.embeddings(spark, dir)),
      "vec_id", "embedding", queryVec, m = pqM, dims = queryVec.length,
      centroidStep = 50, iters = 2, k = 10)

  /** IVF-PQ top-10: trained coarse probe (3 cells) + ADC re-rank from
    * PQ codes — the FAISS-style composition, nothing reads a raw
    * vector at query time ([[graft.operators.Pq.ivfPqTopK]]). */
  private val qSimIvfPq: Q = (spark, dir) =>
    graft.operators.Pq.ivfPqTopK(Tables.fanOut(Tables.embeddings(spark, dir)),
      "vec_id", "embedding", queryVec, coarseStep = 50, coarseIters = 2,
      nprobe = 3, m = pqM, dims = queryVec.length, pqStep = 50, pqIters = 2,
      k = 10)

  /** IVF-PQ over a PERSISTED index — the build-once/query-many
    * deployment shape of [[qSimIvfPq]]: the first invocation per (JVM,
    * data dir) trains the quantizers and writes the codes relation
    * partitioned by coarse cell; every query after that reads the tiny
    * centroid/codebook relations plus exactly `nprobe` cell
    * directories (partition pruning, no corpus scan, no re-coding).
    * Same oracle as q_sim_ivf_pq by construction — routing and coding
    * are per-row deterministic, so build-time codes equal query-time
    * codes. In a probe/bench run the untimed warmup pays the build and
    * the timed passes measure the query path alone, which is the
    * number that matters at 100 TB (a production index is built once
    * per corpus version, probed millions of times). */
  private val qIvfPqIndexed: Q = (spark, dir) => {
    // Keyed on a listing fingerprint, not just the path: a dataset
    // regenerated at the same dir within this JVM maps to a FRESH index
    // dir (no stale serves). The build is synchronized on the keyed Path
    // (one instance per key) so concurrent first-queries can't race the
    // _SUCCESS check-then-build.
    val idxPath = graft.io.TempDirs.keyed("graft-ivfpq-idx",
      s"$dir|${graft.io.TempDirs.listingFingerprint(s"$dir/embeddings.parquet")}")
    val idx = idxPath.toString
    idxPath.synchronized {
      if (!new java.io.File(s"$idx/codes/_SUCCESS").exists())
        graft.operators.Pq.buildIvfPqIndex(
          Tables.fanOut(Tables.embeddings(spark, dir)), "vec_id", "embedding",
          coarseStep = 50, coarseIters = 2, m = pqM, dims = queryVec.length,
          pqStep = 50, pqIters = 2, indexRoot = idx)
    }
    graft.operators.Pq.ivfPqTopKIndexed(spark, idx, "vec_id", queryVec,
      subLen = queryVec.length / pqM, nprobe = 3, k = 10)
  }

  /** ST19 — streaming ANN index maintenance: the embedding corpus
    * arrives in three out-of-order micro-batches (residues 2, 0, 1);
    * each trigger routes + PQ-codes its vectors against quantizers
    * trained OFFLINE on the full corpus and appends them to the
    * cell-partitioned codes store. The final probe scores the store —
    * and must equal the batch IVF-PQ over everything delivered
    * (same oracle as q_sim_ivf_pq), since routing and coding are
    * per-row deterministic and the store is append-only. */
  private val qSt19StreamAnn: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val coarse = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      centroidStep = 50, iters = 2)
    val books = graft.operators.Pq.codebooks(emb, "vec_id", "embedding",
      m = pqM, dims = queryVec.length, centroidStep = 50, iters = 2)
    val in = graft.io.TempDirs.registered("graft-q-st19-in").toString
    val idx = graft.io.TempDirs.registered("graft-q-st19-idx").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st19-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(2L, 0L, 1L).zipWithIndex.foreach { case (r, s) =>
      emb.filter(pmod(col("vec_id"), lit(3L)) === r)
        .coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, emb.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingAnnIndex(src, "vec_id", "embedding",
      coarse, books, subLen = queryVec.length / pqM, idx, ckpt)
    graft.streaming.Streaming.annIndexTopK(spark, idx, coarse, books,
      subLen = queryVec.length / pqM, queryVec, nprobe = 3, k = 10)
      .select(col("id").as("vec_id"), col("adc_dist"))
  }

  /** ST19b — recall across a compaction boundary: vectors are delivered
    * in two batches where the SECOND re-delivers a subset of ids with
    * NEGATED embeddings (a cosine-space antipode — a guaranteed
    * cross-cell move under any non-degenerate coarse quantizer), so the
    * store holds genuinely stale rows in the movers' old cells. The
    * full-probe top-k is computed immediately BEFORE compaction
    * (latest-batch-wins resolution over live + stale rows) and again
    * AFTER [[graft.streaming.Streaming.compactAnnIndex]] rewrites the
    * store to latest-only — and both must equal the batch IVF-PQ over
    * the post-update corpus: compaction is a layout change, never a
    * semantic one. The before-side result is eagerly materialized
    * (localCheckpoint) so its scan can't lazily observe the compacted
    * files. Quantizers train on the post-update corpus (the oracle's
    * training chain reads the same modified set). */
  private val qSt19bCompactRecall: Q = (spark, dir) => {
    val embRaw = Tables.fanOut(Tables.embeddings(spark, dir))
    val movedCond = pmod(col("vec_id"), lit(37L)) === 3L
    val latest = embRaw.withColumn("embedding",
      when(movedCond, transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))
    val coarse = Similarity.kmeansCentroids(latest, "vec_id", "embedding",
      centroidStep = 50, iters = 2)
    val books = graft.operators.Pq.codebooks(latest, "vec_id", "embedding",
      m = pqM, dims = queryVec.length, centroidStep = 50, iters = 2)
    val in = graft.io.TempDirs.registered("graft-q-st19b-in").toString
    val idx = graft.io.TempDirs.registered("graft-q-st19b-idx").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st19b-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(embRaw, latest.filter(movedCond)).zipWithIndex.foreach { case (d, s) =>
      d.coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, embRaw.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingAnnIndex(src, "vec_id", "embedding",
      coarse, books, subLen = queryVec.length / pqM, idx, ckpt)
    // full probe: every trained cell — the narrow-probe staleness window
    // is annIndexTopK's documented contract, not what this witnesses
    val nprobe = coarse.count().toInt
    val before = graft.streaming.Streaming.annIndexTopK(spark, idx, coarse,
        books, subLen = queryVec.length / pqM, queryVec, nprobe, k = 10)
      .select(col("id"), col("adc_dist").as("adc_before"))
      .localCheckpoint()
    graft.streaming.Streaming.compactAnnIndex(spark, idx)
    val after = graft.streaming.Streaming.annIndexTopK(spark, idx, coarse,
        books, subLen = queryVec.length / pqM, queryVec, nprobe, k = 10)
      .select(col("id"), col("adc_dist").as("adc_after"))
    before.join(after, Seq("id"))
      .select(col("id").as("vec_id"), col("adc_before"), col("adc_after"))
  }

  /** Recall@10 of PQ-ADC against exact squared-L2 ground truth — the
    * compression-side index eval (the IVF recalls measure ROUTING loss;
    * this measures CODING loss: how much the m-subspace quantization
    * distorts the ranking). On this synthetic corpus the number is LOW
    * by design: near-uniform vectors have no cluster structure for 10
    * codewords per subspace to exploit, which is exactly what the eval
    * exists to expose — production tuning raises k toward 256 and
    * watches this query until it clears the target. */
  private val qPqRecall: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val ann = graft.operators.Pq.adcTopK(emb, "vec_id", "embedding",
      queryVec, m = pqM, dims = queryVec.length, centroidStep = 50,
      iters = 2, k = 10)
    val l2 = round((0 until queryVec.length).map { i =>
      val d = element_at(col("embedding"), i + 1).cast(DoubleType) - lit(queryVec(i))
      d * d
    }.reduce(_ + _), 6)
    val truth = emb.select(col("vec_id"), l2.as("__d2"))
      .orderBy(col("__d2").asc, col("vec_id").asc).limit(10)
    Similarity.recallAtK(ann, truth, "vec_id", 10)
  }

  /** Per-subspace PQ quantization MSE after the trained rounds — the
    * codebook-health report read before shipping an index build. */
  private val qPqDistortion: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val books = graft.operators.Pq.codebooks(emb, "vec_id", "embedding",
      m = pqM, dims = queryVec.length, centroidStep = 50, iters = 2)
    graft.operators.Pq.distortion(emb, "vec_id", "embedding", books,
      subLen = queryVec.length / pqM)
      .select(col("sub").cast(LongType).as("sub"), col("n"), col("mse"))
  }

  /** Shared feature bank for the learned length-class filter: surface
    * signals with established SQL mirrors (unit-scaled), weak label =
    * the stored n_chars class — the one signal this synthetic corpus
    * genuinely encodes (its text is distributionally identical across
    * lang/source tags, so those labels are unlearnable by design). */
  private def learnFeatures: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "ntok"  -> (Text.tokenCount(col("text")) / lit(200.0)),
    "mtl"   -> (Text.meanTokenLength(col("text")) / lit(10.0)),
    "punct" -> Text.punctRatio(col("text")))
  private def learnLabel = (col("n_chars") > 306).cast(DoubleType)
  private val learnLr = 4.0
  private val learnIters = 8

  /** Trained quality-filter weights: 3 rounds of deterministic batch
    * GD (hard sigmoid, quantized gradients) on lang='en' weak labels —
    * the CCNet/fastText-filter trainer as a first-class distributed
    * operator ([[graft.operators.Learn.logisticTrain]]). */
  private val qLearnLogreg: Q = (spark, dir) =>
    graft.operators.Learn.logisticTrain(
      Tables.fanOut(Tables.documents(spark, dir)), learnFeatures,
      learnLabel, learnLr, learnIters)

  /** Per-document scores under the trained filter — the gate a corpus
    * run applies at scan time (weights collected to literals: a pure
    * codegen'd projection, zero joins). */
  private val qLearnScore: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val w = graft.operators.Learn.logisticTrain(docs, learnFeatures,
      learnLabel, learnLr, learnIters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    docs.select(col("doc_id"),
      graft.operators.Learn.logisticScore(learnFeatures, w).as("score"))
  }

  /** Holdout evaluation of the learned filter: fit on the 90% train
    * split (the same deterministic hash split every split-aware query
    * shares), score the held-out 10%, report one accuracy row — the
    * generalization check a filter must pass before gating a corpus.
    * Scale shape: the split predicate gates the TRAINING scans
    * map-side (no materialized split table), the holdout pass is one
    * scan + a single-row aggregate. */
  private val qLearnHoldout: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .withColumn("__split", ScaleQueries.splitColumn)
    val w = graft.operators.Learn.logisticTrain(
      docs.filter(col("__split") === "train"), learnFeatures,
      learnLabel, learnLr, learnIters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    docs.filter(col("__split") =!= "train")
      .select((graft.operators.Learn.logisticScore(learnFeatures, w) >= 0.5)
        .as("__pred"), (learnLabel === 1.0).as("__y"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__pred") === col("__y"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("n_test"), col("n_correct"),
        round(col("n_correct") / col("n_test"), 4).as("accuracy"))
  }

  /** ROC AUC of the trained filter on its corpus — the threshold-free
    * eval via the integer-exact histogram rank-sum
    * ([[graft.operators.Learn.auc]]). */
  private val qLearnAuc: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val w = graft.operators.Learn.logisticTrain(docs, learnFeatures,
      learnLabel, learnLr, learnIters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.operators.Learn.auc(
      docs.select(
        graft.operators.Learn.logisticScore(learnFeatures, w).as("score"),
        learnLabel.as("y")),
      "score", "y")
  }

  /** Reliability table of the trained filter: 10 score bins, observed
    * positive rate beside the quantized mean score. */
  private val qLearnCalibration: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val w = graft.operators.Learn.logisticTrain(docs, learnFeatures,
      learnLabel, learnLr, learnIters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.operators.Learn.calibration(
      docs.select(
        graft.operators.Learn.logisticScore(learnFeatures, w).as("score"),
        learnLabel.as("y")),
      "score", "y", bins = 10)
  }

  /** ST21 — streaming model training: three ordered micro-batch
    * deliveries (doc_id residues 0, 1, 2), each advancing the model by
    * one mini-batch SGD step through the versioned weight store; the
    * final weights must equal the set-wise three-step replay (the
    * oracle). Order sensitivity is inherent to SGD and pinned by the
    * delivery mtimes exactly as the checkpoint would pin it live. */
  private val qSt21StreamSgd: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"), col("n_chars"))
    val in = graft.io.TempDirs.registered("graft-q-st21-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st21-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st21-ckpt").toString
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
    graft.streaming.Streaming.runStreamingSgd(src, learnFeatures, learnLabel,
      learnLr, state, ckpt)
    graft.streaming.Streaming.sgdWeights(spark, state)
  }

  /** ST21 ↔ batch parity witness: the drained streaming model must
    * EQUAL [[graft.operators.Learn]]'s batch trainer replayed over the
    * same three deliveries in delivery order (one gdStep per batch,
    * weights chained) — the runStreamingSgd contract ("a replayed
    * trigger recomputes the same step from the same predecessor
    * version") made checkable. Both sides are 6-decimal-quantized
    * integer-gradient arithmetic, so parity is exact equality, not a
    * tolerance; the oracle independently re-derives the weights in SQL
    * and pins parity = true. */
  private val qSt21BatchParity: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"), col("n_chars"))
    val in = graft.io.TempDirs.registered("graft-q-st21p-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st21p-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st21p-ckpt").toString
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
    graft.streaming.Streaming.runStreamingSgd(src, learnFeatures, learnLabel,
      learnLr, state, ckpt)
    val streamed = graft.streaming.Streaming.sgdWeights(spark, state)
      .withColumnRenamed("weight", "weight_streamed")
    // batch replay: identical deliveries, identical order, one gdStep
    // each, weights chained through the driver exactly as the weight
    // store chains them
    val m = learnFeatures.size
    var w = Array.fill(m + 1)(0.0)
    Seq(0L, 1L, 2L).foreach { r =>
      val feats = graft.operators.Learn.featurize(
        docs.filter(pmod(col("doc_id"), lit(3L)) === r),
        learnFeatures, learnLabel)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = feats.count().toDouble
      w = graft.operators.Learn.gdStep(feats, m, w, learnLr, n)
      feats.unpersist(blocking = false)
    }
    val replayed = graft.operators.Learn.weightsDf(docs, learnFeatures, w)
      .withColumnRenamed("weight", "weight_replayed")
    streamed.join(replayed, Seq("feature"))
      .select(col("feature"), col("weight_streamed"), col("weight_replayed"),
        (col("weight_streamed") === col("weight_replayed")).as("parity"))
  }

  /** Recall CURVE of the seed-quantizer IVF probe: recall@{1,5,10,50}
    * from ONE ranked-list join + one aggregation — the tune-nprobe
    * sweep without a query per k. */
  private val qRecallCurve: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    def ranked(df: DataFrame): DataFrame = df.withColumn("rank",
      row_number().over(Window.orderBy(col("cosine_sim").desc, col("vec_id").asc)))
    val cand = ranked(Similarity.ivfAnnTopK(emb, "vec_id", "embedding",
      queryVec, centroidStep = 50, nprobe = 3, k = 50))
    val truth = ranked(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Similarity.vecLit(queryVec), 50))
    Similarity.recallCurve(cand, truth, "vec_id", "rank", Seq(1, 5, 10, 50))
  }

  /** ST12 — streaming semantic dedup: three out-of-order micro-batch
    * deliveries (residues 2, 0, 1 — lower vec_ids arrive LATER) through
    * the foreachBatch exemplar-state loop. A cell's exemplar is its
    * FIRST arrival by (seq, vec_id), so the election depends on state
    * carried across triggers: a per-batch-only implementation would
    * re-elect exemplars in later batches and keep rows the persisted
    * exemplar set must drop. Oracle recomputes the same greedy result
    * set-wise (min-(seq,id) exemplar per cell, one cosine per member). */
  private val qSt12StreamSemdedup: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    val cent = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val in = graft.io.TempDirs.registered("graft-q-st12-in").toString
    val out = graft.io.TempDirs.registered("graft-q-st12-out").toString
    val ex = graft.io.TempDirs.registered("graft-q-st12-ex").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st12-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(2L, 0L, 1L).zipWithIndex.foreach { case (r, s) =>
      emb.filter(pmod(col("vec_id"), lit(3L)) === r)
        .withColumn("seq", lit(s.toLong))
        .coalesce(1).write.mode("append").parquet(in)
      // pin strictly increasing mtimes on each delivery's data files:
      // FileStreamSource orders by modification time, and an mtime tie
      // on a coarse-granularity filesystem would make delivery order —
      // and with it the exemplar election — nondeterministic vs the
      // oracle's (seq, id) recomputation
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val schema = emb.withColumn("seq", lit(0L)).schema
    val src = graft.streaming.Streaming.parquetSource(spark, in, schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingSemanticDedup(src,
      "vec_id", "embedding", "seq", cent, semThreshold, ex, out, ckpt)
    spark.read.parquet(out)
      .select(col("vec_id"), col("cell"), col("cos_ex"), col("is_ex"))
  }

  /** ST14 — streaming LSH near-dup dedup: three out-of-order
    * micro-batch deliveries (residues 2, 0, 1 — lower doc_ids arrive
    * LATER) through the signature-store ingestion loop. First ARRIVAL
    * wins: a near-duplicate of an already-seen document drops even when
    * its id is smaller, so the verdict depends on cross-trigger state,
    * not id order. Oracle recomputes the prefix logic set-wise (bucket
    * occupancy at the later doc's trigger, (seq, id)-ordered pairs,
    * signature-agreement estimate). */
  private val qSt14StreamLshDedup: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val in = graft.io.TempDirs.registered("graft-q-st14-in").toString
    val sig = graft.io.TempDirs.registered("graft-q-st14-sig").toString
    val out = graft.io.TempDirs.registered("graft-q-st14-out").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st14-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(2L, 0L, 1L).zipWithIndex.foreach { case (r, s) =>
      docs.filter(pmod(col("doc_id"), lit(3L)) === r)
        .withColumn("seq", lit(s.toLong))
        .coalesce(1).write.mode("append").parquet(in)
      // pin strictly increasing mtimes per delivery (FileStreamSource
      // orders by modification time; a tie would make arrival order —
      // and with it the first-arrival election — nondeterministic)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val schema = docs.withColumn("seq", lit(0L)).schema
    val src = graft.streaming.Streaming.parquetSource(spark, in, schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingLshDedup(src, "doc_id", "text", "seq",
      shingleN = 3, numHashes = minhashN, rowsPerBand = rowsPerBand,
      maxBucketSize = lshBucketCap, threshold = jaccardThreshold,
      sigPath = sig, sinkPath = out, checkpointPath = ckpt)
    spark.read.parquet(out).select(col("doc_id"), col("seq"))
  }

  /** IVF ANN over the TRAINED coarse quantizer: 2 deterministic Lloyd
    * iterations from the every-50th seed, then 3-cell probe. */
  private val qSimIvfKmeans: Q = (spark, dir) =>
    Similarity.ivfKmeansAnnTopK(Tables.fanOut(Tables.embeddings(spark, dir)),
      "vec_id", "embedding", queryVec, centroidStep = 50, iters = 2, nprobe = 3, k = 10)

  /** Recall@10 of the TRAINED quantizer's probe — paired with
    * q_ann_recall this is the train-vs-seed index comparison a user
    * runs before choosing a layout. */
  private val qAnnRecallKmeans: Q = (spark, dir) => {
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
    Similarity.recallAtK(
      Similarity.ivfKmeansAnnTopK(emb, "vec_id", "embedding", queryVec,
        centroidStep = 50, iters = 2, nprobe = 3, k = 10),
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        Similarity.vecLit(queryVec), 10),
      "vec_id", 10)
  }

  def queries: Map[String, Q] = Map(
    "q_t_tokens"        -> qTTokens,
    "q_t_lang_id"       -> qTLangId,
    "q_t_quality"       -> qTQuality,
    "q_t_fingerprint"   -> qTFingerprint,
    "q_sim_exact_dedup" -> qSimExactDedup,
    "q_sim_minhash"     -> qSimMinhash,
    "q_sim_lsh_pairs"   -> qSimLshPairs,
    "q_minhash_calibration" -> qMinhashCalibration,
    "q_sim_minhash_est" -> qSimMinhashEst,
    "q_sim_simhash"     -> qSimSimhash,
    "q_sim_simhash_pairs" -> qSimSimhashPairs,
    "q_t_repetition"    -> qTRepetition,
    "q_sim_jaccard"     -> qSimJaccard,
    "q_sim_lsh_jaccard" -> qSimLshJaccard,
    "q_curate"          -> qCurate,
    "q_sim_cosine_topk" -> qSimCosineTopk,
    "q_embed_matryoshka" -> qEmbedMatryoshka,
    "q_sim_ann_lsh"     -> qSimAnnLsh,
    "q_sim_ivf_ann"     -> qSimIvfAnn,
    "q_ann_recall"      -> qAnnRecall,
    "q_sim_ivf_kmeans"  -> qSimIvfKmeans,
    "q_ann_recall_kmeans" -> qAnnRecallKmeans,
    "q_sim_embed_dedup" -> qSimEmbedDedup,
    "q_semantic_decontam" -> qSemanticDecontam,
    "q_semantic_decontam_fixedbench" -> qSemanticDecontamFixedbench,
    "q_sim_embed_probed" -> qSimEmbedProbed,
    "q_bitext_margin"   -> qBitextMargin,
    "q_topic_balance"   -> qTopicBalance,
    "q_cluster_purity"  -> qClusterPurity,
    "q_embed_outliers"  -> qEmbedOutliers,
    "q_hard_negatives"  -> qHardNegatives,
    "q_embed_project"   -> qEmbedProject,
    "q_ivf_cells"       -> qIvfCells,
    "q_cell_reps"       -> qCellReps,
    "q_semantic_dedup"  -> qSemanticDedup,
    "q_curate_multimodal" -> qCurateMultimodal,
    "q_st12_stream_semdedup" -> qSt12StreamSemdedup,
    "q_st14_stream_lshdedup" -> qSt14StreamLshDedup,
    "q_recall_curve"    -> qRecallCurve,
    "q_sim_pq_adc"      -> qSimPqAdc,
    "q_sim_ivf_pq"      -> qSimIvfPq,
    "q_ivfpq_indexed"   -> qIvfPqIndexed,
    "q_st19_stream_ann" -> qSt19StreamAnn,
    "q_st19b_compact_recall" -> qSt19bCompactRecall,
    "q_pq_recall"       -> qPqRecall,
    "q_pq_distortion"   -> qPqDistortion,
    "q_learn_logreg"    -> qLearnLogreg,
    "q_learn_score"     -> qLearnScore,
    "q_learn_holdout"   -> qLearnHoldout,
    "q_st21_stream_sgd" -> qSt21StreamSgd,
    "q_st21_batch_parity" -> qSt21BatchParity,
    "q_learn_auc"       -> qLearnAuc,
    "q_learn_calibration" -> qLearnCalibration
  )

  // =====================================================================
  // Oracle SQL (DuckDB 1.0) — generated from the same constants
  // =====================================================================

  /** Distinct (doc_id, 3-shingle) pairs — DuckDB list slicing is 1-based
    * inclusive, so t[i:i+2] is the 3-token window starting at i. The
    * source relation is parameterized so the same chain can run over a
    * filtered survivor set (the composed curation DAG) as well as the
    * raw `documents` table. */
  private def shingleCteFrom(docsSrc: String): String =
    s"""toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM $docsSrc),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
       |       FROM toks, unnest(range(1, greatest(len(t)-1, 1))) AS u(i)
       |       WHERE array_to_string(t[i:i+2], ' ') <> '')""".stripMargin

  private val shingleCte = shingleCteFrom("documents")

  /** Kirsch-Mitzenmacher minhash mirror: two 60-bit base hashes from
    * md5 hex, h_i = (h1 + i*h2) mod p — same constants as
    * [[Similarity.minhashSignature]]. */
  private val mhP = graft.operators.Similarity.minhashMod
  private val minhashBase =
    s"""shb AS (SELECT doc_id, shingle,
       |  CAST('0x' || substring(md5('a:' || shingle), 1, 15) AS BIGINT) % $mhP AS h1,
       |  CAST('0x' || substring(md5('b:' || shingle), 1, 15) AS BIGINT) % $mhP AS h2
       |  FROM sh)""".stripMargin

  private val minhashAggs: String =
    (0 until minhashN).map(i => s"min((h1 + $i * h2) % $mhP) AS mh$i").mkString(",\n  ")

  private val stopwordsSqlIn: Map[String, String] =
    Text.stopwords.toMap.map { case (lang, ws) =>
      lang -> ws.map(w => s"'$w'").mkString("(", ",", ")")
    }

  private[graft] def hitsExpr(lang: String): String =
    s"len(list_filter(string_split_regex(text, '\\s+'), x -> x IN ${stopwordsSqlIn(lang)}))"

  private def sqlList(xs: Seq[Double]): String =
    xs.map(_.toString).mkString("[", ",", "]") + "::DOUBLE[]"

  /** vec · constant-list as a left fold (same order as Spark's aggregate). */
  private def dotSql(vecExpr: String, lst: String): String =
    s"list_reduce(list_transform(list_zip($vecExpr, $lst), x -> CAST(x[1] AS DOUBLE) * x[2]), (a,b) -> a+b)"

  private def normSql(vecExpr: String): String =
    s"sqrt(list_reduce(list_transform($vecExpr, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"

  private val qvecSql = sqlList(queryVec)

  /** IVF probe chain ending at `probe(cell)` + `assign(vec_id,
    * embedding, cell)` — shared by q_sim_ivf_ann / q_ann_recall. */
  private lazy val ivfAnnCtes =
    s"""cent AS (SELECT vec_id AS cid, embedding AS cvec
       |    FROM embeddings WHERE vec_id % 50 = 0),
       |probe AS (SELECT cid AS cell FROM (
       |    SELECT cid, ${cosineSql("cvec")} AS qcos FROM cent)
       |    ORDER BY qcos DESC, cid ASC LIMIT 3),
       |assign AS (SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosine2Sql("e.embedding", "c.cvec")} DESC, c.cid ASC) AS rn
       |    FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1)""".stripMargin

  private def cosineSql(vecExpr: String): String =
    s"round(${dotSql(vecExpr, qvecSql)} / (${normSql(vecExpr)} * ${normSql(qvecSql)}), 6)"

  /** Cosine of the first `d` dims vs the truncated query vector —
    * the oracle mirror of the matryoshka slice. */
  private def cosDimSql(d: Int): String = {
    val e = s"embedding[1:$d]"
    val qv = sqlList(queryVec.take(d))
    s"round(${dotSql(e, qv)} / (${normSql(e)} * ${normSql(qv)}), 6)"
  }

  /** Cosine between two list COLUMNS (both sides cast per element, the
    * same fold as Similarity.cosine on two columns). */
  private[graft] def cosine2Sql(a: String, b: String): String = {
    val dot = s"list_reduce(list_transform(list_zip($a, $b), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p+q)"
    s"round($dot / (${normSql(a)} * ${normSql(b)}), 6)"
  }

  private val planes = Similarity.hyperplaneWeights(numPlanes, queryVec.length)
  private val probes = Similarity.probeBuckets(Similarity.bucketOf(queryVec, planes), 1)

  private val bucketSql: String =
    planes.map { w =>
      s"(CASE WHEN ${dotSql("embedding", sqlList(w.toSeq))} >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** Full-width (maxPlanes) bucket: plane p's weights depend only on p,
    * so the adaptive P-plane bucket is this string's P-prefix. */
  private val bucketSqlMax: String =
    Similarity.hyperplaneWeights(24, queryVec.length).map { w =>
      s"(CASE WHEN ${dotSql("embedding", sqlList(w.toSeq))} >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** The adaptive-plane ladder from count(*) — the integer mirror of
    * [[Similarity.adaptivePlanes]](n, base=8, maxPlanes=24,
    * targetPerBucket=32): +1 plane for each doubling past 32·2^8. */
  private val adaptivePlanesSql: String =
    "8 " + (8 until 24).map(j =>
      s"+ (CASE WHEN n > ${32L << j} THEN 1 ELSE 0 END)").mkString(" ")

  /** CTE pair `np(p)` + `b(vec_id, embedding, bucket)` blocking on the
    * adaptive-prefix bucket — shared by the embed-dedup and bitext
    * oracles. */
  private val adaptiveBucketCte: String =
    s"""np AS (SELECT $adaptivePlanesSql AS p
              FROM (SELECT count(*) AS n FROM embeddings)),
          b AS (SELECT vec_id, embedding, label,
              substring($bucketSqlMax, 1, (SELECT p FROM np)) AS bucket
            FROM embeddings)"""

  private val simhashBitSums: String =
    (0 until Similarity.simhashBits).map { j =>
      val src = if (j < 32) "v1" else "v2"
      val bit = j % 32
      s"sum((($src >> $bit) & 1) * 2 - 1) AS b$j"
    }.mkString(",\n  ")

  private val simhashConcat: String =
    (0 until Similarity.simhashBits)
      .map(j => s"(CASE WHEN b$j > 0 THEN '1' ELSE '0' END)").mkString(" || ")

  /** SimHash fingerprint CTE chain ending in `sims(doc_id, simhash)` —
    * shared by q_sim_simhash and the chunk-blocked pair query. */
  private val simhashCtes: String =
    s"""toks AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
          h AS (SELECT doc_id,
            CAST('0x' || substring(md5('a:' || tok), 1, 15) AS BIGINT) AS v1,
            CAST('0x' || substring(md5('b:' || tok), 1, 15) AS BIGINT) AS v2
          FROM toks),
          s AS (SELECT doc_id,
          $simhashBitSums
          FROM h GROUP BY doc_id),
          sims AS (SELECT doc_id, $simhashConcat AS simhash FROM s)"""

  /** Exact Hamming distance between fingerprint columns fa/fb as a
    * 64-term character-compare sum (mirrors the Spark expression). */
  private val hammingSql: String =
    (1 to Similarity.simhashBits).map(i =>
      s"(CASE WHEN substring(fa, $i, 1) <> substring(fb, $i, 1) THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** One Lloyd iteration in SQL — assignment vs `prevCent` (same rounded
    * cosine + lowest-cid tie-break as ivfAssignTo, expressed as the
    * equivalent window), then the quantized integer component means of
    * kmeansCentroids, bit-for-bit: round(x*1e6) summed exactly, scaled
    * back, rounded to 6. */
  private def kmeansIterSql(prevCent: String, tag: String): String =
    s"""a$tag AS (SELECT vec_id, embedding, cid AS cell FROM (
          SELECT e.vec_id, e.embedding, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${cosine2Sql("e.embedding", "c.cvec")} DESC, c.cid ASC) AS rn
          FROM embeddings e CROSS JOIN $prevCent c) t WHERE rn = 1),
        q$tag AS (SELECT cell, i AS pos,
                 CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS q
          FROM a$tag, unnest(range(1, len(embedding)+1)) AS u(i)),
        m$tag AS (SELECT cell, pos,
                 round(CAST(sum(q) AS DOUBLE) / count(*) / 1e6, 6) AS comp
          FROM q$tag GROUP BY cell, pos),
        cent$tag AS (SELECT cell AS cid, list(comp ORDER BY pos) AS cvec
          FROM m$tag GROUP BY cell)"""

  /** Trained-IVF probe chain — seed centroids (`vec_id % 50`), two
    * Lloyd iterations, then `probe(cell)` + `af(vec_id, embedding,
    * cell)` vs the trained `cent2` — shared by q_sim_ivf_kmeans /
    * q_ann_recall_kmeans. */
  private lazy val ivfKmeansCtes: String =
    s"""cent0 AS (SELECT vec_id AS cid, embedding AS cvec
       |    FROM embeddings WHERE vec_id % 50 = 0),
       |${kmeansIterSql("cent0", "1")},
       |${kmeansIterSql("cent1", "2")},
       |probe AS (SELECT cid AS cell FROM (
       |    SELECT cid, ${cosineSql("cvec")} AS qcos FROM cent2)
       |    ORDER BY qcos DESC, cid ASC LIMIT 3),
       |af AS (SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosine2Sql("e.embedding", "c.cvec")} DESC, c.cid ASC) AS rn
       |    FROM embeddings e CROSS JOIN cent2 c) t WHERE rn = 1)""".stripMargin

  // --- Product-quantization oracle (mirror of graft.operators.Pq) ----
  private val pqSubLen = 64 / pqM

  /** Rounded squared L2 between a float-list slice `a` and a double-list
    * codeword `b`, unrolled left-associatively like Pq's assignment. */
  private def pqL2Sql(a: String, b: String): String =
    "round(" + (1 to pqSubLen).map(i =>
      s"(CAST($a[$i] AS DOUBLE) - $b[$i]) * (CAST($a[$i] AS DOUBLE) - $b[$i])")
      .mkString(" + ") + ", 6)"

  /** One per-subspace Lloyd round in SQL: rounded-L2 lowest-cid
    * assignment (as the equivalent window), then the quantized integer
    * component means — bit-for-bit [[graft.operators.Pq.codebooks]]. */
  private def pqLloydIterSql(s: Int, t: Int): String =
    s"""pa$s$t AS (SELECT vec_id, sv, cid AS cell FROM (
          SELECT e.vec_id, e.sv, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${pqL2Sql("e.sv", "c.cvec")} ASC, c.cid ASC) AS rn
          FROM sub$s e CROSS JOIN pc$s${t - 1} c) t WHERE rn = 1),
        pq$s$t AS (SELECT cell, i AS pos,
                 CAST(round(CAST(sv[i] AS DOUBLE) * 1e6) AS BIGINT) AS q
          FROM pa$s$t, unnest(range(1, ${pqSubLen + 1})) AS u(i)),
        pm$s$t AS (SELECT cell, pos,
                 round(CAST(sum(q) AS DOUBLE) / count(*) / 1e6, 6) AS comp
          FROM pq$s$t GROUP BY cell, pos),
        pc$s$t AS (SELECT cell AS cid, list(comp ORDER BY pos) AS cvec
          FROM pm$s$t GROUP BY cell)"""

  /** Literal ADC entry: rounded squared L2 from the query's s-th slice
    * (exact decimal literals) to a trained codeword. */
  private def pqQueryLitSql(s: Int): String = {
    val off = s * pqSubLen
    "round(" + (1 to pqSubLen).map { i =>
      val q = queryVec(off + i - 1)
      s"($q - cvec[$i]) * ($q - cvec[$i])"
    }.mkString(" + ") + ", 6)"
  }

  /** Full PQ chain ending in `codes(vec_id, sub, cell)` and
    * `dt(sub, cid, d2q)` — seeds, two Lloyd rounds, final assignment
    * and the query distance table, per subspace. */
  private lazy val pqCtes: String = {
    val per = (0 until pqM).map { s =>
      val off = s * pqSubLen
      s"""sub$s AS (SELECT vec_id, embedding[${off + 1}:${off + pqSubLen}] AS sv
            FROM embeddings),
          pc${s}0 AS (SELECT vec_id AS cid,
            [${(1 to pqSubLen).map(i => s"round(CAST(sv[$i] AS DOUBLE), 6)").mkString(", ")}] AS cvec
            FROM sub$s WHERE vec_id % 50 = 0),
          ${pqLloydIterSql(s, 1)},
          ${pqLloydIterSql(s, 2)},
          fa$s AS (SELECT vec_id, $s AS sub, cid AS cell FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${pqL2Sql("e.sv", "c.cvec")} ASC, c.cid ASC) AS rn
            FROM sub$s e CROSS JOIN pc${s}2 c) t WHERE rn = 1),
          dt$s AS (SELECT $s AS sub, cid, ${pqQueryLitSql(s)} AS d2q FROM pc${s}2)"""
    }.mkString(",\n          ")
    val codes = (0 until pqM).map(s => s"SELECT * FROM fa$s").mkString(" UNION ALL ")
    val dts = (0 until pqM).map(s => s"SELECT * FROM dt$s").mkString(" UNION ALL ")
    s"""$per,
          codes AS ($codes),
          dt AS ($dts)"""
  }

  /** IVF-PQ: the coarse probe/assignment chain joined with the PQ
    * codes + distance table — used verbatim by both the batch
    * composition (q_sim_ivf_pq) and the streamed store (q_st19). */
  private lazy val ivfPqOracleSql: String =
    s"""WITH $ivfKmeansCtes,
        $pqCtes
        SELECT c.vec_id, sum(CAST(round(d2q * 1e6) AS BIGINT)) / 1e6 AS adc_dist
        FROM codes c
          JOIN dt ON c.sub = dt.sub AND c.cell = dt.cid
          JOIN af ON af.vec_id = c.vec_id
          JOIN probe p ON af.cell = p.cell
        GROUP BY 1 ORDER BY adc_dist ASC, c.vec_id ASC LIMIT 10"""

  /** Logistic-trainer oracle chain: the feature CTE (the q_t_quality
    * formulas), then `learnIters` unrolled hard-sigmoid GD rounds with
    * integer-quantized gradient sums — ends in w<iters>(w0,w1,w2,wb). */
  private def learnCtes(where: String = ""): String = {
    val iters = (1 to learnIters).map { t =>
      s"""g$t AS (SELECT
            sum(CAST(round(err * 1e6) AS BIGINT)) AS gb,
            sum(CAST(round(err * f0 * 1e6) AS BIGINT)) AS g0,
            sum(CAST(round(err * f1 * 1e6) AS BIGINT)) AS g1,
            sum(CAST(round(err * f2 * 1e6) AS BIGINT)) AS g2
          FROM (SELECT greatest(0.0, least(1.0,
                  (f0 * w.w0 + f1 * w.w1 + f2 * w.w2 + w.wb) * 0.25 + 0.5)) - y AS err,
                  f0, f1, f2
                FROM lf, w${t - 1} w)),
        w$t AS (SELECT
            round(w.w0 - $learnLr * (CAST(g.g0 AS DOUBLE) / 1e6) / n.n, 6) AS w0,
            round(w.w1 - $learnLr * (CAST(g.g1 AS DOUBLE) / 1e6) / n.n, 6) AS w1,
            round(w.w2 - $learnLr * (CAST(g.g2 AS DOUBLE) / 1e6) / n.n, 6) AS w2,
            round(w.wb - $learnLr * (CAST(g.gb AS DOUBLE) / 1e6) / n.n, 6) AS wb
          FROM w${t - 1} w, g$t g, ln0 n)"""
    }.mkString(",\n        ")
    s"""lf AS (SELECT doc_id,
          len(string_split_regex(text, '\\s+')) / 200.0 AS f0,
          (length(regexp_replace(text, '\\s+', '', 'g'))
            / CAST(greatest(len(string_split_regex(text, '\\s+')), 1) AS DOUBLE))
            / 10.0 AS f1,
          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) AS f2,
          (CASE WHEN n_chars > 306 THEN 1.0 ELSE 0.0 END) AS y
        FROM documents $where),
        ln0 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lf),
        w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS wb),
        $iters"""
  }

  /** Streaming-SGD oracle chain: same lf features, but each of the
    * three steps trains on ONE delivery (doc_id residues 0, 1, 2 in
    * that order) with its own batch size — the set-wise replay of
    * [[graft.streaming.Streaming.runStreamingSgd]]'s trigger sequence. */
  private lazy val sgdCtes: String = {
    val iters = (1 to 3).map { t =>
      val r = t - 1
      s"""n$t AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lf
            WHERE doc_id % 3 = $r),
        g$t AS (SELECT
            sum(CAST(round(err * 1e6) AS BIGINT)) AS gb,
            sum(CAST(round(err * f0 * 1e6) AS BIGINT)) AS g0,
            sum(CAST(round(err * f1 * 1e6) AS BIGINT)) AS g1,
            sum(CAST(round(err * f2 * 1e6) AS BIGINT)) AS g2
          FROM (SELECT greatest(0.0, least(1.0,
                  (f0 * w.w0 + f1 * w.w1 + f2 * w.w2 + w.wb) * 0.25 + 0.5)) - y AS err,
                  f0, f1, f2
                FROM lf, w${t - 1} w WHERE doc_id % 3 = $r)),
        w$t AS (SELECT
            round(w.w0 - $learnLr * (CAST(g.g0 AS DOUBLE) / 1e6) / n.n, 6) AS w0,
            round(w.w1 - $learnLr * (CAST(g.g1 AS DOUBLE) / 1e6) / n.n, 6) AS w1,
            round(w.w2 - $learnLr * (CAST(g.g2 AS DOUBLE) / 1e6) / n.n, 6) AS w2,
            round(w.wb - $learnLr * (CAST(g.gb AS DOUBLE) / 1e6) / n.n, 6) AS wb
          FROM w${t - 1} w, g$t g, n$t n)"""
    }.mkString(",\n        ")
    val lfStart = learnCtes()
    // reuse learnCtes' lf/w0 prefix verbatim (everything before ln0),
    // then the per-delivery steps
    val prefixEnd = lfStart.indexOf("ln0 AS")
    s"""WITH ${lfStart.substring(0, prefixEnd)}
        w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS wb),
        $iters"""
  }

  /** Full-vector rounded squared L2 from the query literals — the
    * exact ground truth the PQ recall compares against. */
  private lazy val pqExactL2Sql: String =
    "round(" + (1 to 64).map { i =>
      val q = queryVec(i - 1)
      s"($q - CAST(embedding[$i] AS DOUBLE)) * ($q - CAST(embedding[$i] AS DOUBLE))"
    }.mkString(" + ") + ", 6)"

  /** Hamming-radius-1 probe list of the bucket column (bucket itself
    * plus each single-plane flip), as a SQL list literal. */
  private val probeListSql: String = {
    val flips = (1 to numPlanes).map { i =>
      s"substring(bucket, 1, ${i - 1}) || " +
        s"(CASE WHEN substring(bucket, $i, 1) = '1' THEN '0' ELSE '1' END) || " +
        s"substring(bucket, ${i + 1}, $numPlanes)"
    }
    (Seq("bucket") ++ flips).mkString("[", ", ", "]")
  }

  private val bandedSql: String =
    (0 until minhashN / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => s"CAST(mh$i AS VARCHAR)")
      s"SELECT doc_id, $b AS band, md5(${cols.mkString(" || '|' || ")}) AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")

  /** The full LSH-gated exact-jaccard pipeline as a reusable CTE chain
    * ending in `lsh_pairs(id_a, id_b, jaccard)` — the oracle mirror of
    * [[Similarity.lshJaccard]], shared by q_sim_lsh_jaccard and the
    * duplicate-cluster query (CurationQueries), so both stay in
    * lockstep with the Spark constants by construction. */
  private[graft] def lshJaccardCtesFrom(docsSrc: String,
                                        materializePairs: Boolean = false,
                                        threshold: Double = jaccardThreshold): String =
    s"""${shingleCteFrom(docsSrc)},
          $minhashBase,
          sig AS (SELECT doc_id, $minhashAggs FROM shb GROUP BY doc_id),
          banded AS ($bandedSql),
          capped AS (SELECT doc_id, band, band_key FROM (
            SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bsz FROM banded)
            WHERE bsz <= $lshBucketCap),
          cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
                   FROM capped l JOIN capped r
                     ON l.band = r.band AND l.band_key = r.band_key
                    AND l.doc_id < r.doc_id),
          sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
          inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
                    FROM cand c
                    JOIN sh a ON a.doc_id = c.id_a
                    JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
                    GROUP BY 1, 2),
          lsh_pairs AS ${if (materializePairs) "MATERIALIZED " else ""}(SELECT i.id_a, i.id_b,
                 round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
          FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
                       JOIN sizes sb ON i.id_b = sb.doc_id
          WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= $threshold)"""

  private[graft] val lshJaccardCtes: String = lshJaccardCtesFrom("documents")

  /** Shingle → signature → banding → candidate-pair → signature-agreement
    * estimate chain ending in `est(id_a, id_b, jaccard_est)` — the oracle
    * mirror of the minhashSignature/lshCandidatePairs/
    * minhashJaccardEstimate composition, shared by q_sim_minhash_est and
    * the cross-corpus dedup query so both stay in lockstep with the
    * Spark constants. */
  private[graft] val minhashEstCtes: String = {
    val matchSum = (0 until minhashN).map(i =>
      s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString("(", " + ", ")")
    s"""$shingleCte,
          $minhashBase,
          sig AS (SELECT doc_id, $minhashAggs FROM shb GROUP BY doc_id),
          banded AS ($bandedSql),
          capped AS (SELECT doc_id, band, band_key FROM (
            SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bsz FROM banded)
            WHERE bsz <= $lshBucketCap),
          cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
                   FROM capped l JOIN capped r
                     ON l.band = r.band AND l.band_key = r.band_key
                    AND l.doc_id < r.doc_id),
          est AS (SELECT c.id_a, c.id_b,
            round(CAST($matchSum AS DOUBLE) / $minhashN, 4) AS jaccard_est
          FROM cand c JOIN sig a ON a.doc_id = c.id_a
                      JOIN sig b ON b.doc_id = c.id_b)"""
  }

  def oracleSql: Map[String, String] = Map(
    "q_t_tokens" ->
      """SELECT doc_id,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
         FROM documents""",
    "q_t_lang_id" ->
      s"""WITH h AS (SELECT doc_id,
            ${hitsExpr("en")} AS h_en, ${hitsExpr("de")} AS h_de,
            ${hitsExpr("fr")} AS h_fr, ${hitsExpr("es")} AS h_es,
            ${hitsExpr("zh")} AS h_zh
          FROM documents),
          m AS (SELECT *, greatest(h_en, h_de, h_fr, h_es, h_zh) AS mx FROM h)
          SELECT doc_id,
            CASE WHEN h_en = mx AND mx > 0 THEN 'en'
                 WHEN h_de = mx AND mx > 0 THEN 'de'
                 WHEN h_fr = mx AND mx > 0 THEN 'fr'
                 WHEN h_es = mx AND mx > 0 THEN 'es'
                 WHEN h_zh = mx AND mx > 0 THEN 'zh'
                 ELSE 'und' END AS lang_pred
          FROM m""",
    "q_t_quality" ->
      s"""WITH f AS (SELECT doc_id,
            len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) AS alpha_ratio,
            ${hitsExpr("en")} / greatest(len(string_split_regex(text, '\\s+')), 1) AS en_ratio,
            len(string_split_regex(text, '\\s+')) AS n_tok,
            length(regexp_replace(text, '\\s+', '', 'g')) / CAST(greatest(len(string_split_regex(text, '\\s+')), 1) AS DOUBLE) AS mean_tok_len,
            len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) AS punct_ratio
          FROM documents)
          SELECT doc_id,
            round(alpha_ratio * 0.4
              + least(en_ratio * 4.0, 1.0) * 0.3
              + (CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 0.2 ELSE 0.0 END)
              + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 0.1 ELSE 0.0 END)
              - punct_ratio * 0.4, 4) AS q
          FROM f""",
    "q_t_fingerprint" ->
      """SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\s+'))), ' ')) AS fp
         FROM documents""",
    "q_sim_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
         FROM documents GROUP BY 1""",
    "q_sim_minhash" ->
      s"""WITH $shingleCte,
          $minhashBase
          SELECT doc_id,
          $minhashAggs
          FROM shb GROUP BY doc_id""",
    "q_sim_lsh_pairs" ->
      s"""WITH $shingleCte,
          $minhashBase,
          sig AS (SELECT doc_id, $minhashAggs FROM shb GROUP BY doc_id),
          banded AS ($bandedSql),
          capped AS (SELECT doc_id, band, band_key FROM (
            SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bsz FROM banded)
            WHERE bsz <= $lshBucketCap)
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM capped l JOIN capped r
            ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id""",
    "q_sim_minhash_est" ->
      s"""WITH $minhashEstCtes
          SELECT id_a, id_b, jaccard_est FROM est""",
    "q_minhash_calibration" ->
      s"""WITH $minhashEstCtes,
          sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
          itr AS (SELECT c.id_a, c.id_b, count(*) AS inter
                  FROM cand c JOIN sh a ON a.doc_id = c.id_a
                              JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
                  GROUP BY 1, 2),
          ex AS (SELECT i.id_a, i.id_b,
                   round(inter / (sa.sz + sb.sz - inter), 4) AS j
                 FROM itr i JOIN sizes sa ON i.id_a = sa.doc_id
                            JOIN sizes sb ON i.id_b = sb.doc_id)
          SELECT CAST(floor(abs(e.jaccard_est - coalesce(x.j, 0.0)) * 100) AS BIGINT)
                   AS err_bucket,
                 count(*) AS n_pairs
          FROM est e LEFT JOIN ex x ON e.id_a = x.id_a AND e.id_b = x.id_b
          GROUP BY 1""",
    "q_sim_simhash" ->
      s"""WITH $simhashCtes
          SELECT doc_id, simhash FROM sims""",
    "q_sim_simhash_pairs" ->
      s"""WITH $simhashCtes,
          blocked AS (SELECT doc_id, simhash, c,
              substring(simhash, c * ${64 / simhashChunks} + 1, ${64 / simhashChunks}) AS ckey
            FROM sims, unnest(range(0, $simhashChunks)) AS u(c)),
          scapped AS (SELECT doc_id, simhash, c, ckey FROM (
            SELECT *, count(*) OVER (PARTITION BY c, ckey) AS bsz FROM blocked)
            WHERE bsz <= $lshBucketCap),
          sp AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.simhash AS fa, b.simhash AS fb
                 FROM scapped a JOIN scapped b
                   ON a.c = b.c AND a.ckey = b.ckey AND a.doc_id < b.doc_id)
          SELECT id_a, id_b, CAST($hammingSql AS BIGINT) AS hamming
          FROM sp WHERE $hammingSql <= $simhashMaxHamming""",
    "q_t_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
         raw AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
                 FROM tk, unnest(range(1, greatest(len(t)-1, 1))) AS u(i)
                 WHERE array_to_string(t[i:i+2], ' ') <> ''),
         rep AS (SELECT doc_id, count(*) AS total, count(DISTINCT shingle) AS dis
                 FROM raw GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(round(1.0 - CAST(dis AS DOUBLE) / total, 4), 0.0) AS repetition
         FROM documents d LEFT JOIN rep ON rep.doc_id = d.doc_id""",
    "q_sim_jaccard" ->
      s"""WITH $shingleCte,
          sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
          capped AS (SELECT doc_id, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS f FROM sh)
            WHERE f <= $shingleFreqCap),
          co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                 FROM capped a JOIN capped b
                   ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT id_a, id_b,
                 round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
          FROM co JOIN sizes sa ON co.id_a = sa.doc_id
                  JOIN sizes sb ON co.id_b = sb.doc_id
          WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= $jaccardThreshold""",
    "q_curate" ->
      s"""WITH langs AS (SELECT doc_id, source, text,
            ${hitsExpr("en")} AS h_en, ${hitsExpr("de")} AS h_de,
            ${hitsExpr("fr")} AS h_fr, ${hitsExpr("es")} AS h_es,
            ${hitsExpr("zh")} AS h_zh
          FROM documents),
          l2 AS (SELECT doc_id, source, text,
            CASE WHEN h_en = mx AND mx > 0 THEN 'en'
                 WHEN h_de = mx AND mx > 0 THEN 'de'
                 WHEN h_fr = mx AND mx > 0 THEN 'fr'
                 WHEN h_es = mx AND mx > 0 THEN 'es'
                 WHEN h_zh = mx AND mx > 0 THEN 'zh'
                 ELSE 'und' END AS lang
          FROM (SELECT *, greatest(h_en, h_de, h_fr, h_es, h_zh) AS mx FROM langs)),
          qf AS (SELECT doc_id, source, text, lang,
            len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) AS alpha_ratio,
            ${hitsExpr("en")} / greatest(len(string_split_regex(text, '\\s+')), 1) AS en_ratio,
            len(string_split_regex(text, '\\s+')) AS n_tok,
            length(regexp_replace(text, '\\s+', '', 'g')) / CAST(greatest(len(string_split_regex(text, '\\s+')), 1) AS DOUBLE) AS mean_tok_len,
            len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) AS punct_ratio
          FROM l2),
          scored AS (SELECT doc_id, source, text, lang, n_tok,
            round(alpha_ratio * 0.4
              + least(en_ratio * 4.0, 1.0) * 0.3
              + (CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 0.2 ELSE 0.0 END)
              + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 0.1 ELSE 0.0 END)
              - punct_ratio * 0.4, 4) AS q
          FROM qf),
          kept AS (SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM scored WHERE lang = 'en' AND q >= 0.3) WHERE rn = 1)
          SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM kept GROUP BY source""",
    "q_sim_lsh_jaccard" ->
      s"""WITH $lshJaccardCtes
          SELECT id_a, id_b, jaccard FROM lsh_pairs""",
    "q_sim_cosine_topk" ->
      s"""SELECT vec_id, ${cosineSql("embedding")} AS cosine_sim
          FROM embeddings
          ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10""",
    "q_embed_matryoshka" ->
      s"""WITH truth AS (SELECT vec_id FROM embeddings
            ORDER BY ${cosineSql("embedding")} DESC, vec_id ASC LIMIT 10),
          ${matryoshkaDims.map(d =>
            s"""c$d AS (SELECT vec_id FROM embeddings
            ORDER BY ${cosDimSql(d)} DESC, vec_id ASC LIMIT 10)""").mkString(",\n          ")}
          ${matryoshkaDims.map(d =>
            s"""SELECT CAST($d AS BIGINT) AS dim, count(*) AS n_hits,
              round(count(*) / 10.0, 4) AS recall
            FROM c$d WHERE vec_id IN (SELECT vec_id FROM truth)""")
            .mkString("\n          UNION ALL\n          ")}""",
    "q_sim_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings)
          SELECT vec_id, bucket, ${cosineSql("embedding")} AS cosine_sim
          FROM b
          WHERE bucket IN (${probes.map(p => s"'$p'").mkString(",")})
          ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10""",
    "q_sim_ivf_ann" ->
      s"""WITH $ivfAnnCtes
          SELECT a.vec_id, a.cell, ${cosineSql("a.embedding")} AS cosine_sim
          FROM assign a JOIN probe p ON a.cell = p.cell
          ORDER BY cosine_sim DESC, a.vec_id ASC LIMIT 10""",
    "q_ann_recall" ->
      s"""WITH $ivfAnnCtes,
          ann AS (SELECT a.vec_id FROM assign a JOIN probe p ON a.cell = p.cell
                  ORDER BY ${cosineSql("a.embedding")} DESC, a.vec_id ASC LIMIT 10),
          truth AS (SELECT vec_id FROM embeddings
                    ORDER BY ${cosineSql("embedding")} DESC, vec_id ASC LIMIT 10),
          h AS (SELECT count(*) AS n_hits FROM ann
                WHERE vec_id IN (SELECT vec_id FROM truth))
          SELECT CAST(10 AS BIGINT) AS k, n_hits,
                 round(n_hits / 10.0, 4) AS recall FROM h""",
    "q_sim_embed_dedup" ->
      s"""WITH $adaptiveBucketCte,
          okb AS (SELECT bucket FROM b GROUP BY bucket
                  HAVING count(*) <= $embedLshBucketCap),
          bc AS (SELECT b.* FROM b JOIN okb USING (bucket))
          SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                 ${cosine2Sql("a.embedding", "b2.embedding")} AS cosine_sim
          FROM bc a JOIN bc b2
            ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
          WHERE ${cosine2Sql("a.embedding", "b2.embedding")} >= 0.4""",
    "q_cluster_purity" ->
      s"""WITH $ivfKmeansCtes,
          lab AS (SELECT a.vec_id, a.cell, e.label
                  FROM af a JOIN embeddings e USING (vec_id)),
          cl AS (SELECT cell, label, count(*) AS c FROM lab GROUP BY 1, 2),
          m AS (SELECT cell, CAST(sum(c) AS BIGINT) AS n_members,
                 CAST(max(c * 1024 + (1023 - label)) AS BIGINT) AS pk
                FROM cl GROUP BY 1)
          SELECT cell, n_members, 1023 - pk % 1024 AS top_label,
                 (pk // 1024) * 10000 // n_members AS purity_bp
          FROM m""",
    "q_embed_outliers" ->
      s"""WITH $ivfKmeansCtes,
          s AS (SELECT a.vec_id, a.cell,
                 CAST(floor(${cosine2Sql("a.embedding", "c.cvec")}
                   * 1000000.0 + 0.5) AS BIGINT) AS cos_u
                FROM af a JOIN cent2 c ON a.cell = c.cid)
          SELECT vec_id, cell, cos_u, cos_u < $outlierCosFloorU AS is_outlier
          FROM s""",
    "q_hard_negatives" ->
      s"""WITH $adaptiveBucketCte,
          anch AS (SELECT vec_id AS anchor_id, label AS al, embedding AS ae,
                   bucket FROM b WHERE vec_id % $hardNegAnchorMod = 0),
          cand AS (SELECT a.anchor_id, y.vec_id,
                 CAST(floor(${cosine2Sql("a.ae", "y.embedding")}
                   * 1000000.0 + 0.5) AS BIGINT) AS cos_u
                FROM anch a JOIN b y ON a.bucket = y.bucket
                WHERE y.label <> a.al AND y.vec_id <> a.anchor_id)
          SELECT anchor_id, vec_id, cos_u, CAST(rn AS BIGINT) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY anchor_id
              ORDER BY cos_u DESC, vec_id ASC) AS rn FROM cand)
          WHERE rn <= $hardNegK""",
    "q_topic_balance" ->
      s"""WITH $ivfKmeansCtes
          SELECT vec_id, cell FROM (
            SELECT af.vec_id, af.cell,
              row_number() OVER (PARTITION BY cell ORDER BY
                CAST('0x' || substring(md5('$topicBalanceSalt:' || CAST(cell AS VARCHAR)
                  || ':' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
                vec_id ASC) AS rn
            FROM af) WHERE rn <= $topicBalanceN""",
    "q_bitext_margin" ->
      s"""WITH $adaptiveBucketCte,
          okb AS (SELECT bucket FROM b GROUP BY bucket
                  HAVING count(*) <= $embedLshBucketCap),
          bs AS (SELECT vec_id, embedding, label % 2 AS side, bucket
                 FROM b JOIN okb USING (bucket)),
          cand AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
              CAST(floor(${cosine2Sql("x.embedding", "y.embedding")}
                * 1000000.0 + 0.5) AS BIGINT) AS cos_u
            FROM bs x JOIN bs y ON x.bucket = y.bucket
            WHERE x.side = 0 AND y.side = 1),
          pc AS (SELECT * FROM cand WHERE cos_u > 0),
          ax AS (SELECT id_a, CAST(sum(cos_u) AS BIGINT) AS sa, count(*) AS na
                 FROM pc GROUP BY 1),
          byn AS (SELECT id_b, CAST(sum(cos_u) AS BIGINT) AS sb, count(*) AS nb
                  FROM pc GROUP BY 1),
          m AS (SELECT p.id_a, p.id_b, p.cos_u,
              CAST(floor(2.0 * p.cos_u
                / (CAST(a.sa AS DOUBLE) / a.na + CAST(c.sb AS DOUBLE) / c.nb)
                * 10000.0 + 0.5) AS BIGINT) AS margin_bp
            FROM pc p JOIN ax a USING (id_a) JOIN byn c USING (id_b))
          SELECT id_a, id_b, cos_u, margin_bp FROM (
            SELECT *, row_number() OVER (PARTITION BY id_a
              ORDER BY margin_bp DESC, id_b ASC) AS rn FROM m)
          WHERE rn = 1 AND margin_bp >= $bitextMinMarginBp""",
    // semantic decontamination: max cosine vs the bench residue class,
    // argmax via the (cos DESC, bid ASC) window = the struct-max's
    // (cos, -bid) ordering; threshold compares the ROUNDED cosine
    "q_semantic_decontam" ->
      s"""WITH bm AS (SELECT vec_id AS bid, embedding AS be FROM embeddings
                      WHERE vec_id % ${CurationQueries.benchMod} = ${CurationQueries.benchRem}),
          cm AS (SELECT vec_id, embedding FROM embeddings
                 WHERE vec_id % ${CurationQueries.benchMod} <> ${CurationQueries.benchRem}),
          s AS (SELECT cm.vec_id, bm.bid,
                  ${cosine2Sql("cm.embedding", "bm.be")} AS cs
                FROM cm CROSS JOIN bm),
          r AS (SELECT vec_id, bid, cs,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY cs DESC, bid ASC) AS rn
                FROM s)
          SELECT vec_id, bid AS top_bench_id, cs AS max_cos,
                 cs >= $semDecontamThreshold AS contaminated
          FROM r WHERE rn = 1""",
    // fixed-bench variant: identical chain, bench additionally pinned
    // to the 1x-dataset id range (non-binding at oracle scales)
    "q_semantic_decontam_fixedbench" ->
      s"""WITH bm AS (SELECT vec_id AS bid, embedding AS be FROM embeddings
                      WHERE vec_id % ${CurationQueries.benchMod} = ${CurationQueries.benchRem}
                        AND vec_id < $fixedBenchCap),
          cm AS (SELECT vec_id, embedding FROM embeddings
                 WHERE vec_id % ${CurationQueries.benchMod} <> ${CurationQueries.benchRem}),
          s AS (SELECT cm.vec_id, bm.bid,
                  ${cosine2Sql("cm.embedding", "bm.be")} AS cs
                FROM cm CROSS JOIN bm),
          r AS (SELECT vec_id, bid, cs,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY cs DESC, bid ASC) AS rn
                FROM s)
          SELECT vec_id, bid AS top_bench_id, cs AS max_cos,
                 cs >= $semDecontamThreshold AS contaminated
          FROM r WHERE rn = 1""",
    "q_sim_embed_probed" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
          p AS (SELECT vec_id, embedding, unnest($probeListSql) AS probe FROM b)
          SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                 ${cosine2Sql("a.embedding", "b2.embedding")} AS cosine_sim
          FROM p a JOIN b b2
            ON a.probe = b2.bucket AND a.vec_id < b2.vec_id
          WHERE ${cosine2Sql("a.embedding", "b2.embedding")} >= 0.4""",
    "q_sim_ivf_kmeans" ->
      s"""WITH $ivfKmeansCtes
          SELECT af.vec_id, af.cell, ${cosineSql("af.embedding")} AS cosine_sim
          FROM af JOIN probe p ON af.cell = p.cell
          ORDER BY cosine_sim DESC, af.vec_id ASC LIMIT 10""",
    "q_sim_pq_adc" ->
      s"""WITH $pqCtes
          SELECT c.vec_id, sum(CAST(round(d2q * 1e6) AS BIGINT)) / 1e6 AS adc_dist
          FROM codes c JOIN dt ON c.sub = dt.sub AND c.cell = dt.cid
          GROUP BY 1 ORDER BY adc_dist ASC, c.vec_id ASC LIMIT 10""",
    "q_sim_ivf_pq" -> ivfPqOracleSql,
    // the indexed variant IS q_sim_ivf_pq's ranking by construction
    "q_ivfpq_indexed" -> ivfPqOracleSql,
    "q_pq_distortion" ->
      s"""WITH $pqCtes,
          dist AS (${(0 until pqM).map(su =>
            s"""SELECT vec_id, $su AS sub,
                min(${pqL2Sql("e.sv", "c.cvec")}) AS d2
                FROM sub$su e CROSS JOIN pc${su}2 c GROUP BY 1, 2""")
            .mkString("\n            UNION ALL ")})
          SELECT CAST(sub AS BIGINT) AS sub, count(*) AS n,
                 round(CAST(sum(CAST(round(d2 * 1e6) AS BIGINT)) AS DOUBLE)
                       / count(*) / 1e6, 6) AS mse
          FROM dist GROUP BY 1""",
    "q_learn_logreg" ->
      s"""WITH ${learnCtes()}
          SELECT 'ntok' AS feature, w0 AS weight FROM w$learnIters
          UNION ALL SELECT 'mtl', w1 FROM w$learnIters
          UNION ALL SELECT 'punct', w2 FROM w$learnIters
          UNION ALL SELECT '__bias', wb FROM w$learnIters""",
    "q_learn_score" ->
      s"""WITH ${learnCtes()}
          SELECT doc_id, round(greatest(0.0, least(1.0,
            (f0 * w.w0 + f1 * w.w1 + f2 * w.w2 + w.wb) * 0.25 + 0.5)), 6) AS score
          FROM lf, w$learnIters w""",
    "q_learn_auc" ->
      s"""WITH ${learnCtes()},
          scored AS (SELECT round(greatest(0.0, least(1.0,
              (f0 * w.w0 + f1 * w.w1 + f2 * w.w2 + w.wb) * 0.25 + 0.5)), 6) AS score,
              y
            FROM lf, w$learnIters w),
          h AS (SELECT score AS s, count(*) AS n, CAST(sum(y) AS BIGINT) AS np
                FROM scored GROUP BY 1),
          r AS (SELECT np, n,
                  2 * coalesce(sum(n) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + n + 1 AS r2
                FROM h)
          SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                 CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
                 round((sum(np * r2) - sum(np) * (sum(np) + 1))
                       / (2.0 * sum(np) * (sum(n) - sum(np))), 6) AS auc
          FROM r""",
    "q_learn_calibration" ->
      s"""WITH ${learnCtes()},
          scored AS (SELECT round(greatest(0.0, least(1.0,
              (f0 * w.w0 + f1 * w.w1 + f2 * w.w2 + w.wb) * 0.25 + 0.5)), 6) AS score,
              y
            FROM lf, w$learnIters w)
          SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
                 count(*) AS n,
                 round(CAST(sum(CAST(round(score * 1e6) AS BIGINT)) AS DOUBLE)
                       / count(*) / 1e6, 6) AS mean_score,
                 round(CAST(sum(CAST(y AS BIGINT)) AS DOUBLE) / count(*), 6) AS pos_rate
          FROM scored GROUP BY 1""",
    "q_st21_stream_sgd" ->
      s"""$sgdCtes
          SELECT 'ntok' AS feature, w0 AS weight FROM w3
          UNION ALL SELECT 'mtl', w1 FROM w3
          UNION ALL SELECT 'punct', w2 FROM w3
          UNION ALL SELECT '__bias', wb FROM w3""",
    // both engine paths (streaming drain, chained batch replay) must
    // land on the SQL re-derivation, and parity is pinned true
    "q_st21_batch_parity" ->
      s"""$sgdCtes
          SELECT 'ntok' AS feature, w0 AS weight_streamed,
                 w0 AS weight_replayed, TRUE AS parity FROM w3
          UNION ALL SELECT 'mtl', w1, w1, TRUE FROM w3
          UNION ALL SELECT 'punct', w2, w2, TRUE FROM w3
          UNION ALL SELECT '__bias', wb, wb, TRUE FROM w3""",
    "q_learn_holdout" ->
      s"""WITH ${learnCtes("WHERE " + ScaleQueries.splitCaseSql + " = 'train'")},
          test AS (SELECT
            len(string_split_regex(text, '\\s+')) / 200.0 AS f0,
            (length(regexp_replace(text, '\\s+', '', 'g'))
              / CAST(greatest(len(string_split_regex(text, '\\s+')), 1) AS DOUBLE))
              / 10.0 AS f1,
            len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) AS f2,
            (CASE WHEN n_chars > 306 THEN 1.0 ELSE 0.0 END) AS y
          FROM documents WHERE ${ScaleQueries.splitCaseSql} <> 'train'),
          scored AS (SELECT y,
            (CASE WHEN round(greatest(0.0, least(1.0,
              (f0 * w.w0 + f1 * w.w1 + f2 * w.w2 + w.wb) * 0.25 + 0.5)), 6) >= 0.5
             THEN 1.0 ELSE 0.0 END) AS pred
          FROM test, w$learnIters w)
          SELECT count(*) AS n_test,
                 CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
                 round(CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
                       / count(*), 4) AS accuracy
          FROM scored""",
    "q_pq_recall" ->
      s"""WITH $pqCtes,
          adc AS (SELECT c.vec_id
                  FROM codes c JOIN dt ON c.sub = dt.sub AND c.cell = dt.cid
                  GROUP BY 1
                  ORDER BY sum(CAST(round(d2q * 1e6) AS BIGINT)) / 1e6 ASC,
                           c.vec_id ASC LIMIT 10),
          truth AS (SELECT vec_id FROM embeddings
                    ORDER BY $pqExactL2Sql ASC, vec_id ASC LIMIT 10),
          h AS (SELECT count(*) AS n_hits FROM adc
                WHERE vec_id IN (SELECT vec_id FROM truth))
          SELECT CAST(10 AS BIGINT) AS k, n_hits,
                 round(n_hits / 10.0, 4) AS recall FROM h""",
    // the streamed index must converge to the batch computation — the
    // oracle IS q_sim_ivf_pq's, shared by construction
    "q_st19_stream_ann" -> ivfPqOracleSql,
    // compaction is layout-only: before AND after must equal the batch
    // IVF-PQ over the post-update corpus. The shared training/coding
    // CTEs are re-pointed (FROM embeddings -> FROM emb_mod) at the
    // corpus with the movers' vectors negated — the same latest-wins
    // set the store resolves to — and the probe join is dropped (the
    // Spark side probes every cell). Emitting the one ADC sum under
    // both column names pins before == after == batch by construction.
    "q_st19b_compact_recall" -> {
      val mod = """emb_mod AS (SELECT vec_id,
             CASE WHEN vec_id % 37 = 3
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding, label
           FROM embeddings)"""
      val ctes = (ivfKmeansCtes + ",\n        " + pqCtes)
        .replace("FROM embeddings", "FROM emb_mod")
      s"""WITH $mod,
          $ctes
          SELECT c.vec_id,
                 sum(CAST(round(d2q * 1e6) AS BIGINT)) / 1e6 AS adc_before,
                 sum(CAST(round(d2q * 1e6) AS BIGINT)) / 1e6 AS adc_after
          FROM codes c
            JOIN dt ON c.sub = dt.sub AND c.cell = dt.cid
          GROUP BY 1 ORDER BY adc_before ASC, c.vec_id ASC LIMIT 10"""
    },
    "q_ann_recall_kmeans" ->
      s"""WITH $ivfKmeansCtes,
          ann AS (SELECT af.vec_id FROM af JOIN probe p ON af.cell = p.cell
                  ORDER BY ${cosineSql("af.embedding")} DESC, af.vec_id ASC LIMIT 10),
          truth AS (SELECT vec_id FROM embeddings
                    ORDER BY ${cosineSql("embedding")} DESC, vec_id ASC LIMIT 10),
          h AS (SELECT count(*) AS n_hits FROM ann
                WHERE vec_id IN (SELECT vec_id FROM truth))
          SELECT CAST(10 AS BIGINT) AS k, n_hits,
                 round(n_hits / 10.0, 4) AS recall FROM h""",
    "q_embed_project" ->
      planes.zipWithIndex.map { case (w, j) =>
        s"""SELECT vec_id, CAST($j AS BIGINT) AS j,
            round(${dotSql("embedding", sqlList(w.toSeq))} / sqrt(${planes.length}.0), 6) AS proj
            FROM embeddings"""
      }.mkString(" UNION ALL "),
    "q_ivf_cells" ->
      s"""WITH $ivfAnnCtes,
          g AS (SELECT cell, count(*) AS n,
                  CAST(sum(CAST(floor(${normSql("embedding")} * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS qs
                FROM assign GROUP BY cell)
          SELECT cell, n, round(qs / 1000000.0 / n, 4) AS mean_norm FROM g""",
    "q_cell_reps" ->
      s"""WITH $ivfAnnCtes,
          j AS (SELECT a.cell, a.vec_id,
                  ${cosine2Sql("a.embedding", "c.cvec")} AS cos
                FROM assign a JOIN cent c ON a.cell = c.cid),
          r AS (SELECT cell, vec_id, cos,
                  row_number() OVER (PARTITION BY cell ORDER BY cos DESC, vec_id ASC) AS rn,
                  count(*) OVER (PARTITION BY cell) AS n
                FROM j)
          SELECT cell, CAST(n AS BIGINT) AS n, vec_id AS rep_id, cos AS rep_cos
          FROM r WHERE rn = 1""",
    "q_semantic_dedup" ->
      s"""WITH $semanticDedupCtes
          SELECT vec_id, cell, cos_rep FROM surv""",
    "q_curate_multimodal" ->
      s"""WITH $semanticDedupCtes
          SELECT d.doc_id, d.source,
                 CAST(len(string_split_regex(d.text, '\\s+')) AS BIGINT) AS n_tok,
                 s.cell
          FROM documents d JOIN surv s ON d.doc_id = s.vec_id
          WHERE len(string_split_regex(d.text, '\\s+')) >= $mmMinTokens""",
    "q_st12_stream_semdedup" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
            FROM embeddings WHERE vec_id % 50 = 0),
          arr AS (SELECT vec_id, embedding,
              CASE WHEN vec_id % 3 = 2 THEN 0
                   WHEN vec_id % 3 = 0 THEN 1 ELSE 2 END AS seq
            FROM embeddings),
          af AS (SELECT vec_id, embedding, seq, cid AS cell FROM (
              SELECT a.vec_id, a.embedding, a.seq, c.cid,
                     row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${cosine2Sql("a.embedding", "c.cvec")} DESC, c.cid ASC) AS rn
              FROM arr a CROSS JOIN cent c) t WHERE rn = 1),
          ex AS (SELECT cell, vec_id AS ex_id, embedding AS ex_vec FROM (
              SELECT *, row_number() OVER (PARTITION BY cell ORDER BY seq, vec_id) AS rn
              FROM af) t WHERE rn = 1),
          sc AS (SELECT a.vec_id, a.cell, e.ex_id,
                   ${cosine2Sql("a.embedding", "e.ex_vec")} AS cos_ex
                 FROM af a JOIN ex e ON a.cell = e.cell)
          SELECT vec_id, cell, cos_ex, (vec_id = ex_id) AS is_ex
          FROM sc WHERE vec_id = ex_id OR cos_ex < $semThreshold""",
    "q_st14_stream_lshdedup" -> {
      val matchSum = (0 until minhashN).map(i =>
        s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString("(", " + ", ")")
      s"""WITH $shingleCte,
          $minhashBase,
          sig AS (SELECT doc_id, $minhashAggs FROM shb GROUP BY doc_id),
          arr AS (SELECT doc_id,
                    CASE WHEN doc_id % 3 = 2 THEN 0
                         WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS seq
                  FROM documents),
          banded AS ($bandedSql),
          bs AS (SELECT b.doc_id, b.band, b.band_key, a.seq
                 FROM banded b JOIN arr a ON b.doc_id = a.doc_id),
          pairs AS (SELECT DISTINCT e.doc_id AS id_a, l.doc_id AS id_b
                    FROM bs e JOIN bs l
                      ON e.band = l.band AND e.band_key = l.band_key
                     AND (e.seq < l.seq OR (e.seq = l.seq AND e.doc_id < l.doc_id))
                    WHERE (SELECT count(*) FROM bs x
                           WHERE x.band = l.band AND x.band_key = l.band_key
                             AND x.seq <= l.seq) <= $lshBucketCap),
          est AS (SELECT p.id_a, p.id_b,
                    round(CAST($matchSum AS DOUBLE) / $minhashN, 4) AS jaccard_est
                  FROM pairs p JOIN sig a ON a.doc_id = p.id_a
                               JOIN sig b ON b.doc_id = p.id_b),
          drops AS (SELECT DISTINCT id_b FROM est
                    WHERE jaccard_est >= $jaccardThreshold)
          SELECT d.doc_id, a.seq
          FROM documents d JOIN arr a ON d.doc_id = a.doc_id
          WHERE d.doc_id NOT IN (SELECT id_b FROM drops)"""
    },
    "q_recall_curve" ->
      s"""WITH $ivfAnnCtes,
          ann AS (SELECT vec_id, rc FROM (
              SELECT af.vec_id,
                     row_number() OVER (ORDER BY ${cosineSql("af.embedding")} DESC, af.vec_id ASC) AS rc
              FROM assign af JOIN probe p ON af.cell = p.cell) t WHERE rc <= 50),
          tr AS (SELECT vec_id, rt FROM (
              SELECT vec_id,
                     row_number() OVER (ORDER BY ${cosineSql("embedding")} DESC, vec_id ASC) AS rt
              FROM embeddings) t WHERE rt <= 50),
          j AS (SELECT tr.rt, ann.rc FROM tr LEFT JOIN ann ON tr.vec_id = ann.vec_id)
          SELECT CAST(u.k AS BIGINT) AS k,
                 CAST(sum(CASE WHEN j.rt <= u.k AND coalesce(j.rc, 9999) <= u.k
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                 round(CAST(sum(CASE WHEN j.rt <= u.k AND coalesce(j.rc, 9999) <= u.k
                                     THEN 1 ELSE 0 END) AS DOUBLE) / u.k, 4) AS recall
          FROM j, unnest([1, 5, 10, 50]) AS u(k) GROUP BY u.k"""
  )

  /** Semantic-dedup CTE chain ending at `surv(vec_id, cell, cos_rep)` —
    * shared by q_semantic_dedup / q_curate_multimodal. Mirrors the
    * TRAINED path: assignment (`af`) and rep scoring run against the
    * 2-iteration k-means quantizer `cent2`, exactly as the Spark side
    * passes kmeansCentroids output to the semanticDedup overload. */
  /** Semantic-dedup chain with the ASSIGNMENT source parameterized —
    * the quantizer still trains on the full `embeddings` corpus
    * (cent0 → cent2, exactly as [[Similarity.kmeansCentroids]] over the
    * whole table), but assignment/rep-scoring/survivor selection run
    * over `assignSrc` (a `(vec_id, embedding)` relation, e.g. the
    * vectors of documents surviving earlier curation stages). Ends at
    * `surv(vec_id, cell, cos_rep)`; shares [[kmeansIterSql]] and the
    * cosine helpers with [[semanticDedupCtes]] so the constants cannot
    * drift. */
  private[graft] def semanticDedupCtesOver(assignSrc: String): String =
    s"""cent0 AS (SELECT vec_id AS cid, embedding AS cvec
       |    FROM embeddings WHERE vec_id % 50 = 0),
       |${kmeansIterSql("cent0", "1")},
       |${kmeansIterSql("cent1", "2")},
       |af AS MATERIALIZED (SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosine2Sql("e.embedding", "c.cvec")} DESC, c.cid ASC) AS rn
       |    FROM $assignSrc e CROSS JOIN cent2 c) t WHERE rn = 1),
       |j AS (SELECT a.cell, a.vec_id,
       |        ${cosine2Sql("a.embedding", "c.cvec")} AS cos
       |      FROM af a JOIN cent2 c ON a.cell = c.cid),
       |r AS (SELECT cell, vec_id,
       |        row_number() OVER (PARTITION BY cell ORDER BY cos DESC, vec_id ASC) AS rn
       |      FROM j),
       |rv AS (SELECT r.cell, r.vec_id AS rep_id, a.embedding AS rvec
       |       FROM r JOIN af a ON r.vec_id = a.vec_id WHERE r.rn = 1),
       |scored AS (SELECT a.vec_id, a.cell, rv.rep_id,
       |             ${cosine2Sql("a.embedding", "rv.rvec")} AS cos_rep
       |           FROM af a JOIN rv ON a.cell = rv.cell),
       |surv AS (SELECT vec_id, cell, cos_rep FROM scored
       |         WHERE vec_id = rep_id OR cos_rep < $semThreshold)""".stripMargin

  private lazy val semanticDedupCtes =
    s"""$ivfKmeansCtes,
       |j AS (SELECT a.cell, a.vec_id,
       |        ${cosine2Sql("a.embedding", "c.cvec")} AS cos
       |      FROM af a JOIN cent2 c ON a.cell = c.cid),
       |r AS (SELECT cell, vec_id,
       |        row_number() OVER (PARTITION BY cell ORDER BY cos DESC, vec_id ASC) AS rn
       |      FROM j),
       |rv AS (SELECT r.cell, r.vec_id AS rep_id, a.embedding AS rvec
       |       FROM r JOIN af a ON r.vec_id = a.vec_id WHERE r.rn = 1),
       |scored AS (SELECT a.vec_id, a.cell, rv.rep_id,
       |             ${cosine2Sql("a.embedding", "rv.rvec")} AS cos_rep
       |           FROM af a JOIN rv ON a.cell = rv.cell),
       |surv AS (SELECT vec_id, cell, cos_rep FROM scored
       |         WHERE vec_id = rep_id OR cos_rep < $semThreshold)""".stripMargin
}

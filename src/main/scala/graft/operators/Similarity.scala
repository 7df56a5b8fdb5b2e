package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Deduplication & similarity-search operators for training-data
  * pipelines: exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine brute-force and hyperplane-LSH ANN.
  *
  * Design notes for 100 TB:
  *  - Shingling/minhashing are per-row projections (no shuffle).
  *  - LSH banding turns the O(n²) pair space into a single hash-shuffle
  *    on band keys; `maxBucketSize` caps degenerate buckets so one hot
  *    key (empty/boilerplate docs sharing a signature) cannot make the
  *    self-join quadratic.
  *  - All hashes are engine-portable (md5 over deterministic strings),
  *    so results are reproducible across engines and runs — no
  *    Math.random / JVM-hash dependence.
  */
object Similarity {

  // ---------------------------------------------------------------------
  // Shingling: word n-grams as a pure projection (no shuffle).
  // ---------------------------------------------------------------------
  def shinglesArray(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    // Guard: a document with fewer than n tokens yields an empty shingle
    // set. Without the guard sequence(0, size-n) would produce a
    // DESCENDING [0,-1] array and slice(toks, 0, n) throws (SQL array
    // indices are 1-based).
    when(size(toks) >= n,
      filter(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
        s => s =!= ""))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Exploded (id, shingle) pairs, distinct per doc. Uses the native
    * codegen'd `word_shingles` expression when [[graft.GraftExtensions]]
    * is installed (the HOF composition is interpreted and dominates
    * minhash/LSH/jaccard cost); built-in fallback is bit-identical. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val arr =
      if (df.sparkSession.catalog.functionExists("word_shingles"))
        expr(s"word_shingles($textCol, $n)")
      else shinglesArray(col(textCol), n)
    df.select(col(idCol), explode(array_distinct(arr)).as("shingle"))
  }

  // ---------------------------------------------------------------------
  // Exact dedup — hash-groupBy on content hash, keep lowest id.
  // One shuffle on the 128-bit content key; partial (map-side) min().
  // ---------------------------------------------------------------------
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---------------------------------------------------------------------
  // MinHash signatures — k permutations via the Kirsch-Mitzenmacher
  // construction h_i = (h1 + i*h2) mod p over two base hashes, so the
  // per-shingle cost is 2 md5s regardless of k (16 independent salted
  // md5s would be 8x the hash work in the hottest stage). Base hashes
  // take the top 60 bits of md5 hex; everything stays engine-portable
  // and deterministic.
  // ---------------------------------------------------------------------
  val minhashMod = 1000000007L

  /** First 15 hex chars of a 32-char md5 as a 60-bit long. */
  private def hex60(c: Column): Column =
    conv(substring(c, 1, 15), 16, 10).cast(LongType)

  def minhashSignature(shingled: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val h1 = hex60(md5(concat(lit("a:"), col("shingle")))) % minhashMod
    val h2 = hex60(md5(concat(lit("b:"), col("shingle")))) % minhashMod
    val aggs = (0 until numHashes).map(i =>
      min((h1 + lit(i.toLong) * h2) % minhashMod).as(s"mh$i"))
    shingled.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Drop rows whose `keys` group exceeds `cap` members — the degenerate-
    * bucket guard shared by LSH banding, raw jaccard, and simhash
    * blocking. Implemented as aggregate + anti-join, NOT a count window:
    * the window would hash-shuffle AND SORT the full relation, while the
    * aggregate partial-combines map-side and the anti-join's probe side
    * re-reads the (exchange-reused or cheap-to-recompute) input with no
    * sort anywhere. The oversized-key list is tiny by construction
    * (at most n/cap keys), so AQE turns the anti-join into a broadcast;
    * no hint, so a pathological run that exceeds the broadcast threshold
    * degrades to a shuffled anti-join instead of an OOM. */
  private[operators] def dropOversizedBuckets(df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val oversized = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > cap)
      .select(keys.map(col): _*)
    df.join(oversized, keys, "left_anti")
  }

  /** LSH banding: split the signature into bands of `rowsPerBand` hashes;
    * docs sharing any band key are candidate near-duplicates.
    *
    * `maxBucketSize` drops band buckets larger than the cap BEFORE the
    * self-join — one degenerate band key would otherwise fan out
    * quadratically. Dropped buckets only lose recall for keys so common
    * they are boilerplate; exact-dedup catches identical docs first.
    */
  /** Band-key relation (id, band, band_key) of a signature relation —
    * ONE posexplode projection, NOT a union of per-band branches (a
    * union would re-evaluate the upstream signature aggregation once
    * per band). Shared by [[lshCandidatePairs]] and the streaming LSH
    * dedup, so the banding constants cannot drift between them. */
  def bandKeys(sig: DataFrame, idCol: String,
               numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val keys = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"mh$i").cast(StringType))
      md5(concat_ws("|", cols: _*))
    }
    sig.select(col(idCol), posexplode(array(keys: _*)))
      .toDF(idCol, "band", "band_key")
  }

  def lshCandidatePairs(sig: DataFrame, idCol: String,
                        numHashes: Int, rowsPerBand: Int,
                        maxBucketSize: Int = 100): DataFrame = {
    val banded = bandKeys(sig, idCol, numHashes, rowsPerBand)
    // banded sits just above the signature aggregation's exchange, so the
    // anti-join's two consumers reuse that exchange — no double compute.
    val capped = dropOversizedBuckets(banded, Seq("band", "band_key"), maxBucketSize)
    val l = capped.as("l")
    val r = capped.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.band_key") === col("r.band_key") &&
              col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** Estimated Jaccard for candidate pairs from signature agreement:
    * E[fraction of matching minhash slots] = J(A,B), so the estimate is
    * matches/numHashes — no shingle re-join at all, just a signature
    * lookup per side. The cheap middle ground between raw candidates
    * (no score) and exact pair-gated jaccard (two joins back to the
    * shingle relation): at corpus scale the signatures are k longs per
    * doc vs hundreds of shingles, so the verify join shrinks by that
    * factor when estimator precision (sd ≈ sqrt(J(1-J)/k)) suffices. */
  def minhashJaccardEstimate(pairs: DataFrame, sig: DataFrame, idCol: String,
                             numHashes: Int): DataFrame = {
    val a = sig.toDF(sig.columns.map(c => if (c == idCol) "id_a" else s"a_$c"): _*)
    val b = sig.toDF(sig.columns.map(c => if (c == idCol) "id_b" else s"b_$c"): _*)
    val matches = (0 until numHashes).map(i =>
      when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0)).reduce(_ + _)
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard_est", round(matches.cast(DoubleType) / numHashes, 4))
      .select(col("id_a"), col("id_b"), col("jaccard_est"))
  }

  /** End-to-end MinHash-LSH near-dup candidates over (id, text).
    * Defaults: 16 hashes / 4 rows per band = 4 bands — at J=0.8 a pair
    * matches some band with p ≈ 1-(1-0.8^4)^4 ≈ 0.93.
    *
    * The signature relation (k longs per doc — orders of magnitude
    * smaller than the shingle relation) is persisted and materialized
    * before the banding stage: bucket capping and the two self-join
    * sides otherwise each re-run the shingle+minhash aggregation. The
    * small pair result is materialized, then the signature cache is
    * released; callers release the result via [[release]] (the harness
    * clears caches per query). */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
                 maxBucketSize: Int = 100): DataFrame = {
    val sig = minhashSignature(shingles(df, idCol, textCol, shingleN), idCol, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val out = lshCandidatePairs(sig, idCol, numHashes, rowsPerBand, maxBucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sig.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------------
  // SimHash — 64-bit fingerprint from two salted token hashes. Bits
  // 0..31 come from bits 0..31 of the 'a:'-salted 60-bit hash, bits
  // 32..63 from the 'b:'-salted one; a token's weight for bit j is
  // (bit<<j ? +1 : -1) and fingerprint bit j = (sum over tokens > 0).
  // Bit extraction is integer shift/mask (codegen'd) — a 64-way
  // per-character substring comparison costs ~10x more per token row.
  // 64 bits ≈ 1.8e19 buckets — corpus-scale resolution (16 bits = 65k
  // buckets saturates immediately).
  // ---------------------------------------------------------------------
  val simhashBits = 64

  def simhashFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), "\\s+")).as("tok"))
      .withColumn("v1", hex60(md5(concat(lit("a:"), col("tok")))))
      .withColumn("v2", hex60(md5(concat(lit("b:"), col("tok")))))
    val bitSums = (0 until simhashBits).map { j =>
      val src = if (j < 32) col("v1") else col("v2")
      val bit = j % 32
      sum((shiftright(src, bit).bitwiseAND(lit(1L)) * 2 - 1)).as(s"b$j")
    }
    toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        concat((0 until simhashBits).map(j => when(col(s"b$j") > 0, lit("1")).otherwise(lit("0"))): _*)
          .as("simhash"))
  }

  /** SimHash near-duplicate pairs via chunk blocking (the classic
    * Manku/Das/Sarma construction): split the 64-bit fingerprint into
    * `chunks` equal substrings — any pair within Hamming distance
    * `maxHamming` < `chunks` shares at least one identical chunk
    * (pigeonhole), so blocking on (chunk index, chunk value) finds every
    * such pair with ONE hash-shuffle instead of an n² scan. Exact
    * Hamming distance verifies inside each block. `maxBucketSize` drops
    * degenerate chunk buckets (near-empty docs collapsing to the same
    * fingerprint region) before the self-join, same hygiene as LSH
    * banding. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3, chunks: Int = 4,
                          maxBucketSize: Int = 100): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val chunkLen = simhashBits / chunks
    val fp = simhashFingerprint(df, idCol, textCol)
    val blocked = fp.select(col(idCol), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        substring(col("simhash"), c * chunkLen + 1, chunkLen)): _*))
        .as(Seq("chunk", "ckey")))
    val capped = dropOversizedBuckets(blocked, Seq("chunk", "ckey"), maxBucketSize)
    val cand = capped.as("a").join(capped.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.simhash").as("__fa"), col("b.simhash").as("__fb"))
      .distinct()
    // Hamming distance chunk-wise as popcount(xor) over the binary-parsed
    // chunks, NOT a 64-term per-character compare: the char-compare tree
    // exceeds codegen limits, drops the projection to interpreted eval,
    // and dominated the whole query (~8s of a 10s run at sf0.1). Values
    // are identical — the oracle keeps its per-character formulation as
    // an independent mirror.
    val chunkHams = (0 until chunks).map { c =>
      val fa = conv(substring(col("__fa"), c * chunkLen + 1, chunkLen), 2, 10).cast(LongType)
      val fb = conv(substring(col("__fb"), c * chunkLen + 1, chunkLen), 2, 10).cast(LongType)
      bit_count(fa.bitwiseXOR(fb))
    }
    cand.withColumn("hamming", chunkHams.reduce(_ + _).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ---------------------------------------------------------------------
  // N-gram Jaccard — exact set similarity via shingle co-occurrence join:
  // |A∩B| from a self-join on shingle, |A∪B| = |A|+|B|−|A∩B|.
  // `maxShingleFreq` caps the per-shingle fan-out (a shingle appearing in
  // f docs contributes f² join rows): ubiquitous shingles are dropped
  // from the intersection counts, which biases jaccard DOWN for pairs
  // sharing only boilerplate — the safe direction for a dedup gate. For
  // corpus-scale exact jaccard, gate the pair space behind minhashLsh
  // candidates instead of the raw self-join.
  // ---------------------------------------------------------------------
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleFreq: Long = 1000L): DataFrame = {
    // Five consumers (doc sizes, the freq-cap aggregation, the anti-join
    // probe feeding both self-join sides): persist the shingle relation
    // rather than re-scan + re-shingle the corpus per consumer. Released
    // by the harness's per-query cache clear / Similarity.release.
    val sh = shingles(df, idCol, textCol, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val capped = dropOversizedBuckets(sh, Seq("shingle"), maxShingleFreq.toInt)
    val co = capped.as("a").join(capped.as("b"),
        col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact jaccard restricted to a candidate pair set — the corpus-scale
    * composition: LSH prunes the O(n²) pair space, exact jaccard
    * verifies the survivors. Join cost is Σ_pairs |shingles| rows (pair-
    * gated), not Σ_shingle freq² (the raw self-join). */
  def jaccardForPairs(pairs: DataFrame, shingled: DataFrame, idCol: String,
                      threshold: Double): DataFrame = {
    val sizes = shingled.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = shingled.withColumnRenamed(idCol, "id_a")
    val b = shingled.withColumnRenamed(idCol, "id_b")
    val inter = pairs.join(a, "id_a").join(b, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** LSH-gated exact near-dup detection end-to-end: candidates from
    * banding, exact jaccard on just those pairs.
    *
    * The shingle relation feeds three consumers (the signature branch and
    * both sides of the pair verify), so it is persisted for the duration
    * of the job — without it the corpus is scanned + split + exploded +
    * deduped ~3x. The small pair result is materialized (and persisted)
    * while the shingles are cached, then the shingle cache is released;
    * the result keeps its lineage, so a lost partition recomputes rather
    * than fails. */
  def lshJaccard(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int, numHashes: Int, rowsPerBand: Int,
                 maxBucketSize: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The signature relation is also persisted (k longs per doc): the
    // cap aggregation and both self-join sides are 4 consumers that
    // would otherwise each re-run the 16-way minhash aggregation —
    // measured ~2s of a 4.5s run at sf0.1, for a cache of n×k longs.
    val sig = minhashSignature(sh, idCol, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val cands = lshCandidatePairs(sig, idCol, numHashes, rowsPerBand, maxBucketSize)
    val out = jaccardForPairs(cands, sh, idCol, threshold)
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the (near-dup pairs << corpus) result now
    sig.unpersist(blocking = false)
    sh.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------------
  // Embedding cosine similarity — double-precision dot/norms over
  // Array[Float] columns with zip_with/aggregate (codegen'd; no UDF).
  // ---------------------------------------------------------------------
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
              lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
                   lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Session-aware variants: use the native codegen'd `vec_dot`
    * expression (graft.GraftExtensions) when registered — the HOF
    * composition above is interpreted and embeddings work evaluates it
    * per row × per plane/centroid/pair. Same left fold, bit-identical
    * results, so oracle mirrors are unaffected. */
  private def hasNative(df: DataFrame): Boolean =
    df.sparkSession.catalog.functionExists("vec_dot")

  private def dotFor(native: Boolean)(a: Column, b: Column): Column =
    if (native) call_function("vec_dot", a, b) else dot(a, b)

  private def normFor(native: Boolean)(a: Column): Column =
    sqrt(dotFor(native)(a, a))

  private def cosineFor(native: Boolean)(a: Column, b: Column): Column =
    dotFor(native)(a, b) / (normFor(native)(a) * normFor(native)(b))

  /** Public session-aware forms for composing queries outside this
    * file: native `vec_dot` when the extension is registered on `df`'s
    * session, bit-identical HOF fold otherwise. */
  def dotOf(df: DataFrame, a: Column, b: Column): Column =
    dotFor(hasNative(df))(a, b)

  def normOf(df: DataFrame, a: Column): Column =
    normFor(hasNative(df))(a)

  /** Literal column for a constant query vector. */
  def vecLit(q: Seq[Double]): Column = array(q.map(lit): _*)

  /** Brute-force top-k nearest neighbours of one query vector.
    * Per-row projection + TakeOrderedAndProject: the right baseline at any
    * scale (no shuffle; k-heap per partition). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryVec: Column, k: Int, excludeId: Option[Long] = None): DataFrame = {
    val scored = emb
      .withColumn("cosine_sim", round(cosineFor(hasNative(emb))(col(vecCol), queryVec), 6))
    val base = excludeId.map(x => scored.filter(col(idCol) =!= x)).getOrElse(scored)
    base.orderBy(col("cosine_sim").desc, col(idCol).asc)
      .select(col(idCol), col("cosine_sim"))
      .limit(k)
  }

  /** Recall@k of an approximate result list against exact ground truth —
    * the eval every ANN index ships with (tune nprobe/planes until this
    * clears the target). Both inputs are k-row lists, so the semi-join
    * and the single-row aggregate cost nothing at any corpus scale.
    * Output: one row (k, n_hits, recall). */
  def recallAtK(candidates: DataFrame, truth: DataFrame,
                idCol: String, k: Int): DataFrame =
    truth.select(col(idCol))
      .join(candidates.select(col(idCol)), Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
      .select(lit(k.toLong).as("k"), col("n_hits"),
        round(col("n_hits").cast(DoubleType) / k, 4).as("recall"))

  /** Recall@k for SEVERAL k in one aggregation pass — the recall curve
    * an index tuner reads (recall@{1,5,10,50} from one run instead of a
    * query per k). Inputs are RANKED lists (`idCol`, `rankCol` with
    * ranks 1..max(ks)); a truth id is a hit at k iff both its truth
    * rank and its candidate rank are ≤ k (absent from candidates →
    * never a hit). One left join of two bounded lists + one aggregate
    * whose per-k terms are CASE sums — adding a k adds a column to the
    * same pass, not a pass. Output: (k, n_hits, recall) per k. */
  def recallCurve(candidates: DataFrame, truth: DataFrame, idCol: String,
                  rankCol: String, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "need at least one k")
    val joined = truth
      .select(col(idCol), col(rankCol).cast(LongType).as("__rt"))
      .join(candidates.select(col(idCol), col(rankCol).cast(LongType).as("__rc")),
        Seq(idCol), "left")
    val aggs = ks.map(k =>
      sum(when(col("__rt") <= k && col("__rc") <= k, 1L).otherwise(0L)).as(s"__h$k"))
    joined.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ks.map(k =>
        struct(lit(k.toLong).as("k"),
          coalesce(col(s"__h$k"), lit(0L)).as("n_hits"))): _*)).as("r"))
      .select(col("r.k").as("k"), col("r.n_hits").as("n_hits"),
        round(col("r.n_hits").cast(DoubleType) / col("r.k"), 4).as("recall"))
  }

  // ---------------------------------------------------------------------
  // Hyperplane-LSH ANN — signed-random-projection buckets with
  // multi-probe.
  //
  // Hyperplanes are deterministic Rademacher (±1) vectors derived from a
  // fixed arithmetic sequence, so buckets are reproducible across
  // engines and runs (and the oracle can recompute them). Sign bit p =
  // (vec · w_p >= 0); bucket = the `planes`-bit string. Multi-probe
  // expands the query bucket to all buckets within Hamming radius
  // `probeRadius` — the standard recall fix for boundary-crossing
  // neighbours.
  //
  // At 100 TB: `withBuckets` output is written partitioned/bucketed by
  // `bucket`; a query then touches only `1 + planes` partitions (radius
  // 1) instead of scanning the corpus — the filter below pushes straight
  // into such a layout.
  // ---------------------------------------------------------------------
  /** The p*d cross term matters: a plane family affine in p (the old
    * p*73 + d*139 form) makes planes p and p+2 exact negations mod 97,
    * so bucket bits pair up complementarily, Hamming distances are
    * always even, and radius-1 multi-probe can never match anything —
    * half the signature carries zero information. With the cross term
    * no plane pair is equal or negated and each plane splits the dims
    * near 50/50. */
  def hyperplaneWeights(planes: Int, dims: Int): Seq[Array[Double]] =
    (0 until planes).map { p =>
      Array.tabulate(dims)(d => if ((p * 53 + d * 139 + p * d * 17) % 97 < 48) 1.0 else -1.0)
    }

  /** Corpus-size-derived hyperplane count — the deployment knob that
    * keeps LSH-blocked self-joins LINEAR instead of quadratic. A fixed
    * plane count makes blocked candidates grow ~n²/2^planes: every 10×
    * corpus growth multiplies per-bucket membership by 10 and pair
    * fan-out by 100 (measured 7.5× in q_bitext_margin's second probe
    * decade, SCALE.md round 18). Adding one plane halves candidates, so
    * planes must track log2(n): this ladder adds a plane for each
    * doubling of n past `targetPerBucket · 2^base`, capping expected
    * bucket occupancy at ~targetPerBucket and blocked candidates at
    * ~n · targetPerBucket regardless of corpus size.
    *
    * Pure INTEGER comparisons (n > targetPerBucket · 2^j), no log2 —
    * a DuckDB oracle reproduces the same ladder from count(*) with
    * CASE sums, so adaptive-plane results stay engine-exact. Because
    * plane p's weights ([[hyperplaneWeights]]) depend only on p, the
    * P-plane bucket is the P-prefix of the maxPlanes-plane bucket —
    * the oracle computes the full-width bucket once and blocks on its
    * prefix. `maxPlanes` bounds the recall trade (each plane costs
    * boundary-crossing pairs; radius-1 multi-probe or banding recovers
    * them when a caller needs recall at extreme scale). Default 24:
    * the measured 1000× decade (2 M vectors, SCALE.md round 20) showed
    * occupancy creeping 24→30 exactly because the old 16-plane cap had
    * already bound at n≈1 M — 24 planes (16.7 M buckets) keeps
    * occupancy at the ~32 target through a quarter-billion vectors,
    * and ladders identically to the 16-plane era at every n ≤ 2²¹
    * (so every test, bench, and probe dataset is bit-unchanged). */
  def adaptivePlanes(n: Long, base: Int = 8, maxPlanes: Int = 24,
                     targetPerBucket: Long = 32L): Int = {
    require(base >= 1 && maxPlanes >= base, s"need 1 <= base <= maxPlanes")
    base + (base until maxPlanes).count(j => n > (targetPerBucket << j))
  }

  /** Bucket of a vector column under the given hyperplanes. */
  def hyperplaneBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    hyperplaneBucketFor(native = false)(vec, planes)

  private def hyperplaneBucketFor(native: Boolean)(vec: Column,
                                                   planes: Seq[Array[Double]]): Column =
    concat(planes.map { w =>
      when(dotFor(native)(vec, vecLit(w.toSeq)) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Driver-side bucket of a constant query vector (pure arithmetic —
    * same fold order as the column expression). */
  def bucketOf(q: Seq[Double], planes: Seq[Array[Double]]): String =
    planes.map { w =>
      val d = q.zip(w).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      if (d >= 0) "1" else "0"
    }.mkString

  /** Query bucket plus all buckets within the given Hamming radius. */
  def probeBuckets(bucket: String, radius: Int = 1): Seq[String] = {
    require(radius >= 0 && radius <= 2, "probe radius 0..2 supported")
    val r1 = bucket.indices.map(i =>
      bucket.updated(i, if (bucket(i) == '1') '0' else '1'))
    val r2 = if (radius < 2) Seq.empty
      else for { i <- bucket.indices; j <- bucket.indices if j > i }
        yield bucket.updated(i, if (bucket(i) == '1') '0' else '1')
          .updated(j, if (bucket(j) == '1') '0' else '1')
    (Seq(bucket) ++ (if (radius >= 1) r1 else Seq.empty) ++ r2).distinct
  }

  def withBuckets(emb: DataFrame, vecCol: String, numPlanes: Int, dims: Int): DataFrame =
    emb.withColumn("bucket",
      hyperplaneBucketFor(hasNative(emb))(col(vecCol), hyperplaneWeights(numPlanes, dims)))

  /** Johnson–Lindenstrauss random projection: `proj` = the input vector
    * mapped to `outDims` dimensions by the SAME deterministic Rademacher
    * family the hyperplane LSH signs, scaled by 1/sqrt(outDims) (the JL
    * normalization, so expected pairwise distances are preserved). The
    * un-signed dot products are exactly the LSH's pre-sign values —
    * project once, and both the sketch bits and the reduced vector fall
    * out of one pass.
    *
    * Scale shape: a pure per-row projection — no shuffle, no state;
    * stays inside whole-stage codegen (native VecDot when registered),
    * and cuts downstream ANN/cluster cost by dims/outDims. */
  def randomProjection(emb: DataFrame, vecCol: String,
                       outDims: Int, dims: Int): DataFrame = {
    val planes = hyperplaneWeights(outDims, dims)
    val native = hasNative(emb)
    emb.withColumn("proj", array(planes.map(w =>
      dotFor(native)(col(vecCol), vecLit(w.toSeq)) /
        math.sqrt(outDims.toDouble)): _*))
  }

  /** ANN top-k: candidates = vectors in the query's probe buckets, ranked
    * by exact cosine. */
  def lshAnnTopK(emb: DataFrame, idCol: String, vecCol: String,
                 query: Seq[Double], numPlanes: Int, k: Int,
                 probeRadius: Int = 1): DataFrame = {
    val planes = hyperplaneWeights(numPlanes, query.length)
    val probes = probeBuckets(bucketOf(query, planes), probeRadius)
    withBuckets(emb, vecCol, numPlanes, query.length)
      .filter(col("bucket").isin(probes: _*))
      .withColumn("cosine_sim", round(cosineFor(hasNative(emb))(col(vecCol), vecLit(query)), 6))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .select(col(idCol), col("bucket"), col("cosine_sim"))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // IVF — inverted-file ANN. Coarse quantizer = every `centroidStep`-th
  // vector (deterministic; swap for trained k-means centroids in
  // production — assignment/probing are centroid-agnostic). Cell
  // assignment is a broadcast of the small centroid set against the
  // corpus (n*k cosines, embarrassingly parallel); a query scores only
  // the `nprobe` nearest cells.
  //
  // At 100 TB: write `ivfAssign` output partitioned by `cell`; a query
  // then reads nprobe partitions instead of the corpus — this is the
  // standard IVF layout, expressed as plain relational ops.
  // ---------------------------------------------------------------------
  /** Ceiling on trained coarse cells. Every-`step`-th seeding alone
    * grows the cell count as n/step, which makes Lloyd training
    * O(n²/step) — measured super-linear by the 10× scale probe
    * (SCALE.md). Real IVF deployments train a FIXED-size coarse
    * quantizer from a bounded sample; the id-range cap keeps seeding
    * deterministic (no limit-without-order nondeterminism) and binds
    * only for corpora larger than `step · 64` vectors — the oracle
    * scales (sf0.01: 4 cells, sf0.1: 40) are bit-identical with or
    * without it. */
  val maxTrainedCells = 64

  /** Driver-side memo of the seed-anchor min(id), keyed on the
    * CANONICALIZED input plan plus a (path, length, mtime) fingerprint
    * of the plan's input files — so two structurally identical reads of
    * the same bytes share one anchor, and a dataset regenerated at the
    * same path re-anchors instead of serving a stale value. Returns
    * None (→ caller keeps the in-plan broadcast-anchor form) when the
    * plan has no file inputs (in-memory/streaming relations have no
    * stable identity to key on) or the corpus is empty.
    *
    * Why a memo and not a per-call `.head()`: round 18 A/B-measured the
    * per-call scalar anchor at 4.32 s vs 3.18 s for the broadcast form
    * on q_sim_ivf_pq (two quantizer trainings per query → 2 extra
    * blocking driver jobs per call). The memo pays that blocking job
    * ONCE per (JVM, dataset) — exactly what a production deployment
    * reads from catalog statistics — and every later training call gets
    * a LITERAL anchor, which also deletes the per-action seed re-scan
    * the broadcast subtree costs. Round-19 interleaved A/B (isolated
    * min-of-3, same box, alternating passes): memo 3.59 s vs broadcast
    * 3.61 s — LOCAL PARITY, because ReuseExchange already dedupes the
    * seed subtree within a job and 2000 rows scan for free; the r18
    * "~0.5 s residual" was box variance (that day's floor 3.18 s was
    * unreachable by either form this day). Kept anyway: at 100 TB the
    * broadcast form re-aggregates the CORPUS once per training action,
    * the literal form reads a memo — strictly less work, same results.
    * GRAFT_AB_NO_MEMO=1 forces the broadcast form for re-adjudication. */
  private val minIdMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Long]]()

  private[operators] def memoizedMinId(emb: DataFrame, idCol: String): Option[Long] = {
    val files = try emb.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) return None
    val fp = files.iterator.map { f =>
      val file = try new java.io.File(new java.net.URI(f))
        catch { case _: Throwable => new java.io.File(f) }
      s"$f|${file.length}|${file.lastModified}".hashCode.toLong
    }.sum
    val key = emb.queryExecution.analyzed.canonicalized.toString +
      s"#$idCol#${java.lang.Long.toHexString(fp)}"
    minIdMemo.computeIfAbsent(key, _ => {
      val r = emb.agg(min(col(idCol)).cast(LongType)).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    })
  }

  private def centroids(emb: DataFrame, idCol: String, vecCol: String,
                        centroidStep: Int): DataFrame = {
    // Seed lattice anchored at the corpus' MIN id: raw `id % step`
    // assumes ids dense from 0, so a filtered or offset id space would
    // train zero centroids and silently empty every downstream ANN
    // result. Dense-from-0 corpora (minId = 0) keep bit-identical
    // seeds, so the DuckDB oracles are unchanged either way.
    //
    // Anchor preference order: (1) the fingerprint-MEMOIZED literal —
    // one blocking min() per (JVM, dataset), then ZERO per-action seed
    // work; (2) the broadcast-subtree anchor when the input has no
    // file identity. Round-19 interleaved A/B measured the two at
    // local parity (3.59 vs 3.61 s isolated min-of-3 — see
    // memoizedMinId); the memo wins at scale because the broadcast
    // form re-aggregates the corpus once per training action. Never a
    // per-call `.head()` (4.32 s) or an eager/lazy localCheckpoint
    // (4.3/3.63 s) — the round-18 A/B that ruled those out stands.
    (if (sys.env.contains("GRAFT_AB_NO_MEMO")) None else memoizedMinId(emb, idCol)) match {
      case Some(anchor) =>
        emb.filter((col(idCol) - anchor) % centroidStep === 0 &&
            col(idCol) - anchor < centroidStep.toLong * maxTrainedCells)
          .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      case None =>
        val minId = emb.agg(min(col(idCol)).cast(LongType).as("__min_id"))
        emb.crossJoin(broadcast(minId))
          .filter((col(idCol) - col("__min_id")) % centroidStep === 0 &&
            col(idCol) - col("__min_id") < centroidStep.toLong * maxTrainedCells)
          .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    }
  }

  /** Assign every vector to its max-cosine cell (ties -> lowest cid).
    * Norms are precomputed per row / per centroid (one fold each)
    * instead of per (row, centroid) pair.
    *
    * The argmax is a plain `max` aggregation over a packed long, not a
    * row_number window (shuffles AND sorts the full n*k relation) and
    * not max_by over structs (struct buffers force SortAggregate —
    * local sorts of n*k rows). Packing (rounded cosine, B-1-cid) into
    * one long keeps the mutable-buffer HashAggregate: partial (map-side)
    * combine reduces n*k to n before the exchange and nothing ever
    * sorts. The pack order reproduces the window's tie-break exactly
    * (highest cosine, then lowest cid): cosine is already rounded to 6
    * decimals so *1e6 is integral, and a 1-step cosine difference
    * outweighs any cid difference because cid < B = 2^40. */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                centroidStep: Int): DataFrame =
    ivfAssignTo(emb, idCol, vecCol,
      centroids(emb, idCol, vecCol, centroidStep))

  /** Centroid sets above this row count skip the literal-matrix fast
    * path; trained quantizers are ≤ [[maxTrainedCells]] = 64 rows and
    * the every-Nth bootstrap is capped the same way, so the cap is pure
    * safety margin (a 64-dim double matrix at the cap is ~34 MB of task
    * reference — broadcast-sized, the [[graft.operators.Pq]] book cap). */
  private val ivfCentCap = 65536

  /** Assignment against an explicit centroid set (cid, cvec) — shared by
    * the every-Nth coarse quantizer and the trained k-means one.
    * Requires 0 <= cid < 2^40.
    *
    * Fast path: pack the ≤64-row centroid set into literals and compute
    * the max-cosine argmax in ONE native per-row pass (plans/IvfAssign —
    * the exact dot/round/packed-max arithmetic of the join form below,
    * pinned bit-identical by SimilaritySpec's parity test). The join
    * form materializes |corpus|·k UnsafeRow pair rows around the same
    * cosine work — and ivfAssignTo is paid per Lloyd round
    * ([[kmeansCentroids]]), per IVF/ANN query, and per ST19 trigger's
    * coarse assign. Falls back when: the extension is absent,
    * GRAFT_AB_NO_NATIVE_IVFASSIGN=1 (A/B re-adjudication), the cent
    * schema is not the canonical (cid BIGINT, cvec ARRAY<FLOAT|DOUBLE>),
    * the set is empty or exceeds the cap, or any centroid vector is
    * null / carries a null element / breaks uniform length — the join
    * form owns those null-poisoning semantics. */
  def ivfAssignTo(emb: DataFrame, idCol: String, vecCol: String,
                  cent: DataFrame): DataFrame =
    collectCent(emb, cent) match {
      case Some((cvecs, cids)) =>
        // the duplicate-collapse aggregate the join form also ends in:
        // identical (id, vec) rows fold to one, cells equal across
        // duplicates by determinism
        emb.withColumn("__cell",
            call_function("ivf_assign", col(vecCol), typedLit(cvecs), typedLit(cids)))
          .groupBy(col(idCol), col(vecCol))
          .agg(min(col("__cell")).as("cell"))
      case None => ivfAssignToJoin(emb, idCol, vecCol, cent)
    }

  /** Collect + validate a centroid set for the literal fast path:
    * Some(packed matrix, cids) when the native expression is available,
    * the schema is canonical, and the collected set is non-empty, under
    * the cap, and uniformly shaped — None routes callers to the join
    * form, which owns the malformed/oversized semantics. Runs one
    * driver job (k ≤ 64 rows for trained quantizers); an out-of-range
    * cid raises here exactly as inside the join form's norm projection
    * (checkedCent rides the collect). */
  private[operators] def collectCent(emb: DataFrame,
                                     cent: DataFrame): Option[(Seq[Seq[Double]], Seq[Long])] = {
    val schemaOk = cent.schema.fieldNames.contains("cid") &&
      cent.schema.fieldNames.contains("cvec") &&
      cent.schema("cid").dataType == LongType &&
      (cent.schema("cvec").dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      })
    val nativeOk = !sys.env.contains("GRAFT_AB_NO_NATIVE_IVFASSIGN") &&
      emb.sparkSession.catalog.functionExists("ivf_assign") && schemaOk
    val rows = if (nativeOk)
      checkedCent(cent)
        .select(col("cid"), col("cvec").cast(ArrayType(DoubleType)).as("cvec"))
        .limit(ivfCentCap + 1).collect()
    else Array.empty[org.apache.spark.sql.Row]
    val wellFormed = rows.nonEmpty && rows.length <= ivfCentCap &&
      rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1) &&
        !r.getSeq[Any](1).contains(null)) &&
      rows.iterator.map(_.getSeq[Any](1).length).toSet.size == 1
    if (nativeOk && wellFormed)
      Some((rows.toSeq.map(_.getSeq[Double](1).toSeq), rows.toSeq.map(_.getLong(0))))
    else None
  }

  /** Runtime guard on the centroid side (k rows, never the corpus): the
    * packed-argmax cid range — shared message with the join form. */
  private def checkedCent(cent: DataFrame): DataFrame = {
    val b = 1L << 40
    cent.withColumn("__ok",
      assert_true(col("cid") >= 0 && col("cid") < b,
        lit(s"ivfAssignTo: centroid cid must be in [0, 2^40)")))
      .filter(col("__ok").isNull).drop("__ok")
  }

  /** The broadcast-join formulation — the fast path's parity reference
    * and the route for oversized/malformed centroid sets. */
  private[graft] def ivfAssignToJoin(emb: DataFrame, idCol: String, vecCol: String,
                                     cent: DataFrame): DataFrame = {
    val native = hasNative(emb)
    val b = 1L << 40
    // Enforce the packing invariant at runtime, not just in the doc: a cid
    // outside [0, 2^40) would silently corrupt the packed argmax. The check
    // rides the per-centroid norm projection (k rows, not n×k) — assert_true
    // returns null on success, so the `when` keeps it from being pruned.
    val centN = cent.withColumn("__cn",
      when(assert_true(col("cid") >= 0 && col("cid") < b,
             lit(s"ivfAssignTo: centroid cid must be in [0, 2^40)")).isNull,
           normFor(native)(col("cvec"))))
    emb.withColumn("__vn", normFor(native)(col(vecCol)))
      .join(broadcast(centN))
      .withColumn("__ccos",
        round(dotFor(native)(col(vecCol), col("cvec")) / (col("__vn") * col("__cn")), 6))
      .withColumn("__packed",
        round(col("__ccos") * 1e6).cast(LongType) * b + (lit(b - 1) - col("cid")))
      .groupBy(col(idCol), col(vecCol))
      .agg(max(col("__packed")).as("__mp"))
      .select(col(idCol), col(vecCol),
        (lit(b - 1) - pmod(col("__mp"), lit(b))).as("cell"))
  }

  /** Per-cell representative: the member closest to its cell centroid
    * (ties → lowest id) plus the cell population — the
    * canonical-per-cluster step of semantic dedup on the vector side
    * (keep one exemplar per region, as SemDeDup keeps one per cluster).
    *
    * Same packed-argmax idiom as [[ivfAssignTo]] — a map-side-combined
    * `max` aggregation, never a window sort of the corpus. The
    * quantized cosine is shifted by +1e6 so the packed long stays
    * non-negative and BOTH halves unpack exactly (truncating division
    * is only safe on non-negative packs; assignment never unpacks its
    * cosine, this does). Output: (cell, n, rep_id, rep_cos). */
  def cellRepresentatives(emb: DataFrame, idCol: String, vecCol: String,
                          centroidStep: Int): DataFrame =
    cellRepresentatives(emb, idCol, vecCol,
      centroids(emb, idCol, vecCol, centroidStep))

  /** [[cellRepresentatives]] against an explicit quantizer `(cid, cvec)`
    * — the production form. `cent` is the build side of every join here,
    * so it must stay broadcast-sized: pass a BOUNDED centroid set
    * ([[kmeansCentroids]] output with a fixed k). The every-Nth
    * `centroidStep` overload is the cheap bootstrap whose cell count
    * grows linearly with the corpus — fine for index exploration, wrong
    * at 100× (the broadcast grows with it). */
  def cellRepresentatives(emb: DataFrame, idCol: String, vecCol: String,
                          cent: DataFrame): DataFrame = {
    val b = 1L << 40
    repSelection(ivfAssignTo(emb, idCol, vecCol, cent), cent,
      idCol, vecCol, hasNative(emb))
      .select(col("cell"), col("n"),
        (lit(b - 1) - pmod(col("__mp"), lit(b))).as("rep_id"),
        round((expr(s"__mp div $b") - lit(1000000L)) / 1e6, 6).as("rep_cos"))
  }

  /** Shared exemplar selection over an assigned relation: per cell the
    * packed (shifted cosine, complemented id) argmax plus the member
    * count — output (cell, n, __mp) for the callers to unpack. The
    * member-id range invariant (0 ≤ id < 2^40) is enforced the same way
    * [[ivfAssignTo]] guards cids: an id outside the range would bleed
    * into the cosine field and silently corrupt the argmax. The
    * assert_true rides the pack projection — one comparison per row,
    * noise beside the O(dims) cosine fold. */
  private def repSelection(assigned: DataFrame, cent: DataFrame,
                           idCol: String, vecCol: String,
                           native: Boolean): DataFrame = {
    val b = 1L << 40
    assigned.join(broadcast(cent), col("cell") === col("cid"))
      .withColumn("__ccos",
        round(cosineFor(native)(col(vecCol), col("cvec")), 6))
      .withColumn("__pk",
        when(assert_true(col(idCol) >= 0 && col(idCol) < b,
               lit(s"repSelection: member id must be in [0, 2^40)")).isNull,
          (round(col("__ccos") * 1e6).cast(LongType) + lit(1000000L)) * b
            + (lit(b - 1) - col(idCol))))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), max(col("__pk")).as("__mp"))
  }

  /** Semantic dedup (SemDeDup shape): within each quantizer cell, keep
    * the representative and every member whose cosine to it falls
    * BELOW the threshold — near-exemplar redundancy is dropped, corpus
    * diversity kept. Output: surviving (idCol, cell, cos_rep).
    *
    * One assignment pass serves rep selection, rep-vector lookup and
    * member scoring; the corpus-sized assignment cache is released
    * before returning (the survivor result — three narrow columns — is
    * persisted and materialized instead, same contract as
    * [[minhashLsh]]: callers release it via [[release]]). The rep
    * relation is |cells| rows and BROADCASTS into both the vector
    * lookup and the scoring join, so after assignment nothing shuffles
    * the corpus again. The all-pairs within-cell compare SemDeDup is
    * known for is avoided entirely: members compare only to their
    * cell's one exemplar, O(n) cosines total.
    *
    * This overload quantizes with the every-`centroidStep`-th seed —
    * the cheap bootstrap. Its cell count is n/step: it GROWS WITH THE
    * CORPUS, so the rep broadcast that is O(k) under a trained
    * quantizer is O(n) here. Exploration-scale only; production runs
    * pass a bounded trained set to the `cent` overload. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    centroidStep: Int, threshold: Double): DataFrame =
    semanticDedup(emb, idCol, vecCol,
      centroids(emb, idCol, vecCol, centroidStep), threshold)

  /** [[semanticDedup]] against an explicit quantizer `(cid, cvec)` —
    * the production form. Broadcast invariant: `cent` (and with it the
    * per-cell rep relation) must stay broadcast-sized — pass a BOUNDED
    * k, e.g. [[kmeansCentroids]] output. Everything derived from it
    * here is ≤ |cent| rows, so the corpus never shuffles after the
    * assignment aggregation. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    cent: DataFrame, threshold: Double): DataFrame = {
    val native = hasNative(emb)
    val b = 1L << 40
    val assigned = ivfAssignTo(emb, idCol, vecCol, cent)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val reps = repSelection(assigned, cent, idCol, vecCol, native)
      .select(col("cell"), (lit(b - 1) - pmod(col("__mp"), lit(b))).as("rep_id"))
    // broadcast the |cells|-row side: reps is an aggregate whose size
    // ESTIMATE falls back to its child (the corpus), so without the hint
    // the planner would shuffle the assignment relation on rep_id
    val repVecs = broadcast(reps).join(
      assigned.select(col(idCol).as("rep_id"), col(vecCol).as("__rv")), Seq("rep_id"))
    val out = assigned.join(broadcast(repVecs), Seq("cell"))
      .withColumn("cos_rep", round(cosineFor(native)(col(vecCol), col("__rv")), 6))
      .filter(col(idCol) === col("rep_id") || col("cos_rep") < threshold)
      .select(col(idCol), col("cell"), col("cos_rep"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    assigned.unpersist(blocking = false)
    out
  }

  /** Trained coarse quantizer: deterministic Lloyd's k-means over the
    * corpus, initialized from the every-`centroidStep`-th seed and
    * refined for `iters` assignment/mean rounds.
    *
    * Engine-parity-safe means: each component is quantized per row
    * (`round(x*1e6)` as long), integer-summed (exact, order-independent
    * — a double sum would drift with partition order), then scaled back
    * and rounded to 6 decimals. So the trained centroids are bit-stable
    * across engines and partitionings and the whole loop sits under a
    * SQL oracle. Each iteration's k-row centroid relation is persisted
    * and materialized (it is the broadcast side of the next assignment);
    * the corpus itself is never collected to the driver. Cells that end
    * an iteration empty drop out (standard Lloyd behavior). */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      centroidStep: Int, iters: Int): DataFrame =
    kmeansImpl(emb, idCol, vecCol, centroidStep, iters,
      onePass = !sys.env.contains("GRAFT_AB_NO_ONEPASS_TRAIN"))

  /** The explode-form trainer — the one-pass Lloyd round's parity
    * reference (also what GRAFT_AB_NO_ONEPASS_TRAIN=1 re-runs). */
  private[graft] def kmeansCentroidsExplode(emb: DataFrame, idCol: String,
                                            vecCol: String, centroidStep: Int,
                                            iters: Int): DataFrame =
    kmeansImpl(emb, idCol, vecCol, centroidStep, iters, onePass = false)

  private def kmeansImpl(emb: DataFrame, idCol: String, vecCol: String,
                         centroidStep: Int, iters: Int,
                         onePass: Boolean): DataFrame = {
    var cent = centroids(emb, idCol, vecCol, centroidStep)
    var centCk = false // cent_0 is NOT ours to release (caller's lineage)
    for (_ <- 0 until iters) {
      val (prev, prevCk) = (cent, centCk)
      // Eager localCheckpoint: the iteration's materialization barrier
      // AND a lineage cut to a flat k-row scan. The superseded round's
      // blocks are released via raw-RDD unpersist (Checkpoints.release)
      // — unlike Dataset.unpersist there is no CacheManager re-cache
      // cascade to churn, because localCheckpoint never registers there.
      cent = kmeansRound(emb, idCol, vecCol, cent, onePass).localCheckpoint()
      centCk = true
      if (prevCk) Checkpoints.release(prev)
    }
    cent
  }

  /** One Lloyd round: assignment against `cent`, then the integer-
    * quantized per-cell component means. Exposed (un-checkpointed) for
    * the one-pass/explode parity spec and plan capture.
    *
    * One-pass form (fast path): ONE corpus scan, ZERO corpus-sized
    * exchanges — the assignment is a literal-matrix projection
    * (`ivf_assign`) feeding the per-cell means directly as one hash
    * aggregation with `dims` integer-sum columns (the centroid set is
    * already collected for the literals, so its uniform row length
    * gives `dims`); map-side partial aggregation reduces the exchange
    * to k rows per partition. The explode form pays the ivfAssignTo
    * duplicate-collapse exchange (full vectors through a corpus
    * shuffle), a posexplode to n·dims rows, a (cell, pos) aggregation
    * and a collect_list re-assembly per round. Same quantized
    * arithmetic (round(x·1e6) summed exactly as longs, scaled back,
    * rounded to 6 — order-independent), pinned bit-identical by
    * SimilaritySpec on the training contract (unique-(id, vec)
    * corpora — the oracle's training SQL partitions by vec_id alone,
    * so duplicate-bearing corpora are outside the contract; the
    * one-pass form weights duplicates by multiplicity where the
    * explode form collapses them). GRAFT_AB_NO_ONEPASS_TRAIN=1 re-runs
    * the explode form. Null vectors contribute nothing in either form
    * (posexplode of a null array emits no rows; here they are
    * filtered); null ELEMENTS count toward the member count and drop
    * out of the component sum in both forms. Vectors whose length
    * mismatches the quantizer (NULL-cell rows by the ivf_assign
    * contract) FAIL FAST in the one-pass mean's ANSI element_at
    * instead of minting a ragged null-cid codeword — the explode form
    * keeps the old semantics for callers that need them. */
  private[graft] def kmeansRound(emb: DataFrame, idCol: String, vecCol: String,
                                 cent: DataFrame, onePass: Boolean): DataFrame =
    (if (onePass) collectCent(emb, cent) else None) match {
      case Some((cvecs, cids)) =>
        val dims = cvecs.head.length
        val sums = (0 until dims).map(i =>
          sum(round(element_at(col(vecCol), i + 1).cast(DoubleType) * 1e6)
            .cast(LongType)).as(s"__s$i"))
        emb.filter(col(vecCol).isNotNull)
          .select(call_function("ivf_assign", col(vecCol),
            typedLit(cvecs), typedLit(cids)).as("cell"), col(vecCol))
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("__c"), sums: _*)
          .select(col("cell").as("cid"),
            array((0 until dims).map(i =>
              round(col(s"__s$i").cast(DoubleType) / col("__c") / 1e6, 6)): _*)
              .as("cvec"))
      case None =>
        ivfAssignTo(emb, idCol, vecCol, cent)
          .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
          .withColumn("q", round(col("x").cast(DoubleType) * 1e6).cast(LongType))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(col("q")).as("s"), count(lit(1)).as("c"))
          .withColumn("comp", round(col("s").cast(DoubleType) / col("c") / 1e6, 6))
          .groupBy(col("cell"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
            e => e.getField("comp")).as("cvec"))
          .select(col("cell").as("cid"), col("cvec"))
    }

  /** Release the cache of a frame returned by [[lshJaccard]],
    * [[minhashLsh]], [[kmeansCentroids]] or [[semanticDedup]] once the
    * caller has consumed it. The lineage survives, so late re-use
    * recomputes rather than fails. */
  def release(df: DataFrame): Unit = df.unpersist(blocking = false)

  /** IVF ANN top-k over the TRAINED quantizer: k-means centroids, then
    * the standard probe/assign/verify — the production-real IVF (the
    * every-Nth variant remains as the cheap bootstrap). */
  def ivfKmeansAnnTopK(emb: DataFrame, idCol: String, vecCol: String,
                       query: Seq[Double], centroidStep: Int, iters: Int,
                       nprobe: Int, k: Int): DataFrame = {
    val native = hasNative(emb)
    val cent = kmeansCentroids(emb, idCol, vecCol, centroidStep, iters)
    val probeCells = cent
      .withColumn("__qcos", round(cosineFor(native)(col("cvec"), vecLit(query)), 6))
      .orderBy(col("__qcos").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid").as("cell"))
    ivfAssignTo(emb, idCol, vecCol, cent)
      .join(broadcast(probeCells), "cell")
      .withColumn("cosine_sim", round(cosineFor(native)(col(vecCol), vecLit(query)), 6))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .select(col(idCol), col("cell"), col("cosine_sim"))
      .limit(k)
  }

  /** IVF ANN top-k: probe the `nprobe` cells nearest the query, exact
    * cosine within them. */
  def ivfAnnTopK(emb: DataFrame, idCol: String, vecCol: String,
                 query: Seq[Double], centroidStep: Int, nprobe: Int, k: Int): DataFrame = {
    val probeCells = centroids(emb, idCol, vecCol, centroidStep)
      .withColumn("__qcos", round(cosineFor(hasNative(emb))(col("cvec"), vecLit(query)), 6))
      .orderBy(col("__qcos").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid").as("cell"))
    ivfAssign(emb, idCol, vecCol, centroidStep)
      .join(broadcast(probeCells), "cell")
      .withColumn("cosine_sim", round(cosineFor(hasNative(emb))(col(vecCol), vecLit(query)), 6))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .select(col(idCol), col("cell"), col("cosine_sim"))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // Embedding-cosine near-duplicate pairs, blocked by hyperplane bucket:
  // the self-join shuffles on the bucket key instead of exploding to
  // n^2. Same-bucket blocking trades recall for scale (multi-probe or
  // more/fewer planes tunes the trade); exact cosine confirms inside
  // each block.
  // ---------------------------------------------------------------------
  def embedNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                        numPlanes: Int, dims: Int, threshold: Double,
                        bucketCap: Int = Int.MaxValue): DataFrame = {
    // Norms precomputed per SIDE, not per pair: higher-order-function
    // folds are interpreted (CodegenFallback), so each avoided fold is
    // real per-pair CPU. Same IEEE value as computing inline — the
    // oracle mirror is unaffected.
    val native = hasNative(emb)
    val b0 = withBuckets(emb, vecCol, numPlanes, dims)
      .select(col(idCol), col(vecCol), col("bucket"), normFor(native)(col(vecCol)).as("__n"))
    // Degenerate-bucket guard, same rationale as lshJaccard's banding
    // cap: the adaptive ladder bounds EXPECTED occupancy, but a skewed
    // embedding distribution (hubness, all-zero rows, a collapsed
    // model) can still pile one bucket to n and turn the verify stage
    // quadratic. Buckets past the cap are dropped whole — their
    // members are boilerplate-grade for near-DUP purposes (the
    // semantic-dedup path is the right tool there), and the candidate
    // relation stays ≤ buckets·cap² in the worst case at ANY corpus
    // size. Non-binding at healthy occupancy (ladder targets ~32 per
    // bucket) — pinned by the recall-parity spec.
    val b = if (bucketCap == Int.MaxValue) b0
            else dropOversizedBuckets(b0, Seq("bucket"), bucketCap)
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cosine_sim",
        round(dotFor(native)(col(s"a.$vecCol"), col(s"b.$vecCol")) / (col("a.__n") * col("b.__n")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("cosine_sim"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining"): mine cross-side pairs whose cosine stands
    * OUT of its neighborhood — margin(x,y) = 2·cos(x,y) /
    * (avg(x)+avg(y)) — rather than clearing an absolute threshold,
    * which hubness breaks. Practical variant: the neighborhood is the
    * LSH-blocked candidate set (positive-cosine, same hyperplane
    * bucket) instead of an exact k-NN — the industrial shape, since
    * candidate generation at corpus scale is already blocked.
    *
    * Engine-exact arithmetic: cosines quantize to ×1e6 integers
    * (`floor(round6·1e6+0.5)`), neighborhood means divide those integer
    * sums as IEEE doubles, and the margin lands as a ×1e4 integer via
    * `floor(x+0.5)` — every comparison and the final argmax
    * (margin desc, id_b asc) is integer-ordered, so the mined set is
    * bit-identical across engines.
    *
    * Scale shape: one bucket-keyed exchange builds candidates; the two
    * neighborhood aggregates and the per-`id_a` argmax window run on the
    * PAIR relation (≪ corpus² under blocking), never on the corpus. */
  def bitextMarginMine(emb: DataFrame, idCol: String, vecCol: String,
                       sideCol: Column, numPlanes: Int, dims: Int,
                       minMarginBp: Long, bucketCap: Int = Int.MaxValue): DataFrame =
    bitextMarginStages(emb, idCol, vecCol, sideCol, numPlanes, dims,
      minMarginBp, bucketCap).last._2

  /** The mine's intermediate stages, in build order — ONE construction
    * shared with [[bitextMarginMine]] (which returns the last stage),
    * exposed for stage-level timing of the probe decades. Keys:
    * bucketed (capped bucket relation), candidates (cross-side pairs +
    * quantized cosine), margins (neighborhood-mean join + margin),
    * mined (per-id_a argmax over the floor). */
  private[graft] def bitextMarginStages(emb: DataFrame, idCol: String,
      vecCol: String, sideCol: Column, numPlanes: Int, dims: Int,
      minMarginBp: Long, bucketCap: Int = Int.MaxValue): Seq[(String, DataFrame)] = {
    val native = hasNative(emb)
    val b0 = withBuckets(emb.withColumn("__side", sideCol), vecCol, numPlanes, dims)
      .select(col(idCol), col(vecCol), col("__side"), col("bucket"),
        normFor(native)(col(vecCol)).as("__n"))
    // Same degenerate-bucket guard as embedNearDupPairs, counted over
    // BOTH sides (the oracle mirrors that choice), applied before the
    // side split so one hub bucket cannot make candidates quadratic.
    val b = if (bucketCap == Int.MaxValue) b0
            else dropOversizedBuckets(b0, Seq("bucket"), bucketCap)
    val cand = b.filter(col("__side") === 0).as("x")
      .join(b.filter(col("__side") === 1).as("y"),
        col("x.bucket") === col("y.bucket"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        floor(round(dotFor(native)(col(s"x.$vecCol"), col(s"y.$vecCol"))
            / (col("x.__n") * col("y.__n")), 6) * 1e6 + 0.5)
          .cast(LongType).as("cos_u"))
      // only positive-similarity candidates form a neighborhood: keeps
      // both means strictly positive (no zero/negative denominators) and
      // matches the mining intent — anti-correlated pairs are not
      // translation candidates
      .filter(col("cos_u") > 0)
      // FOUR downstream consumptions (both neighborhood sums, the margin
      // row, the final argmax) — persisted so the bucket computation and
      // the blocked self-join run once per action instead of once per
      // consumer (the 1000× stage profile measured the re-computation as
      // the margin stage's dominant term). Narrow relation (3 longs per
      // row); released by the harness's per-query cache clear /
      // [[release]], same contract as ngramJaccardPairs' shingles.
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Neighborhood sums as UNBOUNDED windows over the cached pair
    // relation, not aggregate+join: the join form re-shuffles the pair
    // relation twice more (probe sides) and builds ~|ids|-group hash
    // maps, which at the 1000× decade (18.5M pairs, 1M ids) ran
    // 12–19 s with a ×1.6 spread; the window form sorts instead
    // (spill-friendly) and measured 1.7× faster at parity (committed
    // stage profile, OPTIMIZATION_r22.md §4). Identical values: the
    // per-key window sum/count equal the aggregate's, integer-exact.
    //
    // Partitioning is SIZE-DERIVED, not the session constant (guide §2
    // — scale-adaptive partitioning): at shuffle.partitions = cores the
    // 1000× pair relation gave ~580k-row per-task sorts whose GC/spill
    // cliffs produced ×2–3 run-to-run spreads; ~150k pair rows per task
    // measured stable (×1.15). The count() rides the already-persisted
    // relation (one cache-build pass that the un-persisted form paid
    // three times over); explicit repartition pins the count so the
    // windows inherit it exchange-free (user repartition(n, col) is not
    // AQE-coalesced). The floor keeps toy scales at the session default
    // — bench/oracle plans there are unchanged.
    val nCand = cand.count()
    val defaultPar = emb.sparkSession.sparkContext.defaultParallelism
    val parts = Math.min(4096L, nCand / pairRowsPerPartition + 1L).toInt
    // Only pin when the derived count EXCEEDS the session default: an
    // explicit repartition also disables AQE's partition coalescing,
    // which is exactly what tiny scales want (bench/oracle plans there
    // keep their AQE-managed exchanges and stay floor-comparable).
    def byKey(df: DataFrame, k: Column): DataFrame =
      if (parts > defaultPar) df.repartition(parts, k) else df
    val wA = Window.partitionBy(col("id_a"))
    val wB = Window.partitionBy(col("id_b"))
    val m = byKey(byKey(cand, col("id_b"))
      .withColumn("__sb", sum("cos_u").over(wB))
      .withColumn("__nb", count(lit(1)).over(wB)), col("id_a"))
      .withColumn("__sa", sum("cos_u").over(wA))
      .withColumn("__na", count(lit(1)).over(wA))
      .withColumn("margin_bp",
        floor(lit(2.0) * col("cos_u")
            / (col("__sa").cast(DoubleType) / col("__na")
              + col("__sb").cast(DoubleType) / col("__nb"))
            * 10000.0 + 0.5)
          .cast(LongType))
      .select(col("id_a"), col("id_b"), col("cos_u"), col("margin_bp"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("margin_bp").desc, col("id_b").asc)
    val mined = m.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("margin_bp") >= minMarginBp)
      .select(col("id_a"), col("id_b"), col("cos_u"), col("margin_bp"))
    Seq("bucketed" -> b, "candidates" -> cand, "margins" -> m,
      "mined" -> mined)
  }

  /** Target pair rows per task for the mining windows — the
    * size-derived partitioning knob (≈150k 24-byte pair rows ≈ 4 MB of
    * sort input per task; measured stable at the 1000× decade where the
    * session default's ~580k-row tasks hit GC/spill cliffs). */
  private val pairRowsPerPartition = 150000L

  /** Near-dup pairs WITH their evidence — the explainability report a
    * curator reads before trusting (or appealing) a dedup decision:
    * for every pair clearing the jaccard threshold, the exact score
    * plus the quantities it came from (shared-shingle count, both set
    * sizes) and how many LSH bands collided (how firmly the blocking
    * found it — band count 4/4 is a near-copy, 1/4 a boundary case).
    *
    * Same plan skeleton as [[lshJaccard]] (shingle + signature
    * relations persisted once, capped banding, pair-gated verify); the
    * band-collision count falls out of the SAME self-join that builds
    * candidates — aggregated instead of distinct'd — so the report
    * costs one extra bounded aggregate over the pair relation, nothing
    * corpus-sized. Output: (id_a, id_b, jaccard, inter, sz_a, sz_b,
    * n_bands). */
  def lshJaccardExplain(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int, rowsPerBand: Int,
                        maxBucketSize: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sig = minhashSignature(sh, idCol, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val banded = bandKeys(sig, idCol, numHashes, rowsPerBand)
    val capped = dropOversizedBuckets(banded, Seq("band", "band_key"), maxBucketSize)
    val collided = capped.as("l").join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.band_key") === col("r.band_key") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .groupBy(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.withColumnRenamed(idCol, "id_a")
    val b = sh.withColumnRenamed(idCol, "id_b")
    val inter = collided.select(col("id_a"), col("id_b"))
      .join(a, "id_a").join(b, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .join(collided, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("jaccard"), col("inter"),
        col("sz_a"), col("sz_b"), col("n_bands"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sig.unpersist(blocking = false)
    sh.unpersist(blocking = false)
    out
  }

  /** Per-cell label purity of a quantizer assignment — the clustering-
    * quality eval of an embedding space: cells mixing labels mean every
    * cell-based curation step (topic balance, semantic dedup) inherits
    * the blur. Input is an assigned relation carrying (cellCol,
    * labelCol); majority label per cell rides the packed-argmax idiom
    * (count·1024 + complemented label — a map-side-combined max, never
    * a window; requires 0 ≤ label < 1024). Output: (cell, n_members,
    * top_label, purity_bp). */
  def labelPurity(assigned: DataFrame, cellCol: String, labelCol: String): DataFrame =
    assigned.groupBy(col(cellCol), col(labelCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(cellCol))
      .agg(sum(col("__c")).as("n_members"),
        max(col("__c") * 1024L + (lit(1023L) - col(labelCol))).as("__pk"))
      .select(col(cellCol), col("n_members"),
        (lit(1023L) - pmod(col("__pk"), lit(1024L))).as("top_label"),
        expr("(__pk div 1024) * 10000 div n_members").as("purity_bp"))

  /** Embedding-space outliers: every vector's quantized cosine to its
    * OWN cell centroid, flagged below `floorU` (×1e6 units) — the
    * semantic-garbage gate that catches what text heuristics cannot.
    * One broadcast assignment; the flag is a projection. Output:
    * (idCol, cell, cos_u, is_outlier). */
  def embedOutliers(emb: DataFrame, idCol: String, vecCol: String,
                    cent: DataFrame, floorU: Long): DataFrame = {
    val native = hasNative(emb)
    ivfAssignTo(emb, idCol, vecCol, cent)
      .join(broadcast(cent), col("cell") === col("cid"))
      .withColumn("cos_u",
        floor(round(dotFor(native)(col(vecCol), col("cvec"))
            / (normFor(native)(col(vecCol)) * normFor(native)(col("cvec"))), 6)
          * 1e6 + 0.5).cast(LongType))
      .select(col(idCol), col("cell"), col("cos_u"),
        (col("cos_u") < floorU).as("is_outlier"))
  }

  /** Hard-negative mining for contrastive training: per anchor (every
    * `anchorMod`-th id), the top-k highest-cosine vectors of a
    * DIFFERENT label inside the anchor's LSH bucket — the near misses
    * that teach a margin. Same-bucket blocking bounds candidates at
    * ~n·occupancy/anchorMod (pass an [[adaptivePlanes]]-derived plane
    * count so occupancy stays fixed at any corpus size); the top-k
    * rides the bounded [[TopK.topKPerKey]] UDAF, map-side ≤ k rows per
    * anchor. Output: (anchor_id, idCol, cos_u, rank). */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, anchorMod: Long,
                    numPlanes: Int, dims: Int, k: Int): DataFrame = {
    val native = hasNative(emb)
    val b = withBuckets(emb, vecCol, numPlanes, dims)
      .select(col(idCol), col(labelCol), col(vecCol), col("bucket"),
        normFor(native)(col(vecCol)).as("__n"))
    val anchors = b.filter(pmod(col(idCol), lit(anchorMod)) === 0)
      .select(col(idCol).as("anchor_id"), col(labelCol).as("__al"),
        col(vecCol).as("__ae"), col("bucket"), col("__n").as("__an"))
    val cand = anchors.join(b, Seq("bucket"))
      .filter(col(labelCol) =!= col("__al") && col(idCol) =!= col("anchor_id"))
      .withColumn("cos_u",
        floor(round(dotFor(native)(col("__ae"), col(vecCol))
            / (col("__an") * col("__n")), 6) * 1e6 + 0.5).cast(LongType))
      .select(col("anchor_id"), col(idCol), col("cos_u"))
    TopK.topKPerKey(cand, Seq("anchor_id"), idCol, "cos_u", k)
      .select(col("anchor_id"), col(idCol),
        col("cos_u").cast(LongType).as("cos_u"), col("rank"))
  }

  /** Multi-probe near-dup pairs: the LEFT side of the self-join explodes
    * each vector to its bucket plus all Hamming-radius-1 flips, so pairs
    * whose buckets differ in at most one plane are compared — the
    * standard recall fix for near neighbours split by one hyperplane.
    * Cost is (planes+1)x the left side of the blocked join, still
    * nowhere near n². No pair is scored twice: a probe set contains the
    * partner's bucket at most once and `id_a < id_b` kills the
    * symmetric match, so no post-join dedup shuffle is needed. */
  def embedNearDupPairsProbed(emb: DataFrame, idCol: String, vecCol: String,
                              numPlanes: Int, dims: Int, threshold: Double): DataFrame = {
    val native = hasNative(emb)
    val b = withBuckets(emb, vecCol, numPlanes, dims)
      .select(col(idCol), col(vecCol), col("bucket"), normFor(native)(col(vecCol)).as("__n"))
    val flips = (0 until numPlanes).map { i =>
      val ch = substring(col("bucket"), i + 1, 1)
      concat(substring(col("bucket"), 1, i),
        when(ch === "1", lit("0")).otherwise(lit("1")),
        substring(col("bucket"), i + 2, numPlanes))
    }
    val probed = b.withColumn("probe", explode(array(col("bucket") +: flips: _*)))
    probed.as("a").join(b.as("b"),
        col("a.probe") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cosine_sim",
        round(dotFor(native)(col(s"a.$vecCol"), col(s"b.$vecCol")) / (col("a.__n") * col("b.__n")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("cosine_sim"))
  }
}

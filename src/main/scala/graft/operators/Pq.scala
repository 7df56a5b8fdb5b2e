package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Product quantization (Jégou/Douze/Schmid, TPAMI 2011): split each
  * vector into `m` subspaces, train a small codebook per subspace, and
  * represent every vector by its `m` codeword ids — the memory-side
  * complement to the IVF/LSH ANN paths in [[Similarity]].
  *
  * Why it matters at 100 TB: a 64-dim float vector is 256 bytes; its PQ
  * code is `m` small ints (m bytes at k ≤ 256 codewords). The corpus
  * index shrinks ~64×, and query scoring never touches the raw vectors
  * — an ADC (asymmetric distance computation) scan reads only the codes
  * relation plus an m×k distance table broadcast from the driver.
  *
  * Engine-parity-safe like the [[Similarity.kmeansCentroids]] trainer:
  * distances are rounded to 6 decimals with a lowest-cid tie-break,
  * codeword means are integer-quantized sums (order-independent), and
  * ADC totals are integer-summed — so a SQL oracle reproduces every
  * result bit-for-bit and shard-merged training matches single-node.
  *
  * Input contract: vector components must be unit-scale (|x| ≤ 10) so
  * the packed argmin stays inside a long — embedding models emit unit
  * or near-unit vectors; enforce upstream if not. Codebook cids are
  * checked at runtime.
  */
object Pq {
  /** Packing base for the argmin: pack = round(d2·1e6)·B + cid, min =
    * (lowest distance, then lowest cid). cid < B and d2 < 2^33/1e6
    * (≈8590, far above the |x| ≤ 10 contract's worst case) keep the
    * pack exact and non-negative. */
  private val B = 1L << 30

  /** Squared L2 between the `sub`-th length-`len` slice of `vec` and a
    * codeword, unrolled to `len` codegen'd terms (higher-order-function
    * folds are interpreted — see the norm note in [[Similarity]]). */
  private def l2sqSub(vec: Column, sub: Column, len: Int, cvec: Column): Column =
    (0 until len).map { i =>
      val d = element_at(vec, (sub * len + i + 1).cast(IntegerType)).cast(DoubleType) -
        element_at(cvec, i + 1)
      d * d
    }.reduce(_ + _)

  /** Runtime guard on the codebook side (k·m rows, never the corpus):
    * cid packing range plus the unit-scale contract on codewords —
    * codewords are data means, so out-of-contract data surfaces here. */
  private def checked(books: DataFrame): DataFrame =
    books.withColumn("__ok",
      assert_true(col("cid") >= 0 && col("cid") < B &&
        forall(col("cvec"), c => abs(c) <= 10.0),
        lit("Pq: codebook cid must be in [0, 2^30) and codewords unit-scale")))
      .filter(col("__ok").isNull).drop("__ok")

  /** Assign every (row, subspace) to its nearest codeword. Returns
    * `(idCol, vecCol, carry..., sub, cell)` with the vector (and any
    * `carry` columns, e.g. a coarse-cell id) carried through so
    * downstream means/scoring need no re-join.
    *
    * Scale shape: ONE scan of the corpus against a broadcast m×k
    * codebook; the argmin is the packed-long `min` aggregation of
    * [[Similarity.ivfAssignTo]] (map-side combine collapses n·m·k to
    * n·m before the exchange, nothing sorts). */
  /** Codebooks above this (sub, cid) row count skip the literal-matrix
    * fast path; classic PQ is m·256 rows (~1k), so the cap is pure
    * safety margin. */
  private val pqBookCap = 65536

  def assign(emb: DataFrame, idCol: String, vecCol: String,
             books: DataFrame, subLen: Int,
             carry: Seq[String] = Nil): DataFrame =
    // Fast path: pack the m×k codebook into literals and compute every
    // subspace's argmin in ONE native per-row pass (plans/PqAssign —
    // the exact l2sq/round/packed-min arithmetic of the join form,
    // pinned bit-identical by PqSpec's parity test). The join form
    // materializes |corpus|·m·k rows around the same distance work —
    // and the PQ chain calls assign FOUR times (2 Lloyd rounds, codes,
    // distortion).
    collectBooks(emb, books, subLen) match {
      case Some((subVecs, subCids)) =>
        val cells = call_function("pq_assign", col(vecCol),
          typedLit(subVecs), typedLit(subCids))
        // the duplicate-collapse aggregate the join form also ends in —
        // applied BEFORE the subspace explode, so the exchange carries n
        // rows of (keys, m-long cells array) instead of n·m rows each
        // dragging the full vector. Identical (id, vec, carry) rows hold
        // IDENTICAL cells arrays (pq_assign is deterministic in vec), so
        // min over the array equals the join form's per-sub min; a NULL
        // vec yields an array of m null cells in both forms and a
        // posexplode'd row per sub either way.
        emb.select(col(idCol) +: col(vecCol) +: carry.map(col) :+
            cells.as("__cells"): _*)
          .groupBy(col(idCol) +: col(vecCol) +: carry.map(col): _*)
          .agg(min(col("__cells")).as("__cells"))
          .select(col(idCol) +: col(vecCol) +: carry.map(col) :+
            posexplode(col("__cells")).as(Seq("sub", "cell")): _*)
      case None => assignJoin(emb, idCol, vecCol, books, subLen, carry)
    }

  /** Collect + validate a codebook for the literal fast path:
    * Some(per-sub codeword matrices, per-sub cids) when the native
    * expression is available, the schema is canonical (sub INT, cid
    * BIGINT, cvec ARRAY<DOUBLE>), and the collected books are under the
    * cap with every sub 0..m-1 present and every codeword well-formed —
    * None routes callers to the join form, which owns the
    * malformed/oversized semantics. GRAFT_AB_NO_NATIVE_PQASSIGN=1
    * forces None (A/B re-adjudication). */
  private def collectBooks(emb: DataFrame, books: DataFrame, subLen: Int)
      : Option[(Seq[Seq[Seq[Double]]], Seq[Seq[Long]])] = {
    val schemaOk = books.schema.fieldNames.contains("sub") &&
      books.schema.fieldNames.contains("cid") &&
      books.schema.fieldNames.contains("cvec") &&
      books.schema("sub").dataType == IntegerType &&
      books.schema("cid").dataType == LongType &&
      (books.schema("cvec").dataType match {
        case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
        case _ => false
      })
    val nativeOk = !sys.env.contains("GRAFT_AB_NO_NATIVE_PQASSIGN") &&
      emb.sparkSession.catalog.functionExists("pq_assign") && schemaOk
    val rows = if (nativeOk)
      checked(books).select(col("sub"), col("cid"), col("cvec"))
        .limit(pqBookCap + 1).collect()
    else Array.empty[org.apache.spark.sql.Row]
    val bySub = rows.groupBy(_.getInt(0))
    val m = if (rows.isEmpty) 0 else bySub.keySet.max + 1
    val wellFormed = rows.nonEmpty && rows.length <= pqBookCap &&
      bySub.keySet == (0 until m).toSet &&
      rows.forall(r => !r.isNullAt(2) && {
        val v = r.getSeq[Any](2); v.length == subLen && !v.contains(null)
      })
    if (nativeOk && wellFormed)
      Some(((0 until m).map(s => bySub(s).toSeq.map(_.getSeq[Double](2).toSeq)),
        (0 until m).map(s => bySub(s).toSeq.map(_.getLong(1)))))
    else None
  }

  /** The broadcast-join formulation — the fast path's parity reference
    * and the route for oversized/malformed codebooks. */
  private[graft] def assignJoin(emb: DataFrame, idCol: String, vecCol: String,
                                books: DataFrame, subLen: Int,
                                carry: Seq[String] = Nil): DataFrame =
    emb.join(broadcast(checked(books)))
      .withColumn("__d2",
        round(l2sqSub(col(vecCol), col("sub"), subLen, col("cvec")), 6))
      .withColumn("__packed",
        round(col("__d2") * 1e6).cast(LongType) * B + col("cid"))
      .groupBy(col(idCol) +: col(vecCol) +: carry.map(col) :+ col("sub"): _*)
      .agg(min(col("__packed")).as("__mp"))
      .select(col(idCol) +: col(vecCol) +: carry.map(col) :+ col("sub") :+
        pmod(col("__mp"), lit(B)).as("cell"): _*)

  /** Per-subspace codebooks `(sub, cid, cvec)`: seeds are every
    * `centroidStep`-th vector's slices (cid = seed id, matching the
    * coarse-quantizer convention), refined by `iters` Lloyd rounds of
    * assign + integer-quantized component means. Each round is one
    * corpus scan (assignment and means share the carried vector);
    * the k·m-row codebook is localCheckpoint'd per round — the same
    * materialization-barrier reasoning as [[Similarity.kmeansCentroids]]. */
  def codebooks(emb: DataFrame, idCol: String, vecCol: String,
                m: Int, dims: Int, centroidStep: Int, iters: Int): DataFrame =
    codebooksImpl(emb, idCol, vecCol, m, dims, centroidStep, iters,
      onePass = !sys.env.contains("GRAFT_AB_NO_ONEPASS_TRAIN"))

  /** The explode-form trainer — the one-pass Lloyd round's parity
    * reference (also what GRAFT_AB_NO_ONEPASS_TRAIN=1 re-runs). */
  private[graft] def codebooksExplode(emb: DataFrame, idCol: String,
                                      vecCol: String, m: Int, dims: Int,
                                      centroidStep: Int, iters: Int): DataFrame =
    codebooksImpl(emb, idCol, vecCol, m, dims, centroidStep, iters,
      onePass = false)

  private def codebooksImpl(emb: DataFrame, idCol: String, vecCol: String,
                            m: Int, dims: Int, centroidStep: Int, iters: Int,
                            onePass: Boolean): DataFrame = {
    val subLen = dims / m
    require(subLen * m == dims, s"Pq: m=$m must divide dims=$dims")
    // Bounded codebook: every-step-th seeding alone grows codewords as
    // n/step (quadratic training, caught by the 10× scale probe —
    // SCALE.md); classic PQ uses 256 codewords per subspace (byte
    // codes). The id-range cap is deterministic and binds only past
    // `step · 256` vectors — oracle scales (≤2000 vectors) unaffected.
    // Like Similarity.centroids, the lattice anchors at min(id) so a
    // filtered/offset id space still trains a full codebook instead of
    // silently seeding zero codewords (dense-from-0: identical seeds).
    // Anchor preference mirrors Similarity.centroids: the fingerprint-
    // memoized literal when the input is file-backed (one blocking
    // min() per (JVM, dataset), zero per-action seed work after),
    // else the broadcast-subtree form — never a per-call collect or a
    // lineage cut, both A/B-measured slower (see Similarity.centroids).
    // Same GRAFT_AB_NO_MEMO gate as Similarity.centroids so one A/B
    // switch re-adjudicates the memo across ALL its users, PQ included.
    val seeds = (if (sys.env.contains("GRAFT_AB_NO_MEMO")) None
                 else Similarity.memoizedMinId(emb, idCol)) match {
      case Some(anchor) =>
        emb.filter(pmod(col(idCol) - anchor, lit(centroidStep)) === 0 &&
          col(idCol) - anchor < centroidStep.toLong * 256L)
      case None =>
        val minId = emb.agg(min(col(idCol)).cast(LongType).as("__min_id"))
        emb.crossJoin(broadcast(minId))
          .filter(pmod(col(idCol) - col("__min_id"), lit(centroidStep)) === 0 &&
            col(idCol) - col("__min_id") < centroidStep.toLong * 256L)
    }
    var books = seeds
      .select(explode(array((0 until m).map(lit): _*)).as("sub"),
        col(idCol).as("cid"), col(vecCol).as("__v"))
      .select(col("sub"), col("cid"),
        transform(slice(col("__v"), col("sub") * subLen + 1, lit(subLen)),
          x => round(x.cast(DoubleType), 6)).as("cvec"))
    var booksCk = false // round-0 seeds carry the caller's lineage
    for (_ <- 0 until iters) {
      val (prev, prevCk) = (books, booksCk)
      books = codebooksRound(emb, idCol, vecCol, books, subLen, onePass)
        .localCheckpoint()
      booksCk = true
      if (prevCk) Checkpoints.release(prev) // superseded round's blocks
    }
    books
  }

  /** One per-subspace Lloyd round: assignment against `books`, then the
    * integer-quantized per-(sub, cell) component means. Exposed
    * (un-checkpointed) for the one-pass/explode parity spec and plan
    * capture.
    *
    * One-pass form (fast path): ONE corpus scan, ZERO corpus-sized
    * exchanges — the assignment is a literal-matrix projection
    * (`pq_assign`) whose m-cell array explodes LOCALLY to (sub, cell,
    * subLen-wide slice) rows feeding the per-(sub, cell) means as one
    * hash aggregation with subLen integer-sum columns; map-side partial
    * aggregation reduces the exchange to m·k rows per partition. The
    * explode form pays the assign duplicate-collapse exchange (full
    * vectors through a corpus shuffle), a posexplode to n·dims rows, a
    * (sub, cell, pos) aggregation and a collect_list re-assembly per
    * round. Same quantized arithmetic (round(x·1e6) summed exactly as
    * longs, scaled back, rounded to 6 — order-independent), pinned
    * bit-identical by PqSpec on the training contract (unique-(id, vec)
    * corpora — the oracle's training SQL partitions by vec_id alone, so
    * duplicate-bearing corpora are outside the contract; the one-pass
    * form weights duplicates by multiplicity where the explode form
    * collapses them). GRAFT_AB_NO_ONEPASS_TRAIN=1 re-runs the explode
    * form. Null vectors contribute nothing in either form (their
    * slices are null; posexplode of null emits no rows / the filter
    * drops them); null ELEMENTS count toward the member count and drop
    * out of the component sum in both forms. */
  private[graft] def codebooksRound(emb: DataFrame, idCol: String,
                                    vecCol: String, books: DataFrame,
                                    subLen: Int, onePass: Boolean): DataFrame =
    (if (onePass) collectBooks(emb, books, subLen) else None) match {
      case Some((subVecs, subCids)) =>
        val cells = call_function("pq_assign", col(vecCol),
          typedLit(subVecs), typedLit(subCids))
        val parts = (0 until subVecs.length).map(s => struct(
          lit(s).as("sub"),
          element_at(col("__cells"), s + 1).as("cell"),
          slice(col(vecCol), s * subLen + 1, subLen).as("sv")))
        val sums = (0 until subLen).map(j =>
          sum(round(element_at(col("sv"), j + 1).cast(DoubleType) * 1e6)
            .cast(LongType)).as(s"__s$j"))
        emb.select(col(vecCol), cells.as("__cells"))
          .select(explode(array(parts: _*)).as("p"))
          .select(col("p.sub").as("sub"), col("p.cell").as("cell"),
            col("p.sv").as("sv"))
          .filter(col("sv").isNotNull)
          .groupBy(col("sub"), col("cell"))
          .agg(count(lit(1)).as("__c"), sums: _*)
          .select(col("sub"), col("cell").as("cid"),
            array((0 until subLen).map(j =>
              round(col(s"__s$j").cast(DoubleType) / col("__c") / 1e6, 6)): _*)
              .as("cvec"))
      case None =>
        assign(emb, idCol, vecCol, books, subLen)
          .select(col("sub"), col("cell"),
            posexplode(slice(col(vecCol), col("sub") * subLen + 1, lit(subLen)))
              .as(Seq("pos", "x")))
          .withColumn("q", round(col("x").cast(DoubleType) * 1e6).cast(LongType))
          .groupBy(col("sub"), col("cell"), col("pos"))
          .agg(sum(col("q")).as("s"), count(lit(1)).as("c"))
          .withColumn("comp", round(col("s").cast(DoubleType) / col("c") / 1e6, 6))
          .groupBy(col("sub"), col("cell"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
            e => e.getField("comp")).as("cvec"))
          .select(col("sub"), col("cell").as("cid"), col("cvec"))
    }

  /** The compressed index: `(idCol, codes)` with codes ordered by
    * subspace — m longs per vector, the relation a 100 TB deployment
    * stores and scans instead of raw embeddings. */
  def codes(emb: DataFrame, idCol: String, vecCol: String,
            books: DataFrame, subLen: Int): DataFrame =
    assign(emb, idCol, vecCol, books, subLen)
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cell")))),
        e => e.getField("cell")).as("codes"))

  /** Quantization-distortion report: per subspace, the corpus size and
    * mean squared error to the chosen codeword — the standard PQ
    * training diagnostic (watch it fall across Lloyd rounds; a subspace
    * whose MSE dwarfs the others wants more codewords or a different
    * split). One assignment scan plus a broadcast re-join to the m×k
    * codebook; the error mean rides integer-quantized sums so shards
    * merge exactly. */
  def distortion(emb: DataFrame, idCol: String, vecCol: String,
                 books: DataFrame, subLen: Int): DataFrame = {
    val b = books.select(col("sub").as("__bsub"), col("cid").as("__bcid"),
      col("cvec"))
    assign(emb, idCol, vecCol, books, subLen)
      .join(broadcast(b),
        col("sub") === col("__bsub") && col("cell") === col("__bcid"))
      .withColumn("__q",
        round(round(l2sqSub(col(vecCol), col("sub"), subLen, col("cvec")), 6)
          * 1e6).cast(LongType))
      .groupBy(col("sub"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__q")).cast(DoubleType) / count(lit(1)) / 1e6, 6).as("mse"))
  }

  /** ADC distance COLUMN for one query, evaluated over the codebook
    * relation (never the corpus): squared L2 from the query's `sub`-th
    * slice to the row's codeword — select it on `books` (m·k rows) to
    * materialize the distance table. */
  def distanceTable(query: Seq[Double], subLen: Int): Column = {
    // per-row: query slice selected by the sub column, unrolled terms
    (0 until subLen).map { i =>
      val qi = element_at(
        array(query.grouped(subLen).toSeq.map(s => lit(s(i))): _*),
        (col("sub") + 1).cast(IntegerType)).cast(DoubleType)
      val d = qi - element_at(col("cvec"), i + 1)
      d * d
    }.reduce(_ + _)
  }

  /** ADC top-k: score every vector by the sum of its m table-looked-up
    * subspace distances — the raw vectors are never read at query time.
    *
    * Scale shape: train (bounded scans) → one corpus scan to assign →
    * broadcast-join the m×k distance table → ONE hash aggregation on
    * the id (map-side combine folds the m rows per vector before the
    * exchange; totals are integer sums, so shard merge order is
    * irrelevant) → TakeOrderedAndProject for the top-k. With codes
    * persisted (the production layout), queries skip straight to the
    * broadcast-join at m-bytes-per-vector scan cost. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String, query: Seq[Double],
              m: Int, dims: Int, centroidStep: Int, iters: Int, k: Int): DataFrame = {
    val subLen = dims / m
    val books = codebooks(emb, idCol, vecCol, m, dims, centroidStep, iters)
    val dt = books.select(col("sub").as("__dtsub"), col("cid").as("__dtcid"),
      round(distanceTable(query, subLen), 6).as("d2q"))
    assign(emb, idCol, vecCol, books, subLen)
      .join(broadcast(dt),
        col("sub") === col("__dtsub") && col("cell") === col("__dtcid"))
      .groupBy(col(idCol))
      .agg((sum(round(col("d2q") * 1e6).cast(LongType)) / 1e6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-PQ top-k — the production ANN composition (FAISS's IVFPQ
    * layout): a trained coarse quantizer routes the query to its
    * `nprobe` nearest cells, and ADC re-ranks ONLY those cells'
    * members from their PQ codes.
    *
    * Scale shape: the two quantizers are independent offline
    * artifacts (coarse cells map to `partitionBy` storage — the probe
    * partition-prunes the scan to nprobe directories; PQ codes are
    * the m-bytes-per-vector payload inside each cell). At query time
    * nothing reads a raw vector: the candidate set is cut FIRST by
    * the broadcast probe-cell list, then scored by the broadcast m×k
    * distance table in one id-keyed hash aggregation. Both codebooks
    * broadcast; the corpus contributes one pruned scan.
    *
    * Metrics are deliberately mixed, per the IVF-PQ convention: the
    * coarse probe routes by COSINE (consistent with this engine's IVF
    * family), the PQ re-rank scores by L2 — routing only needs to find
    * the right neighborhoods, and the ADC table is an L2 structure. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                query: Seq[Double], coarseStep: Int, coarseIters: Int,
                nprobe: Int, m: Int, dims: Int, pqStep: Int, pqIters: Int,
                k: Int): DataFrame = {
    val subLen = dims / m
    val cent = Similarity.kmeansCentroids(emb, idCol, vecCol, coarseStep, coarseIters)
    val probeCells = cent
      .withColumn("__qcos",
        round(Similarity.cosine(col("cvec"), Similarity.vecLit(query)), 6))
      .orderBy(col("__qcos").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid").as("cell"))
    val cand = Similarity.ivfAssignTo(emb, idCol, vecCol, cent)
      .join(broadcast(probeCells), "cell")
      .select(col(idCol), col(vecCol))
    val books = codebooks(emb, idCol, vecCol, m, dims, pqStep, pqIters)
    val dt = books.select(col("sub").as("__dtsub"), col("cid").as("__dtcid"),
      round(distanceTable(query, subLen), 6).as("d2q"))
    assign(cand, idCol, vecCol, books, subLen)
      .join(broadcast(dt),
        col("sub") === col("__dtsub") && col("cell") === col("__dtcid"))
      .groupBy(col(idCol))
      .agg((sum(round(col("d2q") * 1e6).cast(LongType)) / 1e6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** One-time IVF-PQ index build — the deployment shape of
    * [[ivfPqTopK]], which re-trains and re-codes the corpus per query.
    * The coarse quantizer and per-subspace codebooks are trained once
    * and persisted (tiny: ≤64 cells, ≤256·m codewords), and every
    * vector's PQ codes land in a codes relation written PARTITIONED BY
    * coarse cell. [[ivfPqTopKIndexed]] then lists `nprobe` cell
    * directories instead of scanning and re-coding the corpus — at
    * 100 TB the per-query read is (nprobe/cells)·|codes| with all
    * training amortized into this build. Trained relations are read
    * back from parquet before coding so the corpus-coding plan carries
    * no Lloyd-iteration lineage. */
  def buildIvfPqIndex(emb: DataFrame, idCol: String, vecCol: String,
                      coarseStep: Int, coarseIters: Int, m: Int, dims: Int,
                      pqStep: Int, pqIters: Int, indexRoot: String): Unit = {
    val subLen = dims / m
    val spark = emb.sparkSession
    Similarity.kmeansCentroids(emb, idCol, vecCol, coarseStep, coarseIters)
      .write.mode("overwrite").parquet(s"$indexRoot/centroids")
    codebooks(emb, idCol, vecCol, m, dims, pqStep, pqIters)
      .write.mode("overwrite").parquet(s"$indexRoot/codebooks")
    val cent = spark.read.parquet(s"$indexRoot/centroids")
    val books = spark.read.parquet(s"$indexRoot/codebooks")
    val routed = Similarity.ivfAssignTo(emb, idCol, vecCol, cent)
      .withColumnRenamed("cell", "ivf_cell")
    assign(routed, idCol, vecCol, books, subLen, carry = Seq("ivf_cell"))
      .groupBy(col(idCol), col("ivf_cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("cell")))),
        e => e.getField("cell")).as("codes"))
      .select(col(idCol), col("ivf_cell").as("cell"), col("codes"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexRoot/codes")
  }

  /** ADC top-k off a [[buildIvfPqIndex]] index: resolve the nprobe
    * nearest coarse cells from the persisted centroids (bounded
    * driver-side collect, ≤64 ids like the streaming store's probe),
    * then scan ONLY those cell directories of the codes relation — the
    * isin on the partition column prunes at file-listing time
    * (PartitionFilters in the scan), never a full scan + filter.
    * Produces the same ranking as [[ivfPqTopK]] with equal parameters:
    * routing and coding are per-row deterministic, so codes computed
    * at build time equal codes computed at query time. */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                       indexRoot: String, idCol: String,
                       query: Seq[Double], subLen: Int, nprobe: Int,
                       k: Int): DataFrame = {
    val probes = spark.read.parquet(s"$indexRoot/centroids")
      .withColumn("__qcos",
        round(Similarity.cosine(col("cvec"), Similarity.vecLit(query)), 6))
      .orderBy(col("__qcos").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid")).collect().map(_.getLong(0)).toSeq
    val dt = spark.read.parquet(s"$indexRoot/codebooks")
      .select(col("sub").as("__dtsub"), col("cid").as("__dtcid"),
        round(distanceTable(query, subLen), 6).as("d2q"))
    spark.read.parquet(s"$indexRoot/codes")
      .filter(col("cell").isin(probes: _*))
      .select(col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(dt),
        col("sub") === col("__dtsub") && col("code") === col("__dtcid"))
      .groupBy(col(idCol))
      .agg((sum(round(col("d2q") * 1e6).cast(LongType)) / 1e6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }
}

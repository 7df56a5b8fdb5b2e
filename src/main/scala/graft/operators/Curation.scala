package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond pairwise similarity: duplicate-cluster resolution (connected
  * components), benchmark decontamination, deterministic stratified
  * sampling, and token-budget shard packing.
  *
  * All of them are declarative relational plans (joins / aggregations /
  * windows) — no collect, no UDFs — and every random-looking choice is a
  * content hash, so results are reproducible and oracle-checkable.
  */
object Curation {

  /** First 15 hex chars of a 32-char md5 as a 60-bit non-negative long —
    * the engine-portable uniform hash used across the similarity stack. */
  private def hex60(c: Column): Column =
    conv(substring(c, 1, 15), 16, 10).cast(LongType)

  // ---------------------------------------------------------------------
  // Connected components — duplicate-cluster resolution.
  //
  // Near-dup detection yields PAIRS; dedup needs CLUSTERS (a keeps-one
  // representative per transitive group: if A~B and B~C, exactly one of
  // {A,B,C} survives even though A~C was never scored). Component id =
  // min node id reachable, computed by iterated min-label propagation
  // with a pointer-jumping step:
  //
  //   neighbor step : lbl(x) <- min(lbl(x), min_{(x,y) in E} lbl(y))
  //   jump step     : lbl(x) <- lbl(lbl(x))
  //
  // The jump halves the distance a label still has to travel each
  // round (the hash-to-min idea), so convergence is O(log diameter)
  // iterations, not O(diameter) — dup chains hundreds of docs long
  // (template families) converge in a handful of rounds. Each round is
  // two hash-shuffles (join on dst, groupBy node). Labels only ever
  // decrease, so a stable checksum (sum of labels) proves the fixpoint —
  // one scalar action per round, no data to the driver.
  //
  // Lineage is TRUNCATED each round (eager localCheckpoint), not just
  // cached: persist keeps the logical plan, so after i rounds Catalyst
  // would re-analyze a tree holding i copies of the (possibly enormous)
  // edge-producing plan — planning time, not compute, then dominates.
  // Checkpointing is the standard Spark pattern for iterative graph
  // algorithms; swap localCheckpoint for reliable checkpoint(dir) on a
  // real cluster where executor loss must be survivable.
  // ---------------------------------------------------------------------
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
                          maxIters: Int = 16): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    // Iterate ONLY over edge-incident nodes: a near-dup graph touches a
    // tiny fraction of the corpus (pairs << docs), so propagating labels
    // for every document would shuffle the full corpus once per round
    // for nothing — singletons are their own component by definition and
    // are unioned back with a single left join at the end.
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node").cast(LongType))
      .localCheckpoint()
    // Labels are monotone non-increasing, so the label sum strictly
    // decreases until the fixpoint; DECIMAL(38,0) keeps the checksum
    // exact at any node-id magnitude.
    def checksum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast(DecimalType(38, 0)))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty edge set -> no labels
    var sum0 = checksum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val neighborMin = sym.join(labels, sym("dst") === labels("node"))
        .select(sym("src").as("node"), col("lbl"))
      val afterNeighbor = labels.select(col("node"), col("lbl"))
        .union(neighborMin)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
      // pointer jump: follow the label one hop (label ids ARE node ids)
      val l2 = afterNeighbor.select(col("node").as("n2"), col("lbl").as("l2"))
      val next = afterNeighbor
        .join(l2, afterNeighbor("lbl") === l2("n2"), "left")
        .select(col("node"), coalesce(col("l2"), col("lbl")).as("lbl"))
        .localCheckpoint() // eager: materializes AND flattens the plan
      val sum1 = checksum(next)
      Checkpoints.release(labels) // prior round superseded by next's blocks
      labels = next
      converged = sum1.compareTo(sum0) == 0
      sum0 = sum1
      it += 1
    }
    // Superseded rounds are released eagerly above (Checkpoints.release:
    // raw-RDD unpersist, no CacheManager entry, no re-cache cascade);
    // only the final label frame's blocks survive, feeding the join below.
    Checkpoints.release(sym) // iteration-only symmetrized edge relation
    val comp = labels.select(col("node"), col("lbl"))
    nodes.select(col(idCol))
      .join(comp, nodes(idCol) === comp("node"), "left")
      .select(col(idCol),
        coalesce(col("lbl"), col(idCol).cast(LongType)).as("component"))
  }

  // ---------------------------------------------------------------------
  // Benchmark decontamination — flag training docs sharing >= minShared
  // distinct word n-grams with any benchmark document.
  //
  // The benchmark shingle set is tiny next to the corpus (eval suites
  // are KBs-to-MBs vs TBs), so it is DISTINCT-ed and broadcast: the
  // corpus side is never shuffled — shingling is a projection, the
  // broadcast join a map-side probe, and the per-doc overlap count a
  // partial aggregation on doc_id. At 100 TB that is one pass over the
  // corpus with no exchange until the (already-small) overlap counts.
  // ---------------------------------------------------------------------
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          shingleN: Int, minShared: Long): DataFrame = {
    val corpusSh = Similarity.shingles(corpus, idCol, textCol, shingleN)
    val benchSh = Similarity.shingles(bench, idCol, textCol, shingleN)
      .select(col("shingle")).distinct()
    corpusSh.join(broadcast(benchSh), "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc
      .filter(col("n_shared") >= minShared)
  }

  // ---------------------------------------------------------------------
  // Semantic benchmark decontamination — the embedding-space companion
  // to [[contaminationReport]]: n-gram overlap misses PARAPHRASED eval
  // leakage (a reworded benchmark question shares no 5-grams with its
  // source), so modern pipelines additionally flag corpus documents
  // whose embedding sits within a cosine threshold of ANY benchmark
  // embedding. Per corpus vector: the best-matching benchmark id, the
  // (6-decimal-rounded) max cosine, and the threshold verdict.
  //
  // Scale shape mirrors the n-gram side: the benchmark set is tiny
  // (eval suites), so its vectors — WITH precomputed norms — broadcast,
  // the corpus side is one map-only probe (|bench| fused
  // dot-products per row, corpus norm computed once per row), and the
  // per-id argmax is a struct-max (cosine, -bench_id) partial
  // aggregation: map-side combined, ties resolve to the smallest
  // benchmark id, no window, no sort, no corpus shuffle before the
  // |corpus|-row result. A benchmark too large to broadcast routes
  // through the IVF probe (ivfAnnTopK per bench vector) instead; an
  // EMPTY benchmark yields an empty report (nothing to leak).
  // ---------------------------------------------------------------------
  /** Bench sets above this row count skip the literal-matrix fast path
    * (a 64-dim double matrix at the cap is ~34 MB of task reference —
    * broadcast-sized; real benchmark suites are fixed-size and far
    * smaller). Above it the broadcast-join fallback runs, and a bench
    * too large even to broadcast routes through the IVF probe
    * (SCALE.md). */
  private val benchMatrixCap = 65536

  def semanticContamination(emb: DataFrame, idCol: String, vecCol: String,
                            bench: DataFrame, threshold: Double): DataFrame = {
    // Fast path: pack the bench side into a literal matrix and score
    // max-cosine in ONE native per-row pass (plans/BenchMaxCos — the
    // exact when/round/struct-max arithmetic of the fallback below,
    // pinned bit-identical by the parity spec). The fallback
    // cross-join materializes |corpus|·|bench| join rows around the
    // same |corpus|·|bench| dot products; the round-20 stage breakdown
    // measured it as q_curation_e2e's dominant term AND all of its
    // run-to-run spread at 100×. Falls back when: the extension is not
    // registered, GRAFT_AB_NO_NATIVE_MAXCOS=1 (A/B re-adjudication),
    // the bench id column is not integral, the bench is empty (the
    // relational result is EMPTY, which no per-row expression yields),
    // or the bench exceeds the matrix cap.
    val nativeOk = !sys.env.contains("GRAFT_AB_NO_NATIVE_MAXCOS") &&
      emb.sparkSession.catalog.functionExists("bench_max_cos") &&
      // LongType exactly: the fast path emits BIGINT top_bench_id and
      // must not silently widen a narrower fallback schema
      bench.schema(bench.schema.fieldIndex(idCol)).dataType == LongType &&
      // the bench vecCol must be a float/double array: the collected
      // rows are pattern-matched as Float/Double below, so any other
      // schema (ARRAY<INT>, scalar) must route to the join fallback's
      // clean AnalysisException instead of a driver-side MatchError
      (bench.schema(bench.schema.fieldIndex(vecCol)).dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType, _) => true
        case _ => false
      })
    val collected = if (nativeOk)
      bench.select(col(idCol).cast(LongType).as("__bid"), col(vecCol).as("__bvec"))
        .limit(benchMatrixCap + 1).collect()
    else Array.empty[org.apache.spark.sql.Row]
    if (nativeOk && collected.nonEmpty && collected.length <= benchMatrixCap) {
      // invalid bench vectors (null array / null element) pack as the
      // EMPTY vector: bn = 0 routes them to the same cos = 0.0 branch
      // the fallback's null-norm AND takes
      val vecs: Seq[Seq[Double]] = collected.toSeq.map { r =>
        val a = if (r.isNullAt(1)) null else r.getSeq[Any](1)
        if (a == null || a.contains(null)) Seq.empty[Double]
        else a.map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
        }
      }
      val bids: Seq[Long] = collected.toSeq.map(_.getLong(0))
      val m = call_function("bench_max_cos", col(vecCol),
        typedLit(vecs), typedLit(bids))
      // the per-id struct-max the fallback also pays (exact semantics
      // under duplicate ids: max of per-row maxes = max over all pairs,
      // same (c, -bid) ordering) — it shuffles |corpus| two-field rows,
      // not the pair relation
      emb.select(col(idCol), m.as("__m"))
        .groupBy(col(idCol))
        .agg(max(struct(col("__m.max_cos").as("c"),
          (-col("__m.top_bench_id")).as("nb"))).as("__mm"))
        .select(col(idCol),
          (-col("__mm.nb")).as("top_bench_id"),
          col("__mm.c").as("max_cos"),
          (col("__mm.c") >= threshold).as("contaminated"))
    } else semanticContaminationJoin(emb, idCol, vecCol, bench, threshold)
  }

  /** The broadcast-join formulation — the fast path's parity reference
    * (the spec pins them bit-identical) and the route for bench sets
    * past the matrix cap or non-BIGINT id schemas. */
  private[graft] def semanticContaminationJoin(emb: DataFrame, idCol: String,
      vecCol: String, bench: DataFrame, threshold: Double): DataFrame = {
    val b = broadcast(bench
      .select(col(idCol).as("__bid"), col(vecCol).as("__bvec"))
      .withColumn("__bn", Similarity.normOf(bench, col("__bvec"))))
    val e = emb.select(col(idCol), col(vecCol).as("__evec"))
      .withColumn("__en", Similarity.normOf(emb, col("__evec")))
    val cos = when(col("__en") > 0.0 && col("__bn") > 0.0,
      round(Similarity.dotOf(emb, col("__evec"), col("__bvec"))
        / (col("__en") * col("__bn")), 6)).otherwise(lit(0.0))
    e.crossJoin(b)
      .select(col(idCol), col("__bid"), cos.as("__c"))
      .groupBy(col(idCol))
      .agg(max(struct(col("__c").as("c"), (-col("__bid")).as("nb"))).as("__m"))
      .select(col(idCol),
        (-col("__m.nb")).as("top_bench_id"),
        col("__m.c").as("max_cos"),
        (col("__m.c") >= threshold).as("contaminated"))
  }

  // ---------------------------------------------------------------------
  // Deterministic stratified sampling — per-stratum Bernoulli keep with
  // a content-hash gate instead of an RNG: the decision for a row is a
  // pure function of (salt, stratum, key), so the sample is reproducible
  // across runs/engines/partitionings, new data never perturbs old
  // decisions, and changing the salt draws an independent sample.
  // Per-stratum rates ride a broadcast join; the filter itself is a
  // no-shuffle projection that pushes down to the scan.
  //
  // Rates are integer BASIS POINTS (keep if hash-bucket < rate_bp of
  // 10000), not float fractions: 0.3*10000 is 2999.999… in binary and
  // engines disagree on cast (Spark truncates, SQL engines round) —
  // integer thresholds make the keep decision exact everywhere.
  // ---------------------------------------------------------------------
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: Column,
                       ratesBp: DataFrame, salt: String): DataFrame = {
    val bucket = pmod(
      hex60(md5(concat_ws(":", lit(salt), col(stratumCol), keyCol))), lit(10000L))
    df.join(broadcast(ratesBp), Seq(stratumCol))
      .filter(bucket < col("rate_bp").cast(LongType))
      .drop("rate_bp")
  }

  // ---------------------------------------------------------------------
  // Weighted sampling — per-row keep probability proportional to a
  // score in [0,1] (soft quality filtering: a 0.9-quality doc survives
  // 9× as often as a 0.1 one, instead of a hard threshold discarding
  // everything below a line). Same salted hash gate — deterministic,
  // map-only, no shuffle; the weight is rounded to basis points so the
  // keep decision is integer-exact across engines.
  // ---------------------------------------------------------------------
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     salt: String): DataFrame = {
    val bucket = pmod(hex60(md5(concat_ws(":", lit(salt), keyCol))), lit(10000L))
    val bp = round(least(greatest(weightCol, lit(0.0)), lit(1.0)) * 10000)
      .cast(LongType)
    df.filter(bucket < bp)
  }

  // ---------------------------------------------------------------------
  // Exact-count sampling — keep exactly min(n, |stratum|) rows per
  // stratum, chosen by salted-hash order. The Bernoulli gate above gives
  // BINOMIAL counts (right for huge strata, no shuffle); eval sets and
  // per-source quotas need EXACT counts, which costs one window (hash-
  // shuffle on the stratum + per-partition sort). Hash order makes the
  // choice reproducible and salt-switchable; ties cannot happen because
  // the tiebreak is the key itself.
  // ---------------------------------------------------------------------
  def exactSample(df: DataFrame, stratumCol: String, keyCol: Column,
                  n: Int, salt: String): DataFrame = {
    val h = hex60(md5(concat_ws(":", lit(salt), col(stratumCol), keyCol)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h.asc, keyCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  // ---------------------------------------------------------------------
  // Mixture sampling — down-sample each stratum toward a target token
  // budget (the data-mixing step: "English web 40%, code 30%, ..."
  // becomes per-source token targets). Keep fraction per stratum =
  // min(1, target/available) in integer basis points, then the same
  // salted content-hash gate as stratifiedSample — so the mixture is
  // reproducible and rows never flip when unrelated strata change.
  // One aggregation for availability (partial combine), a broadcast of
  // the tiny per-stratum fraction table, and a map-side filter: the
  // corpus itself is never shuffled.
  // ---------------------------------------------------------------------
  def mixtureSample(df: DataFrame, stratumCol: String, keyCol: Column,
                    tokCol: Column, targets: DataFrame, salt: String): DataFrame = {
    val avail = df.groupBy(col(stratumCol))
      .agg(sum(tokCol.cast(LongType)).as("__avail"))
    val fracs = avail.join(targets, Seq(stratumCol))
      .select(col(stratumCol),
        least(lit(10000L),
          floor(col("target_tokens").cast(DoubleType) * 10000.0 / col("__avail"))
            .cast(LongType)).as("rate_bp"))
    stratifiedSample(df, stratumCol, keyCol, fracs, salt)
  }

  // ---------------------------------------------------------------------
  // Temperature-scaled mixture targets — per-stratum token targets
  // proportional to avail^tau, renormalized over the token budget (the
  // multilingual/temperature-sampling rule: tau = 1 keeps natural
  // proportions, tau -> 0 flattens toward uniform, so low-resource
  // strata are up-weighted without hand-set ratios). One aggregation
  // over the corpus; everything after it runs on the |strata|-row plan
  // table.
  //
  // Exactness discipline: the raw temperature weight is the single
  // floating-point step, and it is QUANTIZED to integer micro-units
  // per stratum BEFORE any cross-stratum arithmetic — a double sum's
  // value depends on reduction order (non-associative), so summing raw
  // doubles would make the result run- and engine-dependent. From the
  // quantized weights onward everything is integer: shares via `div`,
  // largest-remainder top-up ranked by the integer remainder (ties by
  // stratum), so weight_bp sums to exactly 10000 and targets are
  // engine-exact. tau = 0.5 goes through IEEE sqrt (correctly rounded,
  // bit-identical in any engine); other tau use pow, which is faithful
  // but not correctly rounded — cross-engine oracles should pin 0.5.
  // ---------------------------------------------------------------------
  /** Per `stratumCol`: `avail_tokens`, `weight_bp` (temperature weight
    * in basis points, largest-remainder normalized to sum to 10000) and
    * `target_tokens` (integer share of `budgetTokens`). */
  def temperatureTargets(df: DataFrame, stratumCol: String, tokCol: Column,
                         tau: Double, budgetTokens: Long): DataFrame = {
    val avail = df.groupBy(col(stratumCol))
      .agg(sum(tokCol.cast(LongType)).as("avail_tokens"))
    val raw =
      if (tau == 0.5) sqrt(col("avail_tokens").cast(DoubleType))
      else pow(col("avail_tokens").cast(DoubleType), lit(tau))
    val q = avail.withColumn("__rawq", round(raw * 1e6).cast(LongType))
    // normalizeBp's global window runs over the |strata|-row plan table
    // (already driver-scale), never the corpus — single-partition is fine
    normalizeBp(q, stratumCol, "__rawq")
      .select(col(stratumCol), col("avail_tokens"), col("w_bp").as("weight_bp"),
        expr(s"w_bp * ${budgetTokens}L div 10000").as("target_tokens"))
  }

  // ---------------------------------------------------------------------
  // Epochized materialization — the UP-sampling half of data mixing.
  // mixtureSample can only discard (rate <= 1); when a small high-value
  // stratum's target EXCEEDS its available tokens, training pipelines
  // repeat it (multi-epoch data, the data-constrained regime). Per
  // stratum: epochs = target/avail as an integer part plus a fractional
  // tail — every row is emitted floor(epochs) times with an `epoch`
  // index, and rows whose salted content-hash gate falls under the
  // fractional tail (in basis points) get one extra copy. So emitted
  // tokens per stratum land within bp-resolution of the target, the
  // copy decision is per-row deterministic (a row never flips when
  // unrelated strata change), and every copy is tagged with the epoch
  // it belongs to — loaders shuffle epochs, not this operator.
  //
  // Shape at 100 TB: one aggregate for availability (map-side combine),
  // a broadcast of the |strata|-row plan, then a map-side explode whose
  // output size is exactly the training budget — there is no shuffle of
  // the corpus and no skew hazard (the explode factor is per-stratum
  // uniform). Fractional arithmetic is integer end-to-end:
  // rem * 10000 stays in Long for strata under ~9e14 tokens (a 100 TB
  // corpus totals ~2.5e13 — headroom of 36x on the worst single
  // stratum).
  // ---------------------------------------------------------------------
  /** Rows of `df` repeated per the stratum's `target_tokens` /
    * available-tokens ratio (from `targets`: stratumCol,
    * target_tokens), each copy tagged with `epoch` (0-based). */
  def epochize(df: DataFrame, stratumCol: String, keyCol: Column,
               tokCol: Column, targets: DataFrame, salt: String): DataFrame = {
    val avail = df.groupBy(col(stratumCol))
      .agg(sum(tokCol.cast(LongType)).as("__avail"))
    // `div`/`%` keep the epoch split integer-exact at any magnitude —
    // double-rounding via `/` would diverge from the oracle past 2^53
    val plan = avail.join(targets, Seq(stratumCol)).select(
      col(stratumCol),
      expr("CAST(target_tokens AS BIGINT) div __avail").as("__full"),
      expr("(CAST(target_tokens AS BIGINT) % __avail) * 10000 div __avail")
        .as("__frac_bp"))
    val gate = pmod(
      hex60(md5(concat_ws(":", lit(salt), col(stratumCol), keyCol))), lit(10000L))
    df.join(broadcast(plan), Seq(stratumCol))
      .withColumn("__copies",
        col("__full") + when(gate < col("__frac_bp"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__full", "__frac_bp", "__copies")
  }

  // ---------------------------------------------------------------------
  // Token-budget shard packing — assign documents to training shards so
  // each shard carries ~`budgetTokens` tokens: shard = floor(exclusive
  // running token total / budget) per group, in deterministic id order.
  // One window per group (hash-shuffle on the group key, per-partition
  // sort) — groups are independent, so a 100 TB corpus packs in
  // parallel across sources; a single global sequence would serialize
  // into one partition, which is why the group key is mandatory.
  // ---------------------------------------------------------------------
  def packShards(df: DataFrame, groupCol: String, idCol: String,
                 tokCol: Column, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tok", tokCol.cast(LongType))
      .withColumn("shard",
        floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / budgetTokens))
  }

  // ---------------------------------------------------------------------
  // Context-window sequence packing — the step BETWEEN shard packing
  // and the training loop: documents concatenate in deterministic id
  // order (per group) and slice into fixed `windowTokens`-token
  // training windows, documents SPLITTING across window boundaries
  // exactly as pretraining sample-packing does (no padding waste). The
  // output is the pack manifest: one row per (document × window)
  // overlap segment, carrying where the segment starts inside the
  // document, where it lands inside the window, and its length — what
  // a loader needs to assemble any window from raw documents, and what
  // an attention-masking pipeline needs to mark document boundaries.
  //
  // Scale shape: one prefix-sum window per group (the packShards
  // pattern — groups pack in parallel, a global sequence would
  // serialize), then a pure-projection explode of each document's
  // [firstWin, lastWin] span — a document emits
  // ceil(n/windowTokens)+1 segments at most, so the output is
  // O(corpus tokens / windowTokens + docs) rows. All boundary
  // arithmetic is integer (exact in any engine); zero-token documents
  // emit nothing (they occupy no window space).
  // ---------------------------------------------------------------------
  def packWindows(df: DataFrame, groupCol: String, idCol: String,
                  tokCol: Column, windowTokens: Long): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val L = lit(windowTokens)
    df.withColumn("n_tok", tokCol.cast(LongType))
      .filter(col("n_tok") > 0L)
      .withColumn("__prev", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("window",
        // True integer division (`div`), not floor(double /): the
        // double path silently loses exactness past 2^53 cumulative
        // tokens, and the oracle's `//` is integer at any magnitude.
        explode(sequence(expr(s"__prev div ${windowTokens}L"),
          expr(s"(__prev + n_tok - 1) div ${windowTokens}L"))))
      .select(col(groupCol), col(idCol), col("n_tok"), col("window"),
        greatest(lit(0L), col("window") * L - col("__prev")).as("doc_tok_start"),
        (greatest(col("__prev"), col("window") * L) - col("window") * L)
          .as("win_tok_start"),
        (least(col("n_tok"), (col("window") + 1L) * L - col("__prev"))
          - greatest(lit(0L), col("window") * L - col("__prev"))).as("seg_tokens"))
  }

  // ---------------------------------------------------------------------
  // Source-level gate — drop WHOLE sources whose aggregate quality is
  // bad (the C4/Gopher move: a spam domain is cheaper to reject once,
  // at the domain level, than doc-by-doc). Input rows carry a per-doc
  // quality score; a source survives when its mean quality and doc
  // count clear the floors, and surviving docs come back annotated
  // with their source's stats.
  //
  // Scale shape: the stats relation is |sources| rows (domains, not
  // documents), so the gate is ONE shuffle on the source key for the
  // aggregate plus a broadcast join back — the corpus itself is never
  // re-shuffled. Engine parity: the mean is an integer sum of
  // 1e4-quantized scores divided once at the end, so it is independent
  // of double addition order.
  // ---------------------------------------------------------------------
  def sourceFilter(df: DataFrame, sourceCol: String, qualityCol: Column,
                   minMeanQuality: Double, minDocs: Long): DataFrame = {
    val q10k = round(qualityCol * 10000).cast(LongType)
    val stats = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("src_n_docs"),
      round(sum(q10k).cast(DoubleType) / count(lit(1)) / 10000.0, 4)
        .as("src_mean_q"))
    val kept = stats.filter(
      col("src_mean_q") >= minMeanQuality && col("src_n_docs") >= minDocs)
    df.join(broadcast(kept), Seq(sourceCol))
  }

  // ---------------------------------------------------------------------
  // Wilson lower bound per source — rank sources by the LOWER confidence
  // bound of their gate-pass rate, not the raw rate: a 3-doc source at
  // 100% must not outrank a 10k-doc source at 95% (the small sample's
  // bound collapses toward 0). One aggregation; the bound is pure
  // arithmetic over integer counts plus one sqrt — IEEE sqrt is
  // correctly rounded, so the value is bit-identical in any engine.
  // ---------------------------------------------------------------------
  /** Per `sourceCol`: docs, passes of `passCol` (boolean), the raw rate
    * and the Wilson lower bound at z (default 1.96 ≈ 95%), all rounded
    * to 6 — ordered consumption is the caller's choice. */
  def sourceWilson(df: DataFrame, sourceCol: String, passCol: Column,
                   z: Double = 1.96): DataFrame = {
    val zz = z * z
    val agg = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(passCol.cast(DoubleType)).cast(LongType).as("n_pass"))
    val n = col("n_docs").cast(DoubleType)
    val p = col("n_pass") / n
    val lower = (p + lit(zz) / (lit(2.0) * n)
      - lit(z) * sqrt(p * (lit(1.0) - p) / n + lit(zz) / (lit(4.0) * n * n))) /
      (lit(1.0) + lit(zz) / n)
    agg.select(col(sourceCol), col("n_docs"), col("n_pass"),
      round(p, 6).as("pass_rate"),
      round(lower, 6).as("wilson_lower"))
  }

  // ---------------------------------------------------------------------
  // Quality tiers — equal-depth quality quartiles per stratum (curation
  // by relative quality WITHIN each source, so one high-quality domain
  // doesn't monopolize the kept set). ntile per stratum = one shuffle on
  // the stratum key + per-partition sort; ties broken by id so the tier
  // assignment is deterministic. A GLOBAL ntile would funnel the corpus
  // through one partition — always tier within a partitionable stratum.
  // ---------------------------------------------------------------------
  def qualityTiers(df: DataFrame, stratumCol: String, idCol: String,
                   scoreCol: Column, tiers: Int): DataFrame =
    df.withColumn("tier",
      ntile(tiers).over(Window.partitionBy(col(stratumCol))
        .orderBy(scoreCol.desc, col(idCol).asc)))

  // ---------------------------------------------------------------------
  // Line-level boilerplate removal — drop every line whose document
  // frequency reaches `maxDocFreq` (headers, footers, nav chrome,
  // cookie banners: the CCNet/RefinedWeb pre-dedup pass), then
  // reassemble each document from its surviving lines in order.
  //
  // Shape at 100 TB: the exploded line relation is scanned twice (once
  // to count, once to filter) but the line-frequency aggregate combines
  // map-side and the boilerplate SET is tiny by construction (only
  // lines repeated across >= maxDocFreq documents qualify), so the
  // removal join is a broadcast probe — the corpus itself shuffles only
  // once, for the per-document reassembly. Counting DISTINCT documents
  // per line (not occurrences) keeps a line repeated inside one
  // document from being mistaken for corpus boilerplate.
  // ---------------------------------------------------------------------
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                maxDocFreq: Long): DataFrame = {
    // The exploded line relation feeds BOTH the frequency count and the
    // removal join; without a persist the corpus is scanned+split twice
    // (exchange reuse does not cover the differing consumers). Same
    // lifecycle as lshJaccard's shingle relation: the harness's
    // per-query clearCache (or the caller) releases it.
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = lines.filter(col("line") =!= "")
      .groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") >= maxDocFreq)
      .select(col("line"), lit(1).as("__boiler"))
    val kept = lines.join(broadcast(boiler), Seq("line"), "left")
      .filter(col("__boiler").isNull)
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          e => e.getField("line"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    // every input document gets an output row, even if ALL its lines
    // were boilerplate (clean_text = '', n_kept = 0)
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Stage 2 of exact substring dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better"): cut every n-token
    * span appearing in >= `minDocFreq` distinct documents, keep each
    * document's surviving tokens in order. Stage 1 (the span
    * inventory, q_dup_spans) reports the repeated spans; this is the
    * removal pass that produces the deduplicated corpus (the
    * reference's remark-level dedup, Kafka_GSMLSConsumer.py:196-219,
    * is the document-level analog).
    *
    * Scale shape: one persisted tokenized relation feeds both the
    * token and span projections (scan+split once — lineDedup's
    * lifecycle); spans shuffle as 128-bit hashes, never as text; the
    * document-frequency aggregation partial-combines map-side; covered
    * positions explode to at most n rows per duplicated occurrence;
    * survivors come from an anti-join on (doc, pos). Nothing is
    * quadratic — the heaviest stage is the same shuffle-on-span-hash
    * as stage 1. Every input document gets an output row, even when
    * every token was cut (clean_text = '', n_kept = 0).
    *
    * Cache lifecycle: the tokenized relation stays persisted until the
    * caller (or the harness's per-query clearCache) releases it — the
    * rebuilt corpus is itself corpus-sized, so eagerly materializing it
    * to free the cache early would double peak storage instead of
    * halving it (same contract as [[lineDedup]]). */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          n: Int, minDocFreq: Long): DataFrame = {
    require(n > 0, "need a positive span length")
    val tokd = df.select(col(idCol), split(col(textCol), "\\s+").as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = tokd.select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "tok")))
    val spans = tokd.filter(size(col("__toks")) >= n)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__toks")) - n),
          i => md5(concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))))
        .as(Seq("start", "span_md5")))
    val dup = spans.select(col(idCol), col("span_md5")).distinct()
      .groupBy(col("span_md5")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("span_md5"))
    val covered = spans.join(dup, Seq("span_md5"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("start"), col("start") + lit(n - 1))).as("pos"))
      .distinct()
    val surv = toks.join(covered, Seq(idCol, "pos"), "left_anti")
    val rebuilt = surv.groupBy(col(idCol))
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    tokd.select(col(idCol), size(col("__toks")).cast(LongType).as("__n"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ---------------------------------------------------------------------
  // Bloom-gated decontamination — exact "corpus minus contaminated"
  // with a Bloom-filter prefilter, the runtime-filter pattern made
  // explicit. The dirty-key set is folded into an m-bit bitmap stored
  // as (word -> 64-bit mask) rows: m bits comfortably broadcast even
  // when the raw key set would not (1M keys * 32-byte hashes = 32 MB of
  // strings vs 2^20 bits = 16K rows of longs). Corpus rows probe the
  // bitmap via two broadcast joins (no shuffle, no false negatives);
  // only rows BOTH probes flag — true hits plus the Bloom's false
  // positives — reach the exact anti-join, with their join key nulled
  // out otherwise so non-candidates stream through the join untouched.
  // The result is EXACT (identical to a plain anti-join on the key),
  // which is what lets a SQL oracle check it.
  // ---------------------------------------------------------------------
  def bloomKeepClean(df: DataFrame, keyCol: String,
                     dirty: DataFrame, dirtyKeyCol: String,
                     mBits: Int = 1 << 16): DataFrame = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two")
    val m = lit(mBits.toLong)
    def h(c: Column): Column = hex60(md5(c))
    // probe 2 takes the NEXT log2(m) bits of the hash via an integer
    // shift — `h / m` would be double division, losing low bits of a
    // 60-bit hash above 2^53 and skewing the bit distribution
    val shift = java.lang.Long.numberOfTrailingZeros(mBits.toLong)
    def probes(c: Column): (Column, Column) =
      (pmod(h(c), m), pmod(shiftright(h(c), shift), m))
    val (d1, d2) = probes(col(dirtyKeyCol))
    val bitmap = dirty
      .select(explode(array(d1, d2)).as("__bit"))
      .select((col("__bit") / 64L).cast(LongType).as("__w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__bit, 64) AS INT))").as("__m"))
      .groupBy(col("__w")).agg(bit_or(col("__m")).as("__mask"))
    val (c1, c2) = probes(col(keyCol))
    // probe bit set in the joined bitmap word? (missing word row -> 0 mask)
    def bitSet(alias: String): Column =
      coalesce(col(s"$alias.__mask"), lit(0L)).bitwiseAND(
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(__b_$alias, 64) AS INT))")) =!= 0
    val probed = df
      .withColumn("__b_p1", c1).withColumn("__b_p2", c2)
      .join(broadcast(bitmap.as("p1")),
        (col("__b_p1") / 64L).cast(LongType) === col("p1.__w"), "left")
      .join(broadcast(bitmap.as("p2")),
        (col("__b_p2") / 64L).cast(LongType) === col("p2.__w"), "left")
      .withColumn("__maybe", bitSet("p1") && bitSet("p2"))
      .drop("__b_p1", "__b_p2").drop(col("p1.__w")).drop(col("p1.__mask"))
      .drop(col("p2.__w")).drop(col("p2.__mask"))
    // Null join keys never equi-match, so anti-join passes every
    // non-candidate through untouched; only Bloom candidates carry a
    // real key into the join.
    probed
      .withColumn("__jk", when(col("__maybe"), col(keyCol)))
      .join(broadcast(dirty.select(col(dirtyKeyCol).as("__jk")).distinct()),
        Seq("__jk"), "left_anti")
      .drop("__jk", "__maybe")
  }

  // ---------------------------------------------------------------------
  // Column profiling — per-column count/null/distinct/min/max in ONE
  /** Train/val/test leakage report: given a near-duplicate pair
    * relation (`idA`, `idB`, `scoreCol`) and a split assignment
    * (`idCol`, `splitCol`), count the pairs that CROSS a split boundary
    * — the contamination a dedup-before-split pipeline exists to
    * prevent (a test document with a near-duplicate in train inflates
    * eval scores exactly like benchmark contamination does). One row
    * per unordered split pair: pair count, max similarity, and the
    * engine-parity mean (scores quantized ×1e4 to integers before
    * summing, so the mean is addition-order independent).
    *
    * Scale shape: the pair relation is the near-dup output (≪ corpus);
    * the split relation joins it twice on the id — at web scale the
    * split side is corpus-sized, so these are plain hash joins that AQE
    * broadcasts only when the pair side is small; the report itself is
    * ≤ |splits|² rows. */
  def splitLeakage(pairs: DataFrame, splits: DataFrame, idCol: String,
                   splitCol: String, idA: String = "id_a",
                   idB: String = "id_b", scoreCol: String = "jaccard"): DataFrame = {
    val spA = splits.select(col(idCol).as(idA), col(splitCol).as("__sp_a"))
    val spB = splits.select(col(idCol).as(idB), col(splitCol).as("__sp_b"))
    pairs.join(spA, Seq(idA)).join(spB, Seq(idB))
      .filter(col("__sp_a") =!= col("__sp_b"))
      .select(least(col("__sp_a"), col("__sp_b")).as("split_lo"),
        greatest(col("__sp_a"), col("__sp_b")).as("split_hi"),
        col(scoreCol).as("__s"))
      .groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).as("n_pairs"),
        round(max(col("__s")), 4).as("max_sim"),
        round(sum(floor(col("__s") * 1e4 + 0.5).cast(LongType)).cast(DoubleType)
          / 1e4 / count(lit(1)), 4).as("mean_sim"))
  }

  // pass over the table: all aggregates ride a single global HashAggregate
  // (partial map-side combine, one tiny exchange), then the one result
  // row is exploded to long format. Profiling a 100 TB table costs one
  // scan regardless of how many columns are profiled — never one scan
  // per column.
  // ---------------------------------------------------------------------
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast(DoubleType).as(s"__mn_$c"),
        max(col(c)).cast(DoubleType).as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n"),
        col(s"__nn_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_d"),
        col(s"__mx_$c").as("max_d"))): _*)).as("p"))
      .select(col("p.*"))
  }

  // ---------------------------------------------------------------------
  // Training order — the two ordering decisions a pipeline makes AFTER
  // curation has picked the rows: WHERE each example lands (shard) and
  // WHEN it is seen (position within the shard, per epoch).
  // ---------------------------------------------------------------------

  /** Deterministic seeded global shuffle into training shards, one
    * independent permutation per epoch (GSMLS-Analysis randomizes
    * training order with a pandas `sample(frac=1, random_state=...)`;
    * at corpus scale the same contract is a hash shuffle, not a global
    * sort). Every example gets a 60-bit key from
    * `md5(salt:epoch:id)`; the shard is `key mod nShards` and the
    * position is the rank of the key within its (epoch, shard).
    *
    * Scale shape: the epoch fan-out is a map-side `explode` of a
    * bounded literal array (no per-epoch corpus rescan); the ONLY
    * exchange is the (epoch, shard) hash partition that a shard writer
    * needs anyway, and the within-shard sort is per-partition — there
    * is no global order and no single-reducer window. `nShards` is the
    * parallelism knob: at 100 TB it is the output-file count
    * (thousands), so every reducer sorts ~|corpus|·epochs/nShards keys.
    * Reproducible across engines and runs: same salt, same order. */
  def trainOrder(df: DataFrame, idCol: String, salt: String,
                 epochs: Int, nShards: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val keyed = df
      .select(col(idCol),
        explode(array((0 until epochs).map(e => lit(e)): _*)).as("epoch"))
      .withColumn("__k",
        hex60(md5(concat_ws(":", lit(salt), col("epoch"), col(idCol)))))
      .withColumn("shard", pmod(col("__k"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__k"), col(idCol))
    keyed.select(col(idCol), col("epoch").cast(LongType).as("epoch"),
      col("shard"), row_number().over(w).cast(LongType).as("pos"))
  }

  /** The (epoch, threshold-in-micro-units) schedule [[curriculumAnneal]]
    * applies: linear from `q0` to `q1` across epochs, quantized to ×1e4
    * integers so the kept set is bit-identical across engines. Public so
    * an oracle can be built from the SAME rounding, never a re-derivation. */
  def annealSchedule(epochs: Int, q0: Double, q1: Double): Seq[(Int, Long)] =
    (0 until epochs).map { e =>
      val f = if (epochs == 1) 0.0 else e.toDouble / (epochs - 1)
      e -> math.round((q0 + (q1 - q0) * f) * 10000.0)
    }

  /** Waterfill mixture allocation — temperature targets under per-source
    * availability caps, for the NO-REPEAT regime ([[epochize]]'s exact
    * complement: epochize satisfies an over-availability target by
    * repeating docs; waterfill instead redistributes the excess to
    * sources that still have headroom). Each round gives every ACTIVE
    * (uncapped) source its rawq-proportional share of the remaining
    * budget, clamps at the cap, and retires capped sources; unplaced
    * budget after `rounds` rounds is reported, not silently dropped.
    * All arithmetic is integer floor-division on the ×1e6 quantized
    * temperature weights, so the allocation is engine-exact
    * (fixed-point headroom: rem·rawq must stay under 2^63 — at the
    * 1e6-token budgets used here that is ~7e14, 13k× headroom; a
    * 100 TB deployment re-scales the weight quantum accordingly).
    *
    * Scale shape: one corpus aggregate for availability, then pure
    * |strata|-row rounds of broadcast scalars — the corpus is touched
    * exactly once. */
  def waterfillTargets(df: DataFrame, stratumCol: String, tokCol: Column,
                       tau: Double, budgetTokens: Long, maxEpochs: Int,
                       rounds: Int): DataFrame = {
    require(rounds >= 1 && maxEpochs >= 1,
      s"rounds/maxEpochs must be >= 1, got $rounds/$maxEpochs")
    val avail = df.groupBy(col(stratumCol))
      .agg(sum(tokCol.cast(LongType)).as("avail_tokens"))
    val raw =
      if (tau == 0.5) sqrt(col("avail_tokens").cast(DoubleType))
      else pow(col("avail_tokens").cast(DoubleType), lit(tau))
    var cur = avail
      .withColumn("__rawq", round(raw * 1e6).cast(LongType))
      .withColumn("cap_tokens", col("avail_tokens") * maxEpochs)
      .withColumn("assigned", lit(0L))
    for (_ <- 1 to rounds) {
      val tot = cur.filter(col("assigned") < col("cap_tokens"))
        .agg(coalesce(sum(col("__rawq")), lit(0L)).as("__totq"))
      val rem = cur.agg((lit(budgetTokens) - sum(col("assigned"))).as("__rem"))
      cur = cur.crossJoin(broadcast(tot)).crossJoin(broadcast(rem))
        // Overflow guard, IN-PLAN rather than a docstring caveat: the
        // share product __rem·__rawq silently wraps past 2^63 in
        // non-ANSI Spark, turning a too-large budget into negative
        // allocations. rem ≤ floor(Long.Max / rawq) ⟺ rem·rawq ≤
        // Long.Max in integer arithmetic, so the assert is exact, costs
        // one division on the |strata|-row plan table, and names the
        // fix (rescale the weight quantum) instead of emitting garbage.
        .withColumn("__share",
          when(col("assigned") < col("cap_tokens") && col("__totq") > 0,
            when(assert_true(
                // Integer `div`, NOT Column `/` (Divide casts both Longs
                // to DOUBLE; Long.MaxValue rounds UP to 2^63 and the
                // quotient loses low bits, so the "exact" claim below
                // would be false near the boundary).
                expr("__rem <= 9223372036854775807 div greatest(__rawq, 1)"),
                lit("waterfillTargets: remaining-budget × weight product overflows " +
                  "Long — rescale the ×1e6 weight quantum or lower budgetTokens")).isNull,
              expr("__rem * __rawq div __totq"))).otherwise(lit(0L)))
        .withColumn("assigned",
          least(col("cap_tokens"), col("assigned") + col("__share")))
        .drop("__totq", "__rem", "__share")
    }
    val un = cur.agg((lit(budgetTokens) - sum(col("assigned"))).as("unassigned"))
    cur.crossJoin(broadcast(un))
      .select(col(stratumCol), col("avail_tokens"), col("cap_tokens"),
        col("assigned").as("target_tokens"),
        (col("assigned") === col("cap_tokens")).as("capped"),
        col("unassigned"))
  }

  /** Length-bucketed batching: group documents into fixed-size training
    * batches WITHIN token-length buckets (ascending length, id
    * tiebreak), so every batch pads each member only to its own batch
    * max — the dynamic-batching move that cuts padding waste versus
    * batching in arrival order. Returns the per-(bucket, batch) padding
    * report: member count, batch max, packed tokens, pad tokens.
    *
    * Scale shape: one exchange keyed by bucket, then a per-bucket sort
    * for the deterministic batch numbering. The GLOBAL numbering is a
    * determinism/oracle convenience — padding only depends on which
    * same-bucket docs share a batch, so a 100 TB deployment may instead
    * form B-sized batches per partition after the same bucket exchange
    * (equally padded, no bucket-wide sort) if a hot length bucket ever
    * dominates a reducer. */
  def lenBatches(df: DataFrame, idCol: String, tokCol: Column,
                 bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      s"bucketWidth/batchSize must be >= 1, got $bucketWidth/$batchSize")
    val base = df.select(col(idCol), tokCol.cast(LongType).as("__tok"))
      .withColumn("bucket", expr(s"__tok div $bucketWidth"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("__tok").asc, col(idCol).asc)
    base.withColumn("__rn", row_number().over(w))
      .withColumn("batch", expr(s"(__rn - 1) div $batchSize"))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("__tok")).as("batch_max"),
        sum(col("__tok")).as("n_tokens"),
        (max(col("__tok")) * count(lit(1)) - sum(col("__tok"))).as("pad_tokens"))
  }

  /** Normalize a |strata|-row positive integer `raw` column to exactly
    * 10000 basis points by largest remainder (the temperatureTargets
    * normalization, factored for reuse): floor shares first, then the
    * shortfall goes to the largest remainders (stratum-asc tiebreak).
    * Runs entirely on the bounded plan table — the window is
    * single-partition by design, never the corpus. */
  private[graft] def normalizeBp(df: DataFrame, stratumCol: String,
                                 rawCol: String): DataFrame = {
    val tot = df.agg(sum(col(rawCol)).as("__tot"))
    val scaled = df.crossJoin(broadcast(tot))
      .withColumn("__floor_bp", expr(s"$rawCol * 10000 div __tot"))
      .withColumn("__rem", expr(s"($rawCol * 10000) % __tot"))
    val deficitW = Window.orderBy(col("__rem").desc, col(stratumCol).asc)
    val short = scaled.agg((lit(10000L) - sum(col("__floor_bp"))).as("__short"))
    scaled.crossJoin(broadcast(short))
      .withColumn("__rank", row_number().over(deficitW))
      .withColumn("w_bp",
        col("__floor_bp") + when(col("__rank") <= col("__short"), 1L).otherwise(0L))
      .drop("__tot", "__floor_bp", "__rem", "__rank", "__short", rawCol)
  }

  /** DoReMi-flavored domain reweighting by multiplicative weights: start
    * uniform, then for `rounds` rounds upweight each stratum
    * proportionally to its excess loss — w ← w·(1 + η·loss), the
    * polynomial MW update (the exp() of the paper's exponentiated
    * gradient to first order, chosen because exp/ln are not
    * correctly-rounded across engines while this update is pure integer
    * arithmetic: w·(scale + loss)/scale in floor division, then a
    * largest-remainder renormalization to exactly 10000 bp). `lossU` is
    * the per-stratum excess loss in the SAME fixed-point scale as
    * `scale = etaDen·lossScale`, so η = 1/etaDen.
    *
    * Integer-floor MW keeps the true MW property that weights
    * concentrate on persistently-lossy domains; a stratum ground to
    * 0 bp by flooring stays at 0 (absorbing), which is the correct
    * reading: it lost every round at bp resolution.
    *
    * Scale shape: everything after the per-stratum loss aggregate runs
    * on the |strata|-row plan table (broadcast scalars + a bounded
    * window) — the corpus is touched exactly once, by the caller's
    * loss aggregation. */
  def reweightMixture(losses: DataFrame, stratumCol: String, lossUCol: Column,
                      rounds: Int, etaDen: Long, lossScale: Long): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val scale = etaDen * lossScale
    val base = losses.select(col(stratumCol), lossUCol.cast(LongType).as("loss_u"))
    var cur = normalizeBp(base.withColumn("__raw", lit(1L)), stratumCol, "__raw")
    for (_ <- 1 to rounds) {
      cur = normalizeBp(
        cur.withColumn("__raw", expr(s"w_bp * ($scale + loss_u) div $scale")),
        stratumCol, "__raw")
    }
    cur.select(col(stratumCol), col("loss_u"), col("w_bp"))
  }

  /** Quality-annealed curriculum: epoch `e` of `epochs` keeps only
    * documents whose quality clears a threshold that anneals linearly
    * from `q0` (epoch 0) to `q1` (last epoch) — the standard
    * end-of-pretraining move where late epochs re-feed only the
    * highest-quality slice. Returns the per-(epoch, stratum) budget
    * report a mixture planner consumes: kept doc count, kept token
    * count, and the engine-parity mean quality of the kept slice
    * (scores quantized ×1e4 to integers before summing).
    *
    * Scale shape: ONE corpus scan for all epochs — the (epoch,
    * threshold) schedule is a bounded literal array exploded map-side,
    * the threshold filter runs before the aggregate's partial combine,
    * and the only exchange carries (epoch, stratum) groups. Thresholds
    * are integer micro-units so the kept set is bit-identical across
    * engines. */
  def curriculumAnneal(scored: DataFrame, idCol: String, stratumCol: String,
                       qCol: Column, tokCol: Column, epochs: Int,
                       q0: Double, q1: Double): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val thrQq = annealSchedule(epochs, q0, q1)
    val schedule = explode(array(thrQq.map { case (e, t) =>
      struct(lit(e).as("epoch"), lit(t).as("thr")) }: _*)).as("__s")
    scored
      .select(col(idCol), col(stratumCol),
        floor(qCol * 10000.0 + 0.5).cast(LongType).as("__qq"),
        tokCol.cast(LongType).as("__tok"))
      .select(col("*"), schedule)
      .filter(col("__qq") >= col("__s.thr"))
      .groupBy(col("__s.epoch").cast(LongType).as("epoch"),
        round(col("__s.thr").cast(DoubleType) / 10000.0, 4).as("thr_q"),
        col(stratumCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tok"),
        // Mean quality in ×1e4 micro-units via floor(x+0.5): round() at a
        // .00005 boundary diverges between engines (HALF_UP on the decimal
        // string vs half-away on the binary value); floor and IEEE division
        // are bit-identical everywhere.
        floor(sum(col("__qq")).cast(DoubleType) / count(lit(1)) + 0.5)
          .cast(LongType).as("mean_qq"))
  }
}

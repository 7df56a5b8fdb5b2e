package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics on edge relations — the link-quality side
  * of corpus curation (PageRank-style authority is a standard quality
  * prior for web-crawl training data; the connected-component half
  * lives in [[Curation]]).
  *
  * Everything is expressed as joins + aggregations over the edge
  * relation, so the shuffle unit is the edge partition — no
  * driver-side adjacency, no per-node loops. At 100 TB the edge list
  * shuffles on `src` once per iteration and the rank relation (one row
  * per node) rides the same hash partitioning.
  */
object Graph {

  /** Weighted PageRank, fixed iteration count.
    *
    * r₀(v) = 1/N; r_{t+1}(v) = (1−d)/N + d·Σ_{(u,v)∈E} r_t(u)·w(u,v)/W(u)
    * where W(u) is u's total out-weight. Edges with non-positive weight
    * are DROPPED before the share relation is built (a zero-total
    * source would otherwise yield null/inf shares, and a negative
    * weight would silently corrupt ranks), so W(u) > 0 holds for every
    * surviving source by construction.
    *
    * Dangling nodes (no out-edges after the weight filter) default to
    * not contributing; with `danglingRedistribute = true` their rank
    * mass is redistributed uniformly each iteration —
    * r_{t+1}(v) = (1−d)/N + d·(Σ contrib(v) + D_t/N) where
    * D_t = Σ_{dangling u} r_t(u) — the stochastic-matrix variant, which
    * keeps Σr = 1 and is the correct form for web graphs with sinks.
    * The dangling mass is itself an integer sum of per-node quantized
    * ranks, so the engine-parity contract below still holds.
    *
    * Engine parity: each edge's contribution is quantized to an integer
    * (floor(x·1e9 + 0.5)) BEFORE the per-node sum, so ranks are pure
    * functions of integer sums — independent of partitioning and
    * addition order, reproducible in any engine that applies the same
    * formula. Drift cannot compound across iterations because every
    * iteration re-quantizes.
    *
    * Scale shape: one aggregation builds W(u); each iteration is one
    * hash join of edges against the (|V|-row) rank relation plus one
    * map-side-combined aggregation on `dst`. The rank relation is
    * materialized per iteration via eager `localCheckpoint` — lineage
    * is cut to a flat |V|-row scan each round. A persist+count+release
    * cycle is NOT equivalent here: unpersisting an iteration's relation
    * re-caches every dependent entry, dropping the successors' data and
    * forcing chained recomputes of the edge join per round (measured 5×
    * on the HITS twin before the switch). Checkpoint blocks are |V|
    * rows; each superseded round's blocks are released DETERMINISTICALLY
    * via [[Checkpoints.release]] the moment its successor materializes
    * (raw-RDD unpersist — no CacheManager cascade), so the job holds at
    * most two iteration frames at once instead of `iters`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
               nodes: DataFrame, nodeCol: String,
               iters: Int = 3, damping: Double = 0.85,
               danglingRedistribute: Boolean = false): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(wCol).cast(DoubleType).as("__w"))
      .filter(col("__w") > 0.0) // W(u) > 0 for every surviving source
    val outw = e.groupBy(col("__src")).agg(sum(col("__w")).as("__wout"))
    // share = w/W(u) is iteration-invariant: join it once, persist, and
    // every iteration reuses the same materialized edge relation.
    val share = e.join(outw, Seq("__src"))
      .select(col("__src"), col("__dst"), (col("__w") / col("__wout")).as("__s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nrel = nodes.agg(count(lit(1)).as("__nn"))
    val v0 = nodes.select(col(nodeCol).as("__v")).crossJoin(broadcast(nrel))
    // the dangling set is iteration-invariant: |V|-bounded, derived once
    val dangling = if (danglingRedistribute)
      v0.select(col("__v"))
        .join(share.select(col("__src")).distinct(),
          col("__v") === col("__src"), "left_anti")
        .localCheckpoint()
    else null
    var r = v0.select(col("__v"), (lit(1.0) / col("__nn")).as("__r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val prev = r
      val contrib = share.join(r, col("__src") === col("__v"))
        .select(col("__dst"),
          floor(col("__r") * col("__s") * lit(1e9) + lit(0.5)).cast(LongType).as("__cq"))
        .groupBy(col("__dst")).agg(sum(col("__cq")).as("__cq"))
      val joined = v0.join(contrib, col("__v") === col("__dst"), "left")
      // eager checkpoint = this round's materialization barrier
      r = (if (!danglingRedistribute)
        joined.select(col("__v"),
          (lit(1.0 - damping) / col("__nn")
            + lit(damping) * coalesce(col("__cq"), lit(0L)).cast(DoubleType) / lit(1e9))
            .as("__r"))
      else {
        // quantized dangling mass: a 1-row broadcast, never a shuffle
        val dq = r.join(dangling.withColumnRenamed("__v", "__dv"),
            col("__v") === col("__dv"), "left_semi")
          .agg(coalesce(sum(floor(col("__r") * lit(1e9) + lit(0.5)).cast(LongType)),
            lit(0L)).as("__dq"))
        joined.crossJoin(broadcast(dq))
          .select(col("__v"),
            (lit(1.0 - damping) / col("__nn")
              + lit(damping) * (coalesce(col("__cq"), lit(0L)).cast(DoubleType) / lit(1e9)
                + col("__dq").cast(DoubleType) / lit(1e9) / col("__nn")))
              .as("__r"))
      }).localCheckpoint()
      // prev's blocks are unreachable once this round materialized its
      // own — release NOW, not at ContextCleaner GC time (Checkpoints)
      Checkpoints.release(prev)
    }
    share.unpersist(blocking = false) // safe: r is a flat checkpointed scan
    Checkpoints.release(dangling) // iteration-only; r no longer needs it
    r.select(col("__v").as(nodeCol), col("__r").as("pagerank"))
  }

  /** Personalized (topic-sensitive) PageRank — Haveliwala 2002: the
    * teleport distribution concentrates on a TOPIC SET S instead of
    * being uniform, so authority flows from the topic outward:
    * r₀(v) = t(v); r_{t+1}(v) = (1−d)·t(v) + d·Σ contrib(v), with
    * t(v) = 1/|S| for v ∈ S and 0 elsewhere. The curation use: score
    * sources by their link-proximity to a trusted seed set rather than
    * by global popularity. Nodes unreachable from S (and outside it)
    * score exactly 0. Dangling mass is dropped (document sinks don't
    * recycle into the topic) — compose with the dangling option of
    * [[pageRank]] if the stochastic form is ever needed.
    *
    * Same engine-parity contract as [[pageRank]] (per-edge integer
    * quantization before sums) and the same scale shape: the teleport
    * relation is |V| rows built once (broadcast-joined against the
    * topic set), each iteration one edge-vs-|V|-row hash join + one
    * map-side-combined agg, iteration state eager-localCheckpointed.
    * `topic` must hold `nodeCol`; non-positive-weight edges drop. */
  def pageRankPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
                           wCol: String, nodes: DataFrame, nodeCol: String,
                           topic: DataFrame, iters: Int = 3,
                           damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    // an empty topic set would zero the teleport vector (non-ANSI double
    // division by zero yields NULL, and with |topic| = 0 every node's
    // teleport share is 0), silently emitting all-zero/NULL ranks — fail
    // fast like iters/damping. NOTE: this is the one EAGER Spark job in
    // an otherwise lazy operator library (isEmpty runs a 1-row take at
    // construction time); acceptable because topic sets are small and
    // the check guards every downstream iteration.
    require(!topic.isEmpty, "topic relation must be non-empty")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(wCol).cast(DoubleType).as("__w"))
      .filter(col("__w") > 0.0)
    val outw = e.groupBy(col("__src")).agg(sum(col("__w")).as("__wout"))
    val share = e.join(outw, Seq("__src"))
      .select(col("__src"), col("__dst"), (col("__w") / col("__wout")).as("__s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ns = topic.agg(count(lit(1)).as("__ns"))
    val tvec = nodes.select(col(nodeCol).as("__v"))
      .join(broadcast(topic.select(col(nodeCol).as("__tv"))),
        col("__v") === col("__tv"), "left")
      .crossJoin(broadcast(ns))
      .select(col("__v"),
        when(col("__tv").isNotNull, lit(1.0) / col("__ns"))
          .otherwise(lit(0.0)).as("__t"))
      .localCheckpoint()
    var r = tvec.select(col("__v"), col("__t").as("__r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val prev = r
      val contrib = share.join(r, col("__src") === col("__v"))
        .select(col("__dst"),
          floor(col("__r") * col("__s") * lit(1e9) + lit(0.5)).cast(LongType).as("__cq"))
        .groupBy(col("__dst")).agg(sum(col("__cq")).as("__cq"))
      r = tvec.join(contrib, col("__v") === col("__dst"), "left")
        .select(col("__v"),
          (lit(1.0 - damping) * col("__t")
            + lit(damping) * coalesce(col("__cq"), lit(0L)).cast(DoubleType) / lit(1e9))
            .as("__r"))
        .localCheckpoint()
      Checkpoints.release(prev) // superseded the moment r materialized
    }
    share.unpersist(blocking = false)
    Checkpoints.release(tvec) // iteration-only teleport relation
    r.select(col("__v").as(nodeCol), col("__r").as("ppr"))
  }

  /** Weighted HITS (Kleinberg): hub and authority scores, fixed
    * iteration count — the bipartite-quality companion to [[pageRank]]
    * (a good hub links to good authorities; a good authority is linked
    * from good hubs). Per iteration:
    * a(v) = Σ_{(u,v)∈E} w·h(u), then h(u) = Σ_{(u,v)∈E} w·a(v),
    * each L1-normalized.
    *
    * Engine parity: per-edge contributions are quantized to integers
    * (floor(x·1e9 + 0.5)) before the per-node sums, and normalization
    * divides by the INTEGER total of those per-node integer sums — so
    * every score is an exact ratio of two integers, independent of
    * partitioning and addition order, and drift cannot compound across
    * iterations.
    *
    * Scale shape: identical to [[pageRank]] — each half-step is one
    * hash join of the edge relation against the |V|-row score relation
    * plus one map-side-combined aggregation; the edge relation is
    * persisted once and reused every iteration; score relations are
    * |V| rows, materialized via eager `localCheckpoint` per half-step
    * (see [[pageRank]] for why persist+release cycles are NOT
    * equivalent — the unpersist re-cache churn forced chained edge-join
    * recomputes, 5× measured on this operator). The per-half-step sums
    * relation feeds both the grand-total agg and the normalization
    * join; it is persisted only within the half-step and safely
    * released once the checkpointed output exists. Nodes with no
    * in-edges (out-edges) get authority (hub) 0 — never null. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
           nodes: DataFrame, nodeCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(wCol).cast(DoubleType).as("__w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val v0 = nodes.select(col(nodeCol).as("__v"))
    // one half-step: score the `out` side by joining the edge relation
    // against the current opposite-side relation, quantize per edge,
    // sum per node, then L1-normalize by the integer grand total. The
    // per-node sums relation feeds BOTH the grand-total agg and the
    // normalization join, so it is persisted for the half-step's
    // lifetime — without the pin the dominant edge-join shuffle would
    // run twice per half-step — and released once the checkpointed
    // output exists (nothing references its plan after the cut).
    def halfStep(cur: DataFrame, joinSide: String, outSide: String): DataFrame = {
      val sums = e.join(cur, col(joinSide) === col("__v"))
        .select(col(outSide).as("__n"),
          floor(col("__x") * col("__w") * lit(1e9) + lit(0.5)).cast(LongType).as("__cq"))
        .groupBy(col("__n")).agg(sum(col("__cq")).as("__sq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val tot = sums.agg(sum(col("__sq")).as("__tq"))
      val out = v0.join(sums, col("__v") === col("__n"), "left")
        .crossJoin(broadcast(tot))
        .select(col("__v"),
          when(col("__tq").isNull || col("__tq") === 0L, lit(0.0))
            .otherwise(coalesce(col("__sq"), lit(0L)).cast(DoubleType)
              / col("__tq").cast(DoubleType))
            .as("__x"))
        .localCheckpoint() // eager: the half-step's materialization barrier
      sums.unpersist(blocking = false)
      out
    }
    var h = v0.select(col("__v"), lit(1.0).as("__x")).localCheckpoint()
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val (ph, pa) = (h, a)
      a = halfStep(h, "__src", "__dst")
      Checkpoints.release(pa) // a_{t-1} unreachable once a_t exists
      h = halfStep(a, "__dst", "__src")
      Checkpoints.release(ph) // h_{t-1} likewise (final h/a stay live)
    }
    val out = h.select(col("__v"), col("__x").as("hub"))
      .join(a.select(col("__v"), col("__x").as("authority")), Seq("__v"))
      .select(col("__v").as(nodeCol), col("hub"), col("authority"))
    e.unpersist(blocking = false) // safe: h/a are flat checkpointed scans
    out
  }

  /** k-core of an undirected graph: the maximal subgraph where every
    * vertex keeps degree ≥ k — the standard peel: drop under-degree
    * vertices, recompute degrees on the induced subgraph, repeat to
    * fixpoint. On the near-dup graph the 2-core is exactly the set of
    * documents sitting in CYCLES of similarity (template families);
    * chain-of-weak-ties structures peel away.
    *
    * Scale shape: each round is one degree aggregation + one semi-join
    * pair over the shrinking edge relation (all keyed on vertices),
    * with lineage cut per round (localCheckpoint — the connected-
    * components lesson: plan growth, not compute, is what kills
    * iterative graph jobs). Rounds are bounded by the peeling depth
    * (≤ max degree, tiny in practice); the driver sees one COUNT per
    * round, never data. Returns the core's vertices with their core
    * degrees. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int): DataFrame = {
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast(LongType).as("u"),
        greatest(col(srcCol), col(dstCol)).cast(LongType).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    // one count PER ROUND: the previous round's cardinality carries
    // forward (the checkpoint is immutable), so the fixpoint test costs
    // a single job on the new relation, not a recount of the old one
    var before = e.count()
    var done = before == 0
    while (!done) {
      val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("x"))
      val next = e
        .join(keep.select(col("x").as("u")), "u", "left_semi")
        .join(keep.select(col("x").as("v")), "v", "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
      val after = next.count()
      Checkpoints.release(e) // the peeled round's blocks are superseded
      e = next
      done = after == before || after == 0
      before = after
    }
    e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("core_degree"))
      .select(col("x").as("node"), col("core_degree"))
  }

  /** Triangle census + global clustering coefficient of an undirected
    * graph — the clique-density check a curator reads on the near-dup
    * graph (template families are cliques; a low coefficient says the
    * transitive-closure dedup is merging through weak ties).
    *
    * Scale shape: the classic DEGREE-ORDERED orientation — every edge
    * points from its lower-(degree, id) endpoint, so wedge pairs
    * generate only at each triangle's lowest-degree corner. That bounds
    * the self-join fan-out by Σ d_out² with d_out ≤ O(√m) on any graph
    * (a hub of degree d contributes d wedges, not d²), which is the
    * difference between counting triangles on a power-law near-dup
    * graph and materializing a hub's quadratic neighborhood. Three
    * hash joins, all keyed on vertices; the edge relation is persisted
    * once and shared by degrees, orientation, and closure. The count
    * and coefficient are pure integer arithmetic until one final
    * division — engine-exact. Returns one row
    * (n_nodes, n_edges, n_triangles, clustering_coeff). */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast(LongType).as("u"),
        greatest(col(srcCol), col(dstCol)).cast(LongType).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dt"))
    val wedges = oriented.select(col("s"), col("t").as("w1"), col("dt").as("d1"))
      .join(oriented.select(col("s"), col("t").as("w2"), col("dt").as("d2")), "s")
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("w1") < col("w2")))
    val tri = wedges.join(e,
      least(col("w1"), col("w2")) === col("u") &&
        greatest(col("w1"), col("w2")) === col("v"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        sum(col("d") * (col("d") - 1)).as("__w2")))
    val out = counts.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        when(col("__w2") > 0,
          round(lit(6.0) * col("n_triangles") / col("__w2"), 6))
          .otherwise(lit(0.0)).as("clustering_coeff"))
      .localCheckpoint()
    e.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    out
  }
}

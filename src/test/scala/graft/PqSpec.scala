package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val m = 2
  private val subLen = dims / m

  /** Deterministic unit-scale corpus: 24 vectors in [-1, 1). */
  private def corpus = (0L until 24L).map { i =>
    (i, Array.tabulate(dims)(d => (((i * 7 + d * 3) % 17) - 8).toFloat / 8f))
  }.toDF("vec_id", "embedding")

  private val query: Seq[Double] = (0 until dims).map(d => ((d % 5) - 2) / 4.0)

  test("codebooks are partitioning-independent (quantized integer means)") {
    val a = Pq.codebooks(corpus, "vec_id", "embedding", m, dims,
      centroidStep = 6, iters = 2).orderBy("sub", "cid")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    val b = Pq.codebooks(corpus.repartition(7), "vec_id", "embedding", m, dims,
      centroidStep = 6, iters = 2).orderBy("sub", "cid")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    assert(a.nonEmpty && a.sameElements(b),
      "trained codebooks must be bit-identical under any input partitioning")
  }

  test("codebooks train on an offset id space (min-anchored seed lattice)") {
    val offset = (0L until 24L).map { i =>
      (500000L + 3 * i,
        Array.tabulate(dims)(d => (((i * 7 + d * 3) % 17) - 8).toFloat / 8f))
    }.toDF("vec_id", "embedding")
    val books = Pq.codebooks(offset, "vec_id", "embedding", m, dims,
      centroidStep = 6, iters = 1)
    assert(books.select("cid").distinct().count() > 1,
      "offset ids must seed a real codebook, not zero/one codewords")
    assert(books.groupBy("sub").count().count() == m,
      "every subspace must carry codewords")
  }

  test("codes: one entry per subspace, codeword ids from the codebook") {
    val books = Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 6, 1)
    val cds = Pq.codes(corpus, "vec_id", "embedding", books, subLen).collect()
    assert(cds.length == 24)
    val valid = books.select("cid").as[Long].collect().toSet
    cds.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length == m, s"expected $m codes, got $cs")
      assert(cs.forall(valid), s"code outside the codebook: $cs")
    }
  }

  test("ADC equals exact squared L2 when every vector is its own codeword") {
    // centroidStep=1, iters=0: the codebook IS the corpus, assignment is
    // exact (d2=0 to your own slice), so the ADC total telescopes to the
    // true rounded sub-distance sum — pins the table-lookup mechanics.
    val adc = Pq.adcTopK(corpus, "vec_id", "embedding", query, m, dims,
      centroidStep = 1, iters = 0, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val exact = corpus.select(col("vec_id"), (0 until dims).map { i =>
      val d = element_at(col("embedding"), i + 1).cast(DoubleType) - lit(query(i))
      d * d
    }.reduce(_ + _).as("d2")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(adc.keySet == exact.keySet)
    adc.foreach { case (id, d) =>
      // per-subspace rounding to 6 decimals perturbs the total by < 1e-5
      assert(math.abs(d - exact(id)) < 1e-5,
        s"vec $id: adc=$d exact=${exact(id)}")
    }
  }

  test("ADC ranking tracks the exact ranking on a trained codebook") {
    val adcTop = Pq.adcTopK(corpus, "vec_id", "embedding", query, m, dims,
      centroidStep = 4, iters = 2, k = 5).collect().map(_.getLong(0)).toSet
    val exactTop = Similarity.bruteForceTopK(
      corpus, "vec_id", "embedding", Similarity.vecLit(query), 5)
      .collect().map(_.getLong(0)).toSet
    // coarse 8-bit-ish codebooks on 24 vectors: expect real but imperfect
    // overlap — an empty intersection would mean scoring is broken
    assert(adcTop.intersect(exactTop).nonEmpty,
      s"ADC top-5 $adcTop shares nothing with exact top-5 $exactTop")
  }

  test("assignment: literal-codebook path is join-free; join form broadcasts + packed-mins") {
    val books = Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 6, 1)
    // fast path: the codebook is a literal inside one native projection —
    // the |corpus|·m·k pair relation never exists (file-backed input so
    // ConvertToLocalRelation cannot fold the projection away)
    val dir = graft.io.TempDirs.registered("graft-pqassign-plan").toString
    corpus.write.mode("overwrite").parquet(dir)
    val corpusF = spark.read.parquet(dir)
    val plan = Pq.assign(corpusF, "vec_id", "embedding", books, subLen)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pq_assign"), s"native assignment expression missing:\n$plan")
    assert(!plan.contains("Join"), s"literal-codebook assignment must be join-free:\n$plan")
    assert(!plan.contains("Window"),
      s"assignment must never window-sort the corpus:\n$plan")

    // join form (parity reference / oversized-malformed route)
    val fb = Pq.assignJoin(corpus, "vec_id", "embedding", books, subLen)
      .queryExecution.executedPlan.toString
    assert(fb.contains("BroadcastNestedLoopJoin") || fb.contains("BroadcastExchange"),
      s"the codebook must broadcast:\n$fb")
    assert(fb.contains("partial_min"),
      s"the argmin must combine map-side (packed long min):\n$fb")
    assert(!fb.contains("Window"), s"never a window sort:\n$fb")
  }

  test("assignment: literal-codebook path bit-identical to the join form, edge rows included") {
    val books = Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 6, 2)
    // edges: null vector (21), null element inside sub 0's slice (22),
    // plus one duplicated row (both forms collapse identical duplicates)
    val edge = corpus.withColumn("embedding",
      when(col("vec_id") === 21L, lit(null).cast("array<float>"))
        .when(col("vec_id") === 22L,
          expr("transform(embedding, (x, i) -> IF(i = 2, CAST(NULL AS FLOAT), x))"))
        .otherwise(col("embedding")))
    val emb = edge.union(edge.filter(col("vec_id") === 5L))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "sub", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))))
        .sortBy(t => (t._1, t._2)).toSeq
    val fast = Pq.assign(emb, "vec_id", "embedding", books, subLen)
    assert(fast.queryExecution.analyzed.toString.contains("pq_assign"),
      "fixture must exercise the literal-codebook path")
    val join = Pq.assignJoin(emb, "vec_id", "embedding", books, subLen)
    assert(canon(fast) == canon(join))
    val got = canon(fast)
    assert(got.count(_._1 == 5L) == m, "duplicate rows must collapse in both forms")
    assert(got.filter(_._1 == 21L).forall(_._3 == null), "null vector -> null cells")
    assert(got.find(t => t._1 == 22L && t._2 == 0).get._3 == null
      && got.find(t => t._1 == 22L && t._2 == 1).get._3 != null,
      "null element poisons only its own subspace")
    // a too-short vector is out of contract: BOTH forms fail fast
    // (ANSI element_at in the join form; the same bounds raise natively)
    val short = corpus.withColumn("embedding",
      when(col("vec_id") === 23L, slice(col("embedding"), 1, 5))
        .otherwise(col("embedding")))
    intercept[Exception] {
      Pq.assign(short, "vec_id", "embedding", books, subLen).collect()
    }
    intercept[Exception] {
      Pq.assignJoin(short, "vec_id", "embedding", books, subLen).collect()
    }

    // file-backed round covers the CODEGEN path, not just eval()
    val dir = graft.io.TempDirs.registered("graft-pqassign-parity").toString
    edge.write.mode("overwrite").parquet(dir)
    val embF = spark.read.parquet(dir)
    assert(canon(Pq.assign(embF, "vec_id", "embedding", books, subLen)) ==
      canon(Pq.assignJoin(embF, "vec_id", "embedding", books, subLen)))
  }

  test("codebooks one-pass Lloyd round: bit-identical to the explode form, slim plan") {
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Int, Option[Long], Seq[Option[Double]])] =
      df.collect().map { r =>
        val cid = if (r.isNullAt(1)) None else Some(r.getLong(1))
        val cvec = if (r.isNullAt(2)) Seq.empty[Option[Double]]
          else r.getSeq[Any](2).map(x => Option(x).map(_.asInstanceOf[Double])).toSeq
        (r.getInt(0), cid, cvec)
      }.toSet

    // two trained rounds on a well-formed corpus: bit-identical
    assert(canon(Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 6, 2)) ==
      canon(Pq.codebooksExplode(corpus, "vec_id", "embedding", m, dims, 6, 2)))

    // edges: null vec (21 — its slices are null, contributes nothing in
    // either form), null element in sub 0's slice (22 — NULL cell for
    // that sub only; counts toward its group, drops out of the poisoned
    // component's sum). Training parity is contracted over unique-(id,
    // vec) corpora: the one-pass form weights duplicate rows by
    // multiplicity while the explode form collapses them (the oracle's
    // training SQL partitions by vec_id alone, so duplicate-bearing
    // corpora are outside the training contract either way; Pq.assign
    // keeps its pinned collapse).
    val edge = corpus.withColumn("embedding",
      when(col("vec_id") === 21L, lit(null).cast("array<float>"))
        .when(col("vec_id") === 22L,
          expr("transform(embedding, (x, i) -> IF(i = 2, CAST(NULL AS FLOAT), x))"))
        .otherwise(col("embedding")))
    val one = canon(Pq.codebooks(edge, "vec_id", "embedding", m, dims, 6, 1))
    assert(one == canon(Pq.codebooksExplode(edge, "vec_id", "embedding", m, dims, 6, 1)))
    assert(one.exists(t => t._1 == 0 && t._2.isEmpty),
      "sub 0's NULL-cell codeword (null-element vector) must survive in both forms")

    // file-backed round covers the CODEGEN path, not just eval()
    val dir = graft.io.TempDirs.registered("graft-pqbooks-onepass").toString
    corpus.write.mode("overwrite").parquet(dir)
    val corpusF = spark.read.parquet(dir)
    assert(canon(Pq.codebooks(corpusF, "vec_id", "embedding", m, dims, 6, 2)) ==
      canon(Pq.codebooksExplode(corpusF, "vec_id", "embedding", m, dims, 6, 2)))

    // plan shape: the one-pass round explodes only (sub, cell, slice)
    // ABOVE the duplicate collapse and carries strictly fewer exchanges
    // than the explode form's (sub, cell, pos) re-aggregation chain
    val books0 = Pq.codebooks(corpusF, "vec_id", "embedding", m, dims, 6, 1)
    val fastPlan = Pq.codebooksRound(corpusF, "vec_id", "embedding", books0,
        subLen, onePass = true).queryExecution.executedPlan.toString
    val slowPlan = Pq.codebooksRound(corpusF, "vec_id", "embedding", books0,
        subLen, onePass = false).queryExecution.executedPlan.toString
    assert(fastPlan.contains("pq_assign"), s"one-pass round must assign natively:\n$fastPlan")
    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges(fastPlan) < exchanges(slowPlan),
      s"one-pass round must drop an exchange:\nfast=$fastPlan\nslow=$slowPlan")
  }

  test("adcTopK plans the final top-k as TakeOrderedAndProject") {
    val plan = Pq.adcTopK(corpus, "vec_id", "embedding", query, m, dims, 6, 1, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }

  test("IVF-PQ with an all-cells probe degrades to plain ADC (routing never rescores)") {
    val full = Pq.adcTopK(corpus, "vec_id", "embedding", query, m, dims,
      centroidStep = 4, iters = 1, k = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // nprobe >= cell count: the coarse probe filters nothing, so the
    // ADC ranking must come through untouched — pins that the probe
    // only CUTS candidates and the scoring path is shared
    val probed = Pq.ivfPqTopK(corpus, "vec_id", "embedding", query,
      coarseStep = 6, coarseIters = 1, nprobe = 100, m = m, dims = dims,
      pqStep = 4, pqIters = 1, k = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probed == full,
      s"all-cells IVF-PQ diverged from ADC:\n  $probed\n  $full")
  }

  test("narrow IVF-PQ probe returns a subset of the all-cells ranking's ids") {
    val all = Pq.ivfPqTopK(corpus, "vec_id", "embedding", query,
      coarseStep = 6, coarseIters = 1, nprobe = 100, m = m, dims = dims,
      pqStep = 4, pqIters = 1, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val narrow = Pq.ivfPqTopK(corpus, "vec_id", "embedding", query,
      coarseStep = 6, coarseIters = 1, nprobe = 1, m = m, dims = dims,
      pqStep = 4, pqIters = 1, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(narrow.nonEmpty && narrow.length < 24,
      s"nprobe=1 on 4 seed cells should cut the candidate set: ${narrow.length}")
    narrow.foreach { case (id, d) =>
      assert(all(id) == d, s"vec $id scored $d probed but ${all(id)} unprobed")
    }
  }

  test("ST19: streamed store partition-prunes the probe; a drained checkpoint re-run is a no-op") {
    val coarse = Pq.codebooks(corpus, "vec_id", "embedding", 1, dims, 6, 1)
      .select(col("cid"), col("cvec"))
    val books = Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 4, 1)
    val in = graft.io.TempDirs.registered("graft-st19spec-in").toString
    val idx = graft.io.TempDirs.registered("graft-st19spec-idx").toString
    val ckpt = graft.io.TempDirs.registered("graft-st19spec-ckpt").toString
    corpus.filter(col("vec_id") < 12).coalesce(1).write.mode("append").parquet(in)
    corpus.filter(col("vec_id") >= 12).coalesce(1).write.mode("append").parquet(in)
    def drain(): Unit = graft.streaming.Streaming.runStreamingAnnIndex(
      graft.streaming.Streaming.parquetSource(spark, in, corpus.schema, 1),
      "vec_id", "embedding", coarse, books, subLen, idx, ckpt)
    drain()
    val topk = graft.streaming.Streaming.annIndexTopK(
      spark, idx, coarse, books, subLen, query, nprobe = 2, k = 24)
    val plan = topk.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).nonEmpty,
      s"the probe must prune cell partitions at the file index:\n$plan")
    val first = topk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(first.nonEmpty)
    // all vectors delivered + an all-cells probe => identical to batch IVF-PQ
    val batch = Pq.ivfPqTopK(corpus, "vec_id", "embedding", query,
      coarseStep = 6, coarseIters = 1, nprobe = 100, m = m, dims = dims,
      pqStep = 4, pqIters = 1, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val streamedAll = graft.streaming.Streaming.annIndexTopK(
      spark, idx, coarse, books, subLen, query, nprobe = 100, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(streamedAll == batch,
      s"streamed store must converge to the batch computation:\n$streamedAll\n$batch")
    // re-drain on the same checkpoint with no new files: store unchanged
    def storeFiles() = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        Option(f.listFiles).map(_.toSeq.flatMap(walk)).getOrElse(Seq((f.getPath, f.length)))
      walk(new java.io.File(idx)).sortBy(_._1)
    }
    val before = storeFiles()
    drain()
    assert(storeFiles() == before,
      "a drained checkpoint must not rewrite or duplicate the store")
    // UPDATE: re-deliver id 0 carrying id 5's embedding in a new batch.
    // Latest-batch-wins resolution => id 0 now codes identically to id 5:
    // equal ADC scores, and still exactly one row per id (no doubling).
    val v5 = corpus.filter(col("vec_id") === 5L)
      .select(lit(0L).as("vec_id"), col("embedding"))
    v5.coalesce(1).write.mode("append").parquet(in)
    drain()
    val updated = graft.streaming.Streaming.annIndexTopK(
      spark, idx, coarse, books, subLen, query, nprobe = 100, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(updated.size == 24, s"update must not duplicate ids: ${updated.size}")
    assert(updated(0L) == updated(5L),
      s"updated id 0 must score as id 5: ${updated(0L)} vs ${updated(5L)}")
    assert(updated(0L) != streamedAll.toMap.apply(0L),
      "the stale code must not survive the update")
    // COMPACTION: drops the superseded row (one row per id), preserves
    // every score, and converges when re-run
    graft.streaming.Streaming.compactAnnIndex(spark, idx)
    val store = spark.read.parquet(idx)
    assert(store.count() == 24 && store.select("id").distinct().count() == 24,
      "compaction must leave exactly one row per id")
    val afterCompact = graft.streaming.Streaming.annIndexTopK(
      spark, idx, coarse, books, subLen, query, nprobe = 100, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(afterCompact == updated, "compaction must not change any score")
    graft.streaming.Streaming.compactAnnIndex(spark, idx)
    assert(spark.read.parquet(idx).count() == 24, "compaction must be idempotent")
  }

  test("ST19: cross-cell update auto-compacts at the threshold and heals the stale probe") {
    // The probe contract's one hole: an update that MOVES an id across
    // coarse cells strands a stale row in the old cell, and a probe
    // hitting only that cell serves it. This drives the hole end-to-end:
    // stale read demonstrated, then the drain-time threshold fires
    // compactAnnIndex automatically and the same narrow probe heals.
    val coarse = Pq.codebooks(corpus, "vec_id", "embedding", 1, dims, 6, 1)
      .select(col("cid"), col("cvec"))
    val books = Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 4, 1)
    val in = graft.io.TempDirs.registered("graft-st19auto-in").toString
    val idx = graft.io.TempDirs.registered("graft-st19auto-idx").toString
    val ckpt = graft.io.TempDirs.registered("graft-st19auto-ckpt").toString
    def drain(threshold: Long): Unit = graft.streaming.Streaming.runStreamingAnnIndex(
      graft.streaming.Streaming.parquetSource(spark, in, corpus.schema, 1),
      "vec_id", "embedding", coarse, books, subLen, idx, ckpt,
      autoCompactSupersededPerCell = threshold)
    corpus.coalesce(1).write.mode("append").parquet(in)
    drain(Long.MaxValue)
    // two ids in DIFFERENT coarse cells; re-deliver a with b's embedding
    val cells = Similarity.ivfAssignTo(corpus, "vec_id", "embedding", coarse)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = cells.keys.min
    val b = cells.collectFirst { case (id, c) if c != cells(a) => id }.get
    corpus.filter(col("vec_id") === b)
      .select(lit(a).as("vec_id"), col("embedding"))
      .coalesce(1).write.mode("append").parquet(in)
    drain(Long.MaxValue) // update lands, no compaction yet: 25 rows
    assert(spark.read.parquet(idx).count() == 25)
    // aim the probe at a's OLD cell only (query = that cell's centroid)
    val oldCellVec: Seq[Double] = coarse.filter(col("cid") === cells(a))
      .head.getSeq[Double](1)
    def narrowProbe() = graft.streaming.Streaming.annIndexTopK(
      spark, idx, coarse, books, subLen, oldCellVec, nprobe = 1, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(narrowProbe().contains(a),
      "pre-compaction, the old cell's stale row IS served — the documented hole")
    // below threshold: one superseded row in the old cell, threshold 2 -> no-op
    drain(2L)
    assert(spark.read.parquet(idx).count() == 25,
      "a drain below the superseded-per-cell threshold must not compact")
    // at threshold: the drain itself (no new data needed) fires compaction
    drain(1L)
    val store = spark.read.parquet(idx)
    assert(store.count() == 24 && store.select("id").distinct().count() == 24,
      "auto-compaction must leave exactly one row per id")
    assert(!narrowProbe().contains(a),
      "post-compaction the old cell no longer serves the moved id")
    val full = graft.streaming.Streaming.annIndexTopK(
      spark, idx, coarse, books, subLen, query, nprobe = 100, k = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(full(a) == full(b),
      s"the auto-compacted store must serve the updated code: ${full(a)} vs ${full(b)}")
  }

  test("ST19: same-cell re-delivery never fires auto-compaction (zero staleness hazard)") {
    // Same-cell updates are already resolved latest-batch-wins inside
    // the probed partition, so they carry no staleness hazard — a
    // same-cell-update-heavy stream must NOT pay a full-store rewrite
    // even at threshold 1 (the trigger counts only rows whose id MOVED
    // to a different cell).
    val coarse = Pq.codebooks(corpus, "vec_id", "embedding", 1, dims, 6, 1)
      .select(col("cid"), col("cvec"))
    val books = Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 4, 1)
    val in = graft.io.TempDirs.registered("graft-st19same-in").toString
    val idx = graft.io.TempDirs.registered("graft-st19same-idx").toString
    val ckpt = graft.io.TempDirs.registered("graft-st19same-ckpt").toString
    def drain(threshold: Long): Unit = graft.streaming.Streaming.runStreamingAnnIndex(
      graft.streaming.Streaming.parquetSource(spark, in, corpus.schema, 1),
      "vec_id", "embedding", coarse, books, subLen, idx, ckpt,
      autoCompactSupersededPerCell = threshold)
    corpus.coalesce(1).write.mode("append").parquet(in)
    drain(Long.MaxValue)
    // re-deliver an id with its OWN embedding: same vector -> same cell
    val a = corpus.select(min(col("vec_id"))).head.getLong(0)
    corpus.filter(col("vec_id") === a)
      .coalesce(1).write.mode("append").parquet(in)
    drain(1L) // threshold 1, but the superseded row is same-cell -> no-op
    assert(spark.read.parquet(idx).count() == 25,
      "same-cell supersession must not trigger a full-store rewrite")
    // and the store still serves the latest batch's code for the id
    val topk = graft.streaming.Streaming.annIndexTopK(
      spark, idx, coarse, books, subLen, query, nprobe = 100, k = 24)
    assert(topk.filter(col("id") === a).count() == 1)
  }

  test("indexed IVF-PQ equals the inline composition and partition-prunes the probe") {
    val idx = graft.io.TempDirs.registered("pqspec-idx").toString
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding",
      coarseStep = 6, coarseIters = 1, m = m, dims = dims,
      pqStep = 6, pqIters = 1, indexRoot = idx)
    val indexed = Pq.ivfPqTopKIndexed(spark, idx, "vec_id", query,
      subLen = subLen, nprobe = 2, k = 5)
    val inline = Pq.ivfPqTopK(corpus, "vec_id", "embedding", query,
      coarseStep = 6, coarseIters = 1, nprobe = 2, m = m, dims = dims,
      pqStep = 6, pqIters = 1, k = 5)
    val a = indexed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = inline.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, s"indexed $a != inline $b")
    // the codes scan must prune to the probed cells at file-listing
    // time — the cell predicate belongs in PartitionFilters, and the
    // scan must NOT carry a post-scan Filter on the partition column
    val scan = indexed.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("cell") && !scan.contains("PartitionFilters: []"),
      s"probe should prune by cell partition, got scan line: $scan")
  }

  test("distortion: Lloyd training never increases a subspace's MSE; exact-codebook MSE is zero") {
    def mse(iters: Int): Map[Int, Double] =
      Pq.distortion(corpus, "vec_id", "embedding",
        Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 6, iters), subLen)
        .collect().map(r => (r.getInt(0), r.getDouble(2))).toMap
    val before = mse(0)
    val after = mse(2)
    (0 until m).foreach { s =>
      assert(after(s) <= before(s) + 1e-4, // 6-dp quantized means can wobble a rounded MSE by ~1e-6
        s"sub $s: training worsened MSE ${before(s)} -> ${after(s)}")
    }
    // codebook = corpus => every vector quantizes to itself, MSE 0
    val exact = Pq.distortion(corpus, "vec_id", "embedding",
      Pq.codebooks(corpus, "vec_id", "embedding", m, dims, 1, 0), subLen)
      .collect().map(_.getDouble(2))
    assert(exact.forall(_ == 0.0), s"self-codebook MSE must be zero: ${exact.toSeq}")
  }

  test("out-of-contract codebook (cid or scale) fails fast") {
    val badCid = Seq((0, -1L, Array.fill(subLen)(0.0)))
      .toDF("sub", "cid", "cvec")
    intercept[Exception] {
      Pq.assign(corpus, "vec_id", "embedding", badCid, subLen).collect()
    }
    val badScale = Seq((0, 0L, Array.fill(subLen)(99.0)))
      .toDF("sub", "cid", "cvec")
    intercept[Exception] {
      Pq.assign(corpus, "vec_id", "embedding", badScale, subLen).collect()
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Index, Similarity}

/** Plan-shape pins for the scale claims: these assert the PHYSICAL plan
  * properties the 100 TB design depends on, so a refactor that silently
  * reintroduces a shuffle/sort/nested-loop fails the suite, not a
  * production run.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("AQE splits the hot partition of a skewed sort-merge join (skew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1") // and keep it SMJ at runtime
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key carrying ~2MB of incompressible-ish pad against a uniform tail
      val left = ((1 to 20000).map(i => (1L, i)) ++ (2 to 50).map(i => (i.toLong, i)))
        .map { case (k, i) => (k, s"pad-$i-${i * 2654435761L}%-${i * 40503L}") }
        .toDF("k", "pad")
      val right = (1 to 50).map(i => (i.toLong, i)).toDF("k", "v")
      val j = left.join(right, "k")
      // collect() drives THIS Dataset's QueryExecution (a write would clone
      // it and leave the adaptive plan here unfinalized)
      assert(j.collect().length == 20049)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should mark the hot partition's join as skew-split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("contaminationReport never shuffles the corpus (broadcast probe)") {
    val corpus = (1L to 50L).map(i => (i, s"tok$i a b c d e f")).toDF("id", "text")
    val bench = Seq((99L, "a b c d")).toDF("id", "text")
    val plan = planOf(Curation.contaminationReport(corpus, bench, "id", "text", 3, 2))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$plan")
  }

  test("stratifiedSample is a broadcast join + filter — no corpus exchange") {
    val df = (1L to 50L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val rates = Seq(("a", 5000L), ("b", 1000L)).toDF("s", "rate_bp")
    val plan = planOf(Curation.stratifiedSample(df, "s", col("id"), rates, "x"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }

  test("epochize broadcasts the |strata|-row plan; the emitted corpus never shuffle-joins") {
    val df = (1L to 50L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
      .toDF("id", "s", "n_tok")
    val targets = Seq(("a", 900L), ("b", 50L)).toDF("s", "target_tokens")
    val plan = planOf(Curation.epochize(df, "s", col("id"), col("n_tok"), targets, "x"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the epoch plan table must broadcast onto the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must never be shuffled for the plan join:\n$plan")
    assert(plan.contains("Generate"),
      s"the copy fan-out must be a map-side explode, not a join:\n$plan")
  }

  test("mixture terminal stage: plan tables broadcast, corpus never shuffle-joins") {
    // the q_mixture_e2e composition — targets → epochize → packWindows:
    // every join in the chain must be a broadcast of a |sources|-row
    // plan table; the only full-width corpus exchange is the pack
    // window's per-group partitioning.
    val df = (1L to 60L).map(i => (i, "s" + i % 3, 10L)).toDF("id", "s", "toks")
    val targets = graft.operators.Curation
      .temperatureTargets(df, "s", col("toks"), 0.5, 5000L)
      .select("s", "target_tokens")
    val epoched = graft.operators.Curation
      .epochize(df, "s", col("id"), col("toks"), targets, "x")
      .withColumn("pack_id", col("epoch") * lit(1L << 40) + col("id"))
    val packed = graft.operators.Curation
      .packWindows(epoched, "s", "pack_id", col("toks"), 64L)
    val plan = planOf(packed)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus must never shuffle for a plan-table join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the mixture plan tables must broadcast:\n$plan")
    assert(plan.contains("Generate"),
      s"epoch fan-out must be a map-side explode:\n$plan")
  }

  test("tokenize-pack: merges apply as literals (no join); only the pack window keys an exchange") {
    // q_tokenize_pack = BPE-encode under collected merges → packWindows:
    // the merge table must reach the corpus as codegen'd literals, so the
    // final plan has NO join and exactly one keyed exchange (the pack
    // window's per-source partitioning; fanOut's round-robin is allowed).
    val plan = planOf(
      SparkEntry.queries("q_tokenize_pack")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("Join"),
      s"learned merges must be literals in the encode projection, never a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"only the pack window's per-source exchange may key-shuffle:\n$plan")
    assert(plan.contains("Generate"),
      s"window spans must explode map-side:\n$plan")
  }

  test("trainOrder: one (epoch, shard) hash exchange, map-side epoch fan-out, no global sort") {
    // the shard writer's shape: the ONLY corpus shuffle is the hash
    // partition a sharded write needs anyway; the within-shard order is a
    // per-partition sort (a rangepartitioning here would be a global sort
    // — the thing this operator exists to avoid)
    val docs = (1L to 200L).toDF("id")
    val plan = planOf(Curation.trainOrder(docs, "id", "pin", 3, 8))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"exactly one keyed exchange (epoch, shard):\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"no global sort — order is per (epoch, shard) partition:\n$plan")
    assert(plan.contains("Generate"),
      s"epoch fan-out must be a map-side explode, not a per-epoch rescan:\n$plan")
    assert(!plan.contains("Join"), s"no join anywhere in the shuffle plan:\n$plan")
  }

  test("curriculumAnneal: schedule applies map-side (no join), one aggregate exchange") {
    val docs = (1L to 100L).map(i => (i, "s", i / 100.0, 10L))
      .toDF("id", "source", "q", "n")
    val plan = planOf(Curation.curriculumAnneal(docs, "id", "source",
      col("q"), col("n"), 4, 0.2, 0.8))
    assert(!plan.contains("Join"),
      s"the (epoch, threshold) schedule is a literal explode, never a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"one corpus scan, one aggregate exchange:\n$plan")
    assert(plan.contains("Generate"), s"schedule fan-out must be map-side:\n$plan")
  }

  test("order-e2e: every join stays broadcast; the corpus never sort-merge-joins") {
    // the terminal data product (mixture E2E -> window units -> seeded
    // shard order): plan tables (targets, epoch plans) broadcast onto the
    // corpus, and the post-pack exchanges move window STUBS, so no stage
    // may fall back to a corpus-sized sort-merge join
    val plan = planOf(
      SparkEntry.queries("q_order_e2e")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side joins must broadcast:\n$plan")
    assert(plan.contains("Generate"),
      s"epoch/window fan-out stays a map-side explode:\n$plan")
  }

  test("fanOut contract: non-file-backed plans are returned unchanged, never force-shuffled") {
    // the scaladoc'd boundary (Tables.scala): fanOut reasons about file
    // scans only — an in-memory (e.g. localCheckpointed) corpus passes
    // through untouched and a caller needing fan-out repartitions itself
    val mem = (1L to 100L).toDF("id").localCheckpoint()
    assert(Tables.fanOut(mem) eq mem,
      "fanOut must be an identity for in-memory relations")
  }

  test("packShards plans exactly one Window (one shuffle + sort per group key)") {
    val df = (1L to 50L).map(i => ("g" + i % 3, i, 10L)).toDF("grp", "id", "tok")
    val plan = planOf(Curation.packShards(df, "grp", "id", col("tok"), 100L))
    assert("(?m)^\\s*\\+?-?\\s*Window ".r.findAllIn(plan).size <= 1
      || plan.split("Window").length == 2, s"expected a single Window:\n$plan")
  }

  test("ANN bucket layout partition-prunes: probe filter reads only probe partitions") {
    val dims = 8
    val emb = (1L to 64L).map(i =>
      (i, Array.tabulate(dims)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))).toDF("vec_id", "embedding")
    val dir = graft.io.TempDirs.registered("graft-ann-layout").toString
    // the documented 100 TB layout: bucket column -> partitioned write
    Similarity.withBuckets(emb, "embedding", 4, dims)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val q = (0 until dims).map(d => ((d * 37 % 19) - 9) / 10.0)
    val planes = Similarity.hyperplaneWeights(4, dims)
    val probes = Similarity.probeBuckets(Similarity.bucketOf(q, planes), 1)
    val scan = spark.read.parquet(dir).filter(col("bucket").isin(probes: _*))
    val plan = planOf(scan)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"probe filter must prune partitions:\n$plan")
    // the scan touches at most |probes| of the 16 possible bucket dirs
    val touched = scan.select(input_file_name()).distinct().collect()
      .map(_.getString(0).replaceAll("/[^/]*$", "")).distinct
    assert(touched.length <= probes.length,
      s"read ${touched.length} partition dirs for ${probes.length} probes")
  }

  test("streaming LSH postings store partition-prunes: probe reads only touched buckets") {
    import graft.io.TempDirs
    import graft.streaming.Streaming
    val in = TempDirs.registered("graft-st14plan-in").toString
    val sig = TempDirs.registered("graft-st14plan-sig").toString
    val out = TempDirs.registered("graft-st14plan-out").toString
    val ckpt = TempDirs.registered("graft-st14plan-ckpt").toString
    val docs = (1L to 40L).map(i =>
      (i, s"word$i alpha beta gamma delta epsilon tok${i % 7} zeta eta", 0L))
      .toDF("doc_id", "text", "seq")
    docs.coalesce(1).write.mode("append").parquet(in)
    val src = Streaming.parquetSource(spark, in, docs.schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingLshDedup(src, "doc_id", "text", "seq",
      shingleN = 3, numHashes = 16, rowsPerBand = 4, maxBucketSize = 100,
      threshold = 0.8, sigPath = sig, sinkPath = out, checkpointPath = ckpt,
      storeBuckets = 8)
    val bucketDirs = new java.io.File(sig).listFiles()
      .map(_.getName).filter(_.startsWith("__pbucket=")).sorted.toSeq
    assert(bucketDirs.length > 1,
      s"store should spread across bucket partitions: $bucketDirs")
    // the per-trigger probe shape: read the store pruned to touched buckets
    val probe = Seq(bucketDirs.head.stripPrefix("__pbucket=").toInt)
    val scan = spark.read.parquet(sig).filter(col("__pbucket").isin(probe: _*))
    val plan = planOf(scan)
    assert(plan.contains("PartitionFilters") && plan.contains("__pbucket"),
      s"probe filter must prune store partitions:\n$plan")
    // file-level pruning: the scan touches only the probed bucket dirs
    val touched = scan.select(input_file_name()).distinct().collect()
      .map(_.getString(0).replaceAll("/[^/]*$", "")).distinct
    assert(touched.length <= probe.length,
      s"read ${touched.length} partition dirs for ${probe.length} probed buckets")
  }

  test("dim-side filter dynamically prunes the partitioned fact scan (DPP)") {
    import graft.io.TempDirs
    val dir = TempDirs.registered("graft-dppplan").toString
    val fact0 = (1 to 200).map(i => (i.toLong, s"t${i % 5}", i * 1.0))
      .toDF("id", "ptype", "v")
    fact0.write.mode("overwrite").partitionBy("ptype").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the filter lives on a dim attribute the fact doesn't carry — only
    // DYNAMIC pruning can narrow the fact scan to the dim's survivors.
    // The dim must be storage-backed: a local relation's filter
    // constant-folds away before the PartitionPruning rule looks for it.
    val dimDir = TempDirs.registered("graft-dppplan-dim").toString
    (0 until 5).map(i => (s"t$i", if (i < 2) "keep" else "drop"))
      .toDF("ptype", "cat").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = fact.join(broadcast(dim.filter(col("cat") === "keep")), Seq("ptype"))
    assert(j.collect().length == 80) // t0: ids %5==0 (40), t1: %5==1 (40)
    val plan = j.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition-pruning filter:\n$plan")
  }

  test("runtime bloom filter from the dim filter reaches the fact side of a shuffle join") {
    import graft.io.TempDirs
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      // force a shuffle join (bloom injection doesn't apply to broadcasts
      // — the broadcast IS the filter there) and drop the 10GB
      // application-side floor so the toy fact qualifies; at warehouse
      // scale the floor is what keeps injection to scans worth filtering
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      val fdir = TempDirs.registered("graft-rf-fact").toString
      val ddir = TempDirs.registered("graft-rf-dim").toString
      (1 to 20000).map(i => (i.toLong % 500, s"pad-$i")).toDF("k", "pad")
        .write.mode("overwrite").parquet(fdir)
      (0L until 500L).map(i => (i, if (i < 10) "keep" else "drop"))
        .toDF("k", "cat").write.mode("overwrite").parquet(ddir)
      val fact = spark.read.parquet(fdir)
      val dim = spark.read.parquet(ddir).filter(col("cat") === "keep")
      val j = fact.join(dim, "k")
      assert(j.collect().length == 400) // 10 kept keys x 40 fact rows
      val plan = j.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("bloom_filter_agg"),
        s"the filtered dim side must build a runtime bloom filter:\n$plan")
      assert(plan.contains("might_contain"),
        s"the fact scan side must probe the bloom filter pre-shuffle:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("merge-state snapshot plans one scan per live version, not per bucket") {
    import graft.io.TempDirs
    import graft.streaming.Streaming
    val in = TempDirs.registered("graft-mergescan-in").toString
    val state = TempDirs.registered("graft-mergescan-state").toString
    val ckpt = TempDirs.registered("graft-mergescan-ckpt").toString
    val buckets = 8
    val cand = (0 until 40).map(i => s"k$i")
    val bOf = cand.toDF("key")
      .withColumn("b", pmod(hash(col("key")), lit(buckets)))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // trigger 0: three keys in three DISTINCT buckets; trigger 1: one key
    // in a fourth bucket — the manifest then spans 4 buckets over 2 live
    // versions, so a per-bucket reader would plan 4 scans
    val g0 = cand.foldLeft(Vector.empty[String])((acc, k) =>
      if (acc.size < 3 && !acc.exists(a => bOf(a) == bOf(k))) acc :+ k else acc)
    val k3 = cand.find(k => !g0.exists(a => bOf(a) == bOf(k))).get
    val d0 = g0.map(k => (k, 1L, s"v-$k")).toDF("key", "seq", "value")
    d0.coalesce(1).write.mode("append").parquet(in)
    Streaming.runIncrementalMerge(
      Streaming.parquetSource(spark, in, d0.schema, maxFilesPerTrigger = 1),
      Seq("key"), "seq", buckets, state, ckpt)
    Seq((k3, 2L, s"v-$k3")).toDF("key", "seq", "value")
      .coalesce(1).write.mode("append").parquet(in)
    Streaming.runIncrementalMerge(
      Streaming.parquetSource(spark, in, d0.schema, maxFilesPerTrigger = 1),
      Seq("key"), "seq", buckets, state, ckpt)
    val snap = Streaming.mergedSnapshot(spark, state)
    val plan = planOf(snap)
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans == 2,
      s"snapshot over 4 buckets x 2 versions must plan one scan per version, got $scans:\n$plan")
    assert(snap.select("key").as[String].collect().toSet == (g0 :+ k3).toSet)
  }

  test("lineDedup removes boilerplate via a broadcast probe, not a corpus shuffle") {
    val docs = (1L to 30L).map(i => (i, s"HEADER\nbody $i line\nFOOTER")).toDF("id", "text")
    val plan = planOf(Curation.lineDedup(docs, "id", "text", 10))
    assert(plan.contains("BroadcastHashJoin"), s"boilerplate set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join on the line relation:\n$plan")
  }

  test("repetitionReport: one gram pass, struct-max folded, no Window, no corpus join shuffle") {
    val docs = Seq((1L, "a b a b c"), (2L, "x y x y x")).toDF("doc_id", "text")
    val plan = planOf(graft.operators.Quality.repetitionReport(docs, "doc_id", "text"))
    // the 9-way n-gram expansion is ONE Generate (plus one for lines) —
    // a separate max-count relation would re-scan the gram pipeline
    val nGenerate = "(?i)generate".r.findAllIn(plan).length
    assert(nGenerate == 2, s"expected 2 Generates (lines + grams), got $nGenerate:\n$plan")
    assert(!plan.contains("Window"), s"repetition stats must never sort per doc:\n$plan")
    // the per-doc join-back is hash-based at any scale (broadcast here;
    // an id-keyed shuffle both sides already produce at cluster scale)
    // — a sort-merge join would mean a per-doc SORT crept in
    assert(!"(?i)sortmergejoin".r.findFirstIn(plan).isDefined,
      s"report joins must be hash joins, not sort-merge:\n$plan")
  }

  test("bloomKeepClean stays broadcast-only: bitmap probes + gated anti-join") {
    val corpus = (1L to 40L).map(i => (i, s"key$i")).toDF("id", "k")
    val dirty = (1L to 10L).map(i => s"key${i * 3}").toDF("dk")
    val plan = planOf(Curation.bloomKeepClean(corpus, "k", dirty, "dk"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus must never shuffle for decontamination:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probes:\n$plan")
  }

  test("bm25TopK gates postings on broadcast query terms — never a term shuffle-join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      // disable size-based broadcasts so only the EXPLICIT query-term
      // hints broadcast — at corpus scale statistics won't save a
      // missing hint, and this pin must not pass by accident of tiny data
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val docs = (1L to 40L).map(i => (i, s"alpha beta tok$i gamma")).toDF("id", "text")
      val qs = Seq((1L, "alpha gamma"), (2L, "beta tok7")).toDF("qid", "qtext")
      val plan = planOf(Index.bm25TopK(docs, "id", "text", qs, "qid", "qtext", 5))
      val smjOnTerm = plan.linesIterator
        .filter(_.contains("SortMergeJoin")).filter(_.contains("term#")).toSeq
      assert(smjOnTerm.isEmpty,
        s"postings must reach the join only through the broadcast query-term gate:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast query-term joins:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("semanticDedup(cent) broadcasts the centroid/rep side — corpus never shuffle-joins") {
    val dims = 6
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(dims)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))).toDF("vec_id", "embedding")
    // bounded trained-style quantizer: 4 centroids, double components
    val cent = (0L until 4L).map(k =>
      (k, Array.tabulate(dims)(d => ((k * 5 + d) % 7 - 3).toDouble))).toDF("cid", "cvec")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", cent, 0.99)
    // out is persisted+materialized; the InMemoryRelation prints its cached
    // physical plan, so the join shapes are still visible in the tree
    val plan = planOf(out)
    assert(plan.contains("BroadcastHashJoin"),
      s"rep selection / scoring joins must broadcast the bounded centroid side:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must never be the probe of a shuffle join after assignment:\n$plan")
    Similarity.release(out)
  }

  test("Q9 star: all three dimensions broadcast; aggregation is partial-then-final") {
    val plan = planOf(
      SparkEntry.queries("q_q9_profit")(spark, "/root/testdata/sf0.001"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"part/supplier/nation must broadcast into the fact scan:\n$plan")
    assert(plan.contains("partial_sum"),
      s"profit sum must combine map-side before the final exchange:\n$plan")
  }

  test("Q18: HAVING set broadcasts into both enrichment joins; top-k never full-sorts") {
    val plan = planOf(
      SparkEntry.queries("q_q18_big_orders")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"neither orders nor customer may shuffle for the enrichment joins:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the LIMIT must plan as a top-k, not a global sort:\n$plan")
  }

  test("Q5: dims broadcast, both fact joins shuffle, same-nation equality rides the join key") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      // kill auto-broadcast so the pin sees the shape the EXPLICIT hints
      // produce — at sf0.001 everything fits under the default threshold,
      // which would hide a missing hint or a wrongly-broadcast fact
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(
        SparkEntry.queries("q_q5_local_volume")(spark, "/root/testdata/sf0.001"))
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
        s"region/nation gates and the supplier dim must broadcast:\n$plan")
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size == 2,
        s"exactly the two fact contacts (orders, customer) may shuffle:\n$plan")
      assert("(SortMergeJoin|ShuffledHashJoin) \\[[^\\]]*s_nationkey".r
          .findFirstIn(plan).nonEmpty,
        s"the same-nation equality must be a join KEY, not a post-join filter:\n$plan")
      assert(plan.contains("partial_sum"),
        s"revenue must combine map-side before the final exchange:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("Q4: EXISTS plans as one LEFT SEMI hash join, never a nested loop") {
    val plan = planOf(
      SparkEntry.queries("q_q4_order_priority")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("LeftSemi"),
      s"the EXISTS must decorrelate to a semi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the correlated date comparison must ride the semi join's " +
        s"condition, not force a nested loop:\n$plan")
    assert(plan.contains("l_shipdate"),
      s"the correlated comparison must appear in the physical join:\n$plan")
  }

  test("Q17: decorrelated per-part limits broadcast back; the fact table never shuffles") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      // kill auto-broadcast: the pin must hold from the EXPLICIT hints
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(
        SparkEntry.queries("q_q17_small_qty")(spark, "/root/testdata/sf0.001"))
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
        s"both the part gate and the per-part limits must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"lineitem must never shuffle for the correlated-average rewrite:\n$plan")
      assert(plan.contains("partial_avg"),
        s"the per-part average must combine map-side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("Q21: EXISTS/NOT-EXISTS pair decorrelates to one per-order aggregate, no self-join") {
    val plan = planOf(
      SparkEntry.queries("q_q21_lone_blame")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("LeftSemi"),
      s"the order-status gate must apply as a semi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"neither correlated subquery may plan as a nested loop:\n$plan")
    // The decorrelation's point: the fact table appears exactly twice
    // (candidate rows + the per-order aggregate input), never a third
    // time for an inequality self-join.
    assert("lineitem\\.parquet".r.findAllIn(plan).size <= 2,
      s"the naive form's inequality self-joins must not reappear:\n$plan")
  }

  test("Q22: NOT EXISTS is a LEFT ANTI join; the scalar average is a one-row broadcast") {
    val plan = planOf(
      SparkEntry.queries("q_q22_idle_customers")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("LeftAnti"),
      s"the NOT EXISTS must plan as an anti join:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      s"only the one-row scalar average may cross-join:\n$plan")
    assert(plan.contains("partial_avg") || plan.contains("partial_count"),
      s"the scalar average must combine map-side:\n$plan")
  }

  test("Q19: each side's residual of the OR-of-ANDs pushes into its scan") {
    val plan = planOf(
      SparkEntry.queries("q_q19_disjunctive")(spark, "/root/testdata/sf0.001"))
    // lineitem scan: the quantity-range disjunction reaches PushedFilters
    assert("PushedFilters: \\[[^\\]]*Or\\(Or\\(And\\(GreaterThanOrEqual\\(l_quantity".r
        .findFirstIn(plan).nonEmpty,
      s"the quantity disjunction must push into the lineitem scan:\n$plan")
    // part scan: the brand/size disjunction reaches PushedFilters
    assert("Or\\(Or\\(And\\(EqualTo\\(p_brand".r.findFirstIn(plan).nonEmpty,
      s"the brand/size disjunction must push into the part scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"part must broadcast; the full OR confirms after the join:\n$plan")
  }

  test("Q1: one scan, one map-side-combined aggregation, filter pushed") {
    val plan = planOf(
      SparkEntry.queries("q_q1_pricing")(spark, "/root/testdata/sf0.001"))
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"all eight aggregates must ride a single scan:\n$plan")
    assert(plan.contains("partial_sum") && !plan.contains("Join"),
      s"one partial-combined aggregation, no joins:\n$plan")
    assert("PushedFilters: \\[[^\\]]*LessThanOrEqual\\(l_shipdate".r
        .findFirstIn(plan).nonEmpty,
      s"the date bound must reach the scan:\n$plan")
  }

  test("Q10: revenue aggregates below the customer join (fact spine collapses first)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(
        SparkEntry.queries("q_q10_returns")(spark, "/root/testdata/sf0.001"))
      // the per-custkey aggregation must sit BELOW the join with customer
      // (a printed CHILD of the c_custkey join): the join consumes the
      // collapsed aggregate, not raw lineitem rows
      val joinIdx = plan.indexOf("oin [c_custkey")
      val aggIdx = plan.indexOf("HashAggregate(keys=[o_custkey")
      assert(joinIdx >= 0 && aggIdx > joinIdx,
        s"revenue must pre-aggregate below the customer join:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"),
        s"top-20 must not global-sort:\n$plan")
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size == 2,
        s"exactly lineitem-orders and aggregate-customer may shuffle:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("Q14: numerator and denominator share one aggregation over one joined scan") {
    val plan = planOf(
      SparkEntry.queries("q_q14_promo_share")(spark, "/root/testdata/sf0.001"))
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"the ratio must not re-scan the fact table:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size == 2,
      s"one partial+final aggregation pair serves both sums:\n$plan")
  }

  test("unpivot plans as a map-side Expand with zero exchanges") {
    val plan = planOf(
      SparkEntry.queries("q_unpivot_measures")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("Expand"),
      s"unpivot must plan as Expand:\n$plan")
    // fanOut's round-robin split is allowed (a no-op at scale); what the
    // reshape must never introduce is a KEYED shuffle or per-metric scans
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Union"),
      s"the reshape must neither key-shuffle nor re-scan per metric:\n$plan")
  }

  test("Q13: per-custkey counts aggregate below the LEFT OUTER join (zero bucket survives)") {
    val plan = planOf(
      SparkEntry.queries("q_q13_custdist")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("LeftOuter"),
      s"an inner join would silently delete the zero bucket:\n$plan")
    val joinIdx = plan.indexOf("oin [c_custkey")
    val aggIdx = plan.indexOf("HashAggregate(keys=[o_custkey")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"orders must collapse to per-custkey counts below the join:\n$plan")
  }

  test("Q16: NOT IN compiles to a broadcast LEFT ANTI gate; nothing shuffle-joins") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(
        SparkEntry.queries("q_q16_supplier_cnt")(spark, "/root/testdata/sf0.001"))
      assert(plan.contains("LeftAnti"),
        s"the exclusion set must gate as an anti join:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"both gates must broadcast; only the distinct agg may exchange:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("Q2: argmin join — the per-part minimum aggregates before joining back, brand gate broadcasts") {
    val plan = planOf(
      SparkEntry.queries("q_q2_min_cost")(spark, "/root/testdata/sf0.001"))
    // two aggregation levels (per-(part,supplier) then per-part min)
    assert("HashAggregate\\(keys=\\[l_partkey".r.findAllIn(plan).size >= 2,
      s"both argmin aggregation levels must hash-aggregate:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the min equi-join-back must never nested-loop:\n$plan")
    // pc is persisted and consumed twice: BOTH the min aggregation and
    // the join-back must read the cache, so the fact scan runs once at
    // materialization (each InMemoryTableScan prints the cached plan,
    // which is why counting raw scan strings would mislead here)
    assert("InMemoryTableScan".r.findAllIn(plan).size == 2,
      s"both argmin consumers must read the persisted slice:\n$plan")
  }

  test("Q8: the share's numerator and denominator ride one aggregation over the Q5 spine") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(
        SparkEntry.queries("q_q8_market_share")(spark, "/root/testdata/sf0.001"))
      assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
        s"the ratio must not re-scan the fact table:\n$plan")
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size == 2,
        s"only the orders and customer fact contacts may shuffle:\n$plan")
      assert(plan.contains("partial_sum"),
        s"both share sums must combine map-side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("Q6: pure pushdown — every predicate reaches the scan, no joins") {
    val conf = spark.conf
    val saved = util.Try(Option(conf.get("spark.sql.maxMetadataStringLength")))
      .toOption.flatten
    try {
      // the default 100-char metadata truncation elides the later
      // entries of a multi-predicate PushedFilters list
      conf.set("spark.sql.maxMetadataStringLength", "2000")
      val plan = planOf(
        SparkEntry.queries("q_q6_forecast_delta")(spark, "/root/testdata/sf0.001"))
      assert(!plan.contains("Join"),
        s"Q6 is one scan plus one scalar aggregate:\n$plan")
      val pushed = "PushedFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
      assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
        pushed.contains("GreaterThanOrEqual(l_discount") &&
        pushed.contains("LessThan(l_quantity"),
        s"all three range predicates must push into the scan: $pushed")
      assert(plan.contains("partial_sum"),
        s"the scalar sum must combine map-side:\n$plan")
    } finally saved match {
      case Some(v) => conf.set("spark.sql.maxMetadataStringLength", v)
      case None    => conf.unset("spark.sql.maxMetadataStringLength")
    }
  }

  test("Q7: nation gates broadcast; only the two fact contacts shuffle") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(
        SparkEntry.queries("q_q7_nation_volume")(spark, "/root/testdata/sf0.001"))
      assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
        s"one fact scan:\n$plan")
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size == 2,
        s"only orders and customer may shuffle (the Q5 lesson):\n$plan")
      assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate".r
          .findFirstIn(plan).nonEmpty,
        s"the ship-year window must reach the fact scan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("Q11: one fact scan feeds both the per-part aggregate and (through it) the global total") {
    val plan = planOf(
      SparkEntry.queries("q_q11_important_parts")(spark, "/root/testdata/sf0.001"))
    // per is persisted and consumed twice: threshold filter + total
    assert("InMemoryTableScan".r.findAllIn(plan).size == 2,
      s"both consumers must read the persisted per-part aggregate:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"the nation gate must apply as a semi join on the scan:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      s"only the one-row global total may cross-join:\n$plan")
  }

  test("Q12: the lateness comparison rides the equi join as a residual") {
    val plan = planOf(
      SparkEntry.queries("q_q12_late_priority")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the non-equi lateness predicate must ride the equi join:\n$plan")
    assert(plan.contains("l_shipdate"),
      s"the residual comparison must appear in the physical join:\n$plan")
    assert(plan.contains("partial_sum"),
      s"both conditional counts must combine map-side in one aggregation:\n$plan")
    assert("HashAggregate\\(keys=\\[l_linestatus".r.findAllIn(plan).size == 2,
      s"high and low counts must ride ONE two-phase aggregation:\n$plan")
  }

  test("Q15: global argmax reuses the persisted revenue relation, never re-scans") {
    val plan = planOf(
      SparkEntry.queries("q_q15_top_supplier")(spark, "/root/testdata/sf0.001"))
    // both consumers read the cache, so the fact scan runs once at
    // materialization (the raw scan STRING appears under each printed
    // InMemoryRelation — counting it would mislead, the Q2 note)
    assert("InMemoryTableScan".r.findAllIn(plan).size == 2,
      s"the scalar max and the tie filter must both read the cache:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      s"only the one-row max may cross-join:\n$plan")
  }

  test("Q20: nested IN decorrelates to two semi joins over one pair aggregate") {
    val plan = planOf(
      SparkEntry.queries("q_q20_promo_suppliers")(spark, "/root/testdata/sf0.001"))
    assert("LeftSemi".r.findAllIn(plan).size >= 2,
      s"both IN levels must plan as semi joins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the correlated quantity threshold must never nested-loop:\n$plan")
    assert("HashAggregate\\(keys=\\[l_suppkey[^\\]]*l_partkey".r
        .findAllIn(plan).nonEmpty,
      s"the threshold must come from ONE per-(supplier, part) aggregate:\n$plan")
  }

  test("z-order projection prunes the scan to its two input columns") {
    val dir = graft.io.TempDirs.registered("graft-zorder-scan").toString
    (1L to 20L).map(i => (i, i * 7 % 50, s"pad$i", i * 1.5)).toDF("k", "c", "s", "v")
      .write.mode("overwrite").parquet(dir)
    val plan = planOf(spark.read.parquet(dir)
      .select(col("k"), graft.operators.Layout.zValue(
        pmod(col("c"), lit(65536L)), pmod(col("k"), lit(65536L))).as("zval")))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("k") && readSchema.contains("c")
      && !readSchema.contains("pad") && !readSchema.contains("s:") && !readSchema.contains("v:"),
      s"scan must read only (k, c): $readSchema")
  }

  test("semanticContamination: literal-matrix probe plans with NO join; fallback broadcasts") {
    val dims = 8
    val emb = (1L to 100L).map(i =>
      (i, Array.tabulate(dims)(d => ((i * 31 + d * 7) % 13 - 6).toDouble)))
      .toDF("vec_id", "embedding")
    val bench = (1L to 3L).map(i =>
      (i, Array.tabulate(dims)(d => ((i * 17 + d * 5) % 11 - 5).toDouble)))
      .toDF("vec_id", "embedding")
    // fast path: the bench matrix is a literal inside one native
    // projection — the |corpus|·|bench| pair relation never exists.
    // File-backed corpus so ConvertToLocalRelation cannot fold the
    // projection out of the executed plan.
    val dir = graft.io.TempDirs.registered("graft-maxcos-plan").toString
    emb.write.mode("overwrite").parquet(dir)
    val embF = emb.sparkSession.read.parquet(dir)
    val plan = planOf(Curation.semanticContamination(
      embF, "vec_id", "embedding", bench, 0.8))
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"literal-matrix probe must be join-free:\n$plan")
    assert(plan.contains("bench_max_cos"),
      s"native probe expression missing:\n$plan")
    assert(!plan.contains("Window"), s"argmax must not plan as a window:\n$plan")
    assert("partial_max".r.findAllIn(plan).nonEmpty,
      s"the per-id max must partial-aggregate map-side:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"expected at most the final-aggregate exchange, got $exchanges:\n$plan")

    // fallback (parity reference / oversized-bench route): a broadcast
    // nested-loop over the tiny bench side — never a cartesian product
    // and never a corpus shuffle join
    val fb = planOf(Curation.semanticContaminationJoin(
      emb, "vec_id", "embedding", bench, 0.8))
    assert(fb.contains("BroadcastNestedLoopJoin"),
      s"bench side must broadcast into the fallback probe:\n$fb")
    assert(!fb.contains("CartesianProduct") && !fb.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the fallback probe:\n$fb")
    assert("Exchange hashpartitioning".r.findAllIn(fb).size <= 1,
      s"fallback: at most the final-aggregate exchange:\n$fb")
  }

  test("media metadata consumers never read the binary payload column") {
    val dir = graft.io.TempDirs.registered("graft-media-meta").toString
    val media = graft.operators.Multimodal.asMedia(
      (1L to 20L).map(i => (i, s"payload-bytes-$i", s"src${i % 3}"))
        .toDF("id", "body", "src"),
      col("id"), col("body"), lit("audio/wav"), col("src"), lit(1000L))
    media.write.mode("overwrite").parquet(dir)
    // a metadata-only projection (ids + typed meta struct) must prune
    // the binary `content` column out of the parquet scan entirely —
    // the cost model the multimodal stack's header-only paths depend on
    val q = spark.read.parquet(dir)
      .select(col("media_id"), col("meta.mime"), col("meta.duration_ms"))
    val plan = planOf(q)
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("media_id") && readSchema.contains("meta"),
      s"scan must read the metadata columns: $readSchema")
    assert(!readSchema.contains("content"),
      s"metadata-only scan must NOT read the payload column: $readSchema")
  }

  test("qualityScore and langId projections run the native one-pass expressions " +
       "inside whole-stage codegen, with zero regex/HOF residue") {
    // over a FILE scan: a LocalRelation input would be constant-folded
    // away by ConvertToLocalRelation and pin nothing
    val dir = graft.io.TempDirs.registered("graft-plan-quality").toString
    Seq((1L, "the quick brown fox and it is a fine day")).toDF("id", "t")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select(graft.functions.Text.qualityScore(col("t")).as("q"),
        graft.functions.Text.langId(col("t")).as("lang"))
    val plan = planOf(q)
    assert(plan.contains("quality_features") && plan.contains("lang_hits"),
      s"both native expressions must be in the plan:\n$plan")
    assert(!plan.contains("regexp_extract_all") && !plan.contains("ArrayFilter") &&
      !plan.contains("regexp_replace"),
      s"the regex/HOF stack must be fully replaced, not layered on:\n$plan")
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"the projection must sit inside a WholeStageCodegen stage:\n$plan")
  }

  test("cohenKappa: one corpus exchange to the cell relation; no Window, no sort joins") {
    val df = (1 to 500).map(i => (s"p${i % 3}", s"g${i % 4}")).toDF("p", "g")
    val plan = planOf(graft.operators.Quality.cohenKappa(df, col("p"), col("g")))
    assert(!plan.contains("Window"), s"kappa must never window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the bounded marginal relations must broadcast:\n$plan")
  }

  test("vocabStats: the top-k is a map-side-combined UDAF, never a vocabulary sort") {
    val toks = (1 to 400).map(i => (s"s${i % 4}", s"tok${i % 37}")).toDF("k", "tok")
    val plan = planOf(graft.operators.Quality.vocabStats(toks, "k", "tok", 5))
    assert(plan.contains("partial_topkagg"),
      s"TopK UDAF must partial-combine map-side:\n$plan")
    assert(!plan.contains("Window"),
      s"no rank window over the vocabulary relation:\n$plan")
  }

  test("giniIndex: corpus shuffles once; the only window sorts the count-value histogram") {
    val df = (1 to 1000).map(i => Tuple1(s"u${i % 50}")).toDF("k")
    val plan = planOf(graft.operators.Quality.giniIndex(df, "k"))
    // Two hash exchanges: corpus→per-key counts, counts→value histogram
    // (the second moves the |keys| relation, never the corpus).
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 2,
      s"per-key count + histogram aggregates only, got $hashEx:\n$plan")
    // The single-partition window input is the d ≤ √(2·n_total)-row
    // histogram: its sort key must be the count VALUE __x, and no
    // row_number rank over the keys relation may survive.
    assert("Sort \\[__x".r.findFirstIn(plan).isDefined,
      s"prefix-sum window must sort the histogram on __x:\n$plan")
    assert(!plan.contains("row_number"),
      s"no per-key rank window — ranks come from the closed form:\n$plan")
  }

  test("lenHistogram is one map-side-combined aggregation") {
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toLong)).toDF("k", "n")
    val plan = planOf(graft.operators.Quality.lenHistogram(df, "k", col("n")))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1 && !plan.contains("Window"),
      s"one exchange, no window:\n$plan")
  }

  test("scd2Timeline is one shuffle: both windows share the key partitioning") {
    val df = (1 to 200).map(i => (i % 10L, i.toLong, i * 5L, s"s${i % 3}"))
      .toDF("key", "eid", "t", "st")
    val plan = planOf(graft.operators.Relational
      .scd2Timeline(df, Seq("key"), "st", "t", "eid"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected a single hash exchange on the key, got $exchanges:\n$plan")
    val sorts = "(?m)^\\s*[+:]?-? ?\\*?\\(?\\d*\\)? ?Sort ".r.findAllIn(plan).size
    assert(sorts == 1,
      s"the second window must reuse the first window's sort, got $sorts:\n$plan")
  }
}

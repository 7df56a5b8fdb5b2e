package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** ST1-ST3/ST5 semantics: multi-micro-batch replay with out-of-order
  * duplicates (keep-last dedup), checkpointed restart idempotence, and
  * fan-out — driven through the public file-streaming source (one parquet
  * file per micro-batch via maxFilesPerTrigger=1). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("ST1-ST3: AvailableNow drain, per-batch + cross-batch keep-last dedup") {
    val in = tmp("graft-stream-in")
    val out = tmp("graft-stream-out")
    val ckpt = tmp("graft-stream-ckpt")

    // batch 1: first sightings; batch 2: update for k1 + late (stale) row for k2
    Seq(("k1", 1L, "v1a"), ("k2", 5L, "v2a"))
      .toDF("key", "offset", "payload").coalesce(1).write.parquet(s"$in/b1")
    Seq(("k1", 9L, "v1b"), ("k2", 2L, "v2stale"), ("k3", 1L, "v3"))
      .toDF("key", "offset", "payload").coalesce(1).write.parquet(s"$in/b2")

    val schema = spark.read.parquet(s"$in/b1").schema
    val counter = spark.sparkContext.longAccumulator("rows")
    val src = Streaming.parquetSource(spark, s"$in/*", schema)
    val cfg = Streaming.StreamConfig(
      keys = Seq("key"), orderCol = "offset",
      primaryPath = out, checkpointPath = ckpt,
      fanOut = None, rowCounter = Some(counter))
    Streaming.runAvailableNow(src, b => b.withColumn("cleaned", lit(true)), cfg)

    assert(counter.value == 5) // A4: every delivered row counted
    val view = Streaming.dedupedView(spark, out, Seq("key"), "offset")
      .orderBy("key").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(view == Seq(("k1", "v1b"), ("k2", "v2a"), ("k3", "v3")))
  }

  test("ST2: restart with same checkpoint reprocesses nothing") {
    val in = tmp("graft-restart-in")
    val out = tmp("graft-restart-out")
    val ckpt = tmp("graft-restart-ckpt")
    Seq(("a", 1L, "x")).toDF("key", "offset", "payload")
      .coalesce(1).write.parquet(s"$in/b1")
    val schema = spark.read.parquet(s"$in/b1").schema
    val cfg = Streaming.StreamConfig(Seq("key"), "offset", out, ckpt)

    Streaming.runAvailableNow(Streaming.parquetSource(spark, s"$in/*", schema), identity, cfg)
    val afterFirst = spark.read.parquet(out).count()
    Streaming.runAvailableNow(Streaming.parquetSource(spark, s"$in/*", schema), identity, cfg)
    val afterSecond = spark.read.parquet(out).count()
    assert(afterFirst == 1 && afterSecond == 1) // no duplicate appends on restart
  }

  test("ST5: fan-out writes the projection to a second sink in the same batch") {
    val in = tmp("graft-fan-in")
    val out = tmp("graft-fan-out")
    val out2 = tmp("graft-fan-out2")
    val ckpt = tmp("graft-fan-ckpt")
    Seq(("k1", 1L, "imgA"), ("k2", 2L, "imgB")).toDF("key", "offset", "img")
      .coalesce(1).write.parquet(s"$in/b1")
    val schema = spark.read.parquet(s"$in/b1").schema
    val cfg = Streaming.StreamConfig(Seq("key"), "offset", out, ckpt,
      fanOut = Some((df => df.select("key", "img"), out2)))
    Streaming.runAvailableNow(Streaming.parquetSource(spark, s"$in/*", schema), identity, cfg)
    assert(spark.read.parquet(out).count() == 2)
    val fan = spark.read.parquet(out2)
    assert(fan.columns.toSeq == Seq("key", "img") && fan.count() == 2)
  }

  test("S5/S4: kafka envelope round-trips rows through JSON exactly") {
    val df = Seq((1L, "a b", 2.5, "2024-03-15 10:30:00"), (2L, null: String, -1.0, "2024-01-01 00:00:00"))
      .toDF("id", "txt", "score", "ts_str")
      .withColumn("ts", col("ts_str").cast("timestamp_ntz")).drop("ts_str")
    val wire = Streaming.kafkaEnvelope(df, col("id"))
    assert(wire.columns.toSeq == Seq("key", "value"))
    val back = Streaming.parseEnvelope(wire, df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("S4: malformed message yields null row (quarantine-able), not a crash") {
    val schema = Seq((1L, "x")).toDF("id", "v").schema
    val wire = Seq(("k", "{not json")).toDF("key", "value")
    val back = Streaming.parseEnvelope(wire, schema)
    assert(back.count() == 1 && back.filter(col("id").isNull).count() == 1)
  }

  test("ST3 stateful: dropDuplicatesWithinWatermark dedups across micro-batches") {
    val in = tmp("graft-wmdedup-in")
    val out = tmp("graft-wmdedup-out")
    val ckpt = tmp("graft-wmdedup-ckpt")
    Seq(("k1", "2024-01-01 10:00:00"), ("k2", "2024-01-01 10:05:00"))
      .toDF("key", "ts_s").withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .coalesce(1).write.parquet(s"$in/b1")
    Seq(("k1", "2024-01-01 10:01:00"), ("k3", "2024-01-01 10:06:00")) // k1 redelivered
      .toDF("key", "ts_s").withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .coalesce(1).write.parquet(s"$in/b2")
    val schema = spark.read.parquet(s"$in/b1").schema
    val src = Streaming.parquetSource(spark, s"$in/*", schema) // 1 file per trigger
    Streaming.runStatefulDedup(src, Seq("key"), "ts", "1 hour", out, ckpt)
    val keys = spark.read.parquet(out).select("key").as[String].collect().sorted.toSeq
    assert(keys == Seq("k1", "k2", "k3")) // cross-batch duplicate dropped by state
    // prove the duplicate really crossed a trigger boundary: the offset
    // log committed (at least) two micro-batches
    val batches = new java.io.File(s"$ckpt/offsets").list().count(!_.endsWith(".tmp"))
    assert(batches >= 2, s"expected >=2 committed micro-batches, saw $batches")
  }

  test("ST12: streaming semantic dedup — persisted exemplars gate later batches") {
    val in = tmp("graft-semdd-in")
    val out = tmp("graft-semdd-out")
    val ex = tmp("graft-semdd-ex")
    val ckpt = tmp("graft-semdd-ckpt")
    val cent = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("cid", "cvec")
    // batch 1 (seq 0): id 10 claims cell 0's exemplar slot
    Seq((10L, Array(1.0f, 0.1f), 0L)).toDF("vec_id", "embedding", "seq")
      .coalesce(1).write.parquet(s"$in/b1")
    // batch 2 (seq 1): id 1 is an exact copy of the exemplar — dropped even
    // though its id is LOWER (persisted state decides, not id order);
    // id 2 is diverse in cell 0 — kept as a member; id 3 opens cell 1
    Seq((1L, Array(1.0f, 0.1f), 1L),
        (2L, Array(1.0f, 0.9f), 1L),
        (3L, Array(0.0f, 1.0f), 1L)).toDF("vec_id", "embedding", "seq")
      .coalesce(1).write.parquet(s"$in/b2")
    // distinct mtimes: FileStreamSource orders deliveries by mtime, and a
    // tie would make b2 processable first, scrambling exemplar election
    def pinMtime(d: String, t: Long): Unit =
      new java.io.File(d).listFiles().filter(_.getName.startsWith("part-"))
        .foreach(_.setLastModified(t))
    pinMtime(s"$in/b1", 1700000000000L)
    pinMtime(s"$in/b2", 1700000060000L)
    val schema = spark.read.parquet(s"$in/b1").schema
    val src = Streaming.parquetSource(spark, s"$in/*", schema) // 1 file per trigger
    Streaming.runStreamingSemanticDedup(src, "vec_id", "embedding", "seq",
      cent, 0.95, ex, out, ckpt)
    val rows = spark.read.parquet(out).select("vec_id", "is_ex")
      .as[(Long, Boolean)].collect().toMap
    assert(rows.keySet == Set(10L, 2L, 3L), s"got $rows") // id 1 gated by state
    assert(rows(10L) && rows(3L) && !rows(2L))
    // the exemplar side table holds exactly one row per claimed cell
    val exRows = spark.read.parquet(ex).select("cell", "ex_id")
      .as[(Long, Long)].collect().toMap
    assert(exRows == Map(0L -> 10L, 1L -> 3L))
  }

  test("ST4: watermarked tumbling-window aggregation finalizes closed windows") {
    val in = tmp("graft-wmwin-in")
    val out = tmp("graft-wmwin-out")
    val ckpt = tmp("graft-wmwin-ckpt")
    Seq("2024-01-01 10:00:00", "2024-01-01 10:20:00", "2024-01-01 10:40:00")
      .toDF("ts_s").withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .coalesce(1).write.parquet(s"$in/b1")
    // batch 2 advances the watermark past the 10:00 window's end
    Seq("2024-01-01 12:30:00").toDF("ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .coalesce(1).write.parquet(s"$in/b2")
    val schema = spark.read.parquet(s"$in/b1").schema
    val q = Streaming.parquetSource(spark, s"$in/*", schema)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).count()
      .selectExpr("window.start AS ws", "count")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // the 10:00 window finalized with 3 events; the 12:00 window is
    // still open at stream end (append mode emits only closed windows)
    assert(rows.keys.exists(_.startsWith("2024-01-01 10:00")) )
    assert(rows("2024-01-01 10:00:00.0") == 3L)
    assert(!rows.keys.exists(_.startsWith("2024-01-01 12:00")))
  }

  test("ST6: resumeWorkList = full grid minus event-log entries") {
    val all = Seq((2020, "Essex"), (2020, "Morris"), (2021, "Essex"), (2021, "Morris"))
      .toDF("year", "county")
    val log = Seq((2020, "Essex"), (2020, "Morris"), (2021, "Essex"))
      .toDF("year", "county")
    val rem = Streaming.resumeWorkList(all, log, Seq("year", "county"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rem == Seq((2021, "Morris")))
  }

  test("incremental merge: snapshot = keep-last merge; delta rewrites only touched buckets") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st10spec-in").toString
    val state = TempDirs.registered("graft-st10spec-state").toString
    val ckpt = TempDirs.registered("graft-st10spec-ckpt").toString
    val base = (1 to 64).map(i => (i.toLong, i * 10L, 1L)).toDF("k", "amt", "version")
    // delta: update ONE key + insert one new key -> touches <= 2 of 8 buckets
    val delta = Seq((7L, 777L, 2L), (1000L, 5L, 2L)).toDF("k", "amt", "version")
    base.coalesce(1).write.mode("append").parquet(in)
    delta.coalesce(1).write.mode("append").parquet(in)
    val src = Streaming.parquetSource(spark, in, base.schema, maxFilesPerTrigger = 1)
    Streaming.runIncrementalMerge(src, Seq("k"), "version", buckets = 8, state, ckpt)
    val snap = Streaming.mergedSnapshot(spark, state)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(snap.size == 65)
    assert(snap(7L) == ((777L, 2L)))      // updated
    assert(snap(1000L) == ((5L, 2L)))     // inserted
    assert(snap(8L) == ((80L, 1L)))       // untouched
    // the delta's version directory must hold only the touched buckets
    val vDirs = new java.io.File(state).listFiles.filter(_.isDirectory)
      .map(f => f.getName -> f.listFiles.count(d => d.isDirectory && d.getName.startsWith("__bucket=")))
      .toMap
    assert(vDirs("v0") == 8, s"full load writes all buckets: $vDirs")
    assert(vDirs("v1") <= 2, s"delta must rewrite only touched buckets: $vDirs")
    // time travel: as-of batch 0 resolves through manifest m0 — the
    // pre-delta state (no update, no insert); as-of the last batch is
    // the current snapshot
    val at0 = Streaming.mergedSnapshotAt(spark, state, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at0.size == 64)
    assert(at0(7L) == 70L)
    assert(!at0.contains(1000L))
    val at1 = Streaming.mergedSnapshotAt(spark, state, 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at1(7L) == 777L && at1(1000L) == 5L)
  }

  test("incremental merge: compactEvery bounds live version dirs; snapshot unchanged") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-stcompact-in").toString
    val state = TempDirs.registered("graft-stcompact-state").toString
    val ckpt = TempDirs.registered("graft-stcompact-ckpt").toString
    val compactEvery = 2
    // 3 × compactEvery deliveries: a full load then five single-key deltas
    val base = (1 to 64).map(i => (i.toLong, i * 10L, 1L)).toDF("k", "amt", "version")
    base.coalesce(1).write.mode("append").parquet(in)
    (2 to 6).foreach { v =>
      Seq((v.toLong, v * 1000L, v.toLong)).toDF("k", "amt", "version")
        .coalesce(1).write.mode("append").parquet(in)
    }
    val src = Streaming.parquetSource(spark, in, base.schema, maxFilesPerTrigger = 1)
    Streaming.runIncrementalMerge(src, Seq("k"), "version", buckets = 8, state,
      ckpt, compactEvery = compactEvery)
    // correctness first: compaction must not change the keep-last result
    val snap = Streaming.mergedSnapshot(spark, state)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(snap.size == 64)
    (2 to 6).foreach(v => assert(snap(v.toLong) == ((v * 1000L, v.toLong)), snap(v.toLong)))
    assert(snap(10L) == ((100L, 1L))) // untouched key keeps the base row
    // bound: GC ran at the start of the final batch against the last
    // compacted manifest, so at most compactEvery+1 version dirs survive
    // (the fold target plus the batches since) — NOT one dir per delivery
    val vCount = new java.io.File(state).listFiles
      .count(f => f.isDirectory && f.getName.startsWith("v"))
    assert(vCount <= compactEvery + 1,
      s"expected <= ${compactEvery + 1} live version dirs after 6 deliveries, got $vCount")
  }

  test("ST13: incremental scorecard merges batches; cross-batch dup counted once") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st13spec-in").toString
    val state = TempDirs.registered("graft-st13spec-state").toString
    val ckpt = TempDirs.registered("graft-st13spec-ckpt").toString
    val text = "the quick brown fox jumps over the lazy dog today"
    val b1 = Seq((1L, "a", text), (2L, "a", "completely different words here now"))
      .toDF("doc_id", "source", "text")
    val b2 = Seq((3L, "a", text), // exact dup of doc 1, in a LATER batch
      (4L, "b", "more unique text lives in this entry"))
      .toDF("doc_id", "source", "text")
    b1.coalesce(1).write.mode("append").parquet(in)
    b2.coalesce(1).write.mode("append").parquet(in)
    val src = Streaming.parquetSource(spark, in, b1.schema, maxFilesPerTrigger = 1)
    Streaming.runIncrementalScorecard(src, "doc_id", "source", "text",
      lit(0.8), size(split(col("text"), "\\s+")),
      benchShingles = Seq.empty[String].toDF("shingle"),
      shingleN = 5, minShared = 3, bucketTokens = 32, nBuckets = 20,
      stateRoot = state, checkpointPath = ckpt)
    val out = Streaming.scorecardSnapshot(spark, state, "source", nBuckets = 20)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(5)))).toMap
    // source a: 3 docs across two batches, one cross-batch exact dup
    assert(out("a") == ((3L, 0.8, 0L, 0.3333)), out)
    assert(out("b") == ((1L, 0.8, 0L, 0.0)), out)
  }

  test("ST14: streaming LSH dedup — first ARRIVAL wins across triggers, not smallest id") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st14spec-in").toString
    val sig = TempDirs.registered("graft-st14spec-sig").toString
    val out = TempDirs.registered("graft-st14spec-out").toString
    val ckpt = TempDirs.registered("graft-st14spec-ckpt").toString
    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // batch 0: doc 10 (the template) + doc 11 (same text, same batch —
    // the within-batch smaller id wins); batch 1: doc 5 re-delivers the
    // template with a SMALLER id — it must drop against the trigger-0
    // arrival, proving the verdict rides cross-trigger state
    val b0 = Seq((10L, dupText, 0L), (11L, dupText, 0L),
      (20L, "totally different words live here in this other document", 0L))
      .toDF("doc_id", "text", "seq")
    val b1 = Seq((5L, dupText, 1L)).toDF("doc_id", "text", "seq")
    val seen = scala.collection.mutable.Set[String]()
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + i * 60000L)
          seen += f.getName
        }
      }
    }
    val src = Streaming.parquetSource(spark, in, b0.schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingLshDedup(src, "doc_id", "text", "seq",
      shingleN = 3, numHashes = 16, rowsPerBand = 4, maxBucketSize = 100,
      threshold = 0.8, sigPath = sig, sinkPath = out, checkpointPath = ckpt)
    val kept = spark.read.parquet(out).collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L), s"expected first arrivals only, got $kept")
  }

  test("ST16: streaming SCD2 — runs continue, close, and open across triggers") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st16spec-in").toString
    val state = TempDirs.registered("graft-st16spec-state").toString
    val ckpt = TempDirs.registered("graft-st16spec-ckpt").toString
    // d0 opens u->a (run starts at 10) and v->x; d1 closes u's a-run and
    // opens b; d2 CONTINUES u's b-run (valid_from must stay 30, the
    // cross-trigger continuation) and closes v's x-run
    val d0 = Seq(("u", 1L, 10L, "a"), ("u", 2L, 20L, "a"), ("v", 3L, 15L, "x"))
      .toDF("key", "eid", "t", "st")
    val d1 = Seq(("u", 4L, 30L, "b")).toDF("key", "eid", "t", "st")
    val d2 = Seq(("u", 5L, 40L, "b"), ("v", 6L, 50L, "y"))
      .toDF("key", "eid", "t", "st")
    val seen = scala.collection.mutable.Set[String]()
    Seq(d0, d1, d2).zipWithIndex.foreach { case (d, i) =>
      d.coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + i * 60000L)
          seen += f.getName
        }
      }
    }
    val src = Streaming.parquetSource(spark, in, d0.schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingScd2(src, Seq("key"), "st", "t", "eid", state, ckpt)
    val got = Streaming.scd2Snapshot(spark, state)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    val oracle = graft.operators.Relational
      .scd2Timeline(d0.unionByName(d1).unionByName(d2), Seq("key"), "st", "t", "eid")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(got == oracle, s"streaming=$got batch=$oracle")
    assert(got == Set(
      ("u", "a", 10L, Some(30L), false),
      ("u", "b", 30L, None, true),
      ("v", "x", 15L, Some(50L), false),
      ("v", "y", 50L, None, true)))
  }

  test("ST16: untouched open-store bucket is byte-identical across a trigger") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st16bkt-in").toString
    val state = TempDirs.registered("graft-st16bkt-state").toString
    val ckpt = TempDirs.registered("graft-st16bkt-ckpt").toString
    val buckets = 8
    // two keys hashing to DIFFERENT store buckets, picked dynamically so
    // the test never depends on hash internals
    val cand = (0 until 20).map(i => s"k$i")
    val bOf = cand.toDF("key")
      .withColumn("b", pmod(hash(col("key")), lit(buckets)))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val kA = cand.head
    val kB = cand.find(k => bOf(k) != bOf(kA)).get
    val d0 = Seq((kA, 1L, 10L, "a")).toDF("key", "eid", "t", "st")
    d0.coalesce(1).write.mode("append").parquet(in)
    val src0 = Streaming.parquetSource(spark, in, d0.schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingScd2(src0, Seq("key"), "st", "t", "eid", state, ckpt, buckets)
    val bktDir = new java.io.File(s"$state/opens/v0/__bucket=${bOf(kA)}")
    def files() = bktDir.listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
    val before = files()
    assert(before.nonEmpty, s"expected open-run data under $bktDir")
    // trigger 1 touches ONLY kB's bucket — kA's bucket must not be rewritten
    Seq((kB, 2L, 20L, "x")).toDF("key", "eid", "t", "st")
      .coalesce(1).write.mode("append").parquet(in)
    val src1 = Streaming.parquetSource(spark, in, d0.schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingScd2(src1, Seq("key"), "st", "t", "eid", state, ckpt, buckets)
    assert(files() == before,
      "untouched bucket's files must be byte-identical across the trigger")
    val v1Parts = new java.io.File(s"$state/opens/v1").listFiles()
      .map(_.getName).filter(_.startsWith("__bucket=")).toSeq
    assert(v1Parts == Seq(s"__bucket=${bOf(kB)}"),
      s"v1 must hold only the touched bucket: $v1Parts")
    // the manifest stitches old and new versions into one snapshot
    val snap = Streaming.scd2Snapshot(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(snap == Set((kA, "a"), (kB, "x")), s"snapshot=$snap")
  }

  test("ST16: late arrival older than its key's open run is quarantined") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st16late-in").toString
    val state = TempDirs.registered("graft-st16late-state").toString
    val ckpt = TempDirs.registered("graft-st16late-ckpt").toString
    val d0 = Seq(("u", 1L, 10L, "a")).toDF("key", "eid", "t", "st")
    // d1 carries one contract-violating row (t=5 < the open run's
    // valid_from=10) alongside a good state change
    val d1 = Seq(("u", 2L, 5L, "zz"), ("u", 3L, 20L, "b"))
      .toDF("key", "eid", "t", "st")
    val seen = scala.collection.mutable.Set[String]()
    Seq(d0, d1).zipWithIndex.foreach { case (d, i) =>
      d.coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + i * 60000L)
          seen += f.getName
        }
      }
    }
    val src = Streaming.parquetSource(spark, in, d0.schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingScd2(src, Seq("key"), "st", "t", "eid", state, ckpt)
    // timeline as if the late row was never delivered
    val got = Streaming.scd2Snapshot(spark, state)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      ("u", "a", 10L, Some(20L), false),
      ("u", "b", 20L, None, true)), s"timeline corrupted by late row: $got")
    // ... and the offending row is in quarantine with its collision point
    val quar = Streaming.scd2Quarantine(spark, state)
      .select("key", "eid", "t", "st", "__open_from")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(quar == Seq(("u", 2L, 5L, "zz", 10L)), s"quarantine=$quar")
  }

  test("ST22: sessions merge across triggers, break on the exact gap, close by timeout") {
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st22spec-in").toString
    val out = TempDirs.registered("graft-st22spec-out").toString
    val ckpt = TempDirs.registered("graft-st22spec-ckpt").toString
    def ts(s: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(s))
    // gap = 10s. u1: 0s,5s then 14s in the NEXT trigger (< 5+10 — the
    // cross-trigger merge), then 40s (>= 14+10 — gap break closes
    // [0,24) and opens [40,·)). u2: a single 3s event — closeable only
    // by the timeout path. u3: 0s and EXACTLY 10s in one trigger — the
    // strict boundary makes two sessions, the session_window contract.
    val d0 = Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(3)), (3L, ts(0)), (3L, ts(10)))
      .toDF("user_id", "ts")
    val d1 = Seq((1L, ts(14))).toDF("user_id", "ts")
    val d2 = Seq((1L, ts(40))).toDF("user_id", "ts")
    val s1 = Seq((-1L, ts(86400))).toDF("user_id", "ts") // arm the watermark
    val s2 = Seq((-2L, ts(172800))).toDF("user_id", "ts") // fire the timeouts
    val seen = scala.collection.mutable.Set[String]()
    Seq(d0, d1, d2, s1, s2).zipWithIndex.foreach { case (d, i) =>
      d.coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + i * 60000L)
          seen += f.getName
        }
      }
    }
    val src = Streaming.parquetSource(spark, in, d0.schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingSessionize(src, "user_id", "ts",
      gapMs = 10000L, watermarkDelay = "0 seconds", out, ckpt)
    val got = spark.read.parquet(out).filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).getSecond +
          60 * r.getAs[java.time.LocalDateTime](1).getMinute,
        r.getAs[java.time.LocalDateTime](2).getSecond +
          60 * r.getAs[java.time.LocalDateTime](2).getMinute,
        r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 0, 24, 3L),  // cross-trigger merge, closed by the 40s gap break
      (1L, 40, 50, 1L), // reopened run, closed by timeout
      (2L, 3, 13, 1L),  // timeout-only closure
      (3L, 0, 10, 1L),  // strict boundary: 10s starts a NEW session
      (3L, 10, 20, 1L)), s"got $got")
    // sentinel -1's own session flushes too (the trailing no-data batch
    // runs with -2's watermark); only the LAST sentinel's session is
    // still open — and open state is never emitted
    assert(spark.read.parquet(out).filter(col("user_id") === -2L).count() == 0)
  }

  // shared harness for the two tests below: write each delivery as one
  // parquet file with strictly increasing mtime (FileStreamSource orders
  // by timestamp) so maxFilesPerTrigger=1 replays them as triggers.
  private def deliverTriggers(in: String,
                              batches: Seq[Seq[(Long, java.sql.Timestamp)]]): Unit = {
    val seen = scala.collection.mutable.Set[String]()
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + i * 60000L)
          seen += f.getName
        }
      }
    }
  }

  private def usTs(us: Long): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).plusNanos(us * 1000L))

  test("ST22: sub-ms timestamps never flush a session before its true expiry") {
    // Regression for the timeout floor-truncation (ADVICE r13): with
    // lastUs=500 and gap=10s the session truly expires at 10_000_500us,
    // but floor division set the timeout at 10_000ms — 500us early. A
    // watermark landing in [10_000_000, 10_000_500) then fired the
    // timeout, and an ON-TIME event at 10_000_400us in a later trigger
    // found its session flushed and spuriously started a new one. With
    // ceiling division the timeout is 10_001ms, the state survives, and
    // the event merges — one session, the batch session_window answer.
    import graft.io.TempDirs
    val in = TempDirs.registered("graft-st22subms-in").toString
    val out = TempDirs.registered("graft-st22subms-out").toString
    val ckpt = TempDirs.registered("graft-st22subms-ckpt").toString
    val day = 86400L * 1000000L
    deliverTriggers(in, Seq(
      Seq((1L, usTs(500L))),            // open [500, ·) timeout ceil -> 10_001ms
      Seq((-1L, usTs(10000200L))),      // watermark -> 10_000ms after this batch
      Seq((-2L, usTs(10000300L))),      // no data for u1: old code flushed HERE
      Seq((1L, usTs(10000400L))),       // on-time (< 10_000_500): must merge
      Seq((-3L, usTs(day))),            // advance watermark past u1 expiry
      Seq((-4L, usTs(2 * day)))))       // flush stragglers
    val schema = Seq((1L, usTs(0L))).toDF("user_id", "ts").schema
    val src = Streaming.parquetSource(spark, in, schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingSessionize(src, "user_id", "ts",
      gapMs = 10000L, watermarkDelay = "0 seconds", out, ckpt)
    val base = usTs(0L).getTime * 1000L // epoch micros of the t=0 origin
    val got = spark.read.parquet(out).filter(col("user_id") === 1L)
      .select(col("user_id"),
        unix_micros(col("session_start").cast("timestamp")) - base,
        unix_micros(col("session_end").cast("timestamp")) - base,
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 500L, 20000400L, 2L)), s"got $got")
  }

  test("ST22 property: random per-key-ordered delivery matches batch session_window") {
    // The delivery contract (per-key time-ordered across triggers, any
    // order within a trigger) is the operator's whole input space; this
    // replays seeded-random corpora through randomized trigger cuts and
    // per-trigger shuffles — microsecond-granular timestamps included,
    // exactly what would have caught the floor-truncation — and asserts
    // the drained result equals Spark's own batch session_window.
    import graft.io.TempDirs
    val gap = 10000L // ms
    for (seed <- Seq(7L, 23L, 91L)) {
      val rnd = new scala.util.Random(seed)
      val events = (1 to 30).map { _ =>
        val k = 1L + rnd.nextInt(3)
        // 0-120s span, micro-granular: sessions merge, break, and sit
        // near ms boundaries
        val us = rnd.nextInt(120) * 1000000L + rnd.nextInt(1000000)
        (k, us)
      }
      // per-key ascending, cross-key interleave random: sort each key's
      // times, consume them in a shuffled key sequence
      val perKey = events.groupBy(_._1).map { case (k, es) =>
        k -> es.map(_._2).sorted.iterator
      }
      val delivered = rnd.shuffle(events.map(_._1)).map(k => (k, perKey(k).next()))
      // 4 random contiguous trigger cuts + 2 far-future flush sentinels
      val cuts = (Seq(0, delivered.size) ++ Seq.fill(3)(rnd.nextInt(delivered.size + 1)))
        .sorted.distinct
      val day = 86400L * 1000000L
      val batches = cuts.sliding(2).map { case Seq(a, b) =>
        delivered.slice(a, b).map { case (k, us) => (k, usTs(us)) }
      }.filter(_.nonEmpty).toSeq ++
        Seq(Seq((-1L, usTs(3 * day))), Seq((-2L, usTs(6 * day))))
      val in = TempDirs.registered(s"graft-st22prop$seed-in").toString
      val out = TempDirs.registered(s"graft-st22prop$seed-out").toString
      val ckpt = TempDirs.registered(s"graft-st22prop$seed-ckpt").toString
      deliverTriggers(in, batches)
      val schema = Seq((1L, usTs(0L))).toDF("user_id", "ts").schema
      val src = Streaming.parquetSource(spark, in, schema, maxFilesPerTrigger = 1)
      // watermark delay covers the full corpus span: every event is
      // on-time no matter which trigger its key's interleave landed in
      Streaming.runStreamingSessionize(src, "user_id", "ts",
        gapMs = gap, watermarkDelay = "1 day", out, ckpt)
      val got = spark.read.parquet(out).filter(col("user_id") > 0)
        .select(col("user_id"),
          unix_micros(col("session_start").cast("timestamp")).as("s"),
          unix_micros(col("session_end").cast("timestamp")).as("e"),
          col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = delivered.map { case (k, us) => (k, usTs(us)) }
        .toDF("user_id", "ts")
        .groupBy(col("user_id"), session_window(col("ts"), s"$gap milliseconds"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("s"),
          unix_micros(col("session_window.end")).as("e"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("ST10/ST15 property: any delivery order and trigger cut yields snapshot == batch keep-last") {
    // The merge's whole input space: updates may arrive in ANY order
    // (versions out of order across and within triggers) and under any
    // trigger partitioning, with or without compaction. Keep-last by
    // the explicit version column is order-independent (max per key),
    // so every replay must converge to the same snapshot as a plain
    // batch keep-last over everything delivered — the ST22 sessionizer
    // got this property in r15; this is the ST10/ST15 counterpart.
    import graft.io.TempDirs
    for (seed <- Seq(5L, 41L, 77L)) {
      val rnd = new scala.util.Random(seed)
      // 8 keys × 1-6 versions each; (key, version) unique so keep-last
      // has no ties to break
      val rows: Seq[(Long, Double, Long)] = (1L to 8L).flatMap { k =>
        val nv = 1 + rnd.nextInt(6)
        (1 to nv).map(v => (k, k * 100.0 + v * 7 + rnd.nextInt(5), v.toLong))
      }
      val delivered = rnd.shuffle(rows)
      val cuts = (Seq(0, delivered.size) ++ Seq.fill(3)(rnd.nextInt(delivered.size + 1)))
        .sorted.distinct
      val batches = cuts.sliding(2).map { case Seq(a, b) =>
        delivered.slice(a, b)
      }.filter(_.nonEmpty).toSeq
      val in = TempDirs.registered(s"graft-st10prop$seed-in").toString
      val state = TempDirs.registered(s"graft-st10prop$seed-state").toString
      val ckpt = TempDirs.registered(s"graft-st10prop$seed-ckpt").toString
      val seen = scala.collection.mutable.Set[String]()
      batches.zipWithIndex.foreach { case (b, i) =>
        b.toDF("k", "price", "version").coalesce(1).write.mode("append").parquet(in)
        new java.io.File(in).listFiles().foreach { f =>
          if (!seen.contains(f.getName)) {
            if (f.getName.startsWith("part-"))
              f.setLastModified(1700000000000L + i * 60000L)
            seen += f.getName
          }
        }
      }
      val schema = Seq((1L, 1.0, 1L)).toDF("k", "price", "version").schema
      val src = Streaming.parquetSource(spark, in, schema, maxFilesPerTrigger = 1)
      // odd seeds exercise the compacting variant (ST15), even the plain
      val compactEvery = if (seed % 2 == 1) 2 else 0
      Streaming.runIncrementalMerge(src, Seq("k"), "version", buckets = 4,
        state, ckpt, compactEvery)
      val got = Streaming.mergedSnapshot(spark, state)
        .select(col("k"), col("price"), col("version"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).map { case (_, vs) => vs.maxBy(_._3) }.toSet
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("ST23: streaming MW weights stay a simplex and favor the persistently lossy stratum") {
    val in = tmp("graft-st23-in")
    val state = tmp("graft-st23-state")
    val ckpt = tmp("graft-st23-ckpt")
    // stratum "bad" carries low quality (qq=2000) in EVERY delivery,
    // "good" high (qq=9000) — MW must shift weight toward "bad"
    for (b <- 1 to 3) {
      (1 to 10).flatMap(i => Seq(("bad", 2000L), ("good", 9000L)))
        .toDF("source", "qq").coalesce(1).write.parquet(s"$in/b$b")
    }
    val schema = spark.read.parquet(s"$in/b1").schema
    val src = Streaming.parquetSource(spark, s"$in/*", schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingReweight(src, "source", col("qq"),
      etaDen = 2L, lossScale = 10000L, stateRoot = state, checkpointPath = ckpt)
    val w = Streaming.sgdWeights(spark, state)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w.values.sum == 10000L, s"simplex after drain: $w")
    assert(w("bad") > w("good"), s"lossy stratum must gain weight: $w")
    assert(w("bad") > 5000L, s"three MW rounds from uniform must tip past half: $w")
    // every trigger committed a versioned simplex
    val versions = new java.io.File(state).listFiles().filter(_.getName.startsWith("w"))
    assert(versions.length == 3, s"one weight version per delivery: ${versions.toSeq}")
  }

  test("ST23: a stratum first seen after delivery 0 is ignored per contract — " +
       "and now observably: named in the dropped<id> sidecar, absent from weights") {
    val in = tmp("graft-st23b-in")
    val state = tmp("graft-st23b-state")
    val ckpt = tmp("graft-st23b-ckpt")
    Seq(("a", 5000L), ("b", 7000L)).toDF("source", "qq")
      .coalesce(1).write.parquet(s"$in/b1")
    Seq(("a", 5000L), ("late", 1000L)).toDF("source", "qq")
      .coalesce(1).write.parquet(s"$in/b2")
    // pin delivery order by mtime (the source orders files by timestamp)
    Seq("b1", "b2").zipWithIndex.foreach { case (d, i) =>
      new java.io.File(s"$in/$d").listFiles()
        .filter(_.getName.startsWith("part-"))
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(s"$in/b1").schema
    val src = Streaming.parquetSource(spark, s"$in/*", schema, maxFilesPerTrigger = 1)
    Streaming.runStreamingReweight(src, "source", col("qq"),
      etaDen = 2L, lossScale = 10000L, stateRoot = state, checkpointPath = ckpt)
    val w = Streaming.sgdWeights(spark, state)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set("a", "b"),
      s"the delivery-0 universe is pinned; 'late' must not join: $w")
    assert(w.values.sum == 10000L, s"still a simplex: $w")
    val sidecars = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("dropped"))
    assert(sidecars.length == 1,
      s"exactly the one trigger that dropped a stratum writes a sidecar: ${sidecars.toSeq}")
    val named = spark.read.parquet(sidecars.head.getPath)
      .collect().map(_.getString(0)).toSeq
    assert(named == Seq("late"), s"the dropped stratum must be named: $named")
  }

  test("mergedSnapshot skips an uncommitted (crashed partial) version dir") {
    import graft.io.TempDirs
    val state = TempDirs.registered("graft-snap-partial").toString
    // batch 0 fully committed: v0 bucket data + manifest m0 (with its
    // parquet _SUCCESS — the commit point) mapping bucket 0 -> v0
    val committed = Seq((1L, 10L)).toDF("k", "amt").withColumn("__bucket", lit(0))
    committed.write.partitionBy("__bucket").mode("overwrite").parquet(s"$state/v0")
    Seq((0, 0L)).toDF("bucket", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$state/m0")
    // fake a crash during batch 1: v1 bucket data landed, and the manifest
    // write itself died before its _SUCCESS marker — m1 must be invisible
    val partial = Seq((1L, 999L)).toDF("k", "amt").withColumn("__bucket", lit(0))
    partial.write.partitionBy("__bucket").mode("overwrite").parquet(s"$state/v1")
    Seq((0, 1L)).toDF("bucket", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$state/m1")
    assert(new java.io.File(s"$state/m1/_SUCCESS").delete())
    val snap = Streaming.mergedSnapshot(spark, state)
      .select("k", "amt").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap == Seq((1L, 10L)), s"snapshot must read v0, not the partial v1: $snap")
  }

  test("mergedSnapshot reads the newest COMMITTED manifest once it lands") {
    import graft.io.TempDirs
    val state = TempDirs.registered("graft-snap-committed").toString
    val v0 = Seq((1L, 10L)).toDF("k", "amt").withColumn("__bucket", lit(0))
    v0.write.partitionBy("__bucket").mode("overwrite").parquet(s"$state/v0")
    Seq((0, 0L)).toDF("bucket", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$state/m0")
    // batch 1 commits cleanly: its manifest supersedes m0
    val v1 = Seq((1L, 999L)).toDF("k", "amt").withColumn("__bucket", lit(0))
    v1.write.partitionBy("__bucket").mode("overwrite").parquet(s"$state/v1")
    Seq((0, 1L)).toDF("bucket", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$state/m1")
    val snap = Streaming.mergedSnapshot(spark, state)
      .select("k", "amt").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap == Seq((1L, 999L)), s"snapshot must follow committed m1: $snap")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Curation, Relational}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // -----------------------------------------------------------------
  // Connected components
  // -----------------------------------------------------------------
  test("connectedComponents resolves transitive clusters to min id") {
    // chain 1-2-3-4, pair 10-11, singletons 20, 21
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Curation.connectedComponents(nodes, "id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("connectedComponents handles a long chain (pointer jumping)") {
    // path 0-1-2-...-30: min label must traverse the full diameter,
    // which plain propagation would need 30 rounds for; the jump step
    // must get there within the default iteration cap.
    val n = 31
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val out = Curation.connectedComponents(nodes, "id", edges)
      .agg(max(col("component")), min(col("component"))).head()
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L)
  }

  test("connectedComponents with no edges maps every node to itself") {
    val nodes = Seq(5L, 6L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Curation.connectedComponents(nodes, "id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(5L -> 5L, 6L -> 6L))
  }

  // -----------------------------------------------------------------
  // Decontamination
  // -----------------------------------------------------------------
  test("contaminationReport counts distinct shared n-grams per doc") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over me"), // shares 3-grams
      (2L, "completely different words entirely here"),
      (3L, "the quick brown cat sat")            // shares only 1 three-gram
    ).toDF("id", "text")
    val out = Curation.contaminationReport(corpus, bench, "id", "text", 3, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "the quick brown","quick brown fox","brown fox jumps" = 3
    assert(out == Map(1L -> 3L))
  }

  test("semanticContamination: max cosine, smallest-id tiebreak, threshold verdict") {
    val emb = Seq(
      (1L, Array(1f, 0f)),     // cos 1.0 with bench 100 AND 102 -> tie, top=100
      (2L, Array(0.6f, 0.8f)), // cos .6 / .8 / .6 -> top=101, below threshold
      (3L, Array(0f, 0f))      // zero vector: cosine defined as 0, passes
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Array(1f, 0f)), (101L, Array(0f, 1f)), (102L, Array(1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Curation.semanticContamination(emb, "vec_id", "embedding",
        bench, threshold = 0.99)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((100L, 1.0, true)), out)  // tie -> smallest bench id
    assert(out(2L) == ((101L, 0.8, false)), out)
    assert(out(3L) == ((100L, 0.0, false)), out) // all-zero: max over 0.0s
    // empty benchmark: nothing to leak against -> empty report
    assert(Curation.semanticContamination(emb, "vec_id", "embedding",
      bench.limit(0), 0.5).count() == 0)
  }

  test("semanticContamination: literal-matrix fast path bit-identical to the join form") {
    import org.apache.spark.sql.DataFrame
    val emb = Seq(
      (1L, Array(1f, 0f)), (1L, Array(0f, 1f)), // duplicate id: max over both rows' pairs
      (2L, Array(-1f, 0f)),                     // negative cosines only
      (3L, Array(0f, 0f)),                      // zero corpus vector -> all cos 0.0
      (4L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (102L, Array(1f, 0f)), (100L, Array(1f, 0f)), // tie -> smallest id
      (101L, Array(0f, 1f)),
      (103L, Array(0f, 0f))                          // zero bench vector -> cos 0.0
    ).toDF("vec_id", "embedding")
    def canon(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      if (r.isNullAt(3)) null else r.getBoolean(3))).toSet
    val fast = Curation.semanticContamination(emb, "vec_id", "embedding", bench, 0.5)
    // local relations constant-fold the projection (interpreted eval);
    // the analyzed plan still shows which path was built
    assert(fast.queryExecution.analyzed.toString.contains("bench_max_cos"),
      "fixture must exercise the literal-matrix path")
    val join = Curation.semanticContaminationJoin(emb, "vec_id", "embedding", bench, 0.5)
    assert(canon(fast) == canon(join))
    assert(fast.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      join.schema.fields.map(f => (f.name, f.dataType)).toSeq)

    // file-backed corpus: the projection survives to execution, so this
    // round covers the CODEGEN path (doGenCode), not just eval()
    val dir = graft.io.TempDirs.registered("graft-maxcos-parity").toString
    emb.write.mode("overwrite").parquet(dir)
    val embF = spark.read.parquet(dir)
    val fastF = Curation.semanticContamination(embF, "vec_id", "embedding", bench, 0.5)
    assert(fastF.queryExecution.executedPlan.toString.contains("bench_max_cos"),
      "file-backed run must execute the native expression")
    assert(canon(fastF) ==
      canon(Curation.semanticContaminationJoin(embF, "vec_id", "embedding", bench, 0.5)))

    // every bench vector length-mismatched: vec_dot's null poisons the
    // cosine, so max_cos and the verdict are NULL in both forms
    val benchBad = Seq((200L, Array(1f, 0f, 1f))).toDF("vec_id", "embedding")
    val fastBad = Curation.semanticContamination(emb, "vec_id", "embedding", benchBad, 0.5)
    assert(canon(fastBad) ==
      canon(Curation.semanticContaminationJoin(emb, "vec_id", "embedding", benchBad, 0.5)))
    // the zero corpus vector short-circuits on en > 0 (cos 0.0, verdict
    // false) BEFORE the length check; every other row reaches the dot
    // and nulls out
    assert(canon(fastBad).forall { case (id, bid, c, v) =>
      bid == 200L && (if (id == 3L) c == 0.0 && v == false else c == null && v == null)
    }, canon(fastBad))
  }

  // -----------------------------------------------------------------
  // Stratified sampling
  // -----------------------------------------------------------------
  test("stratifiedSample is deterministic and rate-proportional") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val rates = Seq(("a", 5000L), ("b", 1000L)).toDF("stratum", "rate_bp")
    val s1 = Curation.stratifiedSample(df, "stratum", col("id"), rates, "s")
    val s2 = Curation.stratifiedSample(df, "stratum", col("id"), rates, "s")
    assert(s1.collect().toSet == s2.collect().toSet) // reproducible
    val counts = s1.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 candidates per stratum at 50% / 10%: expect ~500 / ~100
    assert(counts("a") > 400 && counts("a") < 600)
    assert(counts("b") > 50 && counts("b") < 160)
    // different salt draws a different sample
    val s3 = Curation.stratifiedSample(df, "stratum", col("id"), rates, "t")
    assert(s3.collect().toSet != s1.collect().toSet)
  }

  // -----------------------------------------------------------------
  // Shard packing
  // -----------------------------------------------------------------
  test("packShards assigns shards by exclusive running token total") {
    val df = Seq(
      ("g", 1L, 600L), ("g", 2L, 600L), ("g", 3L, 600L), ("g", 4L, 600L),
      ("h", 1L, 2500L), ("h", 2L, 10L)
    ).toDF("grp", "id", "tok")
    val out = Curation.packShards(df, "grp", "id", col("tok"), 1000L)
      .select(col("grp"), col("id"), col("shard"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // g: cum_excl 0,600,1200,1800 -> shards 0,0,1,1
    assert(out(("g", 1L)) == 0L && out(("g", 2L)) == 0L)
    assert(out(("g", 3L)) == 1L && out(("g", 4L)) == 1L)
    // h: oversized first doc still lands in shard 0; next starts at 2500
    assert(out(("h", 1L)) == 0L && out(("h", 2L)) == 2L)
  }

  test("packWindows splits documents across fixed context windows exactly") {
    // L=10, docs of 4/8/10/3 tokens at prev offsets 0/4/12/22:
    //   doc1 [0,4)   -> w0 seg(doc 0, win 0, len 4)
    //   doc2 [4,12)  -> w0 seg(0, 4, 6) + w1 seg(6, 0, 2)
    //   doc3 [12,22) -> w1 seg(0, 2, 8) + w2 seg(8, 0, 2)
    //   doc4 [22,25) -> w2 seg(0, 2, 3)
    val df = Seq(("g", 1L, 4L), ("g", 2L, 8L), ("g", 3L, 10L), ("g", 4L, 3L),
      ("g", 5L, 0L) // zero-token doc occupies no window space
    ).toDF("grp", "id", "tok")
    val out = Curation.packWindows(df, "grp", "id", col("tok"), 10L)
      .select(col("id"), col("window"), col("doc_tok_start"),
        col("win_tok_start"), col("seg_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(
      (1L, 0L, 0L, 0L, 4L),
      (2L, 0L, 0L, 4L, 6L), (2L, 1L, 6L, 0L, 2L),
      (3L, 1L, 0L, 2L, 8L), (3L, 2L, 8L, 0L, 2L),
      (4L, 2L, 0L, 2L, 3L)), out)
    // invariants: every window holds exactly L tokens except the last,
    // and each document's segments cover it exactly once
    val segs = out.toSeq
    val perWin = segs.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(perWin == Map(0L -> 10L, 1L -> 10L, 2L -> 5L), perWin)
    val perDoc = segs.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    assert(perDoc == Map(1L -> 4L, 2L -> 8L, 3L -> 10L, 4L -> 3L), perDoc)
  }

  // -----------------------------------------------------------------
  // Quality tiers
  // -----------------------------------------------------------------
  test("qualityTiers ranks within stratum, deterministic on ties") {
    val df = Seq(
      ("s", 1L, 0.9), ("s", 2L, 0.9), ("s", 3L, 0.5), ("s", 4L, 0.1),
      ("t", 9L, 0.2)
    ).toDF("stratum", "id", "q")
    val out = Curation.qualityTiers(df, "stratum", "id", col("q"), 2)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(out(1L) == 1 && out(2L) == 1) // top half (tie broken by id, both fit)
    assert(out(3L) == 2 && out(4L) == 2)
    assert(out(9L) == 1) // single-row stratum -> tier 1
  }

  // -----------------------------------------------------------------
  // Source-level gate
  // -----------------------------------------------------------------
  test("sourceFilter keeps only sources passing both floors, annotated with stats") {
    val df = Seq(
      (1L, "good", 0.9), (2L, "good", 0.8),   // mean 0.85, n=2 -> kept
      (3L, "spam", 0.5), (4L, "spam", 0.8),   // mean 0.65 < 0.7 -> dropped
      (5L, "tiny", 0.95)                      // n=1 < 2 -> dropped
    ).toDF("doc_id", "source", "q")
    val out = Curation.sourceFilter(df, "source", col("q"),
      minMeanQuality = 0.7, minDocs = 2L).collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.getAs[String]("source") == "good"
      && r.getAs[Long]("src_n_docs") == 2L
      && r.getAs[Double]("src_mean_q") == 0.85))
  }

  test("sourceFilter broadcasts the per-source stats back onto the corpus") {
    val df = Seq((1L, "a", 0.9)).toDF("doc_id", "source", "q")
    val plan = Curation.sourceFilter(df, "source", col("q"), 0.5, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$plan")
  }

  // -----------------------------------------------------------------
  // Column profile
  // -----------------------------------------------------------------
  test("columnProfile computes per-column stats in one pass") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.5), (2L, null), (2L, 3.5)).toDF("k", "v")
    val out = Curation.columnProfile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("k") == ((3L, 0L, 2L, 1.0, 2.0)))
    assert(out("v") == ((3L, 1L, 2L, 1.5, 3.5)))
  }

  // -----------------------------------------------------------------
  // PII redaction
  // -----------------------------------------------------------------
  test("redactPii scrubs emails, phones, SSNs and leaves text intact") {
    val df = Seq(
      "mail me at jo.doe+x@corp.example.org thanks",
      "call (973) 555-0199 or 201-555-0100 today",
      "ssn is 123-45-6789 ok",
      "no pii here, just 12345 numbers"
    ).toDF("t").select(graft.functions.Text.redactPii(col("t")).as("r"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> thanks")
    assert(out(1) == "call <PHONE> or <PHONE> today")
    assert(out(2) == "ssn is <SSN> ok")
    assert(out(3) == "no pii here, just 12345 numbers")
  }

  // -----------------------------------------------------------------
  // Sessionization
  // -----------------------------------------------------------------
  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      ("u", 1L, 0L), ("u", 2L, 1000L), ("u", 3L, 2800L),  // gaps 1000, 1800 -> same session
      ("u", 4L, 4601L),                                   // gap 1801 -> new session
      ("v", 9L, 50L)                                      // other key -> own session 1
    ).toDF("key", "eid", "sec")
      .select(col("key"), col("eid"),
        expr("timestampadd(SECOND, CAST(sec AS INT), TIMESTAMP_NTZ '2024-01-01 00:00:00')").as("ts"))
    val out = Relational.sessionize(df, Seq("key"), "ts", 1800L, "eid")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 9L -> 1L))
  }

  // -----------------------------------------------------------------
  // SCD2 timeline
  // -----------------------------------------------------------------
  test("scd2Timeline collapses state runs into validity intervals") {
    val df = Seq(
      ("u", 1L, 10L, "a"), ("u", 2L, 20L, "a"),  // run a: [10, 30)
      ("u", 3L, 30L, "b"),                       // run b: [30, 40)
      ("u", 4L, 40L, "a"),                       // a returns: [40, null) current
      ("v", 9L, 5L, "x")                         // own single current run
    ).toDF("key", "eid", "t", "st")
    val out = Relational.scd2Timeline(df, Seq("key"), "st", "t", "eid")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      ("u", "a", 10L, Some(30L), false),
      ("u", "b", 30L, Some(40L), false),
      ("u", "a", 40L, None, true),
      ("v", "x", 5L, None, true)))
  }

  test("scd2Timeline intervals partition the key's time axis (as-of enrichment)") {
    val df = Seq(
      ("u", 1L, 10L, "a"), ("u", 2L, 30L, "b"), ("u", 3L, 30L, "b"))
      .toDF("key", "eid", "t", "st")
    val tl = Relational.scd2Timeline(df, Seq("key"), "st", "t", "eid")
    // facts at the boundary take the NEW state ([valid_from, valid_to)),
    // before the first event they take none, and every in-range fact
    // matches exactly one interval — the property as-of enrichment needs
    val facts = Seq(("u", 5L), ("u", 10L), ("u", 29L), ("u", 30L), ("u", 100L))
      .toDF("key", "ft")
    val enriched = facts.join(tl,
        facts("key") === tl("key") && facts("ft") >= tl("valid_from") &&
          (tl("valid_to").isNull || facts("ft") < tl("valid_to")),
        "left")
      .select(facts("ft"), tl("state"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)))
    assert(enriched.length == 5, "each fact matches at most one interval")
    assert(enriched.toMap == Map(5L -> None, 10L -> Some("a"),
      29L -> Some("a"), 30L -> Some("b"), 100L -> Some("b")))
  }

  test("scd2Timeline keeps a leading null state and collapses null runs") {
    val df = Seq(
      ("u", 1L, 10L, None),          // leading null state is a real run
      ("u", 2L, 20L, None),          // null-to-null: same run
      ("u", 3L, 30L, Some("a"))      // null -> a: change
    ).toDF("key", "eid", "t", "st")
    val out = Relational.scd2Timeline(df, Seq("key"), "st", "t", "eid")
      .collect()
      .map(r => (Option(r.getString(1)), r.getLong(2), r.getBoolean(4)))
      .toSet
    assert(out == Set((None, 10L, false), (Some("a"), 30L, true)))
  }

  // -----------------------------------------------------------------
  // As-of join
  // -----------------------------------------------------------------
  test("asofJoin picks latest strictly-prior right row per key") {
    val left = Seq(
      (1L, "u", 100L, "p100"), // prior rights at 50, 90 -> picks 90
      (2L, "u", 50L, "p50"),   // right at exactly 50 NOT visible (strict) -> 10
      (3L, "u", 5L, "p5"),     // nothing prior -> null
      (4L, "v", 100L, "pv")    // other key, no rights -> null
    ).toDF("lid", "key", "ts", "lpay")
    val right = Seq(
      ("u", 10L, 1L, "r10"), ("u", 50L, 2L, "r50"), ("u", 90L, 3L, "r90"),
      ("u", 90L, 4L, "r90b") // equal-time rights: max tiebreak (rid=4) wins
    ).toDF("key", "ts", "rid", "rpay")
    val out = Relational.asofJoin(left, right, Seq("key"), "ts",
        payload = Seq("rid", "rpay"), tiebreak = "rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) null else r.getLong(4).toString)).toMap
    assert(out == Map(1L -> "4", 2L -> "1", 3L -> null, 4L -> null))
  }

  // -----------------------------------------------------------------
  // Top-k aggregator
  // -----------------------------------------------------------------
  test("topKPerKey keeps k best per key, deterministic under repartition") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
      ("b", 7L, 2.0)
    ).toDF("key", "id", "score")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TopK.topKPerKey(d, Seq("key"), "id", "score", 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val out = run(df)
    // ties at 9.0 break to the lower id (2 before 3); k=2 drops id 1 and 4
    assert(out == Set(("a", 2L, 9.0, 1L), ("a", 3L, 9.0, 2L), ("b", 7L, 2.0, 1L)))
    assert(run(df.repartition(7)) == out) // partitioning-independent
  }

  test("topKPerKey plans a partial aggregation before the exchange") {
    val df = Seq(("a", 1L, 5.0)).toDF("key", "id", "score")
    val plan = graft.operators.TopK.topKPerKey(df, Seq("key"), "id", "score", 2)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial_topkagg(...) must appear below the shuffle:
    // that is the map-side k-buffer that shrinks the exchange.
    assert(plan.contains("partial_topkagg"), s"no partial aggregation in:\n$plan")
  }

  // -----------------------------------------------------------------
  // Range join
  // -----------------------------------------------------------------
  test("rangeJoin matches point-in-interval exactly, no nested loop") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 14.99), (4L, 15.0), (5L, -3.0))
      .toDF("pid", "v")
    val intervals = Seq(("w1", 5.0, 15.0), ("w2", -10.0, 0.0)).toDF("w", "lo", "hi")
    val out = Relational.rangeJoin(points, "v", intervals, "lo", "hi", 10.0)
    val got = out.select(col("pid"), col("w")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // [5,15): pids 1,2,3 (15.0 excluded); [-10,0): pid 5
    assert(got == Set((1L, "w1"), (2L, "w1"), (3L, "w1"), (5L, "w2")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"range join must be a bucket equi-join, got:\n$plan")
  }

  // -----------------------------------------------------------------
  // Mixture sampling
  // -----------------------------------------------------------------
  test("mixtureSample keeps everything when target exceeds availability") {
    val df = (0 until 100).map(i => (i.toLong, "s", 10L)).toDF("id", "src", "tok")
    val targets = Seq(("s", 100000L)).toDF("src", "target_tokens")
    val out = Curation.mixtureSample(df, "src", col("id"), col("tok"), targets, "x")
    assert(out.count() == 100) // rate capped at 10000 bp
    // a small target keeps roughly the proportional subset, deterministically
    val small = Curation.mixtureSample(df, "src", col("id"), col("tok"),
      Seq(("s", 300L)).toDF("src", "target_tokens"), "x")
    val n = small.count()
    assert(n > 10 && n < 55, s"expected ~30% kept, got $n")
    assert(small.collect().toSet ==
      Curation.mixtureSample(df, "src", col("id"), col("tok"),
        Seq(("s", 300L)).toDF("src", "target_tokens"), "x").collect().toSet)
  }

  // -----------------------------------------------------------------
  // KMV sketch
  // -----------------------------------------------------------------
  test("kmvDistinct: exact below k, within ~4 stderr above k, deterministic") {
    val df = (1 to 5000).map(i => ("big", s"val$i")) ++ (1 to 10).map(i => ("small", s"v$i"))
    val d = df.toDF("g", "v")
    val out = graft.operators.Sketch.kmvDistinct(d, Seq("g"), col("v"), 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("small") == ((10L, 10L))) // below k -> exact
    val (kept, est) = out("big")
    assert(kept == 64L)
    // KMV stderr ~ n/sqrt(k-1) = 5000/7.9 ~ 630; allow 4 sigma
    assert(math.abs(est - 5000L) < 2520, s"estimate $est too far from 5000")
    val again = graft.operators.Sketch.kmvDistinct(d.repartition(7), Seq("g"), col("v"), 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again("big") == est) // partitioning-independent
  }

  test("kmvSetEstimates: identical sets coincide, disjoint sets intersect ~0") {
    val idSet = (1 to 500).map(i => s"x$i")
    val same = (idSet.map(("a", _)) ++ idSet.map(("b", _))).toDF("g", "v")
    val r1 = graft.operators.Sketch.kmvSetEstimates(same, "g", col("v"), "a", "b", 32).head()
    // identical member sets -> identical sketches -> all four estimates equal
    assert(r1.getLong(0) == r1.getLong(1) && r1.getLong(1) == r1.getLong(2)
      && r1.getLong(2) == r1.getLong(3))
    val disjoint = ((1 to 500).map(i => ("a", s"l$i")) ++ (1 to 500).map(i => ("b", s"r$i")))
      .toDF("g", "v")
    val r2 = graft.operators.Sketch.kmvSetEstimates(disjoint, "g", col("v"), "a", "b", 32).head()
    assert(r2.getLong(3) == 0L) // no shared hashes -> zero intersection estimate
    assert(r2.getLong(2) >= math.max(r2.getLong(0), r2.getLong(1))) // union >= sides
  }

  // -----------------------------------------------------------------
  // Line-level boilerplate removal
  // -----------------------------------------------------------------
  test("lineDedup drops corpus-frequent lines, keeps per-doc repeats and order") {
    val docs = Seq(
      (1L, "COMMON\nalpha one\nalpha one\nbeta"), // internal repeat is NOT boilerplate
      (2L, "COMMON\ngamma"),
      (3L, "COMMON\ndelta"),
      (4L, "COMMON")                              // all lines boilerplate
    ).toDF("id", "text")
    val out = Curation.lineDedup(docs, "id", "text", maxDocFreq = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("alpha one\nalpha one\nbeta", 3L)))
    assert(out(2L) == (("gamma", 1L)))
    assert(out(3L) == (("delta", 1L)))
    assert(out(4L) == (("", 0L))) // doc survives as a row even when emptied
  }

  test("lineDedup ignores empty lines when counting boilerplate") {
    val docs = Seq((1L, "a\n\nb"), (2L, "\nc"), (3L, "\nd"), (4L, "\ne")).toDF("id", "text")
    // '' occurs in 4 docs >= 3 but must never be treated as boilerplate
    val out = Curation.lineDedup(docs, "id", "text", maxDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a\n\nb" && out(2L) == "\nc")
  }

  test("removeRepeatedSpans cuts cross-doc spans, keeps unique text and short docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "lazy the quick brown dog barks"),   // shares "the quick brown" with 1, 4
      (3L, "completely unique text here now"),
      (4L, "the quick brown"),                  // IS the duplicated span
      (5L, "ab cd")                             // shorter than a window
    ).toDF("id", "text")
    val out = Curation.removeRepeatedSpans(docs, "id", "text", n = 3, minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 3L, "fox jumps")))
    assert(out(2L) == ((3L, 3L, "lazy dog barks")))
    assert(out(3L) == ((5L, 0L, "completely unique text here now")))
    assert(out(4L) == ((0L, 3L, "")))      // fully-duplicated doc survives as an empty row
    assert(out(5L) == ((2L, 0L, "ab cd")))
  }

  // -----------------------------------------------------------------
  // Bloom-gated decontamination
  // -----------------------------------------------------------------
  test("bloomKeepClean equals exact anti-join, including under forced false positives") {
    val corpus = (1 to 200).map(i => (i.toLong, s"key$i")).toDF("id", "k")
    val dirty = (1 to 200 by 3).map(i => s"key$i").toDF("dk")
    // m = 64 bits for 134 probe insertions -> bitmap is saturated, most
    // clean rows are Bloom false positives -> the exact confirm join is
    // genuinely load-bearing here
    val kept = Curation.bloomKeepClean(corpus, "k", dirty, "dk", mBits = 64)
      .collect().map(_.getLong(0)).toSet
    val expected = (1 to 200).filter(_ % 3 != 1).map(_.toLong).toSet
    assert(kept == expected)
  }

  test("bloomKeepClean with empty dirty set keeps everything") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val dirty = Seq.empty[String].toDF("dk")
    assert(Curation.bloomKeepClean(corpus, "k", dirty, "dk").count() == 2L)
  }

  test("splitLeakage reports only cross-split pairs, unordered, with exact mean") {
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.85), (5L, 6L, 1.0), (7L, 8L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val splits = Seq(1L -> "train", 2L -> "test", 3L -> "train", 4L -> "train",
      5L -> "val", 6L -> "test", 7L -> "test", 8L -> "train")
      .toDF("doc_id", "split")
    val r = Curation.splitLeakage(pairs, splits, "doc_id", "split")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // (3,4) is train-train: dropped. (1,2) and (7,8) both land in
    // (test, train) regardless of pair orientation; (5,6) in (test, val)
    assert(r.size == 2)
    val tt = r(("test", "train"))
    assert(tt.getAs[Long]("n_pairs") == 2L)
    assert(tt.getAs[Double]("max_sim") == 0.9)
    assert(tt.getAs[Double]("mean_sim") == 0.85) // (9000+8000)/1e4/2
    val tv = r(("test", "val"))
    assert(tv.getAs[Long]("n_pairs") == 1L && tv.getAs[Double]("max_sim") == 1.0)
  }

  test("Wilson lower bound: small perfect sources rank below large near-perfect ones") {
    import spark.implicits._
    // tiny: 3/3 pass; large: 95/100 pass
    val rows = Seq.fill(3)(("tiny", true)) ++
      Seq.fill(95)(("big", true)) ++ Seq.fill(5)(("big", false))
    val out = Curation.sourceWilson(rows.toDF("source", "ok"), "source", col("ok"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (tn, tp, tRate, tLow) = out("tiny")
    val (bn, bp, bRate, bLow) = out("big")
    assert(tRate == 1.0 && bRate == 0.95)
    assert(tLow < bLow,
      s"3/3 (lower=$tLow) must not outrank 95/100 (lower=$bLow)")
    assert(tLow > 0.0 && bLow > 0.0 && tLow < 1.0 && bLow < 1.0)
    assert((tn, tp) == ((3L, 3L)) && (bn, bp) == ((100L, 95L)))
  }

  test("temperatureTargets: weights sum to exactly 10000, tau flattens the mix") {
    val docs = (Seq.fill(90)("big") ++ Seq.fill(10)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s, 100L) }
      .toDF("id", "source", "n_tok")
    def weights(tau: Double): Map[String, Long] =
      Curation.temperatureTargets(docs, "source", col("n_tok"), tau, 1000000L)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val w1 = weights(1.0) // natural proportions: 9000 / 1000
    val wHalf = weights(0.5) // sqrt: 3:1 -> 7500 / 2500
    assert(w1.values.sum == 10000L && wHalf.values.sum == 10000L)
    assert(w1("big") == 9000L && w1("small") == 1000L)
    assert(wHalf("big") == 7500L && wHalf("small") == 2500L)
    assert(wHalf("small") > w1("small"), "lower tau must up-weight the small stratum")
  }

  test("temperatureTargets: largest-remainder top-up lands targets on the budget") {
    // three equal strata: 10000 bp doesn't divide by 3 — exactly one
    // stratum (first by the deterministic tie order) gets the +1
    val docs = Seq((1L, "a", 50L), (2L, "b", 50L), (3L, "c", 50L))
      .toDF("id", "source", "n_tok")
    val out = Curation.temperatureTargets(docs, "source", col("n_tok"), 1.0, 30000L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.values.map(_._1).sum == 10000L)
    assert(out("a") == ((3334L, 10002L)) && out("b") == ((3333L, 9999L)) &&
      out("c") == ((3333L, 9999L)))
  }

  test("epochize: emitted tokens per stratum land within bp-resolution of the target") {
    val docs = (0 until 40).map(i => (i.toLong, "s", 25L)).toDF("id", "source", "n_tok")
    val targets = Seq(("s", 3600L)).toDF("source", "target_tokens") // 3.6 epochs of 1000
    val out = Curation.epochize(docs, "source", col("id"), col("n_tok"), targets, "t")
    val emitted = out.agg(sum(col("n_tok"))).head().getLong(0)
    // full copies contribute exactly 3000; the hash-gated fractional
    // epoch approximates the remaining 600 at bp resolution over 40 docs
    assert(emitted >= 3000L && emitted <= 4000L)
    assert(math.abs(emitted - 3600L) <= 25L * 4,
      s"fractional epoch too far off target: $emitted vs 3600")
    // every full epoch contains every doc exactly once
    val perEpoch = out.groupBy(col("epoch")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perEpoch(0L) == 40L && perEpoch(1L) == 40L && perEpoch(2L) == 40L)
    assert(perEpoch.getOrElse(3L, 0L) < 40L && !perEpoch.contains(4L))
  }

  test("epochize: sub-epoch target keeps a hash-gated subset tagged epoch 0") {
    val docs = (0 until 100).map(i => (i.toLong, "s", 10L)).toDF("id", "source", "n_tok")
    val targets = Seq(("s", 300L)).toDF("source", "target_tokens") // 0.3 epochs
    val out = Curation.epochize(docs, "source", col("id"), col("n_tok"), targets, "t")
    val n = out.count()
    assert(out.agg(max(col("epoch"))).head().getLong(0) == 0L)
    assert(n > 10 && n < 60, s"~30 of 100 docs expected, got $n")
  }

  test("trainOrder: per-epoch permutations are complete, dense, and epoch-independent") {
    val docs = (0 until 200).map(_.toLong).toDF("id")
    val out = Curation.trainOrder(docs, "id", "t", epochs = 2, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 400) // every doc appears once per epoch
    for (e <- 0L to 1L) {
      val ep = out.filter(_._2 == e)
      assert(ep.map(_._1).toSet == (0L until 200L).toSet)
      // positions are dense 1..n within each (epoch, shard)
      ep.groupBy(_._3).foreach { case (_, rows) =>
        assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
      }
    }
    // the two epochs are different permutations (same order would mean
    // the epoch never entered the hash)
    val byShard0 = out.filter(_._2 == 0L).map(t => (t._3, t._4) -> t._1).toMap
    val byShard1 = out.filter(_._2 == 1L).map(t => (t._3, t._4) -> t._1).toMap
    assert(byShard0 != byShard1)
  }

  test("trainOrder is reproducible: same salt, same order; new salt, new order") {
    val docs = (0 until 50).map(_.toLong).toDF("id")
    def run(salt: String) =
      Curation.trainOrder(docs, "id", salt, 1, 4)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(run("a") == run("a"))
    assert(run("a") != run("b"))
  }

  test("curriculumAnneal: thresholds rise, kept budget shrinks monotonically") {
    val docs = (0 until 100)
      .map(i => (i.toLong, "s", i / 100.0, 10L)).toDF("id", "source", "q", "n")
    val out = Curation.curriculumAnneal(docs, "id", "source",
        col("q"), col("n"), epochs = 3, q0 = 0.2, q1 = 0.8)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // thr 0.2 / 0.5 / 0.8 over q=i/100: kept 80 / 50 / 20 docs
    assert(out(0L)._1 == 80L && out(1L)._1 == 50L && out(2L)._1 == 20L)
    assert(out(0L)._2 == 800L && out(2L)._2 == 200L)
    // mean quality of the kept slice rises with the threshold
    assert(out(0L)._3 < out(1L)._3 && out(1L)._3 < out(2L)._3)
  }

  test("annealSchedule: single epoch pins q0; endpoints exact in micro-units") {
    assert(Curation.annealSchedule(1, 0.3, 0.9) == Seq(0 -> 3000L))
    val s = Curation.annealSchedule(4, 0.55, 0.75)
    assert(s.head == (0 -> 5500L) && s.last == (3 -> 7500L))
    assert(s.map(_._2) == s.map(_._2).sorted)
  }

  test("waterfillTargets: caps respected, surplus redistributes, budget conserved") {
    // source "s" tiny (caps immediately), "m"/"l" roomy; budget forces
    // the small source's surplus onto the others
    val docs = (Seq.fill(10)(("s", 10L)) ++ Seq.fill(100)(("m", 10L))
      ++ Seq.fill(400)(("l", 10L)))
      .zipWithIndex.map { case ((src, n), i) => (i.toLong, src, n) }
      .toDF("id", "source", "n")
    val out = Curation.waterfillTargets(docs, "source", col("n"),
        tau = 0.5, budgetTokens = 3000L, maxEpochs = 1, rounds = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5)))
      .toMap
    // avail: s=100, m=1000, l=4000; proportional-to-sqrt shares of 3000
    // give s ~430 >> its 100-cap, so s must cap and its surplus flow on
    assert(out("s")._4 && out("s")._3 == 100L, s"tiny source caps at avail: $out")
    out.values.foreach { case (avail, cap, tgt, capped, _) =>
      assert(tgt <= cap && cap == avail, "no-repeat cap respected")
      assert(capped == (tgt == cap))
    }
    val assigned = out.values.map(_._3).sum
    val un = out.values.head._5
    assert(assigned + un == 3000L, s"budget conserved: $assigned + $un")
    assert(un < 100L, s"3 rounds should place nearly everything: $un left")
    // the roomy sources absorb the redistributed surplus beyond their
    // first-round proportional share (sqrt weights: s .136, m .43, l .86 of 1e6·√10·…)
    assert(out("l")._3 > out("m")._3, "larger source takes the larger share")
  }

  test("lenBatches: batches stay bucket-pure, sized <= B, and pad only to their own max") {
    // lengths 1..100: buckets 0/1/2/3 (width 32), batch size 4
    val docs = (1L to 100L).map(i => (i, i)).toDF("id", "tok")
    val out = Curation.lenBatches(docs, "id", col("tok"), 32L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // every doc lands in exactly one batch
    assert(out.map(_._3).sum == 100L)
    out.foreach { case (bucket, _, n, bmax, ntok, pad) =>
      assert(n <= 4, "batch size cap")
      assert(bmax / 32L == bucket, "batch max stays inside its bucket")
      assert(pad == bmax * n - ntok, "pad accounting")
    }
    // ascending-length batching of consecutive integers: each full batch
    // spans 4 consecutive lengths -> pad = 3+2+1 = 6
    val fulls = out.filter(_._3 == 4)
    assert(fulls.nonEmpty && fulls.forall(_._6 == 6L),
      s"consecutive-length batches pad exactly 6: ${fulls.toSeq}")
  }

  test("reweightMixture: weights stay a 10000-bp simplex, lossier domains gain, uniform loss stays uniform") {
    import org.apache.spark.sql.types.LongType
    val losses = Seq(("a", 8000L), ("b", 4000L), ("c", 1000L), ("d", 1000L))
      .toDF("source", "loss_u")
    val w = Curation.reweightMixture(losses, "source",
        col("loss_u").cast(LongType), rounds = 3, etaDen = 2L, lossScale = 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(w.values.sum == 10000L, s"simplex: $w")
    assert(w("a") > w("b") && w("b") > w("c"), s"monotone in loss: $w")
    // largest remainder can split a tie by at most the 1-bp shortfall
    // unit (deterministic stratum-asc tiebreak) — never more
    assert(math.abs(w("c") - w("d")) <= 1L, s"equal loss, bp-equal weight: $w")
    assert(w("a") > 2500L, s"the lossiest domain must gain over uniform: $w")

    val uniform = Seq(("a", 3000L), ("b", 3000L), ("c", 3000L), ("d", 3000L))
      .toDF("source", "loss_u")
    val wu = Curation.reweightMixture(uniform, "source",
        col("loss_u").cast(LongType), rounds = 3, etaDen = 2L, lossScale = 10000L)
      .collect().map(r => r.getLong(2))
    assert(wu.forall(_ == 2500L), s"uniform loss keeps uniform weights: ${wu.toSeq}")
  }

  test("q_split_by_cluster: a component never straddles a split; assignment covers every doc") {
    val out = SparkEntry.queries("q_split_by_cluster")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "component", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty && out.map(_._1).distinct.length == out.length)
    // the leakage-zero property, structurally: same component => same split
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"component $c split across ${rows.map(_._3).distinct.mkString(",")}")
    }
    assert(out.map(_._3).distinct.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("q_curation_e2e stage timing: all 7 boundaries recorded, result invariant") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val plain = rows(SparkEntry.queries("q_curation_e2e")(spark, dir))
    sys.props("graft.e2e.stageTimes") = "1"
    try {
      val inst = rows(SparkEntry.queries("q_curation_e2e")(spark, dir))
      assert(inst == plain, "instrumented mode must not change the result")
      val st = CurationE2E.stageTimes.synchronized(CurationE2E.stageTimes.toMap)
      val expect = Set("s12_gate_exact", "s3_lsh_neardup", "s4_sem_dedup",
        "s5_ngram_decontam", "s5b_sem_decontam", "s67_dsir_split", "s89_leak_pack")
      assert(st.keySet == expect, s"recorded stages: ${st.keySet}")
      assert(st.values.forall(_ > 0.0), s"non-positive stage time: $st")
    } finally sys.props.remove("graft.e2e.stageTimes")
  }

  test("epochize: a row's copy count never flips when other strata change") {
    val base = Seq((1L, "a", 10L), (2L, "a", 10L)).toDF("id", "source", "n_tok")
    val more = base.union(Seq((3L, "b", 10L), (4L, "b", 10L)).toDF("id", "source", "n_tok"))
    val targets = Seq(("a", 50L), ("b", 15L)).toDF("source", "target_tokens")
    def aRows(df: org.apache.spark.sql.DataFrame) =
      Curation.epochize(df, "source", col("id"), col("n_tok"), targets, "t")
        .filter(col("source") === "a").select("id", "epoch")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aRows(base) == aRows(more))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Index, Quality}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a symmetric cycle stays uniform") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val r = Graph.pageRank(edges, "s", "d", "w", nodes, "v", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // a 3-cycle is its own stationary distribution: every iteration maps
    // uniform to uniform, so 3 iterations must still be ~1/3 each
    assert(r.size == 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6, r))
  }

  test("pageRank concentrates on a sink hub and matches the hand formula") {
    // A->B and C->B; B has no out-edges (its mass is dropped, not
    // redistributed — documented semantics)
    val edges = Seq((1L, 2L, 1L), (3L, 2L, 1L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val r = Graph.pageRank(edges, "s", "d", "w", nodes, "v", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val teleport = 0.15 / 3
    assert(math.abs(r(1L) - teleport) < 1e-6)
    assert(math.abs(r(3L) - teleport) < 1e-6)
    assert(math.abs(r(2L) - (teleport + 0.85 * (2.0 / 3))) < 1e-6, r)
  }

  test("pageRank splits contributions by edge weight") {
    // A routes 3/4 of its rank to B, 1/4 to C
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val r = Graph.pageRank(edges, "s", "d", "w", nodes, "v", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val teleport = 0.15 / 3
    assert(math.abs(r(2L) - (teleport + 0.85 * (1.0 / 3) * 0.75)) < 1e-6, r)
    assert(math.abs(r(3L) - (teleport + 0.85 * (1.0 / 3) * 0.25)) < 1e-6, r)
  }

  test("pageRank redistributes dangling mass when asked (stochastic-matrix form)") {
    // A->B with B a sink. r0 = (1/2, 1/2); dangling mass D0 = r(B) = 1/2.
    // r1(A) = 0.15/2 + 0.85*(0 + (1/2)/2)          = 0.2875
    // r1(B) = 0.15/2 + 0.85*(1/2 + (1/2)/2)        = 0.7125  (sums to 1)
    val edges = Seq((1L, 2L, 1L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L).toDF("v")
    val r = Graph.pageRank(edges, "s", "d", "w", nodes, "v", iters = 1,
        danglingRedistribute = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.2875) < 1e-6, r)
    assert(math.abs(r(2L) - 0.7125) < 1e-6, r)
    assert(math.abs(r.values.sum - 1.0) < 1e-6, "mass must be conserved")
    // without redistribution the sink's mass leaks: total < 1
    val drop = Graph.pageRank(edges, "s", "d", "w", nodes, "v", iters = 1)
      .collect().map(_.getDouble(1)).sum
    assert(drop < 1.0 - 1e-6, s"dropped-mass total should undershoot 1, got $drop")
  }

  test("personalized pageRank concentrates teleport on the topic set") {
    // topic = {A}; A->B. r0 = (1,0,0).
    // r1(A) = 0.15·1 = 0.15; r1(B) = 0.85·r0(A) = 0.85; r1(C) = 0 —
    // C is outside the topic and unreachable, so it scores exactly 0
    val edges = Seq((1L, 2L, 1L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val topic = Seq(1L).toDF("v")
    val r = Graph.pageRankPersonalized(edges, "s", "d", "w", nodes, "v", topic,
        iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.15) < 1e-6, r)
    assert(math.abs(r(2L) - 0.85) < 1e-6, r)
    assert(r(3L) == 0.0, r)
  }

  test("pageRank drops non-positive-weight edges before building shares") {
    // the w=0 edge must not make A's shares null/inf; with it gone this
    // is exactly the A->B sink graph
    val edges = Seq((1L, 2L, 1L), (3L, 1L, 0L), (3L, 2L, 0L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val r = Graph.pageRank(edges, "s", "d", "w", nodes, "v", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val teleport = 0.15 / 3
    assert(math.abs(r(1L) - teleport) < 1e-6, r)
    assert(math.abs(r(3L) - teleport) < 1e-6, r)
    assert(math.abs(r(2L) - (teleport + 0.85 * (1.0 / 3))) < 1e-6, r)
  }

  test("robustOutliers flags only the planted extreme under MAD") {
    // 1..9 plus 1000: median 5.5, MAD 2.5, cutoff 3*1.4826*2.5 ≈ 11.1 —
    // a mean/σ gate would have its σ inflated ~300x by the outlier
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("g", "x")
    val r = Quality.robustOutliers(df, "g", col("x")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n") == 10)
    assert(row.getAs[Long]("n_outliers") == 1, row)
    assert(row.getAs[Double]("med") == 5.5)
    assert(row.getAs[Double]("mad") == 2.5)
  }

  test("robustOutliers approx path agrees with the exact verdict") {
    // three groups with planted extremes: the 100x scale path must
    // reproduce the exact OUTLIER VERDICT everywhere; on odd-sized
    // groups (where the exact percentile doesn't interpolate) the
    // medians themselves coincide too
    val df = (((1 to 9).map(_.toDouble) :+ 1000.0).map(("even", _)) ++
      ((1 to 10).map(_.toDouble) :+ 1000.0).map(("odd", _)) ++
      (1 to 20).map(i => ("clean", i.toDouble))).toDF("g", "x")
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Long]("n_outliers"), r.getAs[Double]("med"),
        r.getAs[Double]("mad"))).sortBy(_._1).toSeq
    val exact = key(Quality.robustOutliers(df, "g", col("x")).collect())
    val approx = key(Quality.robustOutliers(df, "g", col("x"),
      approx = true).collect())
    assert(exact.map(t => (t._1, t._2, t._3)) == approx.map(t => (t._1, t._2, t._3)),
      s"verdicts must agree: exact=$exact approx=$approx")
    assert(exact.map(t => (t._1, t._3)).toSet ==
      Set(("even", 1L), ("odd", 1L), ("clean", 0L)))
    // odd-sized group: rank element == interpolated value, full agreement
    assert(exact.find(_._1 == "odd") == approx.find(_._1 == "odd"))
    // even-sized group: medians differ by at most one inter-element gap
    val (e, a) = (exact.find(_._1 == "even").get, approx.find(_._1 == "even").get)
    assert(math.abs(e._4 - a._4) <= 1.0 && math.abs(e._5 - a._5) <= 1.0)
  }

  test("persisted-report operators leave no corpus-sized cache behind") {
    // release contract: after the operator returns, the ONLY surviving
    // cache is its own bounded report — releasing that must add NOTHING
    // to the context's persistent-RDD registry. The pin is scoped to a
    // pre-test snapshot rather than `isEmpty`: the registry is shared
    // across every suite in this JVM, and other suites' localCheckpoint
    // frames are collected by the ContextCleaner on GC timing — an
    // absolute-emptiness assert flakes on whatever has not been swept
    // yet (the round-13 exit-1), while "no NEW ids" is deterministic.
    spark.catalog.clearCache()
    val preTest = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq((1L, "the cat sat on the mat again and again and again"),
      (2L, "the cat sat on a log near the mat"),
      (3L, "a dog ran past the cat on the mat")).toDF("doc_id", "text")
    val reports = Seq(
      Quality.robustOutliers(docs, "doc_id", length(col("text"))),
      Index.pmiCollocations(docs, "doc_id", "text", minCount = 2, k = 5),
      Quality.sourceScorecard(
        docs.withColumn("source", lit("s")), "doc_id", "source", "text",
        lit(0.8), size(split(col("text"), "\\s+")),
        Seq((99L, "benchmark text entirely elsewhere")).toDF("doc_id", "text"),
        shingleN = 5, minShared = 3))
    reports.foreach(_.collect()) // reports are usable after the call...
    reports.foreach(graft.operators.Similarity.release)
    val leaked = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !preTest.contains(id)
    }
    assert(leaked.isEmpty,
      s"leaked caches: ${leaked.values.map(r => s"${r.id}:${r.name}")}")
  }

  test("lmScoreUnder on its own corpus reduces exactly to lmScore") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "the cat ran"),
      (3L, "a dog sat on a log")).toDF("doc_id", "text")
    val a = Index.lmScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Index.lmScoreUnder(docs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("lmScoreUnder backs off to ln(1/V) for fully unseen bigrams") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val score = Seq((9L, "c d")).toDF("doc_id", "text")
    val r = Index.lmScoreUnder(train, score, "doc_id", "text").collect()
    assert(r.length == 1)
    // unseen context and bigram: ln((0+1)/(0+2)) = ln(0.5) ≈ -0.6931
    assert(r.head.getAs[Double]("lm_score") == -0.6931, r.toSeq)
  }

  test("hits separates pure hubs from the pure authority") {
    // A->C, B->C: A and B are hubs (link out), C the sole authority
    val edges = Seq((1L, 3L, 1L), (2L, 3L, 1L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val r = Graph.hits(edges, "s", "d", "w", nodes, "v", iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(1L) == ((0.5, 0.0)), r)
    assert(r(2L) == ((0.5, 0.0)), r)
    assert(r(3L) == ((0.0, 1.0)), r)
  }

  test("hits splits authority by edge weight") {
    // A routes weight 3 to B, 1 to C: authority 3/4 vs 1/4, A hub 1
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val r = Graph.hits(edges, "s", "d", "w", nodes, "v", iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(1L) == ((1.0, 0.0)), r)
    assert(r(2L) == ((0.0, 0.75)), r)
    assert(r(3L) == ((0.0, 0.25)), r)
  }

  test("iterative graph operators release superseded checkpoint frames eagerly") {
    // Root cause of the round-13 sbt-test flake: pageRank/ppr/hits
    // chained one localCheckpoint per iteration and left every
    // superseded frame's blocks to the ContextCleaner, so the shared
    // context's persistent-RDD registry held GC-timing-dependent junk.
    // Post-fix contract: run them, consume, release the RESULT frames,
    // and the registry holds nothing new — deterministically.
    spark.catalog.clearCache()
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 3L, 2L))
      .toDF("s", "d", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("v") // 4 dangles
    val pr = Graph.pageRank(edges, "s", "d", "w", nodes, "v", iters = 4,
      danglingRedistribute = true)
    pr.collect()
    val prp = Graph.pageRankPersonalized(edges, "s", "d", "w", nodes, "v",
      Seq(1L).toDF("v"), iters = 3)
    prp.collect()
    val hs = Graph.hits(edges, "s", "d", "w", nodes, "v", iters = 3)
    hs.collect()
    val core = Graph.kCore(edges, "s", "d", k = 2)
    core.collect()
    Seq(pr, prp, hs, core).foreach(graft.operators.Checkpoints.release)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(pre)
    assert(leaked.isEmpty, s"leaked checkpoint frames: $leaked")
  }

  test("pmiCollocations scores the dominant pair and applies the count floor") {
    val docs = Seq((1L, "new york new york"), (2L, "new york city"))
      .toDF("doc_id", "text")
    // bigrams: (new,york)x3, (york,new), (york,city) — N=5
    val r = Index.pmiCollocations(docs, "doc_id", "text", minCount = 2, k = 10)
      .collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "new" && r.head.getString(1) == "york")
    assert(r.head.getLong(2) == 3L)
    // ln(3*5/(3*3)) = ln(5/3) = 0.5108256... -> 0.5108
    assert(r.head.getDouble(3) == 0.5108, r.head)
  }

  test("pmiCollocations orders by pmi then pair, and bounds to k") {
    val docs = Seq((1L, "new york new york"), (2L, "new york city"))
      .toDF("doc_id", "text")
    val r = Index.pmiCollocations(docs, "doc_id", "text", minCount = 1, k = 2)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(3)))
    // (york,city) and (york,new) both score ln(5/2)=0.9163, beating
    // (new,york); the tie breaks on w2 ascending; k=2 cuts (new,york)
    assert(r.toSeq == Seq(("york", "city", 0.9163), ("york", "new", 0.9163)))
  }

  test("gopherRules flags each failure mode independently") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was happy for a while in the sun that day it stayed"),
      (2L, "hi there"),
      (3L, "# item one # item two # item three # item four # item five # item six"),
      (4L, "12 34 56 78 90 11 22 33 44 55 66 77")
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"), graft.functions.Text.gopherRules(col("text")).as("g"))
      .select(col("doc_id"), col("g.*"))
      .collect().map(x => x.getLong(0) -> x).toMap
    val good = r(1L)
    assert(good.getAs[Long]("n_words") == 20L)
    Seq("r_wordcount", "r_meanwordlen", "r_alphawords", "r_symbolratio",
      "r_stopwords", "passed").foreach(f => assert(good.getAs[Boolean](f), f))
    assert(!r(2L).getAs[Boolean]("r_wordcount") && !r(2L).getAs[Boolean]("passed"))
    // 6 '#' against 12 words: 60 > 12
    assert(!r(3L).getAs[Boolean]("r_symbolratio"))
    assert(!r(3L).getAs[Boolean]("r_stopwords"))
    // all-digit words: no alphabetic words, mean length 2 < 3
    assert(!r(4L).getAs[Boolean]("r_alphawords"))
    assert(!r(4L).getAs[Boolean]("r_meanwordlen"))
  }

  test("corrOls recovers a perfect line and its coefficients exactly") {
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
      .toDF("g", "x", "y")
    val r = Quality.corrOls(df, "g", col("x"), col("y")).collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("corr") == 1.0)
    assert(r.getAs[Double]("beta") == 2.0)
    assert(r.getAs[Double]("alpha") == 0.0)
    val anti = Seq(("g", 1.0, 3.0), ("g", 2.0, 2.0), ("g", 3.0, 1.0))
      .toDF("g", "x", "y")
    val a = Quality.corrOls(anti, "g", col("x"), col("y")).collect().head
    assert(a.getAs[Double]("corr") == -1.0 && a.getAs[Double]("beta") == -1.0)
    assert(a.getAs[Double]("alpha") == 4.0)
  }

  test("corrOls rescales 2-decimal values exactly and nulls zero-variance groups") {
    val df = Seq(("s", 1.0, 0.01), ("s", 2.0, 0.02), ("s", 3.0, 0.03),
      ("z", 1.0, 5.0), ("z", 1.0, 7.0)).toDF("g", "x", "y")
    val r = Quality.corrOls(df, "g", col("x"), col("y"), 1L, 100L)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("s").getAs[Double]("corr") == 1.0)
    assert(r("s").getAs[Double]("beta") == 0.01)
    assert(r("s").getAs[Double]("alpha") == 0.0)
    // x has zero variance in group z: corr/beta/alpha are NULL, not NaN
    assert(r("z").isNullAt(r("z").fieldIndex("corr")))
    assert(r("z").isNullAt(r("z").fieldIndex("beta")))
    assert(r("z").isNullAt(r("z").fieldIndex("alpha")))
  }

  test("skewReport computes integer share and skew factor per group") {
    val df = (Seq.fill(4)(("a", 1L)) ++ Seq(("a", 2L)) ++
      (1L to 5L).map(("b", _))).toDF("g", "k")
    val r = Quality.skewReport(df, "g", "k")
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("n_rows") == 5 && a.getAs[Long]("n_keys") == 2)
    assert(a.getAs[Long]("max_key_rows") == 4)
    assert(a.getAs[Long]("top_share_bp") == 8000)   // 4*10000/5
    assert(a.getAs[Long]("skew_x100") == 160)       // 4*2*100/5
    val b = r("b")
    assert(b.getAs[Long]("top_share_bp") == 2000 && b.getAs[Long]("skew_x100") == 100)
  }

  test("triangleStats: known censuses, orientation invariance, duplicate collapse") {
    def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
      val r = Graph.triangleStats(edges.toDF("a", "b"), "a", "b").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    // K4: 4 triangles, every wedge closed -> coefficient exactly 1
    val k4 = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    assert(stats(k4) == ((4L, 6L, 4L, 1.0)))
    // path graph: wedges but no triangles
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, 0L, 0.0)))
    // star + one closing edge: exactly the closed wedge counts
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L))
    val (n, m, t, c) = stats(star)
    assert((n, m, t) == ((5L, 5L, 1L)))
    // duplicates, reversed orientations and self-loops collapse
    assert(stats(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))) ==
      ((3L, 3L, 1L, 1.0)))
    // partitioning independence
    val big = (0L until 30L).flatMap(i => Seq((i, (i + 1) % 30), (i, (i + 7) % 30)))
    val a = Graph.triangleStats(big.toDF("a", "b"), "a", "b").collect().head.toSeq
    val bb = Graph.triangleStats(big.toDF("a", "b").repartition(7), "a", "b")
      .collect().head.toSeq
    assert(a == bb)
  }

  test("kCore: chains peel away layer by layer; cycles survive; a tree empties") {
    def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      Graph.kCore(edges.toDF("a", "b"), "a", "b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle with a 3-node tail: the tail peels over multiple rounds,
    // the cycle is the 2-core
    val tailed = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(tailed, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // a pure tree has an empty 2-core
    assert(core(Seq((1L, 2L), (2L, 3L), (2L, 4L)), 2) == Map.empty)
    // K4 is its own 3-core
    val k4 = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    assert(core(k4, 3) == (0L to 3L).map(_ -> 3L).toMap)
    // k=1 keeps everything with at least one edge
    assert(core(Seq((7L, 8L)), 1) == Map(7L -> 1L, 8L -> 1L))
  }
}

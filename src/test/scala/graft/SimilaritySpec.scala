package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("shinglesArray produces word n-grams; short docs yield empty (no crash)") {
    val df = Seq(
      (1L, "a b c d"),     // 2 shingles of n=3
      (2L, "a b"),         // shorter than n -> empty
      (3L, ""),            // empty -> empty
      (4L, "x y z")).toDF("id", "text")
    val got = df.select(col("id"), Similarity.shinglesArray(col("text"), 3).as("sh"))
      .orderBy("id").collect().map(_.getSeq[String](1).toSeq).toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq(), Seq(), Seq("x y z")))
  }

  test("exactDedup groups identical content, keeps min id") {
    val df = Seq((10L, "same text"), (3L, "same text"), (7L, "other")).toDF("id", "text")
    val out = Similarity.exactDedup(df, "id", "text")
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((3L, 2L), (7L, 1L)))
  }

  test("minhash signatures are identical for identical shingle sets") {
    val df = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"), (3L, "z1 z2 z3 z4")).toDF("id", "text")
    val sig = Similarity.minhashSignature(Similarity.shingles(df, "id", "text", 3), "id", 8)
      .orderBy("id").collect()
    assert((1 to 8).forall(i => sig(0).getLong(i) == sig(1).getLong(i)))
    assert((1 to 8).exists(i => sig(0).getLong(i) != sig(2).getLong(i)))
  }

  test("minhashLsh surfaces identical docs as candidate pairs") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with no overlap whatsoever here now")).toDF("id", "text")
    val pairs = Similarity.minhashLsh(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("lshCandidatePairs bucket cap drops degenerate buckets") {
    // 5 identical docs -> one band bucket of size 5; cap 4 must drop it
    val df = (1L to 5L).map(i => (i, "same same same same same")).toDF("id", "text")
    val sig = Similarity.minhashSignature(Similarity.shingles(df, "id", "text", 3), "id", 8)
    val capped = Similarity.lshCandidatePairs(sig, "id", 8, 4, maxBucketSize = 4)
    assert(capped.count() == 0)
    val uncapped = Similarity.lshCandidatePairs(sig, "id", 8, 4, maxBucketSize = 100)
    assert(uncapped.count() == 10) // C(5,2)
  }

  test("ngramJaccardPairs computes exact set jaccard") {
    val df = Seq(
      (1L, "a b c d e"),   // shingles: abc bcd cde
      (2L, "a b c d x"),   // shingles: abc bcd cdx  -> inter 2, union 4 -> 0.5
      (3L, "p q r s t")).toDF("id", "text")
    val out = Similarity.ngramJaccardPairs(df, "id", "text", 3, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 2L, 0.5)))
  }

  test("lshJaccard is contained in the raw exact jaccard with equal scores") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6"),   // identical
      (3L, "w1 w2 w3 w4 w5 zz"),                               // near-dup of 1/2
      (4L, "a b c d e f g h")).toDF("id", "text")              // unrelated
    val gated = Similarity.lshJaccard(df, "id", "text",
        shingleN = 2, numHashes = 16, rowsPerBand = 4,
        maxBucketSize = 100, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val raw = Similarity.ngramJaccardPairs(df, "id", "text", n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gated.subsetOf(raw))          // the gate only prunes, never invents
    assert(gated.contains((1L, 2L, 1.0))) // identical docs always survive
  }

  test("simhash is 64 bits, deterministic, and equal for equal token bags") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta")).toDF("id", "text")
    val out = Similarity.simhashFingerprint(df, "id", "text").orderBy("id").collect()
    assert(out(0).getString(1).length == 64)
    assert(out(0).getString(1) == out(1).getString(1))
    assert(out(0).getString(1) != out(2).getString(1))
    assert(out(0).getString(1).forall(c => c == '0' || c == '1'))
  }

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f)),
      (2L, Seq(0.0f, 3.0f, 0.0f))).toDF("id", "vec")
    val self = df.filter(col("id") === 1)
      .select(round(Similarity.cosine(col("vec"), col("vec")), 6)).collect()(0).getDouble(0)
    assert(self == 1.0)
    val ortho = df.filter(col("id") === 2)
      .select(Similarity.cosine(col("vec"), Similarity.vecLit(Seq(1.0, 0.0, 2.0))))
      .collect()(0).getDouble(0)
    assert(ortho == 0.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "vec")
    val out = Similarity.bruteForceTopK(df, "id", "vec", Similarity.vecLit(Seq(1.0, 0.0)), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L))
  }

  test("recallAtK counts truth ids recovered by the candidate list") {
    val truth = Seq(1L, 2L, 3L, 4L).toDF("id")
    val cand = Seq(2L, 4L, 9L, 11L).toDF("id")
    val r = Similarity.recallAtK(cand, truth, "id", 4).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getDouble(2) == 0.5)
    // empty candidate list -> recall 0, not an empty relation
    val r0 = Similarity.recallAtK(cand.filter(col("id") < 0), truth, "id", 4)
      .collect().head
    assert(r0.getLong(1) == 0L && r0.getDouble(2) == 0.0)
  }

  test("probeBuckets covers Hamming radius and dedups") {
    assert(Similarity.probeBuckets("101", 0) == Seq("101"))
    assert(Similarity.probeBuckets("101", 1).toSet == Set("101", "001", "111", "100"))
    assert(Similarity.probeBuckets("10", 2).toSet == Set("10", "00", "11", "01"))
  }

  test("hyperplane bucket: column expression agrees with driver-side bucketOf") {
    val planes = Similarity.hyperplaneWeights(6, 8)
    val vecs = Seq(
      Seq(0.5, -0.25, 1.0, 0.0, -0.75, 0.3, 0.9, -0.1),
      Seq(-1.0, 2.0, -0.5, 0.25, 0.1, -0.9, 0.4, 0.7))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }.toDF("id", "vec")
    val got = df.select(col("id"), Similarity.hyperplaneBucket(col("vec"), planes).as("b"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == vecs.map(v => Similarity.bucketOf(v, planes)))
  }

  test("ivfAssign puts every vector in exactly one cell; probe finds neighbours") {
    val vecs = (0L to 9L).map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0)
      (i, base.map(x => (x + i * 0.001).toFloat))
    }
    val df = vecs.toDF("id", "vec")
    val assigned = Similarity.ivfAssign(df, "id", "vec", centroidStep = 2)
    assert(assigned.count() == 10)
    assert(assigned.select("id").distinct().count() == 10)
    // query near e1 axis should rank an odd (e1-cluster) vector first
    val top = Similarity.ivfAnnTopK(df, "id", "vec", Seq(0.0, 1.0, 0.0),
      centroidStep = 2, nprobe = 2, k = 3).collect()
    assert(top.nonEmpty && top.head.getLong(0) % 2 == 1)
  }

  test("ivfAssign on an offset/sparse id space still trains centroids") {
    // ADVICE r16: raw `id % step` seeding assumes ids dense from 0 — a
    // filtered corpus whose ids start at 1M trained ZERO centroids and
    // silently emptied downstream ANN. The min-anchored lattice must
    // assign every vector, and on dense-from-0 ids stay bit-identical.
    val dense = (0L to 9L).map(i => (i, Seq(1.0f + i, 2.0f, 3.0f))).toDF("id", "vec")
    val offset = (0L to 9L).map(i => (1000000L + 2 * i, Seq(1.0f + i, 2.0f, 3.0f)))
      .toDF("id", "vec")
    val offAssigned = Similarity.ivfAssign(offset, "id", "vec", centroidStep = 3)
    assert(offAssigned.count() == 10, "offset ids must still assign all vectors")
    assert(offAssigned.select("cell").distinct().count() > 1,
      "offset ids must train more than a single fallback cell")
    // dense-from-0: anchored seeds == raw-modulo seeds (minId = 0)
    val denseCells = Similarity.ivfAssign(dense, "id", "vec", centroidStep = 3)
      .select("cell").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(denseCells == Seq(0L, 3L, 6L, 9L), s"got $denseCells")
  }

  test("ivfAssign plan is HashAggregate-only — no Window, no sorts") {
    val vecs = (0L to 9L).map(i => (i, Seq(1.0f + i, 2.0f, 3.0f)))
    val df = vecs.toDF("id", "vec")
    val plan = Similarity.ivfAssign(df, "id", "vec", centroidStep = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("Sort ["),
      s"sort in plan:\n$plan")
    assert(plan.contains("HashAggregate"))
  }

  test("embedNearDupPairs == driver-computed same-bucket high-cosine pairs") {
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> (0 until 8).map(i => 0.5 + 0.01 * i),
      2L -> (0 until 8).map(i => (0.5 + 0.01 * i) * 1.1),
      3L -> (0 until 8).map(i => if (i % 2 == 0) 1.0 else -1.0),
      4L -> (0 until 8).map(i => 0.5 + 0.01 * i + (if (i == 7) 0.02 else 0.0)))
    // expected from the same definitions, on the float32-rounded values
    // the column path actually sees
    val planes = Similarity.hyperplaneWeights(4, 8)
    val rounded = vecs.map { case (i, v) => i -> v.map(x => x.toFloat.toDouble) }
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(p => p * p).sum))
    }
    val expected = (for {
      (i, vi) <- rounded; (j, vj) <- rounded if i < j
      if Similarity.bucketOf(vi, planes) == Similarity.bucketOf(vj, planes)
      if math.rint(cos(vi, vj) * 1e6) / 1e6 >= 0.9
    } yield (i, j)).toSet
    assert(expected.nonEmpty) // construction sanity: at least one pair survives
    val df = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("id", "vec")
    val pairs = Similarity.embedNearDupPairs(df, "id", "vec",
      numPlanes = 4, dims = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == expected)
  }

  test("multi-probe near-dup == driver mirror; strictly more recall than same-bucket") {
    val rnd = new scala.util.Random(42)
    val vecs: Seq[(Long, Seq[Double])] =
      (0L until 40L).map(i => i -> Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val planes = Similarity.hyperplaneWeights(4, 8)
    val rounded = vecs.map { case (i, v) => i -> v.map(x => x.toFloat.toDouble) }
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(p => p * p).sum))
    }
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val close = for {
      (i, vi) <- rounded; (j, vj) <- rounded if i < j
      if math.rint(cos(vi, vj) * 1e6) / 1e6 >= 0.5
    } yield (i, j, hamming(Similarity.bucketOf(vi, planes), Similarity.bucketOf(vj, planes)))
    val expectSame = close.collect { case (i, j, h) if h == 0 => (i, j) }.toSet
    val expectProbed = close.collect { case (i, j, h) if h <= 1 => (i, j) }.toSet
    // seed sanity: at least one qualifying pair is split by exactly one plane
    assert(expectProbed.size > expectSame.size)
    val df = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("id", "vec")
    val same = Similarity.embedNearDupPairs(df, "id", "vec", 4, 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = Similarity.embedNearDupPairsProbed(df, "id", "vec", 4, 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(same == expectSame)
    assert(probed == expectProbed) // superset of same-bucket, subset of brute force
  }

  test("k-means quantizer: deterministic, means in quantized space, cells cover corpus") {
    val vecs = (0L until 30L).map { i =>
      val base = if (i % 3 == 0) Seq(1.0, 0.0, 0.0)
                 else if (i % 3 == 1) Seq(0.0, 1.0, 0.0) else Seq(0.0, 0.0, 1.0)
      (i, base.map(x => (x + i * 0.001).toFloat))
    }
    val df = vecs.toDF("id", "vec")
    val c1 = Similarity.kmeansCentroids(df, "id", "vec", centroidStep = 10, iters = 2)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val c2 = Similarity.kmeansCentroids(df, "id", "vec", centroidStep = 10, iters = 2)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(c1.toSeq == c2.toSeq) // bit-identical across runs
    assert(c1.nonEmpty && c1.forall(_._2.length == 3))
    // every centroid component is a 6-decimal quantized mean
    assert(c1.forall(_._2.forall(x => (math.rint(x * 1e6) / 1e6) == x)))
    // trained assignment still covers every vector exactly once
    val assigned = Similarity.ivfAssignTo(df, "id", "vec",
      Similarity.kmeansCentroids(df, "id", "vec", 10, 2))
    assert(assigned.count() == 30 && assigned.select("id").distinct().count() == 30)
  }

  test("lshAnnTopK finds the query's own bucket neighbours") {
    val base = ExtensionQueries.queryVec
    val near = base.map(_ * 0.9 + 0.001)           // same bucket, cosine ~1
    val df = Seq((1L, base.map(_.toFloat)), (2L, near.map(_.toFloat))).toDF("id", "vec")
    val out = Similarity.lshAnnTopK(df, "id", "vec", base, 8, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out.contains(1L) && out.contains(2L))
  }

  test("simhashNearDupPairs: identical docs at distance 0, disjoint docs absent") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical -> hamming 0
      (5L, "alpha beta gamma delta epsilon eta"),  // one token differs -> small hamming
      (9L, "q r s t u v w x y z")                  // unrelated
    ).toDF("id", "text")
    val out = Similarity.simhashNearDupPairs(df, "id", "text",
        maxHamming = 7, chunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 0L)
    // every reported pair respects the threshold and the id ordering
    assert(out.forall { case ((a, b), h) => a < b && h <= 7 })
    assert(!out.keySet.exists { case (a, b) => a == 9L || b == 9L })
  }

  test("simhashNearDupPairs finds no pair twice (multi-chunk collisions dedup)") {
    val df = Seq(
      (1L, "m n o p q r"),
      (2L, "m n o p q r")).toDF("id", "text") // identical: ALL 8 chunks collide
    val rows = Similarity.simhashNearDupPairs(df, "id", "text", 7, 8).collect()
    assert(rows.length == 1)
  }

  test("bucket-cap plans contain no Window and no Sort (agg + anti-join)") {
    val docs = (1L to 40L).map(i => (i, s"w$i x$i y$i z$i common tokens here")).toDF("id", "text")
    val lsh = Similarity.minhashLsh(docs, "id", "text").queryExecution.executedPlan.toString
    assert(!lsh.contains("Window"), "LSH banding should not plan a Window")
    val sim = Similarity.simhashNearDupPairs(docs, "id", "text", 7, 8)
      .queryExecution.executedPlan.toString
    assert(!sim.contains("Window"), "simhash blocking should not plan a Window")
  }

  test("randomProjection: signs reproduce the LSH bucket; values match the hand fold") {
    val dims = 6
    val vec = (0 until dims).map(d => (d - 2).toDouble / 2.0)
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "embedding", 4, dims)
    val proj = out.select("proj").collect().head.getSeq[Double](0)
    val planes = Similarity.hyperplaneWeights(4, dims)
    val expected = planes.map(w =>
      vec.zip(w).map { case (x, y) => x * y }.sum / math.sqrt(4.0))
    assert(proj.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // sign(proj_j) is exactly bucket bit j — one pass serves both
    val bucket = Similarity.withBuckets(df, "embedding", 4, dims)
      .select("bucket").collect().head.getString(0)
    assert(proj.map(p => if (p >= 0) '1' else '0').mkString == bucket)
  }

  test("cellRepresentatives: centroid member wins its own cell; no window in the plan") {
    val vecs = (0L to 9L).map { i =>
      val base = if (i < 5) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      if (i % 5 == 0) (i, base)
      else (i, base.zipWithIndex.map { case (v, d) => v * 0.9f + (if (d == 2) 0.1f * i else 0f) })
    }.toDF("vec_id", "embedding")
    val out = Similarity.cellRepresentatives(vecs, "vec_id", "embedding", 5)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "representative selection must stay a max aggregation")
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(0L) == ((5L, 0L, 1.0)))  // the centroid itself, cos exactly 1
    assert(rows(5L) == ((5L, 5L, 1.0)))
  }

  test("semanticDedup drops the near-copy of an exemplar, keeps diverse members") {
    // centroids: ids 0 and 5. id 1 duplicates id 0's direction exactly
    // (cos 1 to the rep), id 2 is oblique (cos < 0.95) and must survive.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),       // same direction as rep 0 -> dropped
      (2L, Array(0.8f, 0f, 0.6f, 0f)),   // cos 0.8 to rep 0 -> kept
      (5L, Array(0f, 1f, 0f, 0f)),
      (6L, Array(0f, 0.9f, 0f, 0.1f))).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      centroidStep = 5, threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    // exact set: 1 (cos 1.0 to rep 0) AND 6 (cos ~0.994 to rep 5) dropped,
    // oblique member 2 (cos 0.8) and both exemplars kept
    assert(kept == Set(0L, 2L, 5L))
  }

  test("minhashJaccardEstimate: identical docs estimate 1.0, estimate bounded") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "a b c d e f g x")).toDF("id", "text")
    val sh = Similarity.shingles(docs, "id", "text", 3)
    val sig = Similarity.minhashSignature(sh, "id", 16)
    val pairs = Similarity.lshCandidatePairs(sig, "id", 16, 4)
    val est = Similarity.minhashJaccardEstimate(pairs, sig, "id", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 2L)) == 1.0)
    assert(est.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("matryoshka truncation: full-dim prefix reproduces ground truth, " +
    "a misleading prefix doesn't") {
    // v1 aligns with q on the first 2 dims but opposes on the last 2;
    // v2 is q itself. Full-dim top-1 is v2; dim-2 top-1 is v1 (perfect
    // prefix alignment beats v2's tie only via the cosine round + id
    // tiebreak — v1's prefix cosine is exactly 1.0 too, so id wins).
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f, -3.0f, -4.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f, -4.0f))).toDF("vec_id", "embedding")
    val q = Seq(1.0, 2.0, 3.0, 4.0)
    val full = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Similarity.vecLit(q), 1).collect()
    assert(full.head.getLong(0) == 2L)
    val trunc = emb.select(col("vec_id"), slice(col("embedding"), 1, 2).as("embedding"))
    val pre = Similarity.bruteForceTopK(trunc, "vec_id", "embedding",
      Similarity.vecLit(q.take(2)), 1).collect()
    assert(pre.head.getLong(0) == 1L)
    // recall@1 of the dim-2 probe against full-dim truth: 0 hits.
    val r = Similarity.recallAtK(
      spark.createDataFrame(Seq(Tuple1(pre.head.getLong(0)))).toDF("vec_id"),
      spark.createDataFrame(Seq(Tuple1(full.head.getLong(0)))).toDF("vec_id"),
      "vec_id", 1).collect().head
    assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0)
  }

  test("bitextMarginMine: sides never mix, one argmax pair per source, floor respected") {
    // deterministic synthetic corpus: 40 vectors, even ids side 0,
    // odd side 1; values from a hash recurrence so runs are identical
    val emb = (0L until 40L).map { i =>
      (i, (0 until 8).map(d => (((i * 31 + d * 17) % 13).toFloat - 6.0f) / 6.0f))
    }.toDF("vec_id", "embedding")
    def mine() = Similarity.bitextMarginMine(emb, "vec_id", "embedding",
      col("vec_id") % 2, numPlanes = 2, dims = 8, minMarginBp = 10000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = mine()
    assert(out.nonEmpty)
    assert(out.forall(p => p._1 % 2 == 0 && p._2 % 2 == 1),
      "id_a must come from side 0, id_b from side 1")
    assert(out.map(_._1).distinct.length == out.length,
      "at most one mined pair per source vector (argmax)")
    assert(out.forall(_._4 >= 10000L), "margin floor must hold")
    assert(out.forall(_._3 > 0L), "only positive-cosine candidates mine")
    assert(mine().toSeq == out.toSeq, "mining must be deterministic")
  }

  test("labelPurity: majority share per cell, ties break to the LOWER label") {
    val assigned = Seq(
      (0L, 7L), (0L, 7L), (0L, 7L), (0L, 2L),   // cell 0: label 7 x3, 2 x1
      (1L, 5L), (1L, 9L)).toDF("cell", "label") // cell 1: tie -> label 5 wins
    val got = Similarity.labelPurity(assigned, "cell", "label")
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 4L, 7L, 7500L), (1L, 2L, 5L, 5000L)))
  }

  test("embedOutliers: anti-aligned member flags, aligned ones do not") {
    // one centroid along +e0; ids 1-2 aligned, id 3 anti-aligned
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val cent = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("cid", "cvec")
    val got = Similarity.embedOutliers(emb, "id", "vec", cent, floorU = 250000L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(0)._2 == 1000000L && !got(0)._3)
    assert(!got(1)._3 && got(2)._2 == -1000000L && got(2)._3)
  }

  test("hardNegatives: same-label neighbours excluded, nearest other-label ranks 1") {
    // 2 planes over 4 dims; anchor id 0 (mod 10), label 0. Planted in the
    // SAME bucket: id 7 label 0 (nearest of all — must be excluded),
    // id 11 label 1 (cos ~0.99 — must rank 1), id 13 label 2 (cos lower).
    val base = Seq(1.0f, 0.2f, 0.1f, 0.05f)
    def near(eps: Float) = base.zipWithIndex.map { case (x, i) => x + (if (i == 1) eps else 0f) }
    val emb = Seq(
      (0L, 0L, base), (7L, 0L, near(0.01f)),
      (11L, 1L, near(0.05f)), (13L, 2L, near(0.4f))).toDF("id", "label", "vec")
    val got = Similarity.hardNegatives(emb, "id", "vec", "label",
      anchorMod = 10L, numPlanes = 2, dims = 4, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // all four share the bucket (same orthant under the Rademacher planes)
    assert(got.map(_._2).toSet.intersect(Set(0L, 7L)).isEmpty,
      "the anchor itself and its same-label twin must never be negatives")
    assert(got == Seq((0L, 11L, 1L), (0L, 13L, 2L)),
      s"nearest other-label vector must rank first: $got")
  }

  test("adaptivePlanes ladder: +1 plane per corpus doubling, integer-exact, capped") {
    import Similarity.adaptivePlanes
    // base holds through every correctness/bench scale (sf0.01: 500,
    // sf0.1: 2000) and up to target·2^base — so oracles and floors at
    // those scales are bit-identical to the fixed-8-plane era
    assert(adaptivePlanes(0L) == 8 && adaptivePlanes(500L) == 8 &&
      adaptivePlanes(2000L) == 8 && adaptivePlanes(8192L) == 8)
    // exact doubling boundaries (strict >, mirroring the SQL CASE ladder)
    assert(adaptivePlanes(8193L) == 9 && adaptivePlanes(16384L) == 9)
    assert(adaptivePlanes(16385L) == 10)
    // the probe decades: 10x = 20k vectors -> 10 planes, 100x = 200k -> 13
    assert(adaptivePlanes(20000L) == 10 && adaptivePlanes(200000L) == 13)
    // 16→24 raise (r20): identical ladder through every measurable
    // scale — 2 M vectors (the 1000× probe decade) still reads 16 —
    // and occupancy stays at target through ~2^23·32 vectors
    assert(adaptivePlanes(2000000L) == 16)
    assert(adaptivePlanes(1L << 40) == 24)
    // capped: recall is bounded away from zero at any corpus size
    assert(adaptivePlanes(Long.MaxValue) == 24)
  }

  test("adaptive bucket is the P-prefix of the 24-plane bucket (plane p depends only on p)") {
    val vecs = (0L until 12L).map { i =>
      (0 until 8).map(d => (((i * 29 + d * 13) % 11).toDouble - 5.0) / 5.0)
    }
    val wMax = Similarity.hyperplaneWeights(24, 8)
    for (p <- Seq(8, 10, 13, 16); v <- vecs) {
      val wp = Similarity.hyperplaneWeights(p, 8)
      assert(Similarity.bucketOf(v, wp) == Similarity.bucketOf(v, wMax).take(p),
        s"P=$p bucket must be the 24-plane prefix — the oracle substrings rely on it")
    }
  }

  test("recall parity under scaled-up plane counts: planted near-dups survive P=13") {
    // The r18 scale-killer fix: plane count now grows with the corpus
    // (log2 ladder). This pins what that trades: with the plane count a
    // 200k-vector corpus would use (13), planted near-duplicate pairs —
    // tight perturbations of a shared base — must still be mined at a
    // hard recall floor, and everything mined must clear the exact
    // cosine threshold (precision 1.0 by construction: exact cosine
    // verifies inside each block).
    val planted = 40
    val base: Long => Seq[Float] = i =>
      (0 until 8).map(d => ((((i * 31 + d * 17) % 13).toFloat - 6.0f) / 6.0f))
    val originals = (0L until planted.toLong).map(i => (i, base(i)))
    val partners = originals.map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, d) => x + 0.01f * (d % 3) }) }
    val fill = (2000L until 2100L).map(i => (i, base(i * 7 + 3)))
    val df = (originals ++ partners ++ fill).toDF("id", "vec")
    val thr = 0.98
    def minedAt(p: Int): Set[(Long, Long)] =
      Similarity.embedNearDupPairs(df, "id", "vec", p, 8, thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth from the driver: which planted pairs really clear thr
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val xd = x.map(_.toDouble); val yd = y.map(_.toDouble)
      val d = xd.zip(yd).map { case (a, b) => a * b }.sum
      d / (math.sqrt(xd.map(a => a * a).sum) * math.sqrt(yd.map(a => a * a).sum))
    }
    val truth = originals.zip(partners).collect {
      case ((i, v), (j, w)) if math.rint(cos(v, w) * 1e6) / 1e6 >= thr => (i, j)
    }.toSet
    assert(truth.size >= planted * 9 / 10, s"construction: ${truth.size} true pairs")
    val at13 = minedAt(13)
    val recall = (truth & at13).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall floor at P=13: got $recall over ${truth.size} planted pairs")
    // parity at the base plane count: adaptive == fixed-8 for any corpus
    // that sizes to 8 planes (every correctness/bench-scale dataset)
    assert(minedAt(Similarity.adaptivePlanes(df.count())) == minedAt(8),
      "adaptive-plane result must be bit-identical to fixed-8 at base-scale corpora")
  }

  test("degenerate-bucket cap: non-binding at healthy occupancy, binding bounds a hub bucket") {
    // Healthy corpus (the planted set above, occupancy well under the
    // cap): capped output must be BIT-IDENTICAL to uncapped — the
    // recall-parity pin for q_sim_embed_dedup / q_bitext_margin, whose
    // oracles now mirror the cap with a HAVING filter.
    val healthy = (0L until 200L).map { i =>
      (i, (0 until 8).map(d => ((((i * 31 + d * 17) % 13).toFloat - 6.0f) / 6.0f)))
    }.toDF("id", "vec")
    def pairs(df: org.apache.spark.sql.DataFrame, cap: Int): Set[(Long, Long)] =
      Similarity.embedNearDupPairs(df, "id", "vec", 8, 8, 0.9, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(healthy, 1024) == pairs(healthy, Int.MaxValue),
      "cap must not bind at healthy occupancy")

    // Pathological hub: every vector identical -> ONE bucket of size n.
    // Uncapped the verify stage is n²/2 pairs; capped the hub bucket is
    // dropped whole and the pair relation is EMPTY — the worst case is
    // bounded instead of quadratic.
    val hub = (0L until 60L).map(i => (i, Seq.fill(8)(0.5f))).toDF("id", "vec")
    assert(pairs(hub, Int.MaxValue).size == 60 * 59 / 2, "construction: one hub bucket")
    assert(pairs(hub, 32).isEmpty, "capped hub bucket must be dropped whole")

    // bitext side: same guard, counted over both sides
    val mined = Similarity.bitextMarginMine(hub, "id", "vec",
      col("id") % 2, 8, 8, minMarginBp = 0L, bucketCap = 32)
    assert(mined.count() == 0, "bitext candidates from a capped hub bucket must vanish")
  }

  test("IVF assignment: literal-centroid path is join-free; join form broadcasts + packed-maxes") {
    val vecs = (0L until 24L).map { i =>
      (i, (0 until 8).map(d => ((((i * 7 + d * 3) % 17) - 8).toFloat / 8f)))
    }
    // file-backed so ConvertToLocalRelation cannot fold the projection away
    val dir = graft.io.TempDirs.registered("graft-ivfassign-plan").toString
    vecs.toDF("id", "vec").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val cent = Similarity.kmeansCentroids(df, "id", "vec", centroidStep = 6, iters = 1)
    val plan = Similarity.ivfAssignTo(df, "id", "vec", cent)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ivf_assign"), s"native assignment expression missing:\n$plan")
    assert(!plan.contains("Join"), s"literal-centroid assignment must be join-free:\n$plan")
    assert(!plan.contains("Window"), s"assignment must never window-sort the corpus:\n$plan")

    // join form (parity reference / oversized-malformed route)
    val fb = Similarity.ivfAssignToJoin(df, "id", "vec", cent)
      .queryExecution.executedPlan.toString
    assert(fb.contains("BroadcastNestedLoopJoin") || fb.contains("BroadcastExchange"),
      s"the centroid set must broadcast:\n$fb")
    assert(fb.contains("partial_max"),
      s"the argmax must combine map-side (packed long max):\n$fb")
    assert(!fb.contains("Window"), s"never a window sort:\n$fb")
  }

  test("IVF assignment: literal-centroid path bit-identical to the join form, edge rows included") {
    val base = (0L until 24L).map { i =>
      (i, (0 until 8).map(d => ((((i * 7 + d * 3) % 17) - 8).toFloat / 8f)))
    }.toDF("id", "vec")
    // trained DOUBLE-cvec quantizer AND the raw float-cvec bootstrap
    // (`centroids` emits the corpus' own float arrays) — both schemas
    // must ride the fast path and match the join form bit-for-bit
    val trained = Similarity.kmeansCentroids(base, "id", "vec", 6, 2)
    val bootstrap = base.filter(col("id") % 6 === 0)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    // edges: null vector (21), null element (22), SHORT vector (23 —
    // vec_dot nulls on length mismatch, so the cell is NULL, no raise),
    // plus one duplicated row (both forms collapse identical duplicates)
    val edge = base.withColumn("vec",
      when(col("id") === 21L, lit(null).cast("array<float>"))
        .when(col("id") === 22L,
          expr("transform(vec, (x, i) -> IF(i = 2, CAST(NULL AS FLOAT), x))"))
        .when(col("id") === 23L, slice(col("vec"), 1, 5))
        .otherwise(col("vec")))
    val emb = edge.union(edge.filter(col("id") === 5L))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Any)] =
      df.select("id", "cell").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
        .sortBy(_._1).toSeq
    for (cent <- Seq(trained, bootstrap)) {
      val fast = Similarity.ivfAssignTo(emb, "id", "vec", cent)
      assert(fast.queryExecution.analyzed.toString.contains("ivf_assign"),
        "fixture must exercise the literal-centroid path")
      val join = Similarity.ivfAssignToJoin(emb, "id", "vec", cent)
      val got = canon(fast)
      assert(got == canon(join), s"fast/join divergence under cent schema ${cent.schema}")
      assert(got.count(_._1 == 5L) == 1, "duplicate rows must collapse in both forms")
      assert(Seq(21L, 22L, 23L).forall(i => got.find(_._1 == i).get._2 == null),
        "null vec / null element / length mismatch -> NULL cell in both forms")
      assert(got.filterNot(t => Seq(21L, 22L, 23L).contains(t._1)).forall(_._2 != null),
        "well-formed vectors must all assign")
    }

    // file-backed round covers the CODEGEN path, not just eval()
    val dir = graft.io.TempDirs.registered("graft-ivfassign-parity").toString
    edge.write.mode("overwrite").parquet(dir)
    val embF = spark.read.parquet(dir)
    assert(canon(Similarity.ivfAssignTo(embF, "id", "vec", trained)) ==
      canon(Similarity.ivfAssignToJoin(embF, "id", "vec", trained)))

    // exact tie-break: two centroids IDENTICAL up to cid — every vector's
    // cosine ties at 6 decimals, so the packed max must pick the LOWER cid
    val c0 = trained.orderBy("cid").limit(1)
      .select(col("cvec")).head.getSeq[Double](0)
    val tied = Seq((7L, c0), (3L, c0)).toDF("cid", "cvec")
    val tiedCells = canon(Similarity.ivfAssignTo(base, "id", "vec", tied))
    assert(tiedCells == canon(Similarity.ivfAssignToJoin(base, "id", "vec", tied)))
    assert(tiedCells.forall(_._2 == java.lang.Long.valueOf(3L)),
      "equal cosines must resolve to the lowest cid in both forms")

    // out-of-range cid fails fast in BOTH forms (pack-corruption guard)
    val badCid = Seq((-1L, c0)).toDF("cid", "cvec")
    intercept[Exception] {
      Similarity.ivfAssignTo(base, "id", "vec", badCid).collect()
    }
    intercept[Exception] {
      Similarity.ivfAssignToJoin(base, "id", "vec", badCid).collect()
    }

    // a malformed centroid (null element) routes to the join form, so
    // both entry points stay bit-identical on it
    val nullElem = Seq((0L, (0 until 8).map(_ * 0.25)))
      .toDF("cid", "cvec")
      .withColumn("cvec",
        expr("transform(cvec, (x, i) -> IF(i = 1, CAST(NULL AS DOUBLE), x))"))
    val viaEntry = Similarity.ivfAssignTo(base, "id", "vec", nullElem)
    assert(!viaEntry.queryExecution.analyzed.toString.contains("ivf_assign"),
      "a malformed centroid set must route to the join form")
    assert(canon(viaEntry) == canon(Similarity.ivfAssignToJoin(base, "id", "vec", nullElem)))
  }

  test("k-means one-pass Lloyd round: bit-identical to the explode form, explode-free plan") {
    val vecs = (0L until 30L).map { i =>
      val base = if (i % 3 == 0) Seq(1.0, 0.0, 0.0)
                 else if (i % 3 == 1) Seq(0.0, 1.0, 0.0) else Seq(0.0, 0.0, 1.0)
      (i, base.map(x => (x + i * 0.001).toFloat))
    }
    val base = vecs.toDF("id", "vec")
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Option[Long], Seq[Option[Double]])] =
      df.collect().map { r =>
        val cid = if (r.isNullAt(0)) None else Some(r.getLong(0))
        val cvec = if (r.isNullAt(1)) Seq.empty[Option[Double]]
          else r.getSeq[Any](1).map(x => Option(x).map(_.asInstanceOf[Double])).toSeq
        (cid, cvec)
      }.toSet

    // two trained rounds on a well-formed corpus: bit-identical
    assert(canon(Similarity.kmeansCentroids(base, "id", "vec", 10, 2)) ==
      canon(Similarity.kmeansCentroidsExplode(base, "id", "vec", 10, 2)))

    // edges: null vec (27 — contributes nothing in either form), null
    // element (28 — NULL cell; counts toward its group's member count,
    // drops out of the poisoned component's sum). Training parity is
    // contracted over unique-(id, vec) corpora: the one-pass form
    // weights duplicate rows by multiplicity while the explode form
    // collapses them (the oracle's training SQL partitions by vec_id
    // alone, so duplicate-bearing corpora are outside the training
    // contract either way; ivfAssignTo keeps its pinned collapse).
    val edge = base.withColumn("vec",
      when(col("id") === 27L, lit(null).cast("array<float>"))
        .when(col("id") === 28L,
          expr("transform(vec, (x, i) -> IF(i = 1, CAST(NULL AS FLOAT), x))"))
        .otherwise(col("vec")))
    val one = canon(Similarity.kmeansCentroids(edge, "id", "vec", 10, 1))
    assert(one == canon(Similarity.kmeansCentroidsExplode(edge, "id", "vec", 10, 1)))
    assert(one.exists(_._1.isEmpty),
      "the NULL-cell codeword of the null-element vector must survive in both forms")

    // file-backed round covers the CODEGEN path, not just eval()
    val dir = graft.io.TempDirs.registered("graft-kmeans-onepass").toString
    base.write.mode("overwrite").parquet(dir)
    val baseF = spark.read.parquet(dir)
    assert(canon(Similarity.kmeansCentroids(baseF, "id", "vec", 10, 2)) ==
      canon(Similarity.kmeansCentroidsExplode(baseF, "id", "vec", 10, 2)))

    // plan shape: the one-pass round never explodes the corpus and
    // carries strictly fewer exchanges than the explode form
    val cent0 = baseF.filter(col("id") % 10 === 0)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val fastPlan = Similarity.kmeansRound(baseF, "id", "vec", cent0, onePass = true)
      .queryExecution.executedPlan.toString
    val slowPlan = Similarity.kmeansRound(baseF, "id", "vec", cent0, onePass = false)
      .queryExecution.executedPlan.toString
    assert(fastPlan.contains("ivf_assign"), s"one-pass round must assign natively:\n$fastPlan")
    assert(!fastPlan.contains("Generate"), s"one-pass round must not explode:\n$fastPlan")
    assert(slowPlan.contains("Generate"), "the reference form is the explode shape")
    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges(fastPlan) < exchanges(slowPlan),
      s"one-pass round must drop an exchange:\nfast=$fastPlan\nslow=$slowPlan")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Similarity}

/** Behavior pins for the round-19 data-card/agreement operators. */
class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: hand-computed confusion matrix, integer bp arithmetic") {
    // 10 rows: agree on 6 (4 a/a, 2 b/b); marginals pred a=6,b=4; gold a=6,b=4
    // po = 6/10 = 0.6 -> 6000 bp
    // pe = (6*6 + 4*4)/100 = 0.52 -> 5200 bp
    // kappa = (6000-5200)*10000 div (10000-5200) = 8000000 div 4800 = 1666
    val df = (Seq.fill(4)(("a", "a")) ++ Seq.fill(2)(("b", "b")) ++
      Seq.fill(2)(("a", "b")) ++ Seq.fill(2)(("b", "a"))).toDF("p", "g")
    val r = Quality.cohenKappa(df, col("p"), col("g")).collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(1) == 6L)
    assert(r.getLong(2) == 6000L && r.getLong(3) == 5200L && r.getLong(4) == 1666L)
  }

  test("cohenKappa: negative kappa carries its sign; constant labelers read 10000") {
    // perfect systematic DISAGREEMENT on balanced binary labels:
    // po = 0, pe = 5000, kappa = -(5000*10000 div 5000) = -10000
    val anti = (Seq.fill(5)(("a", "b")) ++ Seq.fill(5)(("b", "a"))).toDF("p", "g")
    val r1 = Quality.cohenKappa(anti, col("p"), col("g")).collect()(0)
    assert(r1.getLong(2) == 0L && r1.getLong(3) == 5000L && r1.getLong(4) == -10000L)
    // degenerate: both labelers constant and equal -> pe = 10000 -> kappa 10000
    val const = Seq.fill(7)(("x", "x")).toDF("p", "g")
    assert(Quality.cohenKappa(const, col("p"), col("g")).collect()(0).getLong(4) == 10000L)
  }

  test("cohenKappa: a null label pair is NON-agreement (SQL `p = g` semantics)") {
    // the DuckDB kappaSql mirror counts agreement with plain `p = g`,
    // where null = null is NOT true — the engine must match if a caller
    // ever feeds nullable labels (r19 advice item, pinned here)
    val withNulls = Seq(
      (Some("a"), Some("a")), (Some("a"), Some("a")),
      (None: Option[String], None: Option[String]),
      (None: Option[String], Some("a")), (Some("b"), None: Option[String])
    ).toDF("p", "g")
    val r = Quality.cohenKappa(withNulls, col("p"), col("g")).collect()(0)
    assert(r.getLong(0) == 5L, "n counts every row, null labels included")
    assert(r.getLong(1) == 2L, "only the two a/a rows agree — null pairs do not")
  }

  test("cohenKappa is symmetric in its two labelers") {
    val df = Seq(("a","a"),("a","b"),("b","b"),("b","b"),("c","a"),("a","c")).toDF("p","g")
    val ab = Quality.cohenKappa(df, col("p"), col("g")).collect()(0).toSeq
    val ba = Quality.cohenKappa(df, col("g"), col("p")).collect()(0).toSeq
    assert(ab == ba)
  }

  test("lenHistogram: log2 bucket boundaries are exact (length of binary string)") {
    val df = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).map(("k", _)).toDF("k", "n")
    val got = Quality.lenHistogram(df, "k", col("n"))
      .orderBy("len_bucket")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toSeq
    // bucket -> (n_docs, min, max): 1:[1,1] 2:[2,3] 3:[4,7] 4:[8,8] 10:[1023] 11:[1024]
    assert(got == Seq((1L,1L,1L,1L), (2L,2L,2L,3L), (3L,2L,4L,7L),
      (4L,1L,8L,8L), (10L,1L,1023L,1023L), (11L,1L,1024L,1024L)))
  }

  test("vocabStats: totals, hapax and top-k share on a hand case") {
    // key k: tokens a x5, b x3, c,d,e x1 -> n=10, vocab=5, hapax=3
    // topK=2 -> top tokens by count: a(5), b(3) -> share = 8000 bp
    val toks = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d", "e"))
      .map(("k", _)).toDF("k", "tok")
    val r = Quality.vocabStats(toks, "k", "tok", 2).collect()(0)
    assert(r.getLong(1) == 11L && r.getLong(2) == 5L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 7272L) // (5+3)*10000 div 11
  }

  test("lshJaccardExplain: evidence is self-consistent and pairs match lshJaccard") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "a completely different document about nothing shared at all here"),
      (4L, "the quick brown fox jumps over the lazy dog again and again tonight"))
      .toDF("id", "text")
    val exp = Similarity.lshJaccardExplain(df, "id", "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 4, maxBucketSize = 100,
      threshold = 0.5)
    val rows = exp.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, inter, sa, sb, nb) = (r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
      assert(math.abs(j - math.rint(inter.toDouble / (sa + sb - inter) * 1e4) / 1e4) < 1e-9,
        "jaccard must equal its own evidence")
      assert(nb >= 1 && nb <= 4, s"band collisions in [1, numBands]: $nb")
    }
    val plain = Similarity.lshJaccard(df, "id", "text", 3, 16, 4, 100, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Similarity.release(exp)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == plain,
      "explain must report exactly the pairs lshJaccard finds")
    // the identical pair collides in every band
    val ident = rows.find(r => (r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(ident.exists(_.getLong(6) == 4L), "identical docs collide in all 4 bands")
  }

  test("giniIndex: hand cases — uniform 0 bp, concentrated near 10000, known middle") {
    // uniform: 4 keys x 5 events -> gini 0
    val uni = (0 until 4).flatMap(k => Seq.fill(5)(s"u$k")).toDF("k")
    assert(Quality.giniIndex(uni, "k").collect()(0).getLong(2) == 0L)
    // one key owns all but three singleton keys: x = (1,1,1,97), n=4
    // S1 = 1*1+2*1+3*1+4*97 = 394; G = (2*394 - 5*100)/(4*100) = 288/400 = 0.72
    val skew = (Seq.fill(97)("big") ++ Seq("a", "b", "c")).toDF("k")
    assert(Quality.giniIndex(skew, "k").collect()(0).getLong(2) == 7200L)
    // x = (1,2,3): S1 = 1+4+9 = 14; G = (28 - 4*6)/(3*6) = 4/18 -> 2222 bp
    val mid = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c")).toDF("k")
    assert(Quality.giniIndex(mid, "k").collect()(0).getLong(2) == 2222L)
  }

  test("refCoverage: orphans counted as ROWS, unmatched parents as keys") {
    val child = Seq((1L, "x"), (1L, "y"), (2L, "z"), (9L, "orphan"), (9L, "orphan2"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val r = Quality.refCoverage(child, "fk", parent, "pk", "t").collect()(0)
    assert(r.getString(0) == "t")
    assert(r.getLong(1) == 5L, "n_child counts rows")
    assert(r.getLong(2) == 2L, "both rows of the orphan key count")
    assert(r.getLong(3) == 4L && r.getLong(4) == 2L, "parents 3 and 4 unmatched")
    assert(!r.getBoolean(5), "orphans -> integrity not ok")
    val clean = Quality.refCoverage(child.filter(col("fk") =!= 9L), "fk",
      parent, "pk", "t").collect()(0)
    assert(clean.getLong(2) == 0L && clean.getBoolean(5))
  }

  test("kAnonymity: class sizes and the k threshold") {
    val df = (Seq.fill(10)(("a", 1)) ++ Seq.fill(3)(("a", 2)) ++ Seq.fill(12)(("b", 1)))
      .toDF("q1", "q2")
    val got = Quality.kAnonymity(df, Seq("q1", "q2"), 10L)
      .orderBy("q1", "q2").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == Seq(("a", 1, 10L, true), ("a", 2, 3L, false), ("b", 1, 12L, true)))
  }

  test("runStreamingDecay: closed-form replay; new strata join mid-run") {
    val docs = Seq(
      // stratum s0: 2 docs in delivery 0 (ids 0,3 % 3), 1 in delivery 1, 1 in 2
      (0L, "s0"), (3L, "s0"), (1L, "s0"), (2L, "s0"),
      // stratum s1 first appears in delivery 1 (id 4 % 3 = 1) — must join
      (4L, "s1"), (5L, "s1")).toDF("doc_id", "source")
    val in = graft.io.TempDirs.registered("graft-spec-st24-in").toString
    val state = graft.io.TempDirs.registered("graft-spec-st24-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-spec-st24-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(0L, 1L, 2L).zipWithIndex.foreach { case (r, s) =>
      docs.filter(pmod(col("doc_id"), lit(3L)) === r)
        .coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-")) f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, docs.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingDecay(src, "source", 7L, 8L, state, ckpt)
    val got = graft.streaming.Streaming.sgdWeights(spark, state)
      .orderBy("source").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // s0: deliveries (2, 1, 1): ((2*7/8=1)+1=2 -> (2*7/8=1)+1=2) raw 4
    // s1: deliveries (0, 1, 1): joins at t1 with 1 -> (1*7/8=0)+1=1, raw 2
    assert(got.toSeq == Seq(("s0", 2L, 4L), ("s1", 1L, 2L)))
  }
}

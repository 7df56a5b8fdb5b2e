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
}

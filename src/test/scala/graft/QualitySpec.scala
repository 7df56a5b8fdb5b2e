package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(20.0), "b"),
    (2L, None, "b"),
    (3L, Some(-5.0), "c")).toDF("k", "v", "s")

  test("dqReport: null predicate counts as a violation; passed iff zero") {
    val out = Quality.dqReport(frame, Seq(
      "v_positive" -> (col("v") > 0),     // one negative + one null -> 2
      "k_small"    -> (col("k") <= 3)))   // all pass
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("v_positive") == ((2L, false)))
    assert(out("k_small") == ((0L, true)))
  }

  test("dqReport: empty frame reads as zero violations, passed, never null") {
    val out = Quality.dqReport(frame.filter(col("k") > 99), Seq(
      "v_positive" -> (col("v") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("v_positive", 0L, true)))
  }

  test("dqReport rejects duplicate rule names up front") {
    intercept[IllegalArgumentException] {
      Quality.dqReport(frame, Seq("r" -> (col("k") > 0), "r" -> (col("v") > 0)))
    }
  }

  test("driftPsi: identical populations score zero; a shift scores positive") {
    val ref = (1L to 100L).map(i => (i % 10).toDouble).toDF("x")
    val same = Quality.driftPsi(ref, ref, col("x"), 0.0, 10.0, 10)
      .collect()
    assert(same.forall(_.getDouble(4) == 0.0))
    assert(same.forall(_.getDouble(3) == 0.0))
    val shifted = (1L to 100L).map(i => (i % 10).toDouble + 3.0).toDF("x")
    val psi = Quality.driftPsi(ref, shifted, col("x"), 0.0, 13.0, 13)
      .collect().head.getDouble(4)
    assert(psi > 0.25, s"a 3-bucket shift should read as drifted, got $psi")
  }

  test("driftPsi: empty buckets contribute finitely (Laplace smoothing)") {
    val ref = Seq(0.5, 0.5, 0.5).toDF("x")   // all mass in bucket 0
    val cur = Seq(9.5, 9.5).toDF("x")        // all mass in bucket 9
    val rows = Quality.driftPsi(ref, cur, col("x"), 0.0, 10.0, 10).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(rows.forall(_.getDouble(3) >= 0.0))
  }

  test("dqUnique: counts rows beyond the first per key; empty frame passes") {
    val dup = Quality.dqUnique(frame, Seq("k"), "k_unique").collect().head
    assert((dup.getString(0), dup.getLong(1), dup.getBoolean(2)) == (("k_unique", 1L, false)))
    val empty = Quality.dqUnique(frame.filter(col("k") > 99), Seq("k"), "k_unique")
      .collect().head
    assert((empty.getLong(1), empty.getBoolean(2)) == ((0L, true)))
  }

  test("sourceScorecard: volume, dup rate, contamination and verdict per source") {
    val corpus = Seq(
      (1L, "a", "the quick brown fox jumps over the lazy dog today"),
      (2L, "a", "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
      (3L, "a", "completely different words appear in this document here"),
      (4L, "b", "benchmark overlap five gram shared tokens run through here"),
      (5L, "b", "more unique text lives in this second source entry")
    ).toDF("doc_id", "source", "text")
    // bench doc is doc 4's text -> >= 3 shared 5-grams -> b is contaminated
    val bench = Seq(
      (99L, "benchmark overlap five gram shared tokens run through here"))
      .toDF("doc_id", "text")
    val out = Quality.sourceScorecard(corpus, "doc_id", "source", "text",
        lit(0.8), size(split(col("text"), "\\s+")), bench,
        shingleN = 5, minShared = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getBoolean(7)))).toMap
    val (aN, aQ, aC, aCr, aDr, aPsi, aPass) = out("a")
    assert((aN, aQ, aC, aCr, aDr) == ((3L, 0.8, 0L, 0.0, 0.3333)))
    assert(aPsi >= 0.0 && aPsi <= 0.25 && aPass) // same-shaped length dist: low drift
    val (bN, bQ, bC, bCr, bDr, _, bPass) = out("b")
    assert((bN, bQ, bC, bCr, bDr) == ((2L, 0.8, 1L, 0.5, 0.0)))
    assert(!bPass) // contamination rate 0.5 > 0.08 fails the gate
  }
}

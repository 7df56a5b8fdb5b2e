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

  test("repetitionReport: hand-computed line and n-gram coverage fractions") {
    val docs = Seq(
      // 4 lines, 'alpha' repeated: dup_line_frac 1/4; char frac
      // (2-1)*5 / (2*5 + 4 + 5) = 5/19. All n-grams unique -> 0 top/dup
      // coverage; the line CHAR fraction 0.263158 > 0.20 fails the gate
      (1L, "alpha\nbeta\nalpha\ngamma"),
      // pure loop, nc=29: top2 = 5*len("spam spam")=45 -> 1.551724 (>1:
      // overlapping occurrences each count their full span, documented);
      // dup5 = 2*24/29; single 6-gram -> dup6..10 = 0
      (2L, "spam spam spam spam spam spam"),
      // clean short doc: nothing repeats at any n -> all zeros, passes
      // (the longest unique 2-gram must NOT count as repetition)
      (3L, "one two three four five six seven"),
      // empty text: no lines, no grams, all zeros, passes
      (4L, "")).toDF("doc_id", "text")
    val r = Quality.repetitionReport(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    def d(id: Long, c: String) = r(id).getAs[Double](c)
    assert(d(1L, "dup_line_frac") == 0.25)
    assert(d(1L, "dup_line_char_frac") == 0.263158)
    assert(d(1L, "top_2gram_char_frac") == 0.0)
    assert(!r(1L).getAs[Boolean]("passed"))
    assert(d(2L, "dup_line_frac") == 0.0)
    assert(d(2L, "top_2gram_char_frac") == 1.551724) // 45/29
    assert(d(2L, "top_3gram_char_frac") == 1.931034) // 4*14/29
    assert(d(2L, "top_4gram_char_frac") == 1.965517) // 3*19/29
    assert(d(2L, "dup_5gram_char_frac") == 1.655172) // 2*24/29
    assert(d(2L, "dup_6gram_char_frac") == 0.0)
    assert(!r(2L).getAs[Boolean]("passed"))
    Seq(3L, 4L).foreach { id =>
      Seq("dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
        "top_3gram_char_frac", "top_4gram_char_frac", "dup_5gram_char_frac",
        "dup_10gram_char_frac").foreach { c =>
        assert(d(id, c) == 0.0, s"doc $id col $c: ${d(id, c)}")
      }
      assert(r(id).getAs[Boolean]("passed"))
    }
  }
}

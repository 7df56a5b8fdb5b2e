package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Index, Relational, Sketch}

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- Index

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog")
  ).toDF("doc_id", "text")

  test("invertedIndex: df/tf exact, postings sorted and capped") {
    val idx = Index.invertedIndex(docs, "doc_id", "text", postingsCap = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    assert(idx("the") == ((2L, 3L, Seq(1L, 2L))))   // 2 docs, 3 occurrences
    assert(idx("cat") == ((2L, 2L, Seq(1L, 3L))))
    assert(idx("sat")._3 == Seq(1L, 2L))
    // cap: "a" appears only in doc 3; "the" has both docs <= cap 2;
    // with cap 1 the postings shrink but df/tf don't
    val capped = Index.invertedIndex(docs, "doc_id", "text", postingsCap = 1)
      .filter(col("term") === "cat").collect().head
    assert(capped.getLong(1) == 2L && capped.getSeq[Long](3) == Seq(1L))
  }

  test("lmScore: repeated boilerplate outscores unique word salad") {
    val corpus = (1L to 8L).map(i => (i, "alpha beta gamma delta alpha beta"))
      .toDF("doc_id", "text")
      .union(Seq((9L, "zeta omega kappa sigma")).toDF("doc_id", "text"))
    val scores = Index.lmScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(9L),
      s"boilerplate ${scores(1L)} should beat rare-bigram doc ${scores(9L)}")
    // identical docs score identically
    assert(scores(1L) == scores(8L))
  }

  // -------------------------------------------------------------- Funnel

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stage ordering, strict progression, window gating") {
    val ev = Seq(
      // user 1: full ordered funnel within windows
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase"),
      // user 2: click BEFORE first view -> not counted; no click after
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: click after view but outside the 1h window
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 12:30:00"), "click"),
      // user 4: no view at all
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 3600L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("funnel: purchase between view and click does not skip a stage") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "purchase"), // before any click: ignored
      (1L, ts("2024-01-01 10:10:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val row = Relational.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 3600L).collect().head
    assert(row.getLong(4) == 2L && row.isNullAt(3))
  }

  // ---------------------------------------------- Histogram quantiles

  test("histogramQuantiles: uniform data interpolates to the exact quantile") {
    // values 0.5, 1.5, ..., 99.5 over [0,100) with 100 buckets: one value
    // per bucket, so p-quantile = p*100 exactly (cnt=1 interpolation)
    val df = (0 until 100).map(i => ("g", i + 0.5)).toDF("g", "x")
    val out = Sketch.histogramQuantiles(df, "g", col("x"), 0.0, 100.0, 100,
        Seq(0.5, 0.9)).collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(out(0.5) == 50.0 && out(0.9) == 90.0, s"got $out")
  }

  test("histogramQuantiles: out-of-range values clamp to edge cells") {
    val df = Seq(("g", -50.0), ("g", 1.0), ("g", 999.0)).toDF("g", "x")
    val out = Sketch.histogramQuantiles(df, "g", col("x"), 0.0, 10.0, 10, Seq(0.5))
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L) // n counts clamped rows
  }

  test("bm25TopK: shorter doc outranks longer at equal tf; absent terms score nothing") {
    // both docs contain "b" once; doc 2 is shorter -> higher length-normalized
    // tf -> ranks first. Query term "z" appears nowhere -> contributes no rows.
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c c c")).toDF("doc_id", "text")
    val qs = Seq(("q1", "b z")).toDF("query_id", "qtext")
    val out = Index.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L), "docs without 'b' must not match")
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("rrfFuse: scores sum across lists, absent ids contribute nothing, ties break on id") {
    // floor(1e9/61) = 16393442 (rank 1), floor(1e9/62) = 16129032 (rank 2)
    val a = Seq(("g", 1L, 1L), ("g", 2L, 2L)).toDF("g", "id", "rank")
    val b = Seq(("g", 2L, 1L), ("g", 3L, 2L)).toDF("g", "id", "rank")
    val out = Index.rrfFuse(Seq(a, b), Seq("g"), "id", "rank", k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L, 3L))
    assert(out.map(_.getDouble(2)).toSeq ==
      Seq(0.032522, 0.016393, 0.016129)) // (16393442+16129032, 16393442, 16129032) / 1e9
    // equal fused score (both only in one list at rank 1) -> lower id first
    val t1 = Seq(("g", 5L, 1L)).toDF("g", "id", "rank")
    val t2 = Seq(("g", 4L, 1L)).toDF("g", "id", "rank")
    val tied = Index.rrfFuse(Seq(t1, t2), Seq("g"), "id", "rank", k = 10)
      .orderBy("rank").collect()
    assert(tied.map(_.getLong(1)).toSeq == Seq(4L, 5L))
  }

  test("histogramQuantiles rejects quantiles outside (0, 1]") {
    val df = Seq(("g", 1.0)).toDF("g", "x")
    intercept[IllegalArgumentException] {
      Sketch.histogramQuantiles(df, "g", col("x"), 0.0, 10.0, 10, Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Sketch.histogramQuantiles(df, "g", col("x"), 0.0, 10.0, 10, Seq(1.5))
    }
  }

  // ------------------------------------------------------ Fuzzy match

  test("blockedFuzzyMatch: typo resolves to nearest dictionary name") {
    val clean = Seq("red widget", "red wombat", "blue bolt").toDF("nm")
    val dirty = Seq((1L, "rd widget"), (2L, "blue bolt"), (3L, "red widgat"))
      .toDF("id", "nm")
    val out = Relational.blockedFuzzyMatch(dirty, "id", "nm", clean, "nm",
        n => substring(n, 1, 1), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(out == Set((1L, "red widget", 1L), (2L, "blue bolt", 0L),
      (3L, "red widget", 1L)))
  }

  test("blockedFuzzyMatch: no candidate within maxDist drops the record") {
    val clean = Seq("alpha").toDF("nm")
    val dirty = Seq((1L, "azzzza")).toDF("id", "nm")
    assert(Relational.blockedFuzzyMatch(dirty, "id", "nm", clean, "nm",
      n => substring(n, 1, 1), maxDist = 2).count() == 0L)
  }

  test("blockedFuzzyMatch broadcasts the dictionary side") {
    val clean = Seq("red widget").toDF("nm")
    val dirty = Seq((1L, "red widget")).toDF("id", "nm")
    val plan = Relational.blockedFuzzyMatch(dirty, "id", "nm", clean, "nm",
      n => substring(n, 1, 1), 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dictionary not broadcast:\n$plan")
  }

  // ----------------------------------------------------- Normalization

  test("foldAccents + normalizeText canonicalize accented noise") {
    val out = Seq("  Café ZÜrich!! NAÏVE--résumé ")
      .toDF("t").select(Text.normalizeText(col("t"))).collect().head.getString(0)
    assert(out == "cafe zurich naive resume")
  }

  test("accent map is 1:1 and folds to ascii") {
    assert(Text.accentFrom.length == Text.accentTo.length)
    val folded = Seq(Text.accentFrom).toDF("t")
      .select(Text.foldAccents(col("t"))).collect().head.getString(0)
    assert(folded == Text.accentTo)
  }
}

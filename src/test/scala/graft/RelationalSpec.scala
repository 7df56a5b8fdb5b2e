package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def arrivals = Seq(
    // (key, arrival_order, payload)
    ("k1", 1L, "old"), ("k1", 2L, "mid"), ("k1", 3L, "new"),
    ("k2", 5L, "only"),
    ("k3", 9L, "a"), ("k3", 7L, "b")).toDF("key", "arr", "payload")

  test("A5 dedupKeepLast keeps the row with max ordering column per key") {
    val out = Relational.dedupKeepLast(arrivals, Seq("key"), col("arr"))
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "new"), ("k2", "only"), ("k3", "a")))
  }

  test("A5 dedupKeepLast is idempotent") {
    val once = Relational.dedupKeepLast(arrivals, Seq("key"), col("arr"))
    val twice = Relational.dedupKeepLast(once, Seq("key"), col("arr"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("A2 dedupKeepFirst keeps the min ordering row per key") {
    val out = Relational.dedupKeepFirst(arrivals, Seq("key"), col("arr"))
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "old"), ("k2", "only"), ("k3", "b")))
  }

  test("J2a coalesceRepair overwrites null/sentinel targets only") {
    val df = Seq(
      (1, 0.0, 100.0),              // sentinel 0.0 -> repaired
      (2, 50.0, 999.0),             // good value -> kept
      (3, 0.0, Double.NaN)).toDF("id", "target", "source")
      .withColumn("source", when(col("id") === 3, lit(null: java.lang.Double)).otherwise(col("source")))
    val out = Relational.coalesceRepair(df, "target", col("source"))
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(out == Seq(100.0, 50.0, 0.0)) // null source keeps original
  }

  test("S6 validSplit partitions rows totally and disjointly (null predicate -> quarantine)") {
    val df = Seq(
      (1, Some(5)), (2, Some(-1)), (3, None)).toDF("id", "v")
    val (ok, bad) = Relational.validSplit(df, col("v") > 0)
    assert(ok.select("id").as[Int].collect().toSet == Set(1))
    assert(bad.select("id").as[Int].collect().toSet == Set(2, 3))
    assert(ok.count() + bad.count() == df.count())
  }

  test("O1/O2 topK returns k rows in composite order") {
    val df = Seq((1, 10.0), (2, 30.0), (3, 30.0), (4, 20.0)).toDF("id", "score")
    val out = Relational.topK(df, 2, col("score").desc, col("id").asc)
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(2, 3))
  }

  test("U1 unionAll aligns by name and fills missing columns with null") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, true)).toDF("id", "only_b")
    val out = Relational.unionAll(Seq(a, b))
    assert(out.columns.toSet == Set("id", "only_a", "only_b"))
    assert(out.count() == 2)
    assert(out.filter(col("only_a").isNull).count() == 1)
  }

  test("W1 timeOfPossession lags per key with default for first row") {
    val df = Seq(
      ("p1", "2020-01-01"), ("p1", "2022-01-01"),
      ("p2", "2021-06-15")).toDF("prop", "d")
      .withColumn("d", to_date(col("d")))
    val out = Relational.timeOfPossession(df, Seq("prop"), "d")
      .orderBy("prop", "d").collect()
    assert(out(0).getDouble(out(0).length - 1) == 10.0)            // first p1 row -> default
    assert(math.abs(out(1).getDouble(out(1).length - 1) - 2.0) < 0.01) // ~2 years
    assert(out(2).getDouble(out(2).length - 1) == 10.0)            // only p2 row -> default
  }

  test("saltedJoin equals the plain join and spreads a hot key") {
    val fact = (1 to 200).map(i => (if (i <= 190) "hot" else s"k$i", i))
      .toDF("k", "v")
    val dim = Seq(("hot", 1.0), ("k195", 2.0)).toDF("k", "w")
    val salted = Relational.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "v", "w")
    val plain = fact.join(dim, Seq("k"), "inner").select("k", "v", "w")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // the hot key really occupies multiple salt cells
    val cells = fact.filter(col("k") === "hot")
      .withColumn("s", pmod(hash(col("k"), col("v")), lit(4)))
      .select("s").distinct().count()
    assert(cells > 1)
  }

  test("saltedSumCount merges partials to the one-shot aggregate") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "rare" else "hot", i.toLong))
      .toDF("g", "v")
    val out = Relational.saltedSumCount(df, Seq("g"), "v", salts = 8)
      .orderBy("g").collect()
    val expect = df.groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      expect.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("S9 pendingWorkQueue: null-flag filter + group-first + desc order") {
    val df = Seq(
      ("m1", Some("Yes"), 1), ("m2", None, 2), ("m2", None, 1), ("m3", None, 7))
      .toDF("mls", "done", "ord")
    val out = Relational.pendingWorkQueue(df, "done", "mls", col("ord"))
      .select("mls", "ord").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(out == Seq(("m3", 7), ("m2", 1)))
  }

  test("scd2 builds contiguous validity intervals with deterministic ties") {
    val df = Seq(
      ("k1", 10L, 101L, "a"), ("k1", 20L, 102L, "b"), ("k1", 20L, 103L, "c"),
      ("k2", 5L, 201L, "x"))
      .toDF("key", "at", "seq", "attr")
    val out = Relational.scd2(df, Seq("key"), "at", "seq")
      .select("key", "seq", "valid_from", "valid_to", "version", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(out == Set(
      ("k1", 101L, 10L, Some(20L), 1L, false),
      ("k1", 102L, 20L, Some(20L), 2L, false), // tie: 102 before 103 by seq
      ("k1", 103L, 20L, None, 3L, true),
      ("k2", 201L, 5L, None, 1L, true)))
  }

  test("tableDiff classifies inserted/deleted/changed/unchanged with null-safe compares") {
    val before = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None), (4L, Some(40.0)))
      .toDF("k", "v")
    val after = Seq((1L, Some(10.0)), (2L, Some(25.0)), (3L, Some(30.0)), (5L, Some(50.0)))
      .toDF("k", "v")
    val out = Relational.tableDiff(before, after, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", // null -> value is a change, not a match
      4L -> "deleted", 5L -> "inserted"))
  }

  test("rollup emits per-group, subtotal, and grand-total levels with explicit gid") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L)).toDF("f", "s", "v")
    val out = df.rollup(col("f"), col("s"))
      .agg((grouping(col("f")).cast("long") * 2 +
        grouping(col("s")).cast("long")).as("gid"), sum("v").as("sv"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      (Some("a"), Some("x"), 0L, 1L), (Some("a"), Some("y"), 0L, 2L),
      (Some("b"), Some("x"), 0L, 4L),
      (Some("a"), None, 1L, 3L), (Some("b"), None, 1L, 4L),
      (None, None, 3L, 7L)))
  }

  test("rollup plans as Expand into one hash-aggregate pass (one exchange)") {
    val df = Seq(("a", "x", 1L), ("b", "y", 2L)).toDF("f", "s", "v")
    val plan = df.rollup(col("f"), col("s")).agg(sum("v").as("sv"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup should plan an Expand:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"all grouping levels must ride ONE shuffle:\n$plan")
  }

  test("cube adds the column-marginal level rollup omits") {
    val df = Seq(("a", "x", 1L), ("b", "x", 4L)).toDF("f", "s", "v")
    val out = df.cube(col("f"), col("s"))
      .agg((grouping(col("f")).cast("long") * 2 +
        grouping(col("s")).cast("long")).as("gid"), sum("v").as("sv"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    assert(out.contains((None, Some("x"), 2L, 5L))) // f-marginal: cube-only
    assert(out.contains((None, None, 3L, 5L)))
  }

  test("tableDiff with no compare columns degrades to a keys-only diff") {
    val before = Seq(1L, 2L).toDF("k")
    val after = Seq(2L, 3L).toDF("k")
    val out = Relational.tableDiff(before, after, Seq("k"), Nil)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "deleted", 2L -> "unchanged", 3L -> "inserted"))
  }
}

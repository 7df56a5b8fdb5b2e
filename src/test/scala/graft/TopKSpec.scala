package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    val rows = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 50).flatMap(i => Seq.fill(5)(s"noise$i"))
    rows.toDF("k")
  }

  test("Misra-Gries candidates are a superset of true heavy hitters (c << cardinality)") {
    // N = 1050, c = 8 -> any key with count > N/(c+1) = 116 must survive
    // every decrement, under any partitioning.
    for (parts <- Seq(1, 7)) {
      val cand = TopK.mgCandidates(skewed.repartition(parts), "k", c = 8)
        .collect().map(_.getString(0)).toSet
      assert(cand.contains("hot1") && cand.contains("hot2"),
        s"parts=$parts lost a guaranteed heavy hitter: $cand")
      assert(cand.size <= 8, s"sketch exceeded its capacity: $cand")
    }
  }

  test("topKPerKey reduces map-side: partial ObjectHashAggregate below the one exchange") {
    // the scale contract q_source_cap rides on: every key shrinks to <= k
    // rows BEFORE the shuffle; a row_number-window regression would show
    // a Window + full sort here instead
    val df = (1 to 500).map(i => (s"s${i % 7}", i.toLong, (i % 97) / 96.0))
      .toDF("src", "id", "score")
    val out = graft.operators.TopK.topKPerKey(df, Seq("src"), "id", "score", 3)
    assert(out.count() == 21) // 7 keys x k=3
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"UDAF aggregate expected:\n$plan")
    assert(!plan.contains("Window "), s"no window/full-sort path:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"one keyed exchange:\n$plan")
  }

  test("heavyHittersExact recounts candidates exactly in the undersized-buffer regime") {
    val out = TopK.heavyHittersExact(skewed, "k", c = 8, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("hot1", 500L, 1L), ("hot2", 300L, 2L)))
  }
}

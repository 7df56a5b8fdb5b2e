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

  test("heavyHittersExact recounts candidates exactly in the undersized-buffer regime") {
    val out = TopK.heavyHittersExact(skewed, "k", c = 8, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("hot1", 500L, 1L), ("hot2", 300L, 2L)))
  }
}

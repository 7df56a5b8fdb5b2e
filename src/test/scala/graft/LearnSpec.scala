package graft

import org.apache.spark.sql.functions._

import graft.operators.Learn

class LearnSpec extends SparkSpec {
  import spark.implicits._

  // cleanly separable: label is x > 0.5, feature is x
  private def separable = (0 until 40).map { i =>
    val x = i / 40.0
    (x, if (x > 0.5) 1.0 else 0.0)
  }.toDF("x", "y")

  private val fx = Seq("x" -> col("x"))

  test("GD on separable data learns the right sign and classifies perfectly") {
    val w = Learn.logisticTrain(separable, fx, col("y"), lr = 4.0, iters = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("x") > 0, s"positive feature must get a positive weight: $w")
    val scored = separable.select(col("y"),
      Learn.logisticScore(fx, w).as("p")).collect()
    val acc = scored.count(r => (r.getDouble(1) >= 0.5) == (r.getDouble(0) == 1.0)) /
      scored.length.toDouble
    assert(acc == 1.0, s"separable data must classify perfectly, got $acc (w=$w)")
  }

  test("training is partitioning-independent (quantized gradient sums)") {
    val a = Learn.logisticTrain(separable, fx, col("y"), 2.0, 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = Learn.logisticTrain(separable.repartition(7), fx, col("y"), 2.0, 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == b, s"weights must be bit-identical under any partitioning:\n$a\n$b")
  }

  test("more rounds never hurt accuracy on the training set (monotone here)") {
    def acc(iters: Int): Double = {
      val w = Learn.logisticTrain(separable, fx, col("y"), 2.0, iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val s = separable.select(col("y"), Learn.logisticScore(fx, w).as("p")).collect()
      s.count(r => (r.getDouble(1) >= 0.5) == (r.getDouble(0) == 1.0)) / s.length.toDouble
    }
    val a1 = acc(1); val a10 = acc(10)
    assert(a10 >= a1, s"iters=10 accuracy $a10 < iters=1 accuracy $a1")
  }

  test("scoring is a pure projection: no joins, no exchanges") {
    val w = Map("x" -> 1.0, "__bias" -> -0.5)
    val plan = separable.select(Learn.logisticScore(fx, w).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"the fitted gate must apply at scan time:\n$plan")
  }
}

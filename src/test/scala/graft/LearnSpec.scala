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

  test("streaming SGD resumes training from the checkpointed model, not from zero") {
    def deliver(dir: String, lo: Int, hi: Int, stamp: Long): Unit = {
      (lo until hi).map { i => (i / 40.0, if (i / 40.0 > 0.5) 1.0 else 0.0) }
        .toDF("x", "y").coalesce(1).write.mode("append").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.lastModified > stamp)
        .foreach(_.setLastModified(stamp))
    }
    def drainInto(in: String, state: String, ckpt: String): Unit =
      graft.streaming.Streaming.runStreamingSgd(
        graft.streaming.Streaming.parquetSource(spark,
          in, separable.schema, 1),
        fx, col("y"), lr = 2.0, state, ckpt)
    def weights(state: String): Seq[(String, Double)] =
      graft.streaming.Streaming.sgdWeights(spark, state)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
    // run A: both deliveries, one drain
    val inA = graft.io.TempDirs.registered("graft-sgd-a-in").toString
    val stA = graft.io.TempDirs.registered("graft-sgd-a-st").toString
    deliver(inA, 0, 20, 1700000000000L); deliver(inA, 20, 40, 1700000060000L)
    drainInto(inA, stA, graft.io.TempDirs.registered("graft-sgd-a-ck").toString)
    // run B: drain the first delivery, THEN the second arrives, drain again
    val inB = graft.io.TempDirs.registered("graft-sgd-b-in").toString
    val stB = graft.io.TempDirs.registered("graft-sgd-b-st").toString
    val ckB = graft.io.TempDirs.registered("graft-sgd-b-ck").toString
    deliver(inB, 0, 20, 1700000000000L)
    drainInto(inB, stB, ckB)
    deliver(inB, 20, 40, 1700000060000L)
    drainInto(inB, stB, ckB)
    assert(weights(stA) == weights(stB),
      s"a restart mid-stream must continue from the model, not retrain:\n" +
        s"${weights(stA)}\n${weights(stB)}")
  }

  test("AUC: 1 for perfect ranking, 0 for inverted, exactly 0.5 under total ties") {
    def auc(rows: Seq[(Double, Double)]): Double =
      Learn.auc(rows.toDF("s", "y"), "s", "y").collect().head.getDouble(2)
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
    assert(auc(perfect) == 1.0)
    assert(auc(perfect.map { case (s, y) => (s, 1.0 - y) }) == 0.0)
    assert(auc(Seq((0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0))) == 0.5,
      "tie-averaged ranks must give exactly 0.5 when scores carry no signal")
    // partial ties: one positive tied with one negative above a negative
    // ranks(doubled): s=0.1 -> r2=2; s=0.5 pair -> r2=(2*1)+2+1=5 each
    // AUC = (5/2 - 1) / (1*2) = 0.75
    assert(auc(Seq((0.5, 1.0), (0.5, 0.0), (0.1, 0.0))) == 0.75)
  }

  test("calibration bins partition the rows and quantized means are exact") {
    val rows = Seq((0.05, 0.0), (0.07, 0.0), (0.95, 1.0), (0.99, 1.0), (1.0, 1.0))
    val out = Learn.calibration(rows.toDF("s", "y"), "s", "y", bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._2).sum == 5, "bins must partition the input")
    assert(out.toSeq == Seq(
      (0L, 2L, 0.06, 0.0),         // (0.05+0.07)/2 exactly
      (9L, 3L, 0.98, 1.0)),        // score 1.0 clamps into the last bin
      s"got ${out.toSeq}")
  }

  test("NB langid: seen tokens score by class evidence, unseen by the constant") {
    val toks = Seq(
      (1L, "the", true), (1L, "cat", true), (2L, "the", true), (2L, "dog", true),
      (3L, "le", false), (3L, "chat", false), (4L, "le", false), (4L, "chien", false)
    ).toDF("doc_id", "w", "en")
    val (llr, consts) = Learn.nbTrain(toks, "doc_id", "w", col("en"))
    val out = Learn.nbScore(toks, "doc_id", "w", llr, consts)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    // symmetric corpus: en docs positive, fr docs negative, 2 toks each
    assert(out.toSeq == Seq((1L, 2L, true), (2L, 2L, true),
      (3L, 2L, false), (4L, 2L, false)), s"got ${out.toSeq}")
    // quantized integer arithmetic: scores of symmetric docs are exact
    // negations of each other (same counts, classes swapped)
    val llrs = Learn.nbScore(toks, "doc_id", "w", llr, consts)
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(llrs(0) == -llrs(2) && llrs(1) == -llrs(3), s"got ${llrs.toSeq}")
  }

  test("NB train: a single-class weak label yields finite scores, not nulls") {
    // ADVICE r16: log(0) on the empty class must not null the prior
    val toks = Seq((1L, "a", true), (1L, "b", true), (2L, "a", true))
      .toDF("doc_id", "w", "en")
    val (llr, consts) = Learn.nbTrain(toks, "doc_id", "w", col("en"))
    val rows = Learn.nbScore(toks, "doc_id", "w", llr, consts).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3),
        s"degenerate label must stay finite via add-one doc smoothing: $r")
      assert(r.getBoolean(3), "all-positive evidence must classify positive")
    }
  }

  test("scoring is a pure projection: no joins, no exchanges") {
    val w = Map("x" -> 1.0, "__bias" -> -0.5)
    val plan = separable.select(Learn.logisticScore(fx, w).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"the fitted gate must apply at scan time:\n$plan")
  }
}

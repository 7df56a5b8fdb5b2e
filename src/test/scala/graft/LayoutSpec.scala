package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: x on even positions, y on odd") {
    val df = Seq(
      (3L, 0L),      // spread(3) = 0b101 = 5
      (0L, 3L),      // 5 << 1 = 10
      (0xFFFFL, 0L), // all even bits of 32
      (0L, 0xFFFFL), // all odd bits
      (0xFFFFL, 0xFFFFL)
    ).toDF("x", "y")
    val out = df.select(Layout.zValue(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(out.sameElements(Array(5L, 10L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL)))
  }

  test("zValue ignores bits above the low 16") {
    val out = Seq((0x10001L, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).head().getLong(0)
    assert(out == 1L) // high bit masked away, only the low 1 survives
  }

  test("zValueN matches a reference bit-interleave for 3 dims; 2-D agrees with zValue") {
    // reference: bit j of dim i at position j*n+i, computed row-at-a-time
    def ref(vals: Seq[Long], bits: Int): Long = {
      val n = vals.size
      vals.zipWithIndex.map { case (v, i) =>
        (0 until bits).map(j => ((v >> j) & 1L) << (j * n + i)).reduce(_ | _)
      }.reduce(_ | _)
    }
    val rows = Seq(
      Seq(3L, 0L, 0L), Seq(0L, 3L, 0L), Seq(0L, 0L, 3L),
      Seq(0x1FFFFFL, 0L, 0x1FFFFFL), Seq(123456L, 654321L, 999999L))
    val df = rows.map(r => (r(0), r(1), r(2))).toDF("a", "b", "c")
    val out = df.select(
      Layout.zValueN(Seq(col("a"), col("b"), col("c"))).as("z")).collect().map(_.getLong(0))
    assert(out.toSeq == rows.map(ref(_, 21)))
    // monotone box property: all-max 21-bit inputs fill exactly 63 bits
    assert(ref(Seq(0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL), 21) == Long.MaxValue)
    // 2-D: both the parallel-prefix fast path (zValue) and the generic
    // interleave at a non-dispatched width must match the same reference
    val pairs = Seq((3L, 0L), (0xFFFFL, 0xFFFFL), (12345L, 54321L))
    val pdf = pairs.toDF("x", "y")
    val fast = pdf.select(Layout.zValue(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(fast.toSeq == pairs.map(p => ref(Seq(p._1, p._2), 16)))
    val gen14 = pdf.select(
      Layout.zValueN(Seq(pmod(col("x"), lit(16384L)), pmod(col("y"), lit(16384L))),
        bitsPerDim = 14)).collect().map(_.getLong(0))
    assert(gen14.toSeq == pairs.map(p => ref(Seq(p._1 % 16384, p._2 % 16384), 14)))
  }

  test("the N-D z-order layout write plans a range repartition on the interleaved key") {
    val z = SparkEntry.queries("q_zorder_nd")(spark, "/root/testdata/sf0.001")
    val plan = z.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
    assert(plan.contains("zval"))
  }

  test("the z-order layout write plans a range repartition (file-level rectangles)") {
    val z = (1 to 100).map(i => (i.toLong, (i * 7 % 50).toLong)).toDF("k", "c")
      .select(col("k"),
        Layout.zValue(pmod(col("c"), lit(65536L)), pmod(col("k"), lit(65536L))).as("zval"))
      .repartitionByRange(4, col("zval")).sortWithinPartitions(col("zval"))
    val plan = z.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
  }

  test("int8 quantization reconstruction error is bounded by half a step") {
    val dims = 16
    val emb = (1L to 40L).map(i =>
      (i, Array.tabulate(dims)(d => ((i * 31 + d * 7) % 13 - 6) / 5.0f))).toDF("vec_id", "embedding")
    val q = emb.select(col("vec_id"),
        greatest(array_max(transform(col("embedding"), x => abs(x.cast("double")))),
          lit(1e-12)).as("amax"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("v").cast("double").as("v"), col("amax"),
        least(greatest(floor(col("v").cast("double") * 127.0 / col("amax") + 0.5),
          lit(-127.0)), lit(127.0)).as("qv"))
      .select(abs(col("qv") * col("amax") / 127.0 - col("v")).as("err"),
        (col("amax") / 127.0 / 2.0 + lit(1e-9)).as("bound"))
    assert(q.filter(col("err") > col("bound")).count() == 0)
  }

  test("approx_percentile tracks exact percentile (the 100 TB quantile path)") {
    // exact percentile is the oracle-checked q_quantiles formulation;
    // the sketch (approx_percentile, accuracy 1000) must land within 2%
    // of exact per group — the contract a user relies on when exact
    // sort-based quantiles stop being affordable.
    val d = (1 to 5000).map(i => (s"g${i % 3}", (i % 997) * 1.5)).toDF("g", "v")
    d.groupBy(col("g")).agg(
        expr("percentile(v, 0.5)").as("exact"),
        expr("approx_percentile(v, 0.5, 1000)").as("approx"))
      .collect().foreach { r =>
        val (e, a) = (r.getDouble(1), r.getDouble(2))
        assert(math.abs(e - a) / e < 0.02, s"${r.getString(0)}: exact $e approx $a")
      }
  }
}

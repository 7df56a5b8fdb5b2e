package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Similarity

/** The native word_shingles expression must be bit-identical to the
  * built-in HOF composition it replaces (the DuckDB oracle mirrors the
  * built-in semantics). */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("extension registers the function") {
    assert(spark.catalog.functionExists("word_shingles"))
  }

  test("native expression == built-in composition on generated text") {
    val texts = Gen.listOfN(300, Gen.oneOf(
      Gen.listOfN(8, Gen.alphaStr).map(_.mkString(" ")),
      Gen.oneOf("", " ", "a", "a b", "a b c", "  leading", "trailing  ",
        "double  space", "\ttabs\tinside\t", "a  b   c    d"),
      Gen.asciiPrintableStr)).apply(Gen.Parameters.default, Seed(7L)).get
    val df = texts.toDF("text")
    val both = df.select(
      expr("word_shingles(text, 3)").as("native"),
      Similarity.shinglesArray(col("text"), 3).as("builtin"))
    val bad = both.filter(!(col("native") <=> col("builtin"))).count()
    assert(bad == 0)
    // n=1 exercises the empty-shingle filter branch
    val both1 = df.select(
      expr("word_shingles(text, 1)").as("native"),
      Similarity.shinglesArray(col("text"), 1).as("builtin"))
    assert(both1.filter(!(col("native") <=> col("builtin"))).count() == 0)
  }

  test("null text yields an empty array on both native and built-in paths") {
    val df = Seq(Some("a b c d"), None, Some("")).toDF("text")
    val both = df.select(
      expr("word_shingles(text, 2)").as("native"),
      Similarity.shinglesArray(col("text"), 2).as("builtin"))
    assert(both.filter(!(col("native") <=> col("builtin"))).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
    val nullRow = df.filter(col("text").isNull)
      .select(expr("word_shingles(text, 2)").as("sh")).head
    assert(nullRow.getSeq[String](0).isEmpty)
  }

  test("vec_dot matches the built-in fold on malformed input (null, not partial)") {
    val rows = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),   // equal lengths → 32.0
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0)),        // truncated → null
      (Array.empty[Double], Array(1.0)))              // empty vs non-empty → null
      .toDF("a", "b")
    val both = rows.select(
      expr("vec_dot(a, b)").as("native"),
      Similarity.dot(col("a"), col("b")).as("builtin"))
    assert(both.filter(!(col("native") <=> col("builtin"))).count() == 0)
    assert(both.filter(col("native").isNull).count() == 2)
    // null element poisons the sum on both paths
    val withNullElem = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(2.0D, 3.0D) AS b")
    val r = withNullElem.select(
      expr("vec_dot(a, b)").as("native"),
      Similarity.dot(col("a"), col("b")).as("builtin")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("expression runs inside a codegen stage over a non-literal source") {
    val df = spark.range(5)
      .selectExpr("concat('a b c d e ', id) AS text")
      .selectExpr("word_shingles(text, 3) AS sh")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("word_shingles"))
    // WholeStageCodegen compiles the projection; a CodegenFallback
    // expression would abort compilation for the stage.
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"))
    assert(df.collect().length == 5)
    assert(df.head.getSeq[String](0).take(3) == Seq("a b c", "b c d", "c d e"))
  }
}

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
    val bad = both.filter(col("native") =!= col("builtin")).count()
    assert(bad == 0)
    // n=1 exercises the empty-shingle filter branch
    val both1 = df.select(
      expr("word_shingles(text, 1)").as("native"),
      Similarity.shinglesArray(col("text"), 1).as("builtin"))
    assert(both1.filter(col("native") =!= col("builtin")).count() == 0)
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

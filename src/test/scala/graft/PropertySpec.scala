package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Cleaning
import graft.operators.{Relational, Similarity}

/** Property-style tests (SURVEY §5.2): parser totality and dedup
  * idempotence over scalacheck-generated input, evaluated in one batch
  * DataFrame per property (per-case Spark jobs would be pathological).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val weird: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.oneOf("", " ", "---", "0x0", "12000 SF", "1.5 AC", "100x50", "$1,2,3", "NaN", "1e9 SF"),
    Gen.listOfN(5, Gen.oneOf("1", ".", "x", "$", ",", " ", "AC", "SF")).map(_.mkString))

  test("F17 lotSizeSqft is total and non-negative over arbitrary strings") {
    val inputs = sample(weird, 300)
    val out = inputs.toDF("v")
      .select(Cleaning.lotSizeSqft(col("v")).as("r")).collect().map(_.getDouble(0))
    assert(out.length == 300)
    assert(out.forall(_ >= 0.0))
  }

  test("F3 parseCurrency never throws over arbitrary strings") {
    val inputs = sample(weird, 300)
    val out = inputs.toDF("v")
      .select(Cleaning.parseCurrency(col("v")).as("r")).collect()
    assert(out.length == 300) // nulls allowed (coerce), exceptions are not
  }

  test("F18 zeroPad output always has at least the requested width") {
    val inputs = sample(Gen.chooseNum(0L, 99999999L), 200)
    val out = inputs.toDF("v")
      .select(Cleaning.zeroPad(col("v"), 5).as("r")).collect().map(_.getString(0))
    assert(out.forall(_.length == 5)) // lpad truncates overlong to width, pads short
  }

  test("A5 dedup is idempotent and keeps exactly one row per key (random data)") {
    val rows = sample(for {
      k <- Gen.chooseNum(0, 30)
      ord <- Gen.chooseNum(0L, 1000L)
      v <- Gen.alphaStr
    } yield (s"k$k", ord, v), 500)
    val df = rows.toDF("key", "arr", "v")
    val once = Relational.dedupKeepLast(df, Seq("key"), col("arr"))
    val twice = Relational.dedupKeepLast(once, Seq("key"), col("arr"))
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.groupBy("key").count().filter(col("count") > 1).count() == 0)
    assert(once.select("key").distinct().count() == df.select("key").distinct().count())
  }

  test("shinglesArray is total over arbitrary text (incl. < n tokens)") {
    val inputs = sample(Gen.oneOf(weird, Gen.listOfN(10, Gen.alphaStr).map(_.mkString(" "))), 300)
    val out = inputs.toDF("t")
      .select(Similarity.shinglesArray(col("t"), 3).as("sh")).collect()
    assert(out.length == 300)
    assert(out.forall(r => !r.isNullAt(0))) // always an array, possibly empty
  }

  test("F27 fillSentinels leaves no nulls in covered columns") {
    val rows = sample(Gen.option(Gen.alphaStr), 200)
    val df = rows.map(o => Tuple1(o.orNull)).toDF("c")
    val out = Cleaning.fillSentinels(df, Map("c" -> Cleaning.Sentinels.Unknown))
    assert(out.filter(col("c").isNull).count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with most stopword hits; 'und' when none") {
    val df = Seq(
      ("the cat sat on the mat and it is warm", "en"),
      ("der hund ist nicht mit der katze und das haus", "de"),
      ("le chat est dans la maison et il est pour les amis", "fr"),
      ("xyzzy qwerty plugh", "und")).toDF("text", "expected")
    val bad = df.filter(!(Text.langId(col("text")) <=> col("expected"))).count()
    assert(bad == 0)
  }

  test("tokenCount and bpeTokenCount") {
    val r = Seq("Hello, world! x2").toDF("t")
      .select(Text.tokenCount(col("t")), Text.bpeTokenCount(col("t"))).collect()(0)
    assert(r.getInt(0) == 3)
    // Hello , world ! x 2 -> 6
    assert(r.getInt(1) == 6)
  }

  test("fingerprint is order- and duplication-insensitive; contentHash is not") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta alpha"),
      (3L, "alpha beta delta")).toDF("id", "text")
    val fps = df.select(col("id"), Text.fingerprint(col("text")).as("fp"))
      .orderBy("id").collect().map(_.getString(1))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    val hashes = df.select(Text.contentHash(col("text"))).collect().map(_.getString(0))
    assert(hashes.distinct.length == 3)
  }

  test("qualityScore rewards clean english prose over punctuation soup") {
    val good = ("the quick brown fox jumps over the lazy dog and it is a fine day " * 3).trim
    val bad = "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"
    val r = Seq((1, good), (2, bad)).toDF("id", "t")
      .select(col("id"), Text.qualityScore(col("t")).as("q")).orderBy("id")
      .collect().map(_.getDouble(1))
    assert(r(0) > r(1))
    assert(r(0) > 0.5 && r(1) < 0.1)
  }

  test("stopwordRatio bounded in [0,1]") {
    val r = Seq("the the the", "zz qq").toDF("t")
      .select(Text.stopwordRatio(col("t"), Text.stopwords.head._2)).collect().map(_.getDouble(0))
    assert(r(0) == 1.0 && r(1) == 0.0)
  }

  test("stripMarkup drops tags, keeps link anchors, collapses whitespace") {
    val cases = Seq(
      "<div><b>hello</b> world</div>" -> "hello world",
      "see [the docs](http://x.com/y) now" -> "see the docs now",
      "**bold** and `code` # heading" -> "bold and code heading",
      "a  <br/>  b" -> "a b",
      "[](http://empty.example)" -> "")
    val out = cases.map(_._1).toDF("t").select(Text.stripMarkup(col("t")))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }
}

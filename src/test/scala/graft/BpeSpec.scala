package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def learn(words: Seq[(String, Long)], rounds: Int) =
    Bpe.learnMerges(spark, words.toDF("word", "n"), "word", "n", rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("merges are count-ranked, count-weighted, and compose across rounds") {
    // pairs round 1: (a,b) = 2*2 (abab) + 3 (ab) = 7; (b,a) = 2
    // after merging (a,b): abab -> <ab><ab>, ab -> <ab>
    // pairs round 2: (ab,ab) = 2
    val m = learn(Seq(("abab", 2L), ("ab", 3L)), rounds = 3)
    assert(m == Seq((1L, "a", "b", 7L), (2L, "ab", "ab", 2L)))
    // round 3 found no remaining pair -> early stop, 2 merges only
  }

  test("merge application is left-greedy and non-overlapping") {
    // 'aaa': pairs (a,a) count 2 (two overlapping occurrences both count
    // toward the PAIR STATISTIC), but application must rewrite
    // left-greedily: <a><a><a> -> <aa><a>, never <a><aa> or <aa><aa>
    val m = learn(Seq(("aaa", 1L)), rounds = 2)
    assert(m(0) == ((1L, "a", "a", 2L)))
    // round 2 sees <aa><a> -> the only pair is (aa, a)
    assert(m(1) == ((2L, "aa", "a", 1L)))
  }

  test("ties break by pair order, deterministically") {
    // (a,b) and (c,d) both have count 1 -> (a,b) wins by symbol order
    val m = learn(Seq(("ab", 1L), ("cd", 1L)), rounds = 1)
    assert(m == Seq((1L, "a", "b", 1L)))
  }

  test("single-symbol words contribute nothing and never crash") {
    val m = learn(Seq(("a", 5L), ("b", 3L)), rounds = 2)
    assert(m.isEmpty)
  }

  test("encode replays merges left-greedily and never crosses word boundaries") {
    import org.apache.spark.sql.functions.col
    def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
      Seq(text).toDF("t")
        .select(graft.operators.Bpe.encode(col("t"), merges).as("x"))
        .collect().head.getSeq[String](0)
    assert(enc("ab abc d", Seq(("a", "b"))) == Seq("ab", "ab", "c", "d"))
    // left-greedy: <a><a><a> merges the FIRST pair only
    assert(enc("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // merges stack in rank order: (a,b) then (ab,c)
    assert(enc("abc", Seq(("a", "b"), ("ab", "c"))) == Seq("abc"))
    // word boundary: trailing 'a' of one word never pairs with the next
    assert(enc("ba ab", Seq(("a", "a"))) == Seq("b", "a", "a", "b"))
    // non-alpha strips like the training histogram; empty text is fine
    assert(enc("7 + 9!", Seq(("a", "b"))) == Seq())
  }
}

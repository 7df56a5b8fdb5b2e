package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning over a word-frequency table — the
  * tokenizer-training step of an LLM data pipeline, Spark-first.
  *
  * Classic BPE iterates over raw text; the scale-correct shape iterates
  * over the WORD TABLE (distinct word, count), orders of magnitude
  * smaller than the corpus and fully distributed: each merge round is
  * ONE map-side-combined pair-count aggregation over the table plus a
  * top-1 (count desc, then pair asc — deterministic) that collects a
  * single row to the driver — the same bounded-collect contract as the
  * merge-store manifest. Applying a learned merge is a pure projection
  * (literal replace on the wrapped-symbol encoding), so the table never
  * shuffles between rounds; at 100 TB the word histogram is the only
  * thing the trainer touches after the initial corpus aggregation.
  *
  * Encoding: a word's symbol sequence is kept as `<s1><s2>...<sN>`.
  * Wrapping EVERY symbol makes literal left-to-right replace exactly
  * the left-greedy non-overlapping BPE merge: in `<a><a><a>` the merge
  * (a,a) rewrites the first pair and cannot half-consume the next
  * occurrence's boundary, because adjacent matches share no characters.
  * Symbols must therefore never contain '<' or '>' — feed word
  * histograms of `[a-z]+` (or any alphabet excluding the wrappers).
  */
object Bpe {

  /** Learn up to `rounds` merges from `words(wordCol, countCol)`.
    * Returns one row per learned merge — (merge_rank, left_sym,
    * right_sym, freq) — stopping early when no adjacent pair remains. */
  def learnMerges(spark: SparkSession, words: DataFrame, wordCol: String,
                  countCol: String, rounds: Int): DataFrame = {
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var enc = words.select(
      concat(lit("<"), array_join(split(col(wordCol), ""), "><"), lit(">"))
        .as("s"),
      col(countCol).cast("long").as("n"))
      .persist(lvl)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    try {
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val withSyms = enc
          .withColumn("__syms",
            regexp_extract_all(col("s"), lit("<([^>]*)>"), lit(1)))
          .filter(size(col("__syms")) >= 2)
        // adjacent symbol pairs, weighted by the word's corpus count
        val top = withSyms
          .select(col("n"), explode(transform(
            sequence(lit(1), size(col("__syms")) - 1),
            i => struct(element_at(col("__syms"), i).as("x"),
              element_at(col("__syms"), i + 1).as("y")))).as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("n")).as("cnt"))
          .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
          .limit(1).collect() // exactly one row ever reaches the driver
        if (top.isEmpty) done = true
        else {
          val (x, y, cnt) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r.toLong, x, y, cnt))
          val next = enc.withColumn("s",
            replace(col("s"), lit(s"<$x><$y>"), lit(s"<$x$y>")))
            .persist(lvl)
          next.count() // materialize before releasing the parent cache
          enc.unpersist(blocking = false)
          enc = next
          r += 1
        }
      }
    } finally enc.unpersist(blocking = false)
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "freq")
  }

  /** Apply learned merges to segment a text column into BPE tokens — a
    * PURE PROJECTION once the merge table (bounded: one row per merge,
    * the tokenizer artifact) is collected to literals: the whole
    * document becomes one wrapped-symbol string (words joined by `|`,
    * which no `<x><y>` pattern can span, so merges never cross word
    * boundaries), the merges replay in rank order as literal replaces
    * with training's exact left-greedy semantics, and the token array
    * reads back off the wrappers. Zero joins, zero shuffles — the
    * tokenize step costs one codegen'd pass at any corpus size. */
  def encode(text: org.apache.spark.sql.Column,
             merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val words = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
    val wrapped = array_join(transform(words,
      w => concat(lit("<"), array_join(split(w, ""), "><"), lit(">"))), "|")
    val merged = merges.foldLeft(wrapped) { case (s, (x, y)) =>
      replace(s, lit(s"<$x><$y>"), lit(s"<$x$y>"))
    }
    regexp_extract_all(merged, lit("<([^>]*)>"), lit(1))
  }
}

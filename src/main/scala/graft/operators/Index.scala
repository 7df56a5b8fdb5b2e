package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus indexing and statistical language-model scoring — the
  * retrieval / quality-filter side of a training-data pipeline
  * (the reference's remark-classification pass, Kafka_GSMLSConsumer.py:606-647,
  * is a keyword lookup; an inverted index is that lookup's scale form).
  *
  * Both operators reduce to shuffle-on-term aggregations, the shape that
  * survives 100 TB: per-term state is bounded (capped postings, fixed
  * count columns), heavy terms ("the") cost a spillable sort — never an
  * unbounded aggregation buffer.
  */
object Index {

  /** Word terms: maximal lowercase alnum runs. No empty tokens by
    * construction (unlike whitespace-split on padded text). */
  def terms(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Inverted index: one row per term with document frequency, total
    * term frequency, and a postings list capped to the `postingsCap`
    * smallest doc ids.
    *
    * The cap is applied BEFORE list collection via a per-term
    * `row_number` on the (term, doc) relation, so a stopword's
    * aggregation state is `postingsCap` ids, not one id per matching
    * document — a `collect_set(...).slice` formulation would buffer the
    * full corpus doc-list for "the" on one executor. The rank's
    * sort-by-term partitioning is reused by the final `groupBy("term")`
    * (same key — no second exchange), so the whole index is one shuffle
    * on (term, doc) plus one on term. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    postingsCap: Int): DataFrame = {
    val perDoc = df
      .select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tfp"))
    perDoc
      .withColumn("rn",
        row_number().over(Window.partitionBy("term").orderBy(col(idCol))))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum("tfp").as("tf"),
        array_sort(collect_list(when(col("rn") <= postingsCap, col(idCol))))
          .as("postings"))
  }

  /** Bigram language-model score per document — the perplexity-proxy
    * quality filter: train add-one-smoothed bigram statistics on the
    * corpus itself, then score each document by its mean bigram log
    * probability ln((c(w1,w2)+1) / (c(w1)+V)). Boilerplate scores high
    * (its bigrams dominate the corpus), character noise scores low.
    *
    * Engine-parity-safe mean: each bigram's log-probability is
    * quantized to an integer (floor(x*1e6 + 0.5) — half-up in both
    * engines), integer-summed (exact, partition-order-independent; a
    * raw double sum would drift with aggregation order), then scaled
    * back and rounded to 4 decimals.
    *
    * Shuffle shape: bigram tokens join the bigram-count relation on
    * (w1,w2) — vocabulary-bounded, so at corpus scale the join's build
    * side stays small relative to the token stream; the context counts
    * and the vocabulary-size scalar broadcast. */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = df.select(col(idCol),
      posexplode(terms(col(textCol))).as(Seq("pos", "w")))
    val bg = w
      .withColumn("w2",
        lead(col("w"), 1).over(Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("w").as("w1"), col("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
    val v = w.agg(countDistinct(col("w")).as("v"))
    val q = floor(
      log((col("n2") + 1).cast(DoubleType) / (col("n1") + col("v")).cast(DoubleType))
        * 1000000.0 + 0.5).cast(LongType)
    bg.join(c2, Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col(idCol), q.as("q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("q")).cast(DoubleType) / 1000000.0 / count(lit(1)), 4)
          .as("lm_score"))
  }
}

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

  /** BM25 retrieval: top-k documents per query (Robertson k1/b form,
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the Lucene variant,
    * never negative). Repeated query terms count once.
    *
    * Scale shape: the query-term relation broadcasts into the (doc,
    * term, tf) relation, so only postings of QUERY terms survive past
    * the first join — the corpus-wide term statistics (df, avgdl, N)
    * are vocabulary-bounded aggregates, and the per-query result is
    * reduced to k rows map-side by the top-k Aggregator before the
    * final exchange. Nothing in the plan is proportional to corpus
    * size except the one token-split scan.
    *
    * Engine parity: every per-(query, doc, term) contribution is
    * quantized to an integer (floor(x·1e6 + 0.5)) before the sum, so
    * the score is independent of double addition order; ranking ties
    * break on ascending doc id. Output: (queryIdCol, idCol, score,
    * rank). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = df.select(col(idCol), explode(terms(col(textCol))).as("term"))
    // tf feeds three consumers (df counts, doc lengths, the candidate
    // join); persisting it pins the corpus scan + tokenize to exactly
    // one pass — dl is the per-doc sum of tf, not a second explode
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qt = queries.select(col(queryIdCol),
      explode(array_distinct(terms(col(queryTextCol)))).as("term"))
    val qdf = dfreq.join(broadcast(qt.select("term").distinct()), Seq("term"), "left_semi")
    val avgdl = col("total_dl").cast(DoubleType) / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfnorm = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / avgdl))
    val contrib = tf
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(qdf), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .select(col(queryIdCol), col(idCol),
        floor(idf * tfnorm * 1000000.0 + 0.5).cast(LongType).as("qv"))
    val scored = contrib.groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("qv")).cast(DoubleType) / 1000000.0, 4).as("score"))
    TopK.topKPerKey(scored, Seq(queryIdCol), idCol, "score", k)
  }

  /** Reciprocal-rank fusion: combine N rankings of the same id space
    * into one (the standard hybrid-retrieval combiner — lexical BM25 +
    * a second ranker — with the usual k=60 damping). Each input holds
    * `keys ++ (idCol, rankCol)`; an id contributes 1/(kRrf + rank) per
    * list it appears in and nothing for lists it misses.
    *
    * Scale shape: inputs are already top-k lists (bounded per key), so
    * the union + sum is tiny regardless of corpus size; the final
    * per-key cut reuses the bounded-state top-k Aggregator. Engine
    * parity: each contribution is the floor of an exactly-rounded IEEE
    * division (1e9/(kRrf+rank), integer operands), so the fused sum is
    * an exact integer in any engine and any addition order; ties break
    * on ascending id. Output: keys ++ (idCol, rrf_score, rank). */
  def rrfFuse(rankings: Seq[DataFrame], keys: Seq[String], idCol: String,
              rankCol: String, k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val cols = keys.map(col) :+ col(idCol) :+
      floor(lit(1000000000.0) / (lit(kRrf) + col(rankCol))).cast(LongType).as("__c")
    val fused = rankings.map(_.select(cols: _*)).reduce(_ unionByName _)
      .groupBy((keys.map(col) :+ col(idCol)): _*)
      .agg(round(sum(col("__c")).cast(DoubleType) / 1000000000.0, 6).as("rrf_score"))
    TopK.topKPerKey(fused, keys, idCol, "rrf_score", k)
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
    val bg = docBigrams(df, idCol, textCol)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
    val v = df.select(explode(terms(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val q = floor(
      log((col("n2") + 1).cast(DoubleType) / (col("n1") + col("v")).cast(DoubleType))
        * 1000000.0 + 0.5).cast(LongType)
    // no broadcast hint on c1: the unigram-context relation is
    // vocabulary-sized (tens of millions of rows on a web corpus), and a
    // forced broadcast bypasses the planner's size check — OOM instead of
    // a graceful shuffle-join at 100×. Statistics/AQE still broadcast it
    // when it is actually small, same as the bigram join above.
    bg.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col(idCol), q.as("q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("q")).cast(DoubleType) / 1000000.0 / count(lit(1)), 4)
          .as("lm_score"))
  }

  /** Collocation extraction: the top-k adjacent word pairs by pointwise
    * mutual information, PMI = ln(c(w1,w2)·N / (c₁(w1)·c₂(w2))), where
    * c₁/c₂ are the counts of the word in first/second position and N is
    * the total bigram count — the classic "new york"/"machine learning"
    * phrase miner, and the statistic behind phrase-aware tokenizer
    * vocabularies. A `minCount` floor keeps rare-pair noise out (PMI is
    * maximal for hapax pairs).
    *
    * Engine parity: PMI is a pure function of four exact integer counts,
    * quantized (floor(x·1e6 + 0.5)) before the final rounding; ties
    * break on (w1, w2) ascending.
    *
    * Scale shape: the bigram relation aggregates to vocabulary-bounded
    * count relations; the pair relation (already ≤ |V|² but in practice
    * Zipf-thin) joins the two positional count relations on single words
    * — no corpus-sized side ever reaches a join build side, and the
    * `minCount` filter lands before the joins, so at web scale the
    * joined relation is the frequent-pair set only. The final cut is a
    * bounded top-k, persisted and materialized before the corpus-sized
    * bigram cache is released — release the k-row result via
    * [[Similarity.release]] / `unpersist()` when done; no corpus-sized
    * cache survives this call. */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
                      minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, s"need a positive count floor, got $minCount")
    require(k >= 1, s"need a positive k, got $k")
    val bg = docBigrams(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minCount)
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
    val c2r = bg.groupBy("w2").agg(count(lit(1)).as("n2r"))
    val n = bg.agg(count(lit(1)).as("n_total"))
    val pmi = round(
      floor(log(col("n12").cast(DoubleType) * col("n_total").cast(DoubleType)
          / (col("n1").cast(DoubleType) * col("n2r").cast(DoubleType)))
        * lit(1e6) + lit(0.5)).cast(LongType).cast(DoubleType) / 1e6, 4)
    val out = pairs
      .join(c1, Seq("w1"))
      .join(c2r, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n12"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the ≤ k-row result while the bigram relation is pinned,
    // then release the corpus-sized cache (re-reads hit the k-row cache)
    out.count()
    bg.unpersist(blocking = false)
    out
  }

  /** Positioned token relation (id, carry…, pos, w) — the shared
    * tokenize pass under [[lmScore]]/[[lmScoreUnder]]/[[pmiCollocations]].
    * `carry` columns (e.g. a language label) ride along so a caller can
    * derive BOTH a sliced count relation and the full scoring relation
    * from ONE persisted tokenization instead of re-exploding the corpus
    * per pass (the DSIR query does exactly this). */
  def docTokens(df: DataFrame, idCol: String, textCol: String,
                carry: Seq[String] = Nil): DataFrame =
    df.select((col(idCol) +: carry.map(col)) :+
      posexplode(terms(col(textCol))).as(Seq("pos", "w")): _*)

  /** Adjacent-bigram relation (id, carry…, w1, w2) from a positioned
    * token relation — one window per document, no re-tokenize. */
  def bigramsFromTokens(toks: DataFrame, idCol: String,
                        carry: Seq[String] = Nil): DataFrame =
    toks
      .withColumn("__w2",
        lead(col("w"), 1).over(Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("__w2").isNotNull)
      .select((col(idCol) +: carry.map(col)) ++
        Seq(col("w").as("w1"), col("__w2").as("w2")): _*)

  /** Ordered per-document bigram relation (id, w1, w2). */
  private def docBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramsFromTokens(docTokens(df, idCol, textCol), idCol)

  /** Scoring core shared by [[lmScoreUnder]] and the DSIR query: score
    * the `scoreBg` bigram relation (id, w1, w2) under precomputed
    * add-one-smoothed counts — `c2(w1, w2, n2)`, `c1(w1, n1)` and the
    * 1-row vocabulary size `v(v)`. Left joins + coalesce implement the
    * Laplace fallbacks (unseen bigram → ln(1/(c(w1)+V)), unseen context
    * → ln(1/V)); when the counts were estimated from the scored corpus
    * itself the joins never miss and this reduces exactly to
    * [[lmScore]]. Same integer-quantized mean, same vocabulary-bounded
    * join shape (no forced broadcast on the count relations — see the
    * note in [[lmScore]]). */
  def lmScoreOver(scoreBg: DataFrame, c2: DataFrame, c1: DataFrame,
                  v: DataFrame, idCol: String): DataFrame = {
    val q = floor(
      log((coalesce(col("n2"), lit(0L)) + 1).cast(DoubleType)
        / (coalesce(col("n1"), lit(0L)) + col("v")).cast(DoubleType))
        * 1000000.0 + 0.5).cast(LongType)
    scoreBg
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol), q.as("q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("q")).cast(DoubleType) / 1000000.0 / count(lit(1)), 4)
          .as("lm_score"))
  }

  /** [[lmScore]] generalized to a SEPARATE training corpus: score every
    * document of `docs` under the add-one-smoothed bigram LM estimated
    * from `train`. With `train eq docs` this reduces exactly to
    * [[lmScore]] (every scored bigram then exists in the counts, so the
    * left joins never miss). Unseen bigrams fall back to
    * ln(1/(c(w1)+V)); unseen contexts to ln(1/V) — standard Laplace.
    *
    * This is the scoring half of importance resampling (DSIR, Xie et
    * al. 2023): rank corpus documents by lm_target − lm_raw and keep
    * the top slice. Same integer-quantized mean as [[lmScore]], so the
    * score is addition-order-independent. Shuffle shape also matches:
    * the (w1,w2) and (w1) count joins are vocabulary-bounded with no
    * forced broadcast; only the vocabulary-size scalar broadcasts. */
  def lmScoreUnder(train: DataFrame, docs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val tb = docBigrams(train, idCol, textCol)
    val c2 = tb.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = tb.groupBy("w1").agg(count(lit(1)).as("n1"))
    val v = train.select(explode(terms(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    lmScoreOver(docBigrams(docs, idCol, textCol), c2, c1, v, idCol)
  }
}

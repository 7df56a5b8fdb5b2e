package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text
import graft.operators.{Index, Learn, Relational, Similarity, Sketch}

/** Round-6 additions: corpus indexing, statistical LM scoring,
  * cross-corpus dedup, record linkage, funnel analytics, sketch
  * quantiles, and text canonicalization — each under a DuckDB oracle.
  *
  * The reference's keyword classification (Kafka_GSMLSConsumer.py:606-647)
  * and entity repair (Kafka_GSMLSConsumer.py:700-741) are the seed
  * shapes; the operators here are their corpus-scale generalizations.
  */
object LinkageQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val postingsCap = 16
  private val funnelStages = Seq("view", "click", "purchase")
  private val funnelWindowSec = 21600L // 6h: stages 1/2/3 all populated at sf0.01
  private val histLo = 900.0           // l_extendedprice ∈ [901.82, 104997.88]
  private val histHi = 105000.0
  private val histBuckets = 200
  private val histPs = Seq(0.5, 0.9, 0.99)
  private val fuzzyMaxDist = 2
  private val bm25K = 10
  private val bm25K1 = 1.2
  private val bm25B = 0.75
  private val bm25Queries = Seq(         // query terms drawn from the corpus vocabulary
    ("q_plan", "spark join window"),
    ("q_scan", "hash table scan"),
    ("q_flow", "stream batch merge"))
  private val topDocsK = 5
  private val rrfDamp = 60             // the standard RRF damping constant
  private val rrfQualityK = 20         // corpus-wide quality-prior list length
  private val crossJaccardMin = 0.5
  private val packB = 1L << 40         // (est, id) packed-argmax base

  // =====================================================================
  // Spark queries
  // =====================================================================

  /** Inverted index over the corpus: term -> (df, tf, capped postings).
    * The postings array is comma-joined for the oracle compare (the
    * pandas comparator can't sort/hash list cells); the library
    * surface (`Index.invertedIndex`) keeps the typed array. */
  private val qInvIndex: Q = (spark, dir) =>
    Index.invertedIndex(Tables.fanOut(Tables.documents(spark, dir)),
      "doc_id", "text", postingsCap)
      .withColumn("postings",
        array_join(col("postings").cast(ArrayType(StringType)), ","))

  /** Perplexity-proxy quality score: mean add-one-smoothed bigram log
    * probability per document, trained on the corpus itself. */
  private val qLmScore: Q = (spark, dir) =>
    Index.lmScore(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text")

  /** Naive Bayes language classifier (fastText-filter shape): trained
    * on the 80% slice doc_id % 5 != 0 with weak label lang = 'en',
    * scored over ALL documents — held-out docs carry tokens the model
    * never saw, exercising the smoothed-unseen constant. */
  private val qNbLangid: Q = (spark, dir) => {
    val toks = Index.docTokens(Tables.fanOut(Tables.documents(spark, dir)),
      "doc_id", "text", Seq("lang"))
    val (llr, consts) = Learn.nbTrain(toks.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "w", col("lang") === "en")
    Learn.nbScore(toks, "doc_id", "w", llr, consts)
  }

  /** BM25 retrieval: top-10 documents for each of three fixed queries —
    * the index-backed search surface over the corpus. */
  private val qBm25: Q = (spark, dir) => {
    import spark.implicits._
    Index.bm25TopK(Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text",
      bm25Queries.toDF("query_id", "qtext"), "query_id", "qtext",
      bm25K, bm25K1, bm25B)
  }

  /** Per-language top-5 documents by LM score: the quality-ranked
    * shortlist a curation pass keeps per language bucket. Composes the
    * bigram LM with the bounded-state top-k Aggregator — each language
    * is reduced to 5 rows map-side, never window-sorted corpus-wide. */
  private val qTopDocsLm: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val scored = Index.lmScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    graft.operators.TopK.topKPerKey(scored, Seq("lang"), "doc_id", "lm_score", topDocsK)
  }

  /** Hybrid retrieval: RRF-fuse each query's BM25 top-10 with a
    * corpus-wide quality prior (the top-20 documents by bigram LM
    * score, the same list for every query) — relevance and quality
    * combined without score calibration, the standard two-retriever
    * fusion. Both input lists are bounded before fusion, so the fuse
    * itself is O(queries · k) regardless of corpus size. */
  private val qRrfFusion: Q = (spark, dir) => {
    import spark.implicits._
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val qdf = bm25Queries.toDF("query_id", "qtext")
    val bm25 = Index.bm25TopK(docs, "doc_id", "text",
      qdf, "query_id", "qtext", bm25K, bm25K1, bm25B)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val qual = graft.operators.TopK.topKPerKey(
      Index.lmScore(docs, "doc_id", "text").withColumn("__g", lit(1)),
      Seq("__g"), "doc_id", "lm_score", rrfQualityK)
      .crossJoin(broadcast(qdf.select(col("query_id"))))
      .select(col("query_id"), col("doc_id"), col("rank"))
    Index.rrfFuse(Seq(bm25, qual), Seq("query_id"), "doc_id", "rank",
      bm25K, rrfDamp)
  }

  /** view -> click -> purchase funnel, 6-hour stage-transition window. */
  private val qFunnel: Q = (spark, dir) =>
    Relational.funnel(Tables.fanOut(Tables.events(spark, dir)),
      "user_id", "ts", "event_type", funnelStages, funnelWindowSec)

  /** Histogram-interpolated p50/p90/p99 of extended price per return
    * flag — the fixed-memory estimate beside q_quantiles' exact path. */
  private val qHistQuantile: Q = (spark, dir) =>
    Sketch.histogramQuantiles(Tables.fanOut(Tables.lineitem(spark, dir)),
      "l_returnflag", col("l_extendedprice"), histLo, histHi, histBuckets, histPs)

  /** Record linkage: part names with a deterministic typo injected on
    * every third key (second character dropped), matched back to the
    * clean name dictionary — blocked on first letter, best match by
    * (edit distance, name). */
  private val qFuzzyMatch: Q = (spark, dir) => {
    val part = Tables.fanOut(Tables.part(spark, dir))
    val dirty = part.select(col("p_partkey"),
      when(col("p_partkey") % 3 === 0,
        concat(substring(col("p_name"), 1, 1), substring(col("p_name"), 3, 1000)))
        .otherwise(col("p_name")).as("name"))
    Relational.blockedFuzzyMatch(dirty, "p_partkey", "name",
      part.select(col("p_name")), "p_name",
      n => substring(n, 1, 1), fuzzyMaxDist)
  }

  /** Cross-corpus near-dedup: incoming docs (doc_id % 3 == 0) that
    * near-duplicate an existing doc, with their best match by
    * signature-estimated jaccard (ties to the smallest existing id).
    * The dedup-against-what-we-already-have gate of an ingestion
    * pipeline — candidate generation and scoring all happen on the
    * k-long minhash signatures, never a shingle re-join. */
  private val qCrossDedup: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val sig = Similarity.minhashSignature(
      Similarity.shingles(docs, "doc_id", "text", 3), "doc_id", ExtensionQueries.minhashN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val pairs = Similarity.lshCandidatePairs(sig, "doc_id", ExtensionQueries.minhashN,
      ExtensionQueries.rowsPerBand, ExtensionQueries.lshBucketCap)
    val est = Similarity.minhashJaccardEstimate(pairs, sig, "doc_id",
      ExtensionQueries.minhashN)
    val incomingA = (col("id_a") % 3) === 0
    val cross = est
      .filter(incomingA =!= ((col("id_b") % 3) === 0))
      .filter(col("jaccard_est") >= crossJaccardMin)
      .select(
        when(incomingA, col("id_a")).otherwise(col("id_b")).as("incoming_id"),
        when(incomingA, col("id_b")).otherwise(col("id_a")).as("existing_id"),
        col("jaccard_est"))
    // deterministic argmax without a window: pack (est quantized to 4
    // decimals, complemented existing id) into one long, take max —
    // same idiom as Similarity.ivfAssignTo; ids are < 2^40 by the same
    // invariant
    cross
      .withColumn("__pk",
        floor(col("jaccard_est") * 10000 + 0.5).cast(LongType) * packB
          + (lit(packB - 1) - col("existing_id")))
      .groupBy("incoming_id")
      .agg(max("__pk").as("__mp"))
      .select(col("incoming_id"),
        (lit(packB - 1) - pmod(col("__mp"), lit(packB))).as("match_id"),
        round(expr(s"__mp div $packB") / 10000.0, 4).as("jaccard_est"))
  }

  /** Canonical-key normalization: casefold + Latin-1 accent fold +
    * punctuation collapse over text with deterministically appended
    * accented noise (the corpus itself is ASCII, so the suffix is what
    * proves the fold). */
  private val qTNormalize: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"),
        Text.normalizeText(concat(
          substring(col("text"), 1, 30),
          lit(normNoise),
          col("source"))).as("norm"))

  /** Accented/punctuated suffix exercising every fold family; built
    * from escapes (no raw high bytes in source). */
  private val normNoise: String =
    " Caf\u00e9 Z\u00dcrich NA\u00cfVE r\u00e9sum\u00e9, \u00e7a-va? \u00d5la & "

  // =====================================================================
  // Wiring
  // =====================================================================

  def queries: Map[String, Q] = Map(
    "q_inv_index"     -> qInvIndex,
    "q_lm_score"      -> qLmScore,
    "q_nb_langid"     -> qNbLangid,
    "q_bm25"          -> qBm25,
    "q_top_docs_lm"   -> qTopDocsLm,
    "q_rrf_fusion"    -> qRrfFusion,
    "q_funnel"        -> qFunnel,
    "q_hist_quantile" -> qHistQuantile,
    "q_fuzzy_match"   -> qFuzzyMatch,
    "q_cross_dedup"   -> qCrossDedup,
    "q_t_normalize"   -> qTNormalize
  )

  // =====================================================================
  // Oracle SQL (DuckDB 1.0)
  // =====================================================================

  /** Bigram-LM CTE chain ending at `lm(doc_id, n_bigrams, lm_score)` —
    * shared by q_lm_score / q_top_docs_lm / q_rrf_fusion. */
  private val lmCtes =
    """w AS (SELECT doc_id, u.i AS pos, t.wl[u.i] AS w
       |       FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS wl
       |             FROM documents) t,
       |            unnest(range(1, len(t.wl) + 1)) AS u(i)),
       |bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
       |       FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
       |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
       |vv AS (SELECT count(DISTINCT w) AS v FROM w),
       |lmsc AS (SELECT bg.doc_id,
       |           CAST(floor(ln(CAST(n2 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q
       |         FROM bg JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
       |                 JOIN c1 ON bg.w1 = c1.w1, vv),
       |lm AS (SELECT doc_id, count(*) AS n_bigrams,
       |         round(CAST(sum(q) AS BIGINT) / 1000000.0 / count(*), 4) AS lm_score
       |       FROM lmsc GROUP BY doc_id)""".stripMargin

  /** BM25 CTE chain ending at `brank(query_id, doc_id, score, rank)` —
    * shared by q_bm25 / q_rrf_fusion. */
  private val bm25Ctes =
    s"""tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
       |        FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |qs AS (SELECT * FROM (VALUES ${bm25Queries.map { case (i, t) => s"('$i', '$t')" }.mkString(", ")}) v(query_id, qtext)),
       |qt AS (SELECT DISTINCT query_id, term
       |       FROM (SELECT query_id, unnest(regexp_extract_all(lower(qtext), '[a-z0-9]+')) AS term FROM qs)),
       |contrib AS (SELECT qt.query_id, tf.doc_id,
       |    CAST(floor((ln(1e0 + (corpus.n_docs - dfreq.df + 0.5e0) / (dfreq.df + 0.5e0))
       |      * ((tf.tf * ${bm25K1 + 1}e0) / (tf.tf + ${bm25K1}e0 * (${1.0 - bm25B}e0
       |          + (${bm25B}e0 * dl.dl) / (CAST(corpus.total_dl AS DOUBLE) / corpus.n_docs)))))
       |      * 1000000.0 + 0.5) AS BIGINT) AS qv
       |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term) JOIN dl USING (doc_id), corpus),
       |bsc AS (SELECT query_id, doc_id, round(CAST(sum(qv) AS BIGINT) / 1000000.0, 4) AS score
       |        FROM contrib GROUP BY 1, 2),
       |brank AS (SELECT query_id, doc_id, score,
       |            CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |          FROM bsc)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_inv_index" ->
      s"""WITH tk AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM documents),
          p AS (SELECT term, doc_id, count(*) AS tfp FROM tk GROUP BY 1, 2),
          r AS (SELECT term, doc_id, tfp,
                  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM p)
          SELECT term, count(*) AS df, CAST(sum(tfp) AS BIGINT) AS tf,
                 coalesce(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                            FILTER (WHERE rn <= $postingsCap), '') AS postings
          FROM r GROUP BY term""",
    "q_lm_score" ->
      s"""WITH $lmCtes
          SELECT doc_id, n_bigrams, lm_score FROM lm""",
    // Mirrors Learn.nbTrain/nbScore exactly: train on doc_id % 5 <> 0
    // with weak label lang='en'; every log is quantized to integer
    // micro-units q(x) = floor(ln(x)*1e6 + 0.5) the moment it is
    // computed, so the cross-token sum is integer and order-free on
    // both engines. Document counts carry the same add-one smoothing
    // as token counts (degenerate single-class labels stay finite).
    "q_nb_langid" ->
      """WITH tok AS (SELECT doc_id, lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents),
         tr AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
         perw AS (SELECT w,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cp,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cn
           FROM tr GROUP BY w),
         cst AS (SELECT
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS totp,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS totn,
             count(DISTINCT w) AS v,
             count(DISTINCT CASE WHEN lang = 'en' THEN doc_id END) AS dp,
             count(DISTINCT CASE WHEN NOT (lang = 'en') THEN doc_id END) AS dn
           FROM tr),
         cq AS (SELECT totp, totn, v,
             CAST(floor(ln(CAST(dp + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
               - CAST(floor(ln(CAST(dn + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q_prior,
             CAST(floor(ln(1.0 / (totp + v)) * 1000000.0 + 0.5) AS BIGINT)
               - CAST(floor(ln(1.0 / (totn + v)) * 1000000.0 + 0.5) AS BIGINT) AS q_unseen
           FROM cst),
         llr AS (SELECT w,
             CAST(floor(ln(CAST(cp + 1 AS DOUBLE) / (totp + v)) * 1000000.0 + 0.5) AS BIGINT)
               - CAST(floor(ln(CAST(cn + 1 AS DOUBLE) / (totn + v)) * 1000000.0 + 0.5) AS BIGINT) AS qllr
           FROM perw, cq),
         sc AS (SELECT t.doc_id, coalesce(l.qllr, cq.q_unseen) AS q, cq.q_prior
           FROM tok t LEFT JOIN llr l ON t.w = l.w, cq)
         SELECT doc_id, count(*) AS n_toks,
           CAST(max(q_prior) + sum(q) AS BIGINT) / 1000000.0 AS nb_llr,
           (max(q_prior) + sum(q)) > 0 AS nb_positive
         FROM sc GROUP BY doc_id""",
    "q_bm25" ->
      s"""WITH $bm25Ctes
          SELECT query_id, doc_id, score, rank FROM brank WHERE rank <= $bm25K""",
    "q_top_docs_lm" ->
      s"""WITH $lmCtes,
          j AS (SELECT d.lang, lm.doc_id, lm.lm_score
                FROM lm JOIN documents d USING (doc_id)),
          r AS (SELECT lang, doc_id, lm_score,
                  CAST(row_number() OVER (PARTITION BY lang ORDER BY lm_score DESC, doc_id) AS BIGINT) AS rank
                FROM j)
          SELECT lang, doc_id, lm_score, rank FROM r WHERE rank <= $topDocsK""",
    "q_rrf_fusion" ->
      s"""WITH $bm25Ctes,
          $lmCtes,
          bmlist AS (SELECT query_id, doc_id, rank FROM brank WHERE rank <= $bm25K),
          qlist AS (SELECT doc_id,
                      CAST(row_number() OVER (ORDER BY lm_score DESC, doc_id) AS BIGINT) AS rank
                    FROM lm),
          qlist2 AS (SELECT qs.query_id, q.doc_id, q.rank
                     FROM qlist q, qs WHERE q.rank <= $rrfQualityK),
          contribs AS (SELECT query_id, doc_id,
                         CAST(floor(1000000000.0 / ($rrfDamp + rank)) AS BIGINT) AS c FROM bmlist
                       UNION ALL
                       SELECT query_id, doc_id,
                         CAST(floor(1000000000.0 / ($rrfDamp + rank)) AS BIGINT) FROM qlist2),
          fused AS (SELECT query_id, doc_id,
                      round(CAST(sum(c) AS BIGINT) / 1000000000.0, 6) AS rrf_score
                    FROM contribs GROUP BY 1, 2),
          rr AS (SELECT query_id, doc_id, rrf_score,
                   CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
                 FROM fused)
          SELECT query_id, doc_id, rrf_score, rank FROM rr WHERE rank <= $bm25K""",
    "q_funnel" ->
      s"""WITH base AS (SELECT DISTINCT user_id FROM events),
          v AS (SELECT user_id, min(ts) AS t_view FROM events
                WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
                JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t_view
                  AND e.ts <= v.t_view + INTERVAL $funnelWindowSec SECOND GROUP BY 1),
          p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
                JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                  AND e.ts <= c.t_click + INTERVAL $funnelWindowSec SECOND GROUP BY 1)
          SELECT b.user_id, t_view, t_click, t_purchase,
                 CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                           WHEN t_click IS NOT NULL THEN 2
                           WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
          FROM base b LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
                      LEFT JOIN p USING (user_id)""",
    "q_hist_quantile" -> {
      val w = (histHi - histLo) / histBuckets // 520.5, exact in double
      s"""WITH h AS (SELECT l_returnflag,
                  least(${histBuckets - 1}, greatest(0,
                    CAST(floor((l_extendedprice - $histLo) / $w) AS INTEGER))) AS b,
                  count(*) AS cnt
                FROM lineitem GROUP BY 1, 2),
          cum AS (SELECT l_returnflag, b, cnt,
                    CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY b) AS BIGINT) AS cum
                  FROM h),
          cn AS (SELECT *, max(cum) OVER (PARTITION BY l_returnflag) AS n FROM cum),
          ps AS (SELECT unnest([${histPs.map(p => s"${p}e0").mkString(", ")}]) AS p)
          SELECT l_returnflag, ps.p, cn.n,
                 round($histLo + (CAST(cn.b AS DOUBLE)
                   + (ps.p * cn.n - (cn.cum - cn.cnt)) / cn.cnt) * $w, 4) AS est
          FROM cn, ps
          WHERE cn.cum >= ps.p * cn.n AND (cn.cum - cn.cnt) < ps.p * cn.n"""
    },
    "q_fuzzy_match" ->
      s"""WITH dirty AS (SELECT p_partkey,
                  CASE WHEN p_partkey % 3 = 0
                       THEN substring(p_name, 1, 1) || substring(p_name, 3, 1000)
                       ELSE p_name END AS name
                FROM part),
          clean AS (SELECT DISTINCT p_name AS cn FROM part),
          cand AS (SELECT d.p_partkey, d.name, c.cn,
                     CAST(levenshtein(d.name, c.cn) AS BIGINT) AS dist
                   FROM dirty d JOIN clean c
                     ON substring(d.name, 1, 1) = substring(c.cn, 1, 1)
                   WHERE levenshtein(d.name, c.cn) <= $fuzzyMaxDist),
          r AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
                  ORDER BY dist, cn) AS rn FROM cand)
          SELECT p_partkey, name, cn AS matched, dist FROM r WHERE rn = 1""",
    "q_cross_dedup" ->
      s"""WITH ${ExtensionQueries.minhashEstCtes},
          cross_pairs AS (SELECT
              CASE WHEN id_a % 3 = 0 THEN id_a ELSE id_b END AS incoming_id,
              CASE WHEN id_a % 3 = 0 THEN id_b ELSE id_a END AS existing_id,
              jaccard_est
            FROM est
            WHERE (id_a % 3 = 0) <> (id_b % 3 = 0) AND jaccard_est >= $crossJaccardMin),
          pk AS (SELECT incoming_id,
              max(CAST(floor(jaccard_est * 10000 + 0.5) AS BIGINT) * $packB
                  + (${packB - 1} - existing_id)) AS mp
            FROM cross_pairs GROUP BY 1)
          SELECT incoming_id,
                 ${packB - 1} - (mp % $packB) AS match_id,
                 round((mp // $packB) / 10000.0, 4) AS jaccard_est
          FROM pk""",
    "q_t_normalize" ->
      s"""SELECT doc_id,
                 trim(regexp_replace(regexp_replace(
                   translate(lower(substring(text, 1, 30) || '$normNoise' || source),
                             '${Text.accentFrom}', '${Text.accentTo}'),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM documents"""
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text
import graft.operators.{Quality, Similarity}

/** Round-19 data-card / agreement-observability queries — the report
  * surface a curation team publishes WITH a corpus (and reads before
  * trusting an automated annotator): chance-corrected agreement between
  * labelers (Cohen's kappa, both labeler-vs-gold and method-vs-method),
  * the vocabulary long-tail panel, the log2 length histogram, the
  * dedup-decision evidence report, and a streaming decayed-rate monitor.
  * Reference lineage: the reference publishes per-type row counts and
  * dedup verdicts around its cleaning stages (Kafka_GSMLSConsumer.py's
  * per-table frames); these queries are that reporting surface grown to
  * corpus scale. All fixed-point integer arithmetic — kappa, shares and
  * decay are engine-exact (floor quantization, sign carried explicitly,
  * rational decay instead of exp), so every query sits under a DuckDB
  * oracle.
  */
object ReportQueries {
  private type Q = (SparkSession, String) => DataFrame

  private[graft] val vocabTopK = 10
  private[graft] val decayNum = 7L  // per-trigger decay 7/8 in floor arithmetic
  private[graft] val decayDen = 8L

  // =====================================================================
  // Spark queries
  // =====================================================================

  /** Agreement between two DEDUP annotators — exact content-hash dup
    * verdict vs MinHash-LSH near-dup verdict, as Cohen's kappa over the
    * per-doc binary labels. The calibration read: high kappa says the
    * cheap exact pass already finds what LSH finds (spend less); low
    * kappa with near ≫ exact says the corpus duplicates by paraphrase,
    * not by copy. Reuses the proven lshJaccard chain; the kappa runs on
    * a 2×2 cell relation. */
  private val qDupKappa: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val pairs = Similarity.lshJaccard(docs, "doc_id", "text",
      CurationQueries.shingleN, ExtensionQueries.minhashN,
      ExtensionQueries.rowsPerBand, ExtensionQueries.lshBucketCap,
      ExtensionQueries.jaccardThreshold)
    val near = pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id"))).distinct()
    val hashCounts = docs.groupBy(md5(col("text")).as("__h"))
      .agg(count(lit(1)).as("__hc"))
    val flags = docs.select(col("doc_id"), md5(col("text")).as("__h"))
      .join(hashCounts, "__h")
      .join(near.withColumn("__near", lit(1)), Seq("doc_id"), "left")
      .select(when(col("__hc") > 1, 1).otherwise(0).as("exact_dup"),
        coalesce(col("__near"), lit(0)).as("near_dup"))
    Quality.cohenKappa(flags, col("exact_dup"), col("near_dup"))
  }

  /** Agreement of the stopword lang-id HEURISTIC against the corpus'
    * GOLD language labels — the annotator-calibration number that
    * decides whether the heuristic may label unlabeled data. Kappa, not
    * accuracy: 'en' dominates this corpus, so majority-class guessing
    * already "scores" its prevalence — kappa subtracts that. */
  private val qLangidKappa: Q = (spark, dir) =>
    Quality.cohenKappa(
      Tables.fanOut(Tables.documents(spark, dir))
        .select(Text.langId(col("text")).as("pred"), col("lang").as("gold")),
      col("pred"), col("gold"))

  /** Per-source vocabulary panel: token total, vocabulary size, hapax
    * count (frequency-1 types — long-tail health), top-10-token share
    * in bp (boilerplate concentration). The top-k rides the bounded
    * TopK UDAF, never a vocabulary-wide sort. */
  private val qVocabStats: Q = (spark, dir) =>
    Quality.vocabStats(
      Tables.fanOut(Tables.documents(spark, dir))
        .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
        .filter(col("tok") =!= ""),
      "source", "tok", vocabTopK)

  /** Per-source log2-bucketed token-length histogram — the data-card
    * length panel (bucket id = length(bin(n)) = floor(log2)+1, integer
    * string semantics identical across engines). */
  private val qLenHist: Q = (spark, dir) =>
    Quality.lenHistogram(
      Tables.fanOut(Tables.documents(spark, dir))
        .select(col("source"), Text.tokenCount(col("text")).as("__n")),
      "source", col("__n"))

  /** Near-dup pairs with their full evidence: jaccard + the counts it
    * came from + how many LSH bands collided
    * ([[Similarity.lshJaccardExplain]]) — the appealable dedup record. */
  private val qDedupExplain: Q = (spark, dir) =>
    Similarity.lshJaccardExplain(Tables.fanOut(Tables.documents(spark, dir)),
      "doc_id", "text", CurationQueries.shingleN, ExtensionQueries.minhashN,
      ExtensionQueries.rowsPerBand, ExtensionQueries.lshBucketCap,
      ExtensionQueries.jaccardThreshold)

  /** ST24 — streaming decayed per-source arrival rates over three
    * mtime-pinned deliveries (doc_id % 3 = 0, 1, 2): each trigger
    * decays carried activity by 7/8 (integer floor) and adds its batch
    * counts; new strata join mid-run (full-outer state, the contract
    * ST23 deliberately does NOT have). The drained snapshot must equal
    * the closed-form replay — the oracle nests the three floor steps
    * explicitly. */
  private val qSt24StreamDecay: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"))
    val in = graft.io.TempDirs.registered("graft-q-st24-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st24-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st24-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(0L, 1L, 2L).zipWithIndex.foreach { case (r, s) =>
      docs.filter(pmod(col("doc_id"), lit(3L)) === r)
        .coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, docs.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runStreamingDecay(src, "source",
      decayNum, decayDen, state, ckpt)
    graft.streaming.Streaming.sgdWeights(spark, state)
  }

  private[graft] val kAnonK = 10L

  /** k-anonymity over the customer quasi-identifier tuple (market
    * segment, nation): equivalence classes below k are the
    * re-identification risk and the suppression work-list a privacy
    * review produces before person-level rows feed a corpus. */
  private val qKAnon: Q = (spark, dir) =>
    Quality.kAnonymity(Tables.fanOut(Tables.customer(spark, dir)),
        Seq("c_mktsegment", "c_nationkey"), kAnonK)
      .select(col("c_mktsegment"), col("c_nationkey").cast(LongType).as("c_nationkey"),
        col("class_n"), col("meets_k"))

  /** Referential-integrity + coverage panel over the warehouse's four
    * FK edges: orphan counts prove integrity (must be zero), unmatched
    * parents are the coverage signal (customers who never ordered,
    * parts never sold). Child tables collapse to per-key counts before
    * any join. */
  private val qRefCoverage: Q = (spark, dir) => {
    val li = Tables.fanOut(Tables.lineitem(spark, dir))
    Seq(
      Quality.refCoverage(li, "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey", "lineitem->orders"),
      Quality.refCoverage(li, "l_partkey",
        Tables.part(spark, dir), "p_partkey", "lineitem->part"),
      Quality.refCoverage(li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey", "lineitem->supplier"),
      Quality.refCoverage(Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey", "orders->customer"))
      .reduce(_ unionAll _)
  }

  /** Gini of per-user event activity in bp — the engagement-inequality
    * stat of an event-stream data card ([[Quality.giniIndex]]). */
  private val qEventGini: Q = (spark, dir) =>
    Quality.giniIndex(Tables.fanOut(Tables.events(spark, dir)), "user_id")

  /** Day-of-week × hour event profile with share bp — the seasonality
    * panel. All integer epoch arithmetic ((days+4)%7 with 1970-01-01 a
    * Thursday; seconds truncate toward zero on both engines for
    * post-epoch data), never engine date-part functions whose week
    * conventions differ. */
  private val qDowProfile: Q = (spark, dir) => {
    val secs = unix_timestamp(col("ts").cast("timestamp"))
    val e = Tables.fanOut(Tables.events(spark, dir))
      .select(secs.as("__s"))
      .select(expr("(__s div 86400 + 4) % 7").as("dow"),
        expr("(__s % 86400) div 3600").as("hour"))
      .groupBy(col("dow"), col("hour")).agg(count(lit(1)).as("n_events"))
    val tot = e.agg(sum(col("n_events")).as("__tot"))
    e.crossJoin(broadcast(tot))
      .withColumn("share_bp", expr("n_events * 10000 div __tot"))
      .select(col("dow"), col("hour"), col("n_events"), col("share_bp"))
  }

  def queries: Map[String, Q] = Map(
    "q_dup_kappa"       -> qDupKappa,
    "q_langid_kappa"    -> qLangidKappa,
    "q_vocab_stats"     -> qVocabStats,
    "q_len_log_hist"        -> qLenHist,
    "q_dedup_explain"   -> qDedupExplain,
    "q_st24_stream_decay" -> qSt24StreamDecay,
    "q_k_anon"          -> qKAnon,
    "q_ref_coverage"    -> qRefCoverage,
    "q_event_gini"      -> qEventGini,
    "q_dow_profile"     -> qDowProfile)

  // =====================================================================
  // DuckDB oracle SQL
  // =====================================================================

  /** Kappa tail over a `flags(p, g)` CTE — the integer mirror of
    * [[Quality.cohenKappa]]: bp quantities by floor division, the
    * kappa sign carried explicitly so DuckDB's floor `//` and Spark's
    * truncating `div` agree (both divisions run on non-negative
    * operands), HUGEINT sums CAST before any output-reaching value. */
  private def kappaSql(flagsCte: String): String =
    s"""$flagsCte,
          cm AS (SELECT p, g, count(*) AS c FROM flags GROUP BY 1, 2),
          marg AS (SELECT CAST((SELECT sum(r.rc * q.gc) FROM
                (SELECT p, sum(c) AS rc FROM cm GROUP BY 1) r
                JOIN (SELECT g, sum(c) AS gc FROM cm GROUP BY 1) q
                  ON r.p = q.g) AS BIGINT) AS pe_num),
          m AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN p = g THEN c ELSE 0 END) AS BIGINT) AS agree
                FROM cm),
          bp AS (SELECT n, agree,
                 agree * 10000 // n AS po_bp,
                 pe_num * 10000 // (n * n) AS pe_bp
                FROM m, marg)
          SELECT n, agree AS n_agree, po_bp, pe_bp,
            CASE WHEN pe_bp >= 10000 THEN CAST(10000 AS BIGINT)
                 ELSE (CASE WHEN po_bp >= pe_bp THEN 1 ELSE -1 END)
                   * (abs(po_bp - pe_bp) * 10000 // (10000 - pe_bp)) END AS kappa_bp
          FROM bp"""

  /** The stopword-argmax lang-id CASE ladder (declaration-order ties,
    * zero hits -> 'und') — same construction as the q_curate oracle. */
  private val langidPredSql: String = {
    import ExtensionQueries.hitsExpr
    s"""SELECT lang AS g,
          CASE WHEN h_en = mx AND mx > 0 THEN 'en'
               WHEN h_de = mx AND mx > 0 THEN 'de'
               WHEN h_fr = mx AND mx > 0 THEN 'fr'
               WHEN h_es = mx AND mx > 0 THEN 'es'
               WHEN h_zh = mx AND mx > 0 THEN 'zh'
               ELSE 'und' END AS p
        FROM (SELECT lang, h_en, h_de, h_fr, h_es, h_zh,
                greatest(h_en, h_de, h_fr, h_es, h_zh) AS mx
              FROM (SELECT lang,
                ${hitsExpr("en")} AS h_en, ${hitsExpr("de")} AS h_de,
                ${hitsExpr("fr")} AS h_fr, ${hitsExpr("es")} AS h_es,
                ${hitsExpr("zh")} AS h_zh
              FROM documents))"""
  }

  def oracleSql: Map[String, String] = Map(
    "q_dup_kappa" ->
      s"""WITH ${ExtensionQueries.lshJaccardCtes},
          near AS (SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM lsh_pairs
            UNION ALL SELECT id_b FROM lsh_pairs)),
          eh AS (SELECT doc_id,
                 count(*) OVER (PARTITION BY md5(text)) AS hc FROM documents),
          ${kappaSql(
            """flags AS (SELECT CASE WHEN e.hc > 1 THEN 1 ELSE 0 END AS p,
                   CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END AS g
                 FROM eh e LEFT JOIN near n USING (doc_id))""")}""",
    "q_langid_kappa" ->
      s"""WITH ${kappaSql(s"flags AS ($langidPredSql)")}""",
    "q_vocab_stats" ->
      s"""WITH toks AS (SELECT source,
              unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
          t2 AS (SELECT * FROM toks WHERE tok <> ''),
          freq AS (SELECT source, tok, count(*) AS c FROM t2 GROUP BY 1, 2),
          panel AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS vocab,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
                FROM freq GROUP BY 1),
          ranked AS (SELECT source, c, row_number() OVER (PARTITION BY source
                ORDER BY c DESC,
                  CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) ASC) AS rn
               FROM freq),
          top AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts
                  FROM ranked WHERE rn <= $vocabTopK GROUP BY 1)
          SELECT p.source, p.n_tokens, p.vocab, p.hapax,
                 t.ts * 10000 // p.n_tokens AS top_share_bp
          FROM panel p JOIN top t USING (source)""",
    "q_len_log_hist" ->
      s"""WITH d AS (SELECT source,
              len(string_split_regex(text, '\\s+')) AS l FROM documents)
          SELECT source, CAST(length(bin(l)) AS BIGINT) AS len_bucket,
                 count(*) AS n_docs, CAST(sum(l) AS BIGINT) AS sum_len,
                 CAST(min(l) AS BIGINT) AS min_len,
                 CAST(max(l) AS BIGINT) AS max_len
          FROM d GROUP BY 1, 2""",
    "q_dedup_explain" ->
      s"""WITH ${ExtensionQueries.lshJaccardCtes},
          collided AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                 count(*) AS n_bands
               FROM capped l JOIN capped r
                 ON l.band = r.band AND l.band_key = r.band_key
                AND l.doc_id < r.doc_id
               GROUP BY 1, 2)
          SELECT i.id_a, i.id_b,
                 round(i.inter / (sa.sz + sb.sz - i.inter), 4) AS jaccard,
                 CAST(i.inter AS BIGINT) AS inter,
                 CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
                 c.n_bands
          FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
                       JOIN sizes sb ON i.id_b = sb.doc_id
                       JOIN collided c ON c.id_a = i.id_a AND c.id_b = i.id_b
          WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 4)
                  >= ${ExtensionQueries.jaccardThreshold}""",
    "q_k_anon" ->
      s"""SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                 count(*) AS class_n, count(*) >= $kAnonK AS meets_k
          FROM customer GROUP BY 1, 2""",
    "q_ref_coverage" ->
      Seq(("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
          ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))
        .map { case (name, child, ck, parent, pk) =>
          s"""SELECT '$name' AS relationship, n_child, n_orphans, n_parents,
                n_unmatched_parents, n_orphans = 0 AS integrity_ok
              FROM (SELECT
                CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_child,
                CAST((SELECT coalesce(sum(cnt), 0) FROM
                    (SELECT $ck AS k, count(*) AS cnt FROM $child GROUP BY 1) cc
                  WHERE k NOT IN (SELECT $pk FROM $parent)) AS BIGINT) AS n_orphans,
                CAST((SELECT count(*) FROM $parent) AS BIGINT) AS n_parents,
                CAST((SELECT count(*) FROM (SELECT DISTINCT $pk AS k FROM $parent) pp
                  WHERE k NOT IN (SELECT $ck FROM $child)) AS BIGINT)
                  AS n_unmatched_parents)"""
        }.mkString("\n          UNION ALL\n          "),
    "q_event_gini" ->
      """WITH c AS (SELECT user_id, count(*) AS x FROM events GROUP BY 1),
          r AS (SELECT x, row_number() OVER (ORDER BY x ASC, user_id ASC) AS i FROM c),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(x) AS BIGINT) AS n_total,
                 CAST(sum(i * x) AS BIGINT) AS s1 FROM r)
          SELECT n_keys, n_total,
            CAST(floor(CAST(2 * s1 - (n_keys + 1) * n_total AS DOUBLE)
              / CAST(n_keys * n_total AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
              AS gini_bp
          FROM s""",
    // integer epoch arithmetic (floor(epoch) truncates like Spark's
    // unix_timestamp for post-epoch data; (days+4)%7: 1970-01-01 = Thu)
    "q_dow_profile" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
          b AS (SELECT (s // 86400 + 4) % 7 AS dow,
                 (s % 86400) // 3600 AS hour FROM e),
          g AS (SELECT dow, hour, count(*) AS n_events FROM b GROUP BY 1, 2),
          t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM g)
          SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
                 n_events, n_events * 10000 // tot AS share_bp
          FROM g, t""",
    // three mtime-pinned deliveries (doc_id % 3 = 0, 1, 2) -> the decay
    // recurrence unrolled: d3 = ((c0*7//8) + c1)*7//8 + c2, all floor
    "q_st24_stream_decay" ->
      s"""WITH c AS (SELECT source,
              sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS c0,
              sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END) AS c1,
              sum(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END) AS c2,
              count(*) AS n
            FROM documents GROUP BY 1)
          SELECT source,
            CAST(((c0 * $decayNum // $decayDen + c1) * $decayNum // $decayDen
              + c2) AS BIGINT) AS decayed,
            CAST(n AS BIGINT) AS raw_total
          FROM c""")
}

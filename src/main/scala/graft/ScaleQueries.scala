package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text
import graft.operators.Curation

/** Round-6 scale-pattern queries with DuckDB oracles: line-level
  * boilerplate removal (the CCNet/RefinedWeb pre-dedup pass),
  * Bloom-gated decontamination (the runtime-filter pattern made
  * explicit, exact by construction), and token-vocabulary building.
  */
object ScaleQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val lineChunk = 10      // tokens per synthesized "line"
  private val lineMaxDf = 10      // doc-frequency threshold for boilerplate
  private val benchMod = 25       // doc_id % benchMod == benchRem -> benchmark set
  private val benchRem = 7
  private val vocabK = 100

  // =====================================================================
  // Spark queries
  // =====================================================================

  /** Line-level boilerplate removal. The corpus has no newlines, so each
    * document is synthesized into lines first: a per-source header line,
    * the text in 10-token lines, and a corpus-wide footer — lineDedup
    * must strip exactly the lines whose document frequency reaches the
    * threshold (header: one per source; footer: every doc) and keep the
    * content lines, reassembled in order. */
  private val qLineDedup: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val syn = docs.select(col("doc_id"),
      concat(
        lit("=== "), col("source"), lit(" header ===\n"),
        concat_ws("\n", Text.chunkTokens(col("text"), lineChunk, 0)),
        lit("\nsubscribe to our newsletter")).as("syntext"))
    Curation.lineDedup(syn, "doc_id", "syntext", lineMaxDf)
  }

  /** Bloom-gated decontamination: the benchmark slice's content hashes
    * fold into a broadcast bitmap; corpus rows failing the Bloom probes
    * stream through with a nulled join key, only candidates cross the
    * exact anti-join. The result is exactly "corpus minus docs whose
    * text hash appears in the benchmark slice". */
  private val qBloomDecontam: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .withColumn("__ck", md5(col("text")))
    val bench = docs.filter(col("doc_id") % benchMod === benchRem)
      .select(col("__ck").as("bkey"))
    val corpus = docs.filter(col("doc_id") % benchMod =!= benchRem)
    Curation.bloomKeepClean(corpus, "__ck", bench, "bkey")
      .select(col("doc_id"), col("source"))
  }

  /** Token-vocabulary builder: corpus-wide token frequencies, top-k by
    * (count desc, token asc) with dense ids — the vocabulary-seeding
    * step of a tokenizer build. The global rank window runs AFTER the
    * top-k cut, so it only ever sorts k rows in one partition; the
    * frequency aggregation itself is a map-side-combined hash agg. */
  private val qTVocab: Q = (spark, dir) => {
    val counts = Tables.fanOut(Tables.documents(spark, dir))
      .select(explode(Text.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    counts.orderBy(col("n").desc, col("token").asc).limit(vocabK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token").asc))
          .cast(LongType))
  }

  /** Z-order clustering key over (customer, order) — the layout write:
    * range-partition + sort on the Morton value, so every output file
    * covers a small rectangle of the 2-D key space and min/max stats
    * prune on either dimension. The zval arithmetic is what the oracle
    * checks; ZorderSpec pins the RangePartitioning in the plan. */
  private val qZorder: Q = (spark, dir) => {
    val z = Tables.fanOut(Tables.orders(spark, dir))
      .select(col("o_orderkey"),
        operators.Layout.zValue(
          pmod(col("o_custkey"), lit(65536L)),
          pmod(col("o_orderkey"), lit(65536L))).as("zval"))
    z.repartitionByRange(8, col("zval")).sortWithinPartitions(col("zval"))
  }

  /** 3-D Z-order clustering key over (customer, order, order-date-day)
    * — the N-dimensional layout write: 21 bits per dimension round-robin
    * interleaved into one 63-bit key, range-partitioned and sorted so
    * every file covers a small box of the 3-D key space and min/max
    * stats prune on any of the three dimensions. */
  private val qZorderNd: Q = (spark, dir) => {
    val dim = lit(1L << 21)
    val z = Tables.fanOut(Tables.orders(spark, dir))
      .select(col("o_orderkey"),
        operators.Layout.zValueN(Seq(
          pmod(col("o_custkey"), dim),
          pmod(col("o_orderkey"), dim),
          pmod(datediff(col("o_orderdate"), lit("1970-01-01")).cast(LongType), dim))
        ).as("zval"))
    z.repartitionByRange(8, col("zval")).sortWithinPartitions(col("zval"))
  }

  /** SCD type-2 dimension build from the order history: per customer,
    * each order becomes a version row valid until the next one. */
  private val qScd2: Q = (spark, dir) =>
    operators.Relational.scd2(
        Tables.fanOut(Tables.orders(spark, dir))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("o_orderdate")),
        Seq("o_custkey"), "o_orderdate", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("valid_from"), col("valid_to"), col("version"), col("is_current"))

  /** Exact grouped quantiles (percentile is exact in both engines;
    * both interpolate at rank p*(n-1), rounded to absorb float noise).
    * The scale path for when exact isn't affordable is approx_percentile
    * — QuantileSpec pins its error against this exact result. */
  private val qQuantiles: Q = (spark, dir) =>
    Tables.fanOut(Tables.orders(spark, dir))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))

  /** Streaming MERGE: three delta deliveries (full load, re-price+
    * inserts, second re-price) drain through the incremental-merge
    * sink one file per trigger; the reconstructed snapshot must equal
    * the batch keep-last merge over everything delivered — delivery
    * order and batch boundaries must not matter. */
  private val qSt10Incremental: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val d1 = o.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("price"), lit(1L).as("version"))
    val d2 = o.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("k"), (col("o_totalprice") * 2).as("price"),
        lit(2L).as("version"))
      .unionByName(o.filter(col("o_orderkey") % 1000 === 1)
        .select((col("o_orderkey") + 10000000L).as("k"),
          col("o_totalprice").as("price"), lit(2L).as("version")))
    val d3 = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), (col("o_totalprice") * 3).as("price"),
        lit(3L).as("version"))
    val in = graft.io.TempDirs.registered("graft-q-st10-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st10-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st10-ckpt").toString
    d1.coalesce(1).write.mode("append").parquet(in)
    d2.coalesce(1).write.mode("append").parquet(in)
    d3.coalesce(1).write.mode("append").parquet(in)
    val src = graft.streaming.Streaming.parquetSource(spark, in, d1.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runIncrementalMerge(src, Seq("k"), "version",
      buckets = 8, state, ckpt)
    graft.streaming.Streaming.mergedSnapshot(spark, state)
      .select(col("k"), col("price"), col("version"))
  }

  /** Compacted streaming MERGE: five delta deliveries drained with
    * `compactEvery = 2`, so batches 2 and 4 fold the whole prior
    * snapshot into a single version and GC drops everything the folded
    * manifest no longer references. Exercises the version-count bound
    * (≤ compactEvery + 1 live version dirs at rest) while the snapshot
    * must STILL equal the plain batch keep-last merge — compaction is
    * a layout change, never a semantic one. */
  private val qSt15Compacted: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    def delta(mod: Int, mult: Int, ver: Long) =
      o.filter(col("o_orderkey") % mod === 0)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") * mult).as("price"), lit(ver).as("version"))
    val d1 = o.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("price"), lit(1L).as("version"))
    val in = graft.io.TempDirs.registered("graft-q-st15-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st15-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st15-ckpt").toString
    d1.coalesce(1).write.mode("append").parquet(in)
    delta(10, 2, 2L).coalesce(1).write.mode("append").parquet(in)
    delta(7, 3, 3L).coalesce(1).write.mode("append").parquet(in)
    delta(5, 4, 4L).coalesce(1).write.mode("append").parquet(in)
    delta(3, 5, 5L).coalesce(1).write.mode("append").parquet(in)
    val src = graft.streaming.Streaming.parquetSource(spark, in, d1.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runIncrementalMerge(src, Seq("k"), "version",
      buckets = 8, state, ckpt, compactEvery = 2)
    graft.streaming.Streaming.mergedSnapshot(spark, state)
      .select(col("k"), col("price"), col("version"))
  }

  /** Time-travel read on the incremental-merge state: three delta
    * deliveries drain through the merge sink, then the snapshot is read
    * AS OF batch 1 — resolved through the newest manifest committed at
    * or below that batch, exactly how a reader at that point in time
    * would have bound it. The result must equal the keep-last merge
    * over the first TWO deltas only; the third delivery must be
    * invisible. Delivery order matters here (unlike the order-free
    * keep-last merges), so file mtimes pin the trigger sequence. */
  private val qSt17TimeTravel: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val d1 = o.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("price"), lit(1L).as("version"))
    val d2 = o.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("k"), (col("o_totalprice") * 2).as("price"),
        lit(2L).as("version"))
    val d3 = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), (col("o_totalprice") * 3).as("price"),
        lit(3L).as("version"))
    val in = graft.io.TempDirs.registered("graft-q-st17-in").toString
    val state = graft.io.TempDirs.registered("graft-q-st17-state").toString
    val ckpt = graft.io.TempDirs.registered("graft-q-st17-ckpt").toString
    val seen = scala.collection.mutable.Set[String]()
    Seq(d1, d2, d3).zipWithIndex.foreach { case (d, s) =>
      d.coalesce(1).write.mode("append").parquet(in)
      // pin strictly increasing mtimes per delivery (FileStreamSource
      // orders by modification time)
      new java.io.File(in).listFiles().foreach { f =>
        if (!seen.contains(f.getName)) {
          if (f.getName.startsWith("part-"))
            f.setLastModified(1700000000000L + s * 60000L)
          seen += f.getName
        }
      }
    }
    val src = graft.streaming.Streaming.parquetSource(spark, in, d1.schema,
      maxFilesPerTrigger = 1)
    graft.streaming.Streaming.runIncrementalMerge(src, Seq("k"), "version",
      buckets = 8, state, ckpt)
    graft.streaming.Streaming.mergedSnapshotAt(spark, state, 1L)
      .select(col("k"), col("price"), col("version"))
  }

  /** Markup stripping over synthesized HTML/markdown wrapping (the
    * corpus itself is plain text, so each doc is wrapped in tags, a
    * markdown link, emphasis, and a heading marker — extraction must
    * recover exactly the wrapped content). */
  private val qTStrip: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"),
        Text.stripMarkup(concat(
          lit("<html><p class=\"x\">"), substring(col("text"), 1, 60),
          lit("</p> **bold** [anchor text](http://ex.com/a?b=1) ## heading <br/>tail"))
        ).as("clean"))

  /** TF-IDF term weighting: tf per (doc, token), df over the tf
    * relation (already distinct per doc), N via a 1-row broadcast —
    * never a driver-side count. Two shuffles (doc×token, token); the
    * idf join is vocabulary-sized. */
  private val qTfidf: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    // tf feeds both the df aggregation and the final join — persist so
    // the tokenize+count runs once (released by the harness clearCache)
    val tf = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("__n").cast(DoubleType) / col("df")), 4).as("tfidf"))
  }

  /** Winsorization: clip a metric to its per-group [p05, p95] — the
    * feature-normalization outlier guard. Quantile bounds are one exact
    * aggregation (rounded so both engines agree bit-for-bit), then a
    * broadcast join + map-only clip. */
  private val qWinsorize: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    val bounds = o.groupBy(col("o_orderpriority")).agg(
      round(expr("percentile(o_totalprice, 0.05)"), 4).as("lo"),
      round(expr("percentile(o_totalprice, 0.95)"), 4).as("hi"))
    o.join(broadcast(bounds), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"),
        least(greatest(col("o_totalprice"), col("lo")), col("hi")).as("clipped"))
  }

  /** Deterministic 90/5/5 train/val/test split: the assignment is a
    * pure function of (salt, doc_id) — reproducible, new data never
    * reassigns old rows, map-only. */
  /** Deterministic 90/5/5 split assignment for `doc_id` — shared by
    * q_split and the split-leakage report so both stay on the identical
    * hash by construction. */
  private[graft] def splitColumn: org.apache.spark.sql.Column = {
    val bucket = pmod(
      conv(substring(md5(concat(lit("split6:"), col("doc_id").cast(StringType))), 1, 15), 16, 10)
        .cast(LongType), lit(10000L))
    when(bucket < 9000L, lit("train"))
      .when(bucket < 9500L, lit("val"))
      .otherwise(lit("test"))
  }

  /** DuckDB mirror of [[splitColumn]]. */
  private[graft] val splitCaseSql: String =
    """CASE WHEN CAST('0x' || substring(md5('split6:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9000 THEN 'train'
           WHEN CAST('0x' || substring(md5('split6:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9500 THEN 'val'
           ELSE 'test' END"""

  private val qSplit: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), splitColumn.as("split"))

  /** Repeated-span inventory — stage 1 of exact substring dedup (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better"):
    * every 8-token span appearing in >= 2 distinct documents, with its
    * document frequency. Shingling is a projection; the frequency agg
    * partial-combines map-side; output is keyed by span hash so rows
    * stay narrow at corpus scale. */
  private val qDupSpans: Q = (spark, dir) =>
    operators.Similarity.shingles(
        Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text", 8)
      .groupBy(col("shingle")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(md5(col("shingle")).as("span_md5"), col("n_docs"))

  /** Stage 2 of exact substring dedup: remove every 8-token span held
    * by >= 2 documents and rebuild each document from its surviving
    * tokens — the pass that actually yields the deduplicated training
    * corpus (stage 1, q_dup_spans, only inventories the spans). */
  private val qDupRemove: Q = (spark, dir) =>
    Curation.removeRepeatedSpans(
      Tables.fanOut(Tables.documents(spark, dir)), "doc_id", "text",
      n = 8, minDocFreq = 2)

  /** Token-length histogram per source (integer 32-token buckets — no
    * float log bucketing, which disagrees across engines at power-of-two
    * boundaries): the length-distribution profile driving truncation /
    * chunking policy. */
  private val qLenHist: Q = (spark, dir) =>
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("source"), Text.tokenCount(col("text")).cast(LongType).as("n_tok"))
      .withColumn("bucket", (col("n_tok") / 32L).cast(LongType))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))

  /** Heavy hitters through the Misra-Gries sketch + exact recount: the
    * buffer (256) exceeds the key cardinality here so the candidate set
    * is provably complete and the top-10 exact; TopKSpec pins the
    * superset bound in the undersized-buffer regime the operator exists
    * for. Keys compare as strings end-to-end (cast before ranking) so
    * both engines use identical tie-break collation. */
  private val qHeavyHitters: Q = (spark, dir) =>
    operators.TopK.heavyHittersExact(
      Tables.fanOut(Tables.events(spark, dir)).select(col("user_id").as("user_key")),
      "user_key", c = 256, k = 10)

  /** Snapshot diff: the orders table against its next refresh (re-price
    * every 10th, drop every 13th, insert beyond-range keys) classified
    * into inserted/deleted/changed/unchanged. */
  private val qTableDiff: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    val before = o.select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val after = o.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")).as("price"))
      .unionByName(o.filter(col("o_orderkey") % 1000 === 1)
        .select((col("o_orderkey") + 10000000L).as("k"), col("o_totalprice").as("price")))
    operators.Relational.tableDiff(before, after, Seq("k"), Seq("price"))
  }

  /** Symmetric int8 embedding quantization — the 4× storage compression
    * an embedding store runs before ANN at corpus scale. Per-vector
    * scale = 127/max|x|; rounding is floor(x·s + 0.5) (round-half-up in
    * BOTH engines — round() half-even vs half-up divergence is the trap),
    * clamped to [-127, 127]. Pure projection, exploded to long form so
    * the oracle compares scalar cells. */
  private val qEmbedQuantize: Q = (spark, dir) =>
    Tables.fanOut(Tables.embeddings(spark, dir))
      .select(col("vec_id"),
        greatest(array_max(transform(col("embedding"), x => abs(x.cast(DoubleType)))),
          lit(1e-12)).as("amax"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos").cast(LongType).as("pos"),
        least(greatest(floor(col("v").cast(DoubleType) * 127.0 / col("amax") + 0.5),
          lit(-127.0)), lit(127.0)).cast(LongType).as("qv"))

  /** ROLLUP over (returnflag, linestatus) — the subtotal hierarchy an
    * OLAP report runs in ONE pass instead of three group-bys. The
    * grouping id is computed explicitly (2·g(flag) + g(status)) so the
    * oracle compare never depends on an engine's grouping_id bit
    * order. Scale shape: Expand×3 feeds one hash aggregate with
    * map-side partials — rows shuffle once, subtotal levels included;
    * sum_qty is exact (integer-valued quantities, double-safe). */
  private val qRollup: Q = (spark, dir) =>
    Tables.fanOut(Tables.lineitem(spark, dir))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")).cast(LongType) * 2 +
          grouping(col("l_linestatus")).cast(LongType)).as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"))

  /** CUBE over (status, priority) — all four grouping levels of the
    * order matrix in one pass (Expand×4 → single shuffle). The measure
    * sums floor(price) as BIGINT so the cross-engine compare is exact
    * under any addition order. */
  private val qCube: Q = (spark, dir) =>
    Tables.fanOut(Tables.orders(spark, dir))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        (grouping(col("o_orderstatus")).cast(LongType) * 2 +
          grouping(col("o_orderpriority")).cast(LongType)).as("gid"),
        count(lit(1)).as("n"),
        sum(floor(col("o_totalprice")).cast(LongType)).as("sum_price"))

  /** GROUPING SETS — the two marginal totals plus the grand total,
    * skipping the full cross product a cube would pay for: the
    * report-page shape (row totals, column totals, grand total) as one
    * scan. Runs through the spark.sql surface since the DataFrame API
    * has no grouping-sets verb. */
  private val qGroupingSets: Q = (spark, dir) => {
    Tables.fanOut(Tables.lineitem(spark, dir))
      .createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
                CAST(grouping(l_returnflag) AS BIGINT) * 2 +
                  CAST(grouping(l_linestatus) AS BIGINT) AS gid,
                count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem_gs
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
  }

  /** Data-quality expectation report: four row-level rules plus the
    * key-uniqueness check, one report row each, all in one pass (the
    * uniqueness check adds its own key-grouped aggregate). */
  private val qDqReport: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    operators.Quality.dqReport(o, Seq(
      "totalprice_positive" -> (col("o_totalprice") > 0),
      "status_in_domain"    -> col("o_orderstatus").isin("F", "O", "P"),
      "date_in_range"       -> col("o_orderdate").between("1992-01-01", "1998-12-31"),
      "priority_in_domain"  -> col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
      .unionByName(operators.Quality.dqUnique(o, Seq("o_orderkey"), "orderkey_unique"))
  }

  /** PSI drift between the pre-1996 and 1996+ order-price populations:
    * 20 fixed price buckets, smoothed shares, quantized terms — the
    * snapshot-over-snapshot stability report. */
  private val qDriftPsi: Q = (spark, dir) => {
    val o = Tables.fanOut(Tables.orders(spark, dir))
    operators.Quality.driftPsi(
      o.filter(col("o_orderdate") < "1996-01-01"),
      o.filter(col("o_orderdate") >= "1996-01-01"),
      col("o_totalprice"), lo = 0.0, hi = 600000.0, nBuckets = 20)
  }

  private val cmDepth = 4
  private val cmWidth = 512

  /** Count-min frequency estimates for every 5th user beside the exact
    * recount — est ≥ exact always, equal when no cell collides; the
    * sketch (d×w counters) broadcasts into the probe join. */
  private val qCmFreq: Q = (spark, dir) => {
    val ev = Tables.fanOut(Tables.events(spark, dir))
    val sk = operators.Sketch.cmSketch(ev, col("user_id"), cmDepth, cmWidth)
    val probes = ev.select(col("user_id")).distinct()
      .filter(col("user_id") % 5 === 0)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
    operators.Sketch.cmEstimate(sk, probes, "user_id", cmDepth, cmWidth)
      .join(exact, Seq("user_id"))
      .select(col("user_id").as("user_key"), col("est"), col("n_exact"))
  }

  private val bpeRounds = 6

  /** BPE merge learning over the corpus word histogram: 6 rounds, each
    * one pair-count aggregation over the (distinct word, count) table
    * and a deterministic top-1. The oracle unrolls the same recurrence
    * in SQL — same wrapped-symbol encoding, same left-greedy literal
    * replace, same (count desc, pair asc) tiebreak — so every learned
    * merge is value-checked, not just the final vocabulary. */
  private val qTBpe: Q = (spark, dir) => {
    val words = Tables.fanOut(Tables.documents(spark, dir))
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    operators.Bpe.learnMerges(spark, words, "word", "n", bpeRounds)
  }

  /** BPE ENCODE under the corpus' own learned merges — the tokenizer's
    * apply half: the merge table (bounded, one row per merge) collects
    * to literals and the whole corpus tokenizes in one codegen'd
    * projection ([[operators.Bpe.encode]]) — no joins, no shuffles.
    * Output keeps rows narrow at scale: token count + an md5 over the
    * ordered token stream instead of the token array itself. */
  private val qTBpeEncode: Q = (spark, dir) => {
    val words = Tables.fanOut(Tables.documents(spark, dir))
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val merges = operators.Bpe.learnMerges(spark, words, "word", "n", bpeRounds)
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"),
        operators.Bpe.encode(col("text"), merges).as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast(LongType).as("n_bpe_tokens"),
        md5(array_join(col("__toks"), " ")).as("tokens_md5"))
  }

  /** Tokenizer-TRUE window packing — the terminal LM-data composition:
    * BPE-encode every document under the corpus' own learned merges,
    * then pack the RESULTING token counts into fixed 512-token training
    * windows per source (the mixture E2E packs whitespace counts; a
    * real loader packs tokenizer output). Glue between two
    * oracle-proven stages ([[qTBpeEncode]], `q_pack_windows`): the
    * merge table collects to literals (bounded — one row per learned
    * merge), encode is a codegen'd projection, so the ONLY corpus
    * exchange in the final plan is the pack window's per-source
    * partitioning (plan-pinned in PlanSpec). */
  private val qTokenizePack: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val words = docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val merges = operators.Bpe.learnMerges(spark, words, "word", "n", bpeRounds)
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    Curation.packWindows(
      docs.select(col("source"), col("doc_id"),
        size(operators.Bpe.encode(col("text"), merges)).cast(LongType).as("__n_bpe")),
      "source", "doc_id", col("__n_bpe"), CurationQueries.packWindowTokens)
      .select(col("source"), col("doc_id"), col("n_tok"), col("window"),
        col("doc_tok_start"), col("win_tok_start"), col("seg_tokens"))
  }

  /** Tokenizer fertility by language — tokens-per-word and
    * chars-per-token under the corpus' own learned BPE merges, the
    * standard "how well does this tokenizer serve each language" eval
    * (a high-fertility language pays more sequence length per word).
    * Same bounded-merge-literal encode as [[qTBpeEncode]]; the per-doc
    * token counts reduce map-side into one tiny per-lang aggregate, so
    * the whole eval is one corpus scan and one |langs|-row exchange.
    * Ratios are integer-sum quotients rounded at 4 — engine-exact. */
  private val qTokFertility: Q = (spark, dir) => {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val words = docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val merges = operators.Bpe.learnMerges(spark, words, "word", "n", bpeRounds)
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    docs
      .select(col("lang"),
        size(operators.Bpe.encode(col("text"), merges)).cast(LongType).as("__bpe"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .cast(LongType).as("__w"),
        length(array_join(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0)), "")).cast(LongType).as("__c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__bpe")).as("n_bpe"),
        sum(col("__w")).as("n_words"),
        sum(col("__c")).as("n_chars"),
        round(sum(col("__bpe")).cast(DoubleType)
          / greatest(sum(col("__w")), lit(1L)), 4).as("fertility"),
        round(sum(col("__c")).cast(DoubleType)
          / greatest(sum(col("__bpe")), lit(1L)), 4).as("chars_per_tok"))
  }

  def queries: Map[String, Q] = Map(
    "q_t_bpe"          -> qTBpe,
    "q_t_bpe_encode"   -> qTBpeEncode,
    "q_tokenize_pack"  -> qTokenizePack,
    "q_tok_fertility"  -> qTokFertility,
    "q_cm_freq"        -> qCmFreq,
    "q_drift_psi"      -> qDriftPsi,
    "q_dq_report"      -> qDqReport,
    "q_rollup"         -> qRollup,
    "q_cube"           -> qCube,
    "q_grouping_sets"  -> qGroupingSets,
    "q_embed_quantize" -> qEmbedQuantize,
    "q_heavy_hitters"  -> qHeavyHitters,
    "q_table_diff"     -> qTableDiff,
    "q_dup_spans"      -> qDupSpans,
    "q_dup_remove"     -> qDupRemove,
    "q_len_hist"       -> qLenHist,
    "q_line_dedup"     -> qLineDedup,
    "q_bloom_decontam" -> qBloomDecontam,
    "q_t_vocab"        -> qTVocab,
    "q_zorder"         -> qZorder,
    "q_zorder_nd"      -> qZorderNd,
    "q_scd2"           -> qScd2,
    "q_quantiles"      -> qQuantiles,
    "q_st10_incremental" -> qSt10Incremental,
    "q_st15_compacted" -> qSt15Compacted,
    "q_st17_time_travel" -> qSt17TimeTravel,
    "q_t_strip"        -> qTStrip,
    "q_tfidf"          -> qTfidf,
    "q_winsorize"      -> qWinsorize,
    "q_split"          -> qSplit
  )

  /** DuckDB mirror of [[operators.Layout.zValueN]]: bit j of dim i at
    * position j*N+i, generated as the same shift/mask arithmetic. */
  private def zNdSql(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    dims.zipWithIndex.flatMap { case (d, i) =>
      (0 until bits).map(j => s"((($d >> $j) & 1) << ${j * n + i})")
    }.mkString(" | ")
  }

  /** DuckDB mirror of [[operators.Layout.spread16]] — same 4
    * shift/mask rounds as SQL arithmetic. */
  private def spreadSql(e: String): String = {
    val a = s"($e & 65535)"
    val b1 = s"(($a | ($a << 8)) & 16711935)"
    val b2 = s"(($b1 | ($b1 << 4)) & 252645135)"
    val b3 = s"(($b2 | ($b2 << 2)) & 858993459)"
    s"(($b3 | ($b3 << 1)) & 1431655765)"
  }

  /** DuckDB mirror of [[operators.Bpe.learnMerges]]: the same wrapped
    * `<sym>` encoding, pair extraction via 1-based list indexing, the
    * same (cnt desc, x asc, y asc) top-1, and the same left-to-right
    * literal replace, unrolled one CTE trio per round. */
  private def bpeSql(rounds: Int): String = {
    val sel = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, x AS left_sym, y AS right_sym, cnt AS freq FROM m$r")
      .mkString("\n         UNION ALL\n         ")
    s"${bpeCtesSql(rounds)}\n$sel"
  }

  /** The trainer CTE prefix alone (`WITH w0..wR, m1..mR` — no final
    * select) for queries composing ON the learned merges. */
  private def bpeCtesSql(rounds: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (
         SELECT '<' || array_to_string(regexp_extract_all(word, '.'), '><') || '>' AS s, n
         FROM (SELECT word, count(*) AS n
               FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
                     FROM documents)
               GROUP BY word))"""
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
           SELECT x, y, CAST(sum(n) AS BIGINT) AS cnt FROM (
             SELECT l[i] AS x, l[i + 1] AS y, n FROM (
               SELECT regexp_extract_all(s, '<([^>]*)>', 1) AS l, n FROM w${r - 1}),
               unnest(range(1, len(l))) AS u(i))
           GROUP BY x, y),
         m$r AS MATERIALIZED (SELECT x, y, cnt FROM p$r ORDER BY cnt DESC, x ASC, y ASC LIMIT 1),
         w$r AS MATERIALIZED (
           SELECT replace(s,
             '<' || (SELECT x FROM m$r) || '><' || (SELECT y FROM m$r) || '>',
             '<' || (SELECT x FROM m$r) || (SELECT y FROM m$r) || '>') AS s, n
           FROM w${r - 1})"""
    }
    s"WITH $w0,\n${perRound.mkString(",\n")}"
  }

  /** The nested-replace chain applying merges m1..mR (in rank order,
    * innermost first — the same left-greedy order the trainer used) to
    * SQL expression `inner` — the DuckDB mirror of
    * [[operators.Bpe.encode]]'s merge loop. */
  private def bpeApplySql(rounds: Int, inner: String): String =
    (1 to rounds).foldLeft(inner)((acc, r) =>
      s"replace($acc, '<' || (SELECT x FROM m$r) || '><' || (SELECT y FROM m$r) || '>', " +
        s"'<' || (SELECT x FROM m$r) || (SELECT y FROM m$r) || '>')")

  /** CTEs wrapping each document's words (`<c><h><a><r>`-encoded,
    * '|'-joined so merges never cross word boundaries) and applying the
    * learned merges — shared by the encode and tokenize-pack oracles. */
  private def bpeDocCtesSql(rounds: Int): String =
    s"""${bpeCtesSql(rounds)},
       docw AS (SELECT doc_id, source, array_to_string(list_transform(
           regexp_extract_all(lower(text), '[a-z]+'),
           w -> '<' || array_to_string(regexp_extract_all(w, '.'), '><') || '>'),
           '|') AS s FROM documents),
       applied AS (SELECT doc_id, source, ${bpeApplySql(rounds, "s")} AS s FROM docw)"""

  // =====================================================================
  // Oracle SQL (DuckDB 1.0)
  // =====================================================================

  def oracleSql: Map[String, String] = Map(
    "q_t_bpe" -> bpeSql(bpeRounds),
    "q_t_bpe_encode" ->
      s"""${bpeDocCtesSql(bpeRounds)}
         SELECT doc_id,
           CAST(len(regexp_extract_all(s, '<([^>]*)>', 1)) AS BIGINT) AS n_bpe_tokens,
           md5(array_to_string(regexp_extract_all(s, '<([^>]*)>', 1), ' ')) AS tokens_md5
         FROM applied""",
    "q_tok_fertility" ->
      s"""${bpeDocCtesSql(bpeRounds)},
         enc AS (SELECT doc_id,
             CAST(len(regexp_extract_all(s, '<([^>]*)>', 1)) AS BIGINT) AS n_bpe
           FROM applied),
         w AS (SELECT doc_id, lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_words,
             CAST(length(array_to_string(regexp_extract_all(lower(text), '[a-z]+'), ''))
               AS BIGINT) AS n_chars
           FROM documents)
         SELECT w.lang, count(*) AS n_docs,
           CAST(sum(e.n_bpe) AS BIGINT) AS n_bpe,
           CAST(sum(w.n_words) AS BIGINT) AS n_words,
           CAST(sum(w.n_chars) AS BIGINT) AS n_chars,
           round(CAST(sum(e.n_bpe) AS DOUBLE) / greatest(sum(w.n_words), 1), 4) AS fertility,
           round(CAST(sum(w.n_chars) AS DOUBLE) / greatest(sum(e.n_bpe), 1), 4) AS chars_per_tok
         FROM w JOIN enc e USING (doc_id)
         GROUP BY 1""",
    "q_tokenize_pack" -> {
      val L = CurationQueries.packWindowTokens
      s"""${bpeDocCtesSql(bpeRounds)},
         t AS (SELECT doc_id, source,
             CAST(len(regexp_extract_all(s, '<([^>]*)>', 1)) AS BIGINT) AS n_tok
           FROM applied),
         p AS (SELECT doc_id, source, n_tok,
             CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
           FROM t WHERE n_tok > 0),
         e AS (SELECT doc_id, source, n_tok, prev,
             unnest(range(prev // $L, (prev + n_tok - 1) // $L + 1)) AS win
           FROM p)
         SELECT source, doc_id, n_tok, win AS window,
           greatest(0, win * $L - prev) AS doc_tok_start,
           greatest(prev, win * $L) - win * $L AS win_tok_start,
           least(n_tok, (win + 1) * $L - prev)
             - greatest(0, win * $L - prev) AS seg_tokens
         FROM e"""
    },
    "q_embed_quantize" ->
      """WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
           FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
         mx AS (SELECT vec_id, greatest(max(abs(v)), 1e-12) AS amax
                FROM ex GROUP BY vec_id)
         SELECT ex.vec_id, CAST(i - 1 AS BIGINT) AS pos,
           CAST(least(greatest(floor(v * 127.0 / amax + 0.5), -127.0), 127.0) AS BIGINT) AS qv
         FROM ex JOIN mx ON ex.vec_id = mx.vec_id""",
    "q_heavy_hitters" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS user_key, count(*) AS n
           FROM events GROUP BY 1)
         SELECT user_key, n,
           CAST(row_number() OVER (ORDER BY n DESC, user_key ASC) AS BIGINT) AS rank
         FROM c ORDER BY n DESC, user_key ASC LIMIT 10""",
    "q_table_diff" ->
      """WITH b AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
         a AS (SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS price
               FROM orders WHERE o_orderkey % 13 <> 0
               UNION ALL
               SELECT o_orderkey + 10000000, o_totalprice FROM orders
               WHERE o_orderkey % 1000 = 1)
         SELECT coalesce(b.k, a.k) AS k, b.price AS old_price, a.price AS new_price,
           CASE WHEN b.k IS NULL THEN 'inserted'
                WHEN a.k IS NULL THEN 'deleted'
                WHEN b.price IS DISTINCT FROM a.price THEN 'changed'
                ELSE 'unchanged' END AS status
         FROM b FULL OUTER JOIN a ON b.k = a.k""",
    "q_dup_spans" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
         sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
                FROM tk, unnest(range(1, greatest(len(t)-6, 1))) AS u(i)
                WHERE array_to_string(t[i:i+7], ' ') <> '')
         SELECT md5(shingle) AS span_md5, count(*) AS n_docs
         FROM sh GROUP BY shingle HAVING count(*) >= 2""",
    "q_dup_remove" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
         tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
                 FROM t, unnest(range(1, len(toks) + 1)) AS u(i)),
         sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS st,
                       md5(array_to_string(toks[i:i+7], ' ')) AS span_md5
                FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
                WHERE len(toks) >= 8),
         dup AS (SELECT span_md5 FROM (
                   SELECT span_md5, count(DISTINCT doc_id) AS nd FROM sp GROUP BY 1)
                 WHERE nd >= 2),
         cov AS (SELECT DISTINCT s.doc_id, s.st + j AS pos
                 FROM sp s JOIN dup d ON s.span_md5 = d.span_md5,
                      unnest(range(0, 8)) AS g(j)),
         surv AS (SELECT k.doc_id, k.pos, k.tok
                  FROM tok k LEFT JOIN cov
                    ON k.doc_id = cov.doc_id AND k.pos = cov.pos
                  WHERE cov.pos IS NULL),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                        string_agg(tok, ' ' ORDER BY pos) AS clean_text
                 FROM surv GROUP BY doc_id)
         SELECT t.doc_id, coalesce(a.n_kept, 0) AS n_kept,
                CAST(len(t.toks) AS BIGINT) - coalesce(a.n_kept, 0) AS n_removed,
                coalesce(a.clean_text, '') AS clean_text
         FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id""",
    "q_len_hist" ->
      """WITH t AS (SELECT source,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
         FROM documents)
         SELECT source, CAST(n_tok // 32 AS BIGINT) AS bucket,
           count(*) AS n_docs, min(n_tok) AS min_tok, max(n_tok) AS max_tok
         FROM t GROUP BY source, n_tok // 32""",
    // The lines relation is rebuilt directly (header / 10-token chunks /
    // footer with the same positions the Spark side gets from splitting
    // the synthesized text), then the same doc-frequency gate and
    // in-order reassembly.
    "q_line_dedup" ->
      s"""WITH tk AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS t FROM documents),
          chl AS (SELECT doc_id, CAST(1 + s // $lineChunk AS BIGINT) AS pos,
                    array_to_string(t[s+1:s+$lineChunk], ' ') AS line
                  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t), 1), $lineChunk)) AS s
                        FROM tk)),
          npos AS (SELECT doc_id, max(pos) AS mx FROM chl GROUP BY doc_id),
          lines AS (
            SELECT doc_id, CAST(0 AS BIGINT) AS pos, '=== ' || source || ' header ===' AS line FROM tk
            UNION ALL SELECT doc_id, pos, line FROM chl
            UNION ALL SELECT doc_id, mx + 1 AS pos, 'subscribe to our newsletter' AS line FROM npos),
          boiler AS (SELECT line FROM lines WHERE line <> ''
                     GROUP BY line HAVING count(DISTINCT doc_id) >= $lineMaxDf),
          kept AS (SELECT l.doc_id, l.pos, l.line
                   FROM lines l LEFT JOIN boiler b ON l.line = b.line
                   WHERE b.line IS NULL),
          reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                    count(*) AS n_kept
                  FROM kept GROUP BY doc_id)
          SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
            CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
          FROM documents d LEFT JOIN reb r ON d.doc_id = r.doc_id""",
    "q_bloom_decontam" ->
      s"""SELECT d.doc_id, d.source FROM documents d
          WHERE d.doc_id % $benchMod <> $benchRem
            AND NOT EXISTS (SELECT 1 FROM documents b
                            WHERE b.doc_id % $benchMod = $benchRem
                              AND md5(b.text) = md5(d.text))""",
    "q_t_vocab" ->
      s"""WITH tok AS (SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents),
          cnt AS (SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token)
          SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS rank
          FROM cnt ORDER BY n DESC, token ASC LIMIT $vocabK""",
    "q_zorder" ->
      s"""SELECT o_orderkey,
          CAST(${spreadSql("(o_custkey % 65536)")}
            | (${spreadSql("(o_orderkey % 65536)")} << 1) AS BIGINT) AS zval
          FROM orders""",
    "q_zorder_nd" ->
      s"""SELECT o_orderkey,
          CAST(${zNdSql(Seq(
            "(o_custkey % 2097152)",
            "(o_orderkey % 2097152)",
            "(date_diff('day', DATE '1970-01-01', o_orderdate) % 2097152)"), 21)}
            AS BIGINT) AS zval
          FROM orders""",
    "q_scd2" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "q_quantiles" ->
      """SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           count(*) AS n
         FROM orders GROUP BY o_orderpriority""",
    "q_st10_incremental" ->
      """WITH u AS (
           SELECT o_orderkey AS k, o_totalprice AS price, 1 AS version FROM orders
           UNION ALL
           SELECT o_orderkey, o_totalprice * 2, 2 FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_totalprice, 2 FROM orders WHERE o_orderkey % 1000 = 1
           UNION ALL
           SELECT o_orderkey, o_totalprice * 3, 3 FROM orders WHERE o_orderkey % 7 = 0)
         SELECT k, price, CAST(version AS BIGINT) AS version FROM (
           SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
           FROM u) WHERE rn = 1""",
    "q_st15_compacted" ->
      """WITH u AS (
           SELECT o_orderkey AS k, o_totalprice AS price, 1 AS version FROM orders
           UNION ALL
           SELECT o_orderkey, o_totalprice * 2, 2 FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice * 3, 3 FROM orders WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice * 4, 4 FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice * 5, 5 FROM orders WHERE o_orderkey % 3 = 0)
         SELECT k, price, CAST(version AS BIGINT) AS version FROM (
           SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
           FROM u) WHERE rn = 1""",
    "q_st17_time_travel" ->
      """WITH u AS (
           SELECT o_orderkey AS k, o_totalprice AS price, 1 AS version FROM orders
           UNION ALL
           SELECT o_orderkey, o_totalprice * 2, 2 FROM orders WHERE o_orderkey % 10 = 0)
         SELECT k, price, CAST(version AS BIGINT) AS version FROM (
           SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
           FROM u) WHERE rn = 1""",
    "q_t_strip" ->
      """SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             '<html><p class="x">' || substring(text, 1, 60)
               || '</p> **bold** [anchor text](http://ex.com/a?b=1) ## heading <br/>tail',
             '<[^>]*>', ' ', 'g'),
             '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
             '[*_`#]+', '', 'g'),
             '\s+', ' ', 'g')) AS clean
         FROM documents""",
    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> '' GROUP BY doc_id, token),
         df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         n AS (SELECT count(*) AS n FROM documents)
         SELECT tf.doc_id, tf.token, tf.tf, df.df,
           round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf
         FROM tf JOIN df ON tf.token = df.token, n""",
    "q_winsorize" ->
      """WITH b AS (SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.05), 4) AS lo,
           round(quantile_cont(o_totalprice, 0.95), 4) AS hi
         FROM orders GROUP BY o_orderpriority)
         SELECT o_orderkey, o.o_orderpriority,
           least(greatest(o_totalprice, b.lo), b.hi) AS clipped
         FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority""",
    "q_cm_freq" -> {
      // coalesce mirrors Sketch.cmKey's null sentinel: a NULL key must hash
      // under '' in BOTH engines, not null out the '||' chain (which would
      // silently drop the row from the sketch while Spark counts it)
      def cell(keyExpr: String) =
        s"CAST('0x' || substring(md5('cm' || CAST(rs.r AS VARCHAR) || ':' || coalesce(CAST($keyExpr AS VARCHAR), '')), 1, 15) AS BIGINT) % $cmWidth"
      s"""WITH rs AS (SELECT unnest(range(0, $cmDepth)) AS r),
          sk AS (SELECT rs.r AS r, ${cell("user_id")} AS c, count(*) AS cnt
                 FROM events, rs GROUP BY 1, 2),
          probes AS (SELECT DISTINCT user_id FROM events WHERE user_id % 5 = 0),
          cells AS (SELECT p.user_id, rs.r AS r, ${cell("p.user_id")} AS c
                    FROM probes p, rs),
          est AS (SELECT cells.user_id, min(coalesce(sk.cnt, 0)) AS est
                  FROM cells LEFT JOIN sk ON cells.r = sk.r AND cells.c = sk.c
                  GROUP BY 1),
          exact AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1)
          SELECT est.user_id AS user_key, CAST(est.est AS BIGINT) AS est, exact.n_exact
          FROM est JOIN exact ON est.user_id = exact.user_id"""
    },
    "q_drift_psi" ->
      """WITH rc AS (SELECT CAST(least(19, greatest(0, floor(o_totalprice / 30000.0))) AS BIGINT) AS bucket,
                     count(*) AS c
           FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1),
         cc AS (SELECT CAST(least(19, greatest(0, floor(o_totalprice / 30000.0))) AS BIGINT) AS bucket,
                     count(*) AS c
           FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1),
         spine AS (SELECT unnest(range(0, 20)) AS bucket),
         j AS (SELECT s.bucket, coalesce(rc.c, 0) AS n_ref, coalesce(cc.c, 0) AS n_cur
               FROM spine s LEFT JOIN rc ON s.bucket = rc.bucket
                            LEFT JOIN cc ON s.bucket = cc.bucket),
         t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr, CAST(sum(n_cur) AS BIGINT) AS tc FROM j),
         terms AS (SELECT bucket, n_ref, n_cur,
             CAST(floor(((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 20 AS DOUBLE)
                          - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 20 AS DOUBLE))
                         * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 20 AS DOUBLE))
                              / (CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 20 AS DOUBLE))))
                        * 1000000000.0 + 0.5) AS BIGINT) AS qt
           FROM j, t)
         SELECT bucket, n_ref, n_cur, qt / 1000000000.0 AS psi_term,
                (SELECT CAST(sum(qt) AS BIGINT) FROM terms) / 1000000000.0 AS psi_total
         FROM terms""",
    "q_dq_report" ->
      (Seq(
        "totalprice_positive" -> "o_totalprice > 0",
        "status_in_domain"    -> "o_orderstatus IN ('F', 'O', 'P')",
        "date_in_range"       -> ("o_orderdate BETWEEN TIMESTAMP '1992-01-01 00:00:00' " +
                                  "AND TIMESTAMP '1998-12-31 00:00:00'"),
        "priority_in_domain"  -> ("o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', " +
                                  "'4-NOT SPECIFIED', '5-LOW')")).map { case (name, pred) =>
        s"""SELECT '$name' AS rule,
             CAST(sum(CASE WHEN NOT coalesce($pred, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             CAST(sum(CASE WHEN NOT coalesce($pred, FALSE) THEN 1 ELSE 0 END) AS BIGINT) = 0 AS passed
           FROM orders"""
      } :+
        """SELECT 'orderkey_unique' AS rule,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
             count(*) = count(DISTINCT o_orderkey) AS passed
           FROM orders""").mkString(" UNION ALL "),
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) * 2 +
             CAST(GROUPING(l_linestatus) AS BIGINT) AS gid,
           count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) * 2 +
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) * 2 +
             CAST(GROUPING(l_linestatus) AS BIGINT) AS gid,
           count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q_split" ->
      s"""SELECT doc_id, source, $splitCaseSql AS split
         FROM documents"""
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Jdbc
import graft.operators.ImagesDoc

/** IO-adapter and image-pipeline parity queries: JDBC round-trip (S2/S6
  * over embedded Derby), F24 style split, and the E3 flat image
  * classification. */
object IoQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** S2/S6 — write a filtered projection into an embedded Derby table
    * (batched append), read it back through the JDBC source with a
    * pushed-down predicate. The oracle computes the same relation from
    * the parquet directly, so a pass proves the sink+source round-trip
    * is lossless and the pushdown filter semantics match.
    *
    * One fixed in-memory DB, dropped and recreated per invocation —
    * in-memory Derby DBs live until JVM exit, so a fresh name per call
    * (warmup + timed bench = 2 calls) would pin a table copy per
    * invocation on the driver heap. The drop can't go in a `finally`:
    * the returned read is lazy and executes after this builder returns. */
  private val qS2JdbcRoundtrip: Q = (spark, dir) => {
    val db = "jdbc:derby:memory:graftrt"
    try java.sql.DriverManager.getConnection(s"$db;drop=true")
    catch { case _: java.sql.SQLException => () } // 08006 on drop, XJ004 if absent
    val subset = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    Jdbc.append(subset, s"$db;create=true", "ORDERS_F")
    Jdbc.read(spark, db, "ORDERS_F")
      .filter(col("o_totalprice") > 200000.0)
  }

  /** S3 — partitioned parallel JDBC read: numPartitions concurrent range
    * scans on the key column (the 100 TB read path for big JDBC tables;
    * the reference's server-side cursor, RealEstateImages.py:222-227).
    * Bounds only set the stride — rows outside land in the edge
    * partitions — so a generous fixed upper bound is correct at any SF.
    * Oracle = the same relation from parquet: a pass proves the range
    * scans cover the table exactly once. */
  private val qS3JdbcPartitioned: Q = (spark, dir) => {
    val db = "jdbc:derby:memory:graftpart"
    try java.sql.DriverManager.getConnection(s"$db;drop=true")
    catch { case _: java.sql.SQLException => () }
    val subset = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    Jdbc.append(subset, s"$db;create=true", "ORDERS_P")
    Jdbc.readPartitioned(spark, db, "ORDERS_P", "O_ORDERKEY",
        lowerBound = 1L, upperBound = 1L << 20, numPartitions = 8)
      .filter(col("o_totalprice") > 150000.0)
      .select(col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_TOTALPRICE").as("o_totalprice"))
  }

  /** S8/E3 — nested-document sink round-trip with the reference's FULL
    * document field set {MLSNum, Date, Address, Town, State, Zipcode,
    * CountyCode, BlockID, LotID, Condition, Prop_Style, Images}
    * (RealEstateImages.py:603-687): flat image rows + synthesized
    * listing fields → assembleDocuments → JSON document sink → read
    * back → flatten. The oracle computes the flat relation directly, so
    * a pass proves the nested rebuild carries every listing field and
    * the document codec is lossless — the Mongo insert_one analog under
    * the correctness gate. */
  private val listingFields = Seq("Date", "Address", "Town", "State",
    "Zipcode", "CountyCode", "BlockID", "LotID", "Prop_Style")

  private val qS8DocRoundtrip: Q = (spark, dir) => {
    val kk = col("mlsnum").cast(LongType)
    val flat = qE3ImageClassify(spark, dir)
      .select(col("mlsnum").as("MLSNum"), lit("Unknown").as("Condition"),
        date_format(date_add(lit("2024-01-01").cast(DateType),
          (kk % 365).cast(IntegerType)), "MM/dd/yyyy").as("Date"),
        concat(col("mlsnum"), lit(" OAK AVE")).as("Address"),
        concat(lit("TOWN"), (kk % 25).cast(StringType)).as("Town"),
        lit("NJ").as("State"),
        lpad(((kk * 7) % 100000).cast(StringType), 5, "0").as("Zipcode"),
        lpad((kk % 21).cast(StringType), 2, "0").as("CountyCode"),
        concat(lit("B"), (kk % 900).cast(StringType)).as("BlockID"),
        concat(lit("L"), (kk % 50).cast(StringType)).as("LotID"),
        when(kk % 3 === 0, lit("Colonial")).when(kk % 3 === 1, lit("Ranch"))
          .otherwise(lit("MultiFam")).as("Prop_Style"),
        col("section"), col("url"), col("directory"))
    val docs = ImagesDoc.assembleDocuments(flat, listingFields)
    val path = graft.io.TempDirs.registered("graft-docs").toString
    ImagesDoc.writeDocuments(docs, path)
    val schema = StructType(
      Seq(StructField("MLSNum", StringType), StructField("Condition", StringType)) ++
      listingFields.map(StructField(_, StringType)) :+
      StructField("Images", MapType(StringType, ArrayType(StructType(Seq(
        StructField("Condition", StringType),
        StructField("URL", StringType),
        StructField("Directory", StringType)))))))
    val carried = Seq("MLSNum") ++ listingFields
    spark.read.schema(schema).json(path)
      .select(carried.map(col) :+ explode(col("Images")).as(Seq("section", "imgs")): _*)
      .select(carried.map(col) ++ Seq(col("section"), explode(col("imgs")).as("img")): _*)
      .select(col("MLSNum").as("mlsnum") +:
        listingFields.map(f => col(f).as(f.toLowerCase)) :+
        col("section") :+ col("img.URL").as("url") :+
        col("img.Directory").as("directory"): _*)
  }

  /** S6 — JDBC sink with quarantine: rows failing validation land in a
    * parquet quarantine path instead of poisoning a JDBC batch (the
    * reference's per-row DataError salvage, Kafka_GSMLSConsumer.py:
    * 1244-1254, made deterministic). The query reads back the sunk
    * table; the oracle is the valid subset — a pass proves the split
    * kept exactly the valid rows and the sink round-trip is lossless.
    * Note the quarantine dir is written unconditionally (empty parquet
    * when all rows are valid): check the returned quarantined COUNT,
    * not the path's existence, to decide whether anything was bad. */
  private val qS6Quarantine: Q = (spark, dir) => {
    val db = "jdbc:derby:memory:graftq6"
    try java.sql.DriverManager.getConnection(s"$db;drop=true")
    catch { case _: java.sql.SQLException => () }
    val src = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus"))
    val quarantine = graft.io.TempDirs.registered("graft-quarantine").toString
    Jdbc.writeWithQuarantine(src,
      col("o_totalprice") > 50000.0 && col("o_orderstatus") =!= "P",
      s"$db;create=true", "ORDERS_Q", quarantine)
    Jdbc.read(spark, db, "ORDERS_Q")
      .select(col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_TOTALPRICE").as("o_totalprice"),
        col("O_ORDERSTATUS").as("o_orderstatus"))
  }

  /** S7 — parquet checkpoint save/load as the engine API (the
    * reference's xlsx snapshots); oracle = identity projection. */
  private val qS7Checkpoint: Q = (spark, dir) => {
    val ck = graft.io.TempDirs.registered("graft-q-s7").toString
    graft.io.Checkpoint.save(
      Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
      ck, "cust")
    graft.io.Checkpoint.load(spark, ck, "cust")
  }

  /** F24 — style split/priority with the reference's exact quirks. */
  private val qF24StyleSplit: Q = (spark, dir) => {
    val k = col("p_partkey")
    val styled = Tables.part(spark, dir).select(
      k.as("p_partkey"),
      when(k % 9 === 0, lit("Duplex,TwoStory"))
        .when(k % 9 === 1, lit("Triplex,Cluster"))
        .when(k % 9 === 2, lit("OneStory,FourPlex"))
        .when(k % 9 === 3, lit("TwoStory,FixrUppr"))
        .when(k % 9 === 4, lit("SeeRem"))
        .when(k % 9 === 5, lit("FixrUppr"))
        .when(k % 9 === 6, lit("Resident"))
        .when(k % 9 === 7, lit(",Cluster"))
        .otherwise(lit("Colonial")).as("style_raw"))
    ImagesDoc.applyStyleSplit(styled, "style_raw")
      .select(col("p_partkey"), col("style_raw"),
        col("Prop_Style").as("prop_style"), col("Condition").as("condition"))
  }

  /** E3 — IMAGES dict-string parse → explode → caption classification →
    * deterministic path synthesis, flat view (the nested map rebuild is
    * exercised in ImagesDocSpec; maps don't hash portably). */
  private val qE3ImageClassify: Q = (spark, dir) => {
    val k = col("p_partkey")
    val capA = when(k % 5 === 0, lit("Kitchen view"))
      .when(k % 5 === 1, lit("Master Bathroom"))
      .when(k % 5 === 2, lit("Front of house"))
      .when(k % 5 === 3, lit("floor plan"))
      .otherwise(lit("mystery room"))
    // k%4==3 maps to 'Other' like cap_a's k%5==4, so rows with k ≡ 19
    // (mod 20) produce two images in one section and exercise seq=2.
    val capB = when(k % 4 === 0, lit("Dining area"))
      .when(k % 4 === 1, lit("Finished basement"))
      .when(k % 4 === 2, lit("Two car garage"))
      .otherwise(lit("odd corner space"))
    val withImages = Tables.part(spark, dir).select(
      k.cast(StringType).as("mls"),
      lit("Unknown").as("cond"),
      concat(lit("{'"), capA, lit("': 'http://img/"), k.cast(StringType), lit("a.png', '"),
             capB, lit("': 'http://img/"), k.cast(StringType), lit("b.png'}")).as("IMAGES"))
    ImagesDoc.explodeImages(withImages, "mls", "IMAGES", "cond", lit("imgs"))
      .select(col("MLSNum").as("mlsnum"), col("caption"), col("url"),
        col("section"), col("seq").cast(LongType).as("seq"), col("directory"))
  }

  /** Multimodal byte-level ops over a media-framed documents table:
    * payload size, portable content key, frame-sample count. The decode
    * stub itself is exercised in MultimodalSpec (no SQL surface). */
  private val qMmMedia: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.documents(spark, dir),
      col("doc_id"), col("text"), lit("text/plain"), col("source"),
      col("n_chars").cast(LongType))
    media.select(
      col("media_id"),
      graft.operators.Multimodal.byteSize(col("content")).cast(LongType).as("n_bytes"),
      graft.operators.Multimodal.contentKey(col("content")).as("content_key"),
      size(graft.operators.Multimodal.frameOffsets(col("meta.duration_ms"), 50))
        .cast(LongType).as("n_frames"))
  }

  /** Multimodal feature extraction: opaque payload → 4 deterministic
    * feature channels + the vector's L2 norm — the binary→embedding
    * bridge (columnar, shuffle-free), proven value-exact against the
    * oracle computing the same salted-hash channels. */
  private val qMmFeatures: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.fanOut(Tables.documents(spark, dir)),
      col("doc_id"), col("text"), lit("text/plain"), col("source"),
      col("n_chars").cast(LongType))
    val feats = (0 until 4).map(j =>
      graft.operators.Multimodal.hashFeature(col("content"), j).as(s"f$j"))
    media.select(
      (col("media_id") +: feats :+
        round(sqrt((0 until 4).map(j =>
          graft.operators.Multimodal.hashFeature(col("content"), j))
          .map(c => c * c).reduce(_ + _)), 6).as("feat_norm")): _*)
  }

  /** Distributed media decode through the real partition-iterator
    * plumbing (the JVM analog of mapInPandas) with the deterministic
    * stub codec. The stub derives fake dimensions from payload bytes
    * (first and middle byte, `64 + (b & 0x7f)`) — byte arithmetic DuckDB
    * mirrors over hex(encode(text)), so even the mapPartitions path sits
    * under the value-level oracle. */
  private val qMmDecode: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.documents(spark, dir),
      col("doc_id"), col("text"), lit("text/plain"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.decode(spark, media,
        spark.sparkContext.defaultParallelism)
      .select(col("mediaId").as("media_id"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("ok"))
  }

  /** Distributed resize through the partition-iterator plumbing: real
    * images re-raster to the target under a nearest-neighbor transform
    * (witnessed on real PNG bytes in MultimodalSpec); this corpus's
    * text payloads take the deterministic fallback (decode-fallback
    * input dims, one synthetic byte per output pixel), which the
    * oracle mirrors — schema, partitioning and batch shape are the
    * production path either way. */
  private val qMmResize: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.documents(spark, dir),
      col("doc_id"), col("text"), lit("image/png"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.resize(spark, media, targetW = 96,
        targetH = 64, spark.sparkContext.defaultParallelism)
      .select(col("mediaId").as("media_id"),
        col("inWidth").cast(LongType).as("in_width"),
        col("inHeight").cast(LongType).as("in_height"),
        col("outWidth").cast(LongType).as("out_width"),
        col("outHeight").cast(LongType).as("out_height"),
        col("outBytes").as("out_bytes"), col("ok"))
  }

  /** Distributed audio decode through the partition-iterator plumbing:
    * WAV payloads get REAL header-parsed channel/rate/duration
    * (witnessed on synthesized RIFF bytes in MultimodalSpec); this
    * corpus's text payloads take the deterministic byte fallback
    * (first byte → channels, middle byte → rate, length → duration),
    * which DuckDB mirrors over hex(encode(text)) — the full
    * binary→audio-metadata path sits under the value-level oracle. */
  private val qMmAudio: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.documents(spark, dir),
      col("doc_id"), col("text"), lit("audio/wav"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.decodeAudio(spark, media,
        spark.sparkContext.defaultParallelism)
      .select(col("mediaId").as("media_id"),
        col("channels").cast(LongType).as("channels"),
        col("sampleRateHz").cast(LongType).as("sample_rate_hz"),
        col("durationMs").as("duration_ms"),
        col("ok"))
  }

  /** PCM waveform statistics, the decode step itself under the oracle:
    * non-WAV payloads take the SAME s16le sample arithmetic over their
    * raw bytes that a 16-bit WAV's data chunk gets, so the DuckDB
    * mirror re-derives every sample from hex and checks n/peak/RMS/
    * zero-crossings exactly — not a byte-peek fake. The real-WAV
    * header-skip path is witnessed on authored RIFF bytes in
    * MultimodalSpec. */
  private val qMmAudioStats: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.documents(spark, dir),
      col("doc_id"), col("text"), lit("audio/wav"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.audioStats(spark, media,
        spark.sparkContext.defaultParallelism)
      .select(col("mediaId").as("media_id"),
        col("nSamples").as("n_samples"),
        col("peakAbs").as("peak_abs"),
        col("rmsMilli").as("rms_milli"),
        col("zeroCrossings").as("zero_crossings"),
        col("ok"))
  }

  /** Distributed video-container decode, same shape as [[qMmAudio]]:
    * MP4 payloads get REAL box-tree metadata (witnessed on authored
    * ISO-BMFF bytes in MultimodalSpec); the text corpus takes the
    * deterministic byte fallback the DuckDB oracle mirrors. */
  private val qMmVideo: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.documents(spark, dir),
      col("doc_id"), col("text"), lit("video/mp4"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.decodeVideo(spark, media,
        spark.sparkContext.defaultParallelism)
      .select(col("mediaId").as("media_id"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("durationMs").as("duration_ms"),
        col("ok"))
  }

  /** MJPEG frame statistics, the byte-level decode itself under the
    * oracle ([[graft.operators.Multimodal.videoStats]]): frame starts
    * (FF D8 FF positional scan), largest encoded-frame segment, and the
    * SAD motion proxy are ONE format-free arithmetic over every
    * payload, so DuckDB re-derives every byte from hex and recomputes
    * all three exactly. The real-MJPEG path (authored JPEG frames) is
    * witnessed in MultimodalSpec. */
  private val qMmVideoStats: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.documents(spark, dir),
      col("doc_id"), col("text"), lit("video/mjpeg"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.videoStats(spark, media,
        spark.sparkContext.defaultParallelism)
      .select(col("mediaId").as("media_id"),
        col("nFrames").as("n_frames"),
        col("maxSegBytes").as("max_seg_bytes"),
        col("motionSad").as("motion_sad"),
        col("ok"))
  }

  /** Perceptual-hash fingerprint (average-hash) per media payload: 64
    * taps NN-downsampled from the byte signal, mean-thresholded, packed
    * into 8 band values — the image-dedup signature, as one codegen'd
    * map-side projection (no UDF, no shuffle). The oracle re-derives
    * every bit from hex with the same exact-integer threshold. */
  private val qMmPhash: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.fanOut(Tables.documents(spark, dir)),
      col("doc_id"), col("text"), lit("image/png"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.aHash(media)
  }

  /** Perceptual near-duplicate pairs at Hamming ≤ 7 over the aHash:
    * banded blocking (8 bands × 8 bits, pigeonhole-complete at this
    * threshold) + bucket cap + exact popcount(xor) verify — the
    * multimodal twin of `q_sim_simhash_pairs`, one hash-shuffle at any
    * corpus size. */
  private val qMmPhashDedup: Q = (spark, dir) => {
    val media = graft.operators.Multimodal.asMedia(
      Tables.fanOut(Tables.documents(spark, dir)),
      col("doc_id"), col("text"), lit("image/png"), col("source"),
      col("n_chars").cast(LongType))
    graft.operators.Multimodal.phashNearDupPairs(media,
      maxHamming = 7, maxBucketSize = 100)
  }

  /** Dynamic partition pruning witness: the fact lands partitioned by
    * event_type; the dim carries a derived category the fact doesn't
    * have, so the only route to pruning is DYNAMIC — Catalyst turns the
    * broadcast dim's filtered keys into a runtime partition filter on
    * the fact scan (`dynamicpruningexpression` — pinned in PlanSpec),
    * and the fact reads 2 of 5 partition directories instead of the
    * whole table. At 100 TB this is the difference between scanning a
    * day and scanning a decade when the predicate lives on the dim. */
  private val qDppPrune: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val landing = graft.io.TempDirs.registered("graft-dpp").toString
    ev.write.mode("overwrite").partitionBy("event_type").parquet(landing)
    val fact = spark.read.parquet(landing)
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("category",
        when(col("event_type").isin("click", "view"), lit("engagement"))
          .otherwise(lit("other")))
    fact.join(broadcast(dim.filter(col("category") === "engagement")),
        Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value")).cast(LongType)).as("sum_value"))
  }

  /** S1/F1/P1 — the landing-zone ingest path: write the table to a text
    * landing format (CSV header files, the .xls analog), read it back
    * permissively with an explicit schema, uppercase the column names,
    * and apply the fixed target projection. Oracle = identity over the
    * source table, proving the landing round-trip is lossless. */
  private val qS1Landing: Q = (spark, dir) => {
    val src = Tables.orders(spark, dir)
    val landing = graft.io.TempDirs.registered("graft-landing").toString
    src.write.mode("overwrite").option("header", "true").csv(landing)
    val raw = spark.read.option("header", "true").schema(src.schema).csv(landing)
    val upper = graft.functions.Cleaning.upperColumns(raw)
    upper.select(col("O_ORDERKEY").as("o_orderkey"),
      col("O_ORDERSTATUS").as("o_orderstatus"),
      col("O_TOTALPRICE").as("o_totalprice"),
      col("O_ORDERDATE").cast("timestamp_ntz").as("o_orderdate"))
  }

  /** Columnar landing in ORC — the second columnar format beside
    * parquet (Avro/Kafka connectors are absent from this environment;
    * ORC ships in spark-sql). Events land partitioned by event_type,
    * and the read-back filter prunes whole partition DIRECTORIES
    * (event_type) before the value predicate pushes into the ORC
    * reader's stripe/row-group statistics — at 100 TB the scan touches
    * one partition's stripes, nothing else. The projection skips `ts`
    * so the oracle stays free of ns-vs-us timestamp string drift. */
  private val qOrcRoundtrip: Q = (spark, dir) => {
    val src = Tables.events(spark, dir)
    val landing = graft.io.TempDirs.registered("graft-orc").toString
    src.write.mode("overwrite").partitionBy("event_type").orc(landing)
    spark.read.orc(landing)
      .filter(col("event_type") === "click" && col("value") > 50.0)
      .select(col("event_id"), col("user_id"), col("value"))
  }

  /** Schema-evolution landing read: an early delivery WITHOUT the
    * later-added column beside a new delivery with it, read back as one
    * relation via parquet schema merging — old files surface NULL for
    * the added column. The landing-zone reality at scale: producers
    * upgrade, history doesn't rewrite. mergeSchema is set on THIS read
    * only (not session-wide), since merging footers across a 100 TB
    * zone is the expensive path an evolving prefix actually needs. */
  private val qSchemaEvolution: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val landing = graft.io.TempDirs.registered("graft-evolve").toString
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("append").parquet(landing)
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("append").parquet(landing)
    spark.read.option("mergeSchema", "true").parquet(landing)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
  }

  def queries: Map[String, Q] = Map(
    "q_schema_evolution"    -> qSchemaEvolution,
    "q_orc_roundtrip"       -> qOrcRoundtrip,
    "q_s1_landing"          -> qS1Landing,
    "q_s2_jdbc_roundtrip"   -> qS2JdbcRoundtrip,
    "q_s3_jdbc_partitioned" -> qS3JdbcPartitioned,
    "q_s6_quarantine"       -> qS6Quarantine,
    "q_s7_checkpoint"       -> qS7Checkpoint,
    "q_s8_doc_roundtrip"    -> qS8DocRoundtrip,
    "q_f24_style_split"     -> qF24StyleSplit,
    "q_e3_image_classify"   -> qE3ImageClassify,
    "q_mm_media"            -> qMmMedia,
    "q_mm_features"         -> qMmFeatures,
    "q_mm_decode"           -> qMmDecode,
    "q_mm_resize"           -> qMmResize,
    "q_mm_audio"            -> qMmAudio,
    "q_mm_audio_stats"      -> qMmAudioStats,
    "q_mm_video"            -> qMmVideo,
    "q_mm_video_stats"      -> qMmVideoStats,
    "q_mm_phash"            -> qMmPhash,
    "q_mm_phash_dedup"      -> qMmPhashDedup,
    "q_dpp_prune"           -> qDppPrune)

  /** DuckDB mirror of [[graft.operators.Multimodal.aHashBandCols]]:
    * the same 64 NN taps over hex(payload), the same exact-integer
    * mean threshold (tap·64 > Σtaps), the same 8×8-bit LE band pack. */
  private val aHashBandsCte: String =
    """b AS (SELECT doc_id, hex(encode(text)) AS hx,
           coalesce(octet_length(encode(text)), 0) AS n FROM documents),
       taps AS (SELECT doc_id, i,
           CASE WHEN n = 0 THEN 0
                ELSE CAST('0x' || substring(hx, 2 * ((i * n) // 64) + 1, 2) AS INT) END AS tap
         FROM b, unnest(range(0, 64)) AS u(i)),
       tsum AS (SELECT doc_id, sum(tap) AS st FROM taps GROUP BY 1),
       bands AS (SELECT t.doc_id, t.i // 8 AS band,
           CAST(sum(CASE WHEN t.tap * 64 > s.st THEN 1 << (t.i % 8) ELSE 0 END) AS BIGINT) AS bval
         FROM taps t JOIN tsum s ON t.doc_id = s.doc_id GROUP BY 1, 2)"""

  private val homeSectionsCase: String =
    graft.functions.Cleaning.homeSections.map { case (label, pat) =>
      s"WHEN regexp_matches(caption, '$pat') THEN '$label'"
    }.mkString("CASE ", " ", " ELSE 'Other' END")

  def oracleSql: Map[String, String] = Map(
    "q_schema_evolution" ->
      """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, o_totalprice, o_orderpriority
         FROM orders WHERE o_orderkey % 2 = 1""",
    "q_orc_roundtrip" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_type = 'click' AND value > 50.0""",
    "q_s1_landing" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders",
    "q_mm_media" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(hex(encode(text))) AS content_key,
         CAST(floor(n_chars / 50) + 1 AS BIGINT) AS n_frames
         FROM documents""",
    "q_s2_jdbc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0""",
    "q_dpp_prune" ->
      """SELECT event_type, count(*) AS n,
              CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_value
         FROM events WHERE event_type IN ('click', 'view')
         GROUP BY event_type""",
    "q_mm_video" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
           coalesce(octet_length(encode(text)), 0) AS n FROM documents)
         SELECT doc_id AS media_id,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 160 + CAST('0x' || substring(hx, 1, 2) AS INT) % 128 END AS BIGINT) AS width,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 90 + CAST('0x' || substring(hx, 2 * (n // 2) + 1, 2) AS INT) % 128 END AS BIGINT) AS height,
           CAST(CASE WHEN n = 0 THEN 0 ELSE n END AS BIGINT) AS duration_ms,
           n > 0 AS ok
         FROM b""",
    // the PCM decode arithmetic itself, re-derived sample-by-sample
    // from hex: u = hi·256 + lo per byte pair, two's-complement s16,
    // RMS quantized by the engine-exact floor(x·1000 + 0.5)
    "q_mm_video_stats" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
             coalesce(octet_length(encode(text)), 0) AS n FROM documents),
         u AS (SELECT doc_id, i, n,
                 CAST('0x' || substring(hx, 2 * i + 1, 2) AS INT) AS v
               FROM (SELECT doc_id, hx, n, unnest(range(0, n)) AS i FROM b)),
         w AS (SELECT doc_id, i, v, n,
                 lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv,
                 lead(v) OVER (PARTITION BY doc_id ORDER BY i) AS nv1,
                 lead(v, 2) OVER (PARTITION BY doc_id ORDER BY i) AS nv2
               FROM u),
         soi AS (SELECT doc_id, i, n FROM w
                 WHERE v = 255 AND nv1 = 216 AND nv2 = 255),
         sad AS (SELECT doc_id, CAST(sum(abs(v - pv)) AS BIGINT) AS sad
                 FROM w WHERE pv IS NOT NULL GROUP BY 1),
         fr AS (SELECT doc_id, count(*) AS nf, min(i) AS first_i FROM soi GROUP BY 1),
         segl AS (SELECT doc_id,
                    coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i), n) - i
                      AS len
                  FROM soi
                  UNION ALL
                  SELECT doc_id, first_i AS len FROM fr WHERE first_i > 0),
         mx AS (SELECT doc_id, max(len) AS mseg FROM segl GROUP BY 1)
         SELECT b.doc_id AS media_id,
           CAST(coalesce(fr.nf, 0) AS BIGINT) AS n_frames,
           CAST(CASE WHEN b.n = 0 THEN 0
                     WHEN mx.mseg IS NULL THEN b.n
                     ELSE mx.mseg END AS BIGINT) AS max_seg_bytes,
           coalesce(sad.sad, 0) AS motion_sad,
           b.n > 0 AS ok
         FROM b LEFT JOIN fr ON b.doc_id = fr.doc_id
                LEFT JOIN sad ON b.doc_id = sad.doc_id
                LEFT JOIN mx ON b.doc_id = mx.doc_id""",
    "q_mm_audio_stats" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
             coalesce(octet_length(encode(text)), 0) AS n FROM documents),
         s AS (SELECT doc_id, i,
                 CAST('0x' || substring(hx, 4 * i + 3, 2)
                   || substring(hx, 4 * i + 1, 2) AS INT) AS u
               FROM (SELECT doc_id, hx, unnest(range(0, n // 2)) AS i FROM b)),
         w AS (SELECT doc_id, i,
                 CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS sm,
                 lag(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
                   OVER (PARTITION BY doc_id ORDER BY i) AS pm
               FROM s),
         agg AS (SELECT doc_id, count(*) AS ns, max(abs(sm)) AS peak,
                   CAST(sum(CAST(sm AS BIGINT) * sm) AS BIGINT) AS sq,
                   CAST(sum(CASE WHEN pm IS NOT NULL AND ((sm < 0) <> (pm < 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zc
                 FROM w GROUP BY 1)
         SELECT b.doc_id AS media_id,
           CAST(coalesce(a.ns, 0) AS BIGINT) AS n_samples,
           CAST(coalesce(a.peak, 0) AS BIGINT) AS peak_abs,
           CAST(CASE WHEN coalesce(a.ns, 0) > 0
                THEN floor(sqrt(CAST(a.sq AS DOUBLE) / a.ns) * 1000 + 0.5)
                ELSE 0 END AS BIGINT) AS rms_milli,
           coalesce(a.zc, 0) AS zero_crossings,
           b.n > 0 AS ok
         FROM b LEFT JOIN agg a ON b.doc_id = a.doc_id""",
    "q_mm_audio" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
           coalesce(octet_length(encode(text)), 0) AS n FROM documents)
         SELECT doc_id AS media_id,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 1 + CAST('0x' || substring(hx, 1, 2) AS INT) % 2 END AS BIGINT) AS channels,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 8000 + 125 * (CAST('0x' || substring(hx, 2 * (n // 2) + 1, 2) AS INT) % 128) END AS BIGINT) AS sample_rate_hz,
           CAST(CASE WHEN n = 0 THEN 0 ELSE n END AS BIGINT) AS duration_ms,
           n > 0 AS ok
         FROM b""",
    "q_mm_resize" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
           coalesce(octet_length(encode(text)), 0) AS n FROM documents)
         SELECT doc_id AS media_id,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 64 + CAST('0x' || substring(hx, 1, 2) AS INT) % 128 END AS BIGINT) AS in_width,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 64 + CAST('0x' || substring(hx, 2 * (n // 2) + 1, 2) AS INT) % 128 END AS BIGINT) AS in_height,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 96 END AS BIGINT) AS out_width,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 64 END AS BIGINT) AS out_height,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 96 * 64 END AS BIGINT) AS out_bytes,
           n > 0 AS ok
         FROM b""",
    "q_mm_phash" ->
      s"""WITH $aHashBandsCte
          SELECT doc_id AS media_id,
            ${(0 until 8).map(b =>
              s"max(CASE WHEN band = $b THEN bval END) AS band$b").mkString(",\n            ")}
          FROM bands GROUP BY doc_id""",
    "q_mm_phash_dedup" ->
      s"""WITH $aHashBandsCte,
          capped AS (SELECT doc_id, band, bval FROM (
              SELECT *, count(*) OVER (PARTITION BY band, bval) AS bsz FROM bands)
            WHERE bsz <= 100),
          cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM capped a JOIN capped b
                     ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
          ham AS (SELECT c.id_a, c.id_b,
                    CAST(sum(bit_count(xor(ba.bval, bb.bval))) AS BIGINT) AS hamming
                  FROM cand c
                  JOIN bands ba ON ba.doc_id = c.id_a
                  JOIN bands bb ON bb.doc_id = c.id_b AND bb.band = ba.band
                  GROUP BY 1, 2)
          SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 7""",
    "q_mm_decode" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
           coalesce(octet_length(encode(text)), 0) AS n FROM documents)
         SELECT doc_id AS media_id,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 64 + CAST('0x' || substring(hx, 1, 2) AS INT) % 128 END AS BIGINT) AS width,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE 64 + CAST('0x' || substring(hx, 2 * (n // 2) + 1, 2) AS INT) % 128 END AS BIGINT) AS height,
           n > 0 AS ok
         FROM b""",
    "q_mm_features" -> {
      def f(j: Int) =
        s"round(CAST('0x' || substring(md5('f$j:' || hex(encode(text))), 1, 15) AS BIGINT)" +
          " % 1000000 / 1000000.0, 6)"
      s"""SELECT doc_id AS media_id,
          ${(0 until 4).map(j => s"${f(j)} AS f$j").mkString(",\n          ")},
          round(sqrt(${(0 until 4).map(j => s"${f(j)} * ${f(j)}").mkString(" + ")}), 6) AS feat_norm
          FROM documents"""
    },
    "q_s3_jdbc_partitioned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice > 150000.0""",
    "q_s6_quarantine" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
         WHERE o_totalprice > 50000.0 AND o_orderstatus <> 'P'""",
    "q_s7_checkpoint" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "q_s8_doc_roundtrip" ->
      s"""WITH t AS (SELECT p_partkey,
            CASE WHEN p_partkey % 5 = 0 THEN 'Kitchen view'
                 WHEN p_partkey % 5 = 1 THEN 'Master Bathroom'
                 WHEN p_partkey % 5 = 2 THEN 'Front of house'
                 WHEN p_partkey % 5 = 3 THEN 'floor plan'
                 ELSE 'mystery room' END AS cap_a,
            CASE WHEN p_partkey % 4 = 0 THEN 'Dining area'
                 WHEN p_partkey % 4 = 1 THEN 'Finished basement'
                 WHEN p_partkey % 4 = 2 THEN 'Two car garage'
                 ELSE 'odd corner space' END AS cap_b
          FROM part),
          pairs AS (
            SELECT p_partkey AS mlsnum, cap_a AS caption,
                   'http://img/' || CAST(p_partkey AS VARCHAR) || 'a.png' AS url FROM t
            UNION ALL
            SELECT p_partkey, cap_b, 'http://img/' || CAST(p_partkey AS VARCHAR) || 'b.png' FROM t),
          classified AS (SELECT *, $homeSectionsCase AS section FROM pairs),
          seqd AS (SELECT *,
            row_number() OVER (PARTITION BY mlsnum, section ORDER BY url) AS seq
          FROM classified)
          SELECT CAST(mlsnum AS VARCHAR) AS mlsnum,
                 strftime(DATE '2024-01-01' + CAST(mlsnum % 365 AS INT), '%m/%d/%Y') AS "date",
                 CAST(mlsnum AS VARCHAR) || ' OAK AVE' AS address,
                 'TOWN' || CAST(mlsnum % 25 AS VARCHAR) AS town,
                 'NJ' AS "state",
                 lpad(CAST((mlsnum * 7) % 100000 AS VARCHAR), 5, '0') AS zipcode,
                 lpad(CAST(mlsnum % 21 AS VARCHAR), 2, '0') AS countycode,
                 'B' || CAST(mlsnum % 900 AS VARCHAR) AS blockid,
                 'L' || CAST(mlsnum % 50 AS VARCHAR) AS lotid,
                 CASE WHEN mlsnum % 3 = 0 THEN 'Colonial'
                      WHEN mlsnum % 3 = 1 THEN 'Ranch'
                      ELSE 'MultiFam' END AS prop_style,
                 section, url,
                 'imgs/' || section || '/Unknown/' || CAST(mlsnum AS VARCHAR)
                   || ' - ' || section || '_' || CAST(seq AS VARCHAR) || '.png' AS directory
          FROM seqd""",
    "q_f24_style_split" ->
      """WITH t AS (SELECT p_partkey,
           CASE WHEN p_partkey % 9 = 0 THEN 'Duplex,TwoStory'
                WHEN p_partkey % 9 = 1 THEN 'Triplex,Cluster'
                WHEN p_partkey % 9 = 2 THEN 'OneStory,FourPlex'
                WHEN p_partkey % 9 = 3 THEN 'TwoStory,FixrUppr'
                WHEN p_partkey % 9 = 4 THEN 'SeeRem'
                WHEN p_partkey % 9 = 5 THEN 'FixrUppr'
                WHEN p_partkey % 9 = 6 THEN 'Resident'
                WHEN p_partkey % 9 = 7 THEN ',Cluster'
                ELSE 'Colonial' END AS style_raw
         FROM part),
         s AS (SELECT *, string_split(style_raw, ',') AS parts,
           contains(style_raw, ',') AS is_list FROM t),
         mf AS (SELECT *,
           (CASE WHEN parts[1] <> '' THEN parts[1] ELSE parts[2] END)
             IN ('Cluster','UndrOver','TwoStory','ThreStry','OneStory') AS first_mf
         FROM s)
         SELECT p_partkey, style_raw,
           CASE WHEN is_list THEN
                  CASE WHEN list_contains(parts, 'Duplex') THEN 'Duplex'
                       WHEN list_contains(parts, 'Triplex') THEN 'Triplex'
                       WHEN list_contains(parts, 'FourPlex') THEN 'FourPlex'
                       WHEN first_mf THEN 'MultiFam'
                       ELSE NULL END
                WHEN style_raw IN ('Cluster','UndrOver','TwoStory','ThreStry','OneStory') THEN 'MultiFam'
                WHEN style_raw = 'Resident' THEN 'Residential'
                WHEN style_raw = 'SeeRem' THEN NULL
                WHEN style_raw = 'FixrUppr' THEN NULL
                ELSE style_raw END AS prop_style,
           CASE WHEN style_raw = 'FixrUppr'
                  OR (is_list AND NOT list_contains(parts, 'Duplex')
                      AND NOT list_contains(parts, 'Triplex')
                      AND NOT list_contains(parts, 'FourPlex')
                      AND first_mf AND list_contains(parts, 'FixrUppr'))
                THEN 'FIXER UPPER' ELSE 'Unknown' END AS condition
         FROM mf""",
    "q_e3_image_classify" ->
      s"""WITH t AS (SELECT p_partkey,
            CASE WHEN p_partkey % 5 = 0 THEN 'Kitchen view'
                 WHEN p_partkey % 5 = 1 THEN 'Master Bathroom'
                 WHEN p_partkey % 5 = 2 THEN 'Front of house'
                 WHEN p_partkey % 5 = 3 THEN 'floor plan'
                 ELSE 'mystery room' END AS cap_a,
            CASE WHEN p_partkey % 4 = 0 THEN 'Dining area'
                 WHEN p_partkey % 4 = 1 THEN 'Finished basement'
                 WHEN p_partkey % 4 = 2 THEN 'Two car garage'
                 ELSE 'odd corner space' END AS cap_b
          FROM part),
          pairs AS (
            SELECT p_partkey AS mlsnum, cap_a AS caption,
                   'http://img/' || CAST(p_partkey AS VARCHAR) || 'a.png' AS url FROM t
            UNION ALL
            SELECT p_partkey, cap_b, 'http://img/' || CAST(p_partkey AS VARCHAR) || 'b.png' FROM t),
          classified AS (SELECT *, $homeSectionsCase AS section FROM pairs),
          seqd AS (SELECT *,
            row_number() OVER (PARTITION BY mlsnum, section ORDER BY url) AS seq
          FROM classified)
          SELECT CAST(mlsnum AS VARCHAR) AS mlsnum, caption, url, section,
                 CAST(seq AS BIGINT) AS seq,
                 'imgs/' || section || '/Unknown/' || CAST(mlsnum AS VARCHAR)
                   || ' - ' || section || '_' || CAST(seq AS VARCHAR) || '.png' AS directory
          FROM seqd""")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample plumbing.
  *
  * The byte-level ops (size, hash, base64, frame offsets) are pure
  * Catalyst expressions. Image decode is REAL for the formats the JDK
  * ships readers for (PNG/JPEG/GIF/BMP, header-only dimension parse via
  * javax.imageio inside [[decodePartition]] — per-partition batch
  * iterator, the Scala analog of mapInPandas); audio decode is REAL for
  * WAV (RIFF `fmt `/`data` header arithmetic in [[decodeAudioPartition]],
  * no codec library needed), and video metadata is REAL for MP4/ISO-BMFF
  * containers (box-tree walk in [[decodeVideoPartition]]: `mvhd` duration,
  * `tkhd` display size). Unrecognized payloads fall back to a
  * deterministic byte-derived fake so text-payload corpora remain
  * testable and oracle-comparable. Frame/sample decode of compressed
  * codecs is the one remaining swap-point — it needs codec libraries
  * this container doesn't ship.
  *
  * 100 TB notes: media rows are large and skewed — `repartitionForDecode`
  * spreads payloads by id hash before the expensive per-row work, and
  * metadata-only queries never touch the binary column (parquet column
  * pruning keeps the payload unread).
  */
object Multimodal {

  /** Media row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("source", StringType),
      StructField("duration_ms", LongType))))))

  /** Wrap a text/bytes column as a media frame (UTF-8 payload). */
  def asMedia(df: DataFrame, idCol: Column, payload: Column,
              mime: Column, source: Column, durationMs: Column): DataFrame =
    df.select(
      idCol.cast(LongType).as("media_id"),
      payload.cast(BinaryType).as("content"),
      struct(mime.as("mime"), source.as("source"),
        durationMs.cast(LongType).as("duration_ms")).as("meta"))

  // ------------------------------------------------------------------
  // Byte-level expressions (codegen'd; no decode needed)
  // ------------------------------------------------------------------
  def byteSize(content: Column): Column = octet_length(content)

  /** Engine-portable content key over the payload bytes. Hex, not
    * base64: base64 line-chunking conventions differ across engines,
    * hex is unambiguous. */
  def contentKey(content: Column): Column = md5(hex(content))

  /** Evenly spaced frame-sample offsets in [0, duration] (step ms). */
  def frameOffsets(durationMs: Column, stepMs: Int): Column =
    sequence(lit(0L), durationMs, lit(stepMs.toLong))

  /** Deterministic feature channel j in [0, 1) from the payload bytes —
    * the columnar feature-extract stand-in (a real extractor would
    * replace the hash with codec output via [[decodePartition]]). Salted
    * md5 over the hex payload, top 60 bits, scaled; engine-portable, so
    * the whole binary→feature-vector path sits under the DuckDB oracle. */
  def hashFeature(content: Column, channel: Int): Column =
    round(
      conv(substring(md5(concat(lit(s"f$channel:"), hex(content))), 1, 15), 16, 10)
        .cast(LongType) % 1000000L / 1000000.0, 6)

  /** Feature vector: `dims` hash channels as an Array[Double] column —
    * the bridge from opaque media payloads to the ANN/similarity stack. */
  def hashFeatures(content: Column, dims: Int): Column =
    array((0 until dims).map(hashFeature(content, _)): _*)

  // ------------------------------------------------------------------
  // Decode plumbing — real signature, stubbed codec
  // ------------------------------------------------------------------
  final case class DecodedMeta(mediaId: Long, width: Int, height: Int, ok: Boolean)

  /** Spread large payloads across executors before per-row decode work;
    * hash partitioning on the id avoids hot partitions from skewed
    * upstream layouts. */
  def repartitionForDecode(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions, col("media_id"))

  /** True iff the payload starts with a magic number of an image format
    * the JDK's bundled ImageIO readers handle (PNG / JPEG / GIF / BMP).
    * A cheap prefix check — at corpus scale most payloads are text or
    * other media, and constructing an ImageReader per non-image row
    * would dominate the decode stage. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||                // JPEG SOI
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Header-only image dimensions via the JDK's ImageIO reader registry:
    * `ImageReader.getWidth/getHeight(0)` parse the format header without
    * decoding pixel data — the right cost model when the downstream
    * question is "what are the dimensions", not "give me the raster". */
  private def imageDims(content: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val rd = readers.next()
        try { rd.setInput(iis); Some((rd.getWidth(0), rd.getHeight(0))) }
        finally rd.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Production decode swap-point (partition iterator in, iterator out —
    * the JVM analog of mapInPandas). Real image payloads (PNG/JPEG/GIF/
    * BMP by magic number) get true dimensions from a JDK-only header
    * parse; anything else — this container's corpora are UTF-8 text
    * payloads — falls back to deterministic byte-derived dimensions so
    * the pipeline stays testable end-to-end and oracle-comparable
    * without codec libraries. Audio/video codecs remain out of scope
    * for this container and would slot in beside [[imageDims]]. */
  def decodePartition(rows: Iterator[Row]): Iterator[DecodedMeta] =
    rows.map { r =>
      val id = r.getAs[Long]("media_id")
      val content = r.getAs[Array[Byte]]("content")
      if (content == null || content.isEmpty) DecodedMeta(id, 0, 0, ok = false)
      else {
        val decoded = if (looksLikeImage(content)) imageDims(content) else None
        decoded match {
          case Some((w, h)) => DecodedMeta(id, w, h, ok = true)
          case None =>
            // deterministic fallback: dimensions from the payload bytes
            val w = 64 + (content(0) & 0x7f)
            val h = 64 + (content(content.length / 2) & 0x7f)
            DecodedMeta(id, w, h, ok = true)
        }
      }
    }

  /** Distributed decode: repartition → per-partition batch decode →
    * typed Dataset back to DataFrame. */
  def decode(spark: SparkSession, media: DataFrame, partitions: Int): DataFrame = {
    import spark.implicits._
    repartitionForDecode(media, partitions)
      .select(col("media_id"), col("content"))
      .mapPartitions(decodePartition)(Encoders.product[DecodedMeta])
      .toDF()
  }

  final case class ResizedMeta(mediaId: Long, inWidth: Int, inHeight: Int,
                               outWidth: Int, outHeight: Int,
                               outBytes: Long, ok: Boolean)

  /** Resize swap-point, shaped like [[decodePartition]]: real image
    * payloads are decoded, scaled to (targetW, targetH) with a
    * NEAREST-NEIGHBOR affine transform — chosen over interpolating
    * kernels because its output pixels are an exact deterministic
    * selection of input pixels, no FP resampling to drift — and
    * re-encoded as PNG (lossless, JDK-bundled). Non-image payloads
    * take the [[decodePartition]] fallback dims with a synthetic
    * out-payload size of outW·outH (one byte per pixel), keeping the
    * pipeline oracle-comparable end-to-end without codec libraries. */
  def resizePartition(targetW: Int, targetH: Int)(rows: Iterator[Row]): Iterator[ResizedMeta] =
    rows.map { r =>
      val id = r.getAs[Long]("media_id")
      val content = r.getAs[Array[Byte]]("content")
      if (content == null || content.isEmpty)
        ResizedMeta(id, 0, 0, 0, 0, 0L, ok = false)
      else {
        val real =
          if (!looksLikeImage(content)) None
          else try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(content))).map { img =>
              val out = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
                g.drawImage(img, 0, 0, targetW, targetH, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedMeta(id, img.getWidth, img.getHeight,
                targetW, targetH, bos.size().toLong, ok = true)
            }
          } catch { case _: Exception => None }
        real.getOrElse {
          val w = 64 + (content(0) & 0x7f)
          val h = 64 + (content(content.length / 2) & 0x7f)
          ResizedMeta(id, w, h, targetW, targetH,
            targetW.toLong * targetH, ok = true)
        }
      }
    }

  /** Distributed resize: the same repartition → per-partition batch →
    * typed Dataset plumbing as [[decode]]. */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int,
             targetH: Int, partitions: Int): DataFrame = {
    import spark.implicits._
    repartitionForDecode(media, partitions)
      .select(col("media_id"), col("content"))
      .mapPartitions(resizePartition(targetW, targetH))(Encoders.product[ResizedMeta])
      .toDF()
  }

  // ------------------------------------------------------------------
  // Audio decode — real for WAV (RIFF header arithmetic, zero codec
  // dependencies), deterministic byte-derived fallback otherwise
  // ------------------------------------------------------------------
  final case class AudioMeta(mediaId: Long, channels: Int, sampleRateHz: Int,
                             durationMs: Long, ok: Boolean)

  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Header-only WAV metadata: walk the RIFF chunk list for `fmt `
    * (channels, sample rate, bits/sample) and `data` (payload length),
    * duration = data bytes / byte rate. Pure arithmetic over the
    * container header — the audio analog of [[imageDims]]'s
    * no-pixel-decode cost model, and it needs no codec library at all:
    * PCM WAV is self-describing. */
  private def wavMeta(b: Array[Byte]): Option[(Int, Int, Long)] = {
    var i = 12
    var channels = -1; var rate = -1L; var bits = -1; var dataLen = -1L
    var corrupt = false
    while (!corrupt && i + 8 <= b.length && (channels < 0 || dataLen < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = u32le(b, i + 4)
      // A declared size >= 2^31 cannot fit in this payload and would
      // wrap negative as an Int: treat the walk as corrupt rather than
      // stepping backwards (index crash) or by zero (infinite loop).
      if (sz > Int.MaxValue - 16) corrupt = true
      else {
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          channels = u16le(b, i + 10)
          rate = u32le(b, i + 12)
          bits = u16le(b, i + 22)
        } else if (id == "data") dataLen = sz
        val next = i + 8 + sz.toInt + (sz.toInt & 1) // word-aligned chunks
        if (next <= i) corrupt = true else i = next
      }
    }
    if (corrupt) return None
    if (channels > 0 && rate > 0 && bits >= 8 && dataLen >= 0) {
      val byteRate = rate * channels * (bits / 8)
      if (byteRate > 0) Some((channels, rate.toInt, dataLen * 1000L / byteRate))
      else None
    } else None
  }

  /** Audio decode swap-point, shaped like [[decodePartition]]: WAV
    * payloads (RIFF magic) get true channel/rate/duration from the
    * header; anything else falls back to deterministic byte-derived
    * values (first byte → channels, middle byte → rate, byte length →
    * duration) so text-payload corpora stay oracle-comparable.
    * Compressed codecs (MP3/AAC/video) would slot in beside
    * [[wavMeta]]. */
  def decodeAudioPartition(rows: Iterator[Row]): Iterator[AudioMeta] =
    rows.map { r =>
      val id = r.getAs[Long]("media_id")
      val content = r.getAs[Array[Byte]]("content")
      if (content == null || content.isEmpty)
        AudioMeta(id, 0, 0, 0L, ok = false)
      else {
        val meta = if (looksLikeWav(content)) wavMeta(content) else None
        meta match {
          case Some((ch, sr, ms)) => AudioMeta(id, ch, sr, ms, ok = true)
          case None =>
            AudioMeta(id,
              1 + (content(0) & 1),
              8000 + 125 * (content(content.length / 2) & 0x7f),
              content.length.toLong,
              ok = true)
        }
      }
    }

  // ------------------------------------------------------------------
  // PCM sample decode — REAL waveform statistics, not just container
  // headers: 16-bit PCM WAV payloads decode their `data` chunk's
  // interleaved s16le samples (pure byte arithmetic, zero codec
  // dependencies — PCM is uncompressed), and every other payload takes
  // the SAME s16le arithmetic over its raw bytes, so the fallback is
  // not a fake: the oracle re-derives identical samples from hex and
  // checks the actual decode arithmetic end-to-end.
  // ------------------------------------------------------------------
  final case class AudioStats(mediaId: Long, nSamples: Long, peakAbs: Long,
                              rmsMilli: Long, zeroCrossings: Long, ok: Boolean)

  /** `data` chunk (offset, byteLen) of a 16-bit PCM WAV, None for other
    * bit depths / containers (those take the raw-bytes path). */
  private def wavDataChunk(b: Array[Byte]): Option[(Int, Int)] = {
    if (!looksLikeWav(b)) return None
    var i = 12
    var bits = -1; var dataOff = -1; var dataLen = -1
    var corrupt = false
    while (!corrupt && i + 8 <= b.length && (bits < 0 || dataOff < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val szL = u32le(b, i + 4)
      // Same corruption guard as wavMeta: a size that wraps negative as
      // an Int would make the step non-advancing (executor-task hang)
      // or negative (index crash), and a negative dataLen would pass the
      // bounds check below. Bail to the raw-bytes fallback instead.
      if (szL > Int.MaxValue - 16) corrupt = true
      else {
        val sz = szL.toInt
        if (id == "fmt " && i + 8 + 16 <= b.length) bits = u16le(b, i + 22)
        else if (id == "data") { dataOff = i + 8; dataLen = sz }
        val next = i + 8 + sz + (sz & 1)
        if (next <= i) corrupt = true else i = next
      }
    }
    if (!corrupt && bits == 16 && dataOff >= 0 && dataLen >= 0 &&
        dataOff + dataLen <= b.length)
      Some((dataOff, dataLen))
    else None
  }

  /** s16le waveform stats over `len` bytes at `from` (trailing odd byte
    * dropped): (n, peak, Σs², zero crossings). All integer — the RMS
    * quantization happens once, downstream. */
  private def s16leStats(b: Array[Byte], from: Int, len: Int): (Long, Long, Long, Long) = {
    val n = len / 2
    var i = 0; var sumSq = 0L; var peak = 0L; var zc = 0L; var prevNeg = false
    while (i < n) {
      val off = from + 2 * i
      val u = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      val s = if (u >= 0x8000) u - 0x10000 else u
      sumSq += s.toLong * s
      val a = math.abs(s).toLong
      if (a > peak) peak = a
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    (n.toLong, peak, sumSq, zc)
  }

  /** Per-payload waveform statistics: sample count, peak |amplitude|,
    * RMS (quantized to integer milli-units via floor(x·1000 + 0.5) —
    * the engine-exact half-up, never a decimal round of a double), and
    * zero-crossing count. 16-bit PCM WAVs measure their data chunk;
    * everything else measures its raw bytes as s16le. */
  def audioStatsPartition(rows: Iterator[Row]): Iterator[AudioStats] =
    rows.map { r =>
      val id = r.getAs[Long]("media_id")
      val content = r.getAs[Array[Byte]]("content")
      if (content == null || content.isEmpty)
        AudioStats(id, 0L, 0L, 0L, 0L, ok = false)
      else {
        val (from, len) = wavDataChunk(content)
          .getOrElse((0, content.length & ~1))
        val (n, peak, sumSq, zc) = s16leStats(content, from, len)
        val rms = if (n > 0)
          math.floor(math.sqrt(sumSq.toDouble / n) * 1000.0 + 0.5).toLong
        else 0L
        AudioStats(id, n, peak, rms, zc, ok = true)
      }
    }

  /** Distributed waveform stats — same spread-then-batch shape as
    * [[decode]]; metadata-only consumers never read the payload. */
  def audioStats(spark: SparkSession, media: DataFrame,
                 partitions: Int): DataFrame = {
    import spark.implicits._
    repartitionForDecode(media, partitions)
      .select(col("media_id"), col("content"))
      .mapPartitions(audioStatsPartition)(Encoders.product[AudioStats])
      .toDF()
  }

  /** Distributed audio decode — same spread-then-batch shape as
    * [[decode]]. */
  def decodeAudio(spark: SparkSession, media: DataFrame,
                  partitions: Int): DataFrame = {
    import spark.implicits._
    repartitionForDecode(media, partitions)
      .select(col("media_id"), col("content"))
      .mapPartitions(decodeAudioPartition)(Encoders.product[AudioMeta])
      .toDF()
  }

  // ------------------------------------------------------------------
  // Video decode — real for MP4/ISO-BMFF containers (box-tree header
  // arithmetic: mvhd → duration, tkhd → display size), deterministic
  // byte-derived fallback otherwise
  // ------------------------------------------------------------------
  final case class VideoMeta(mediaId: Long, width: Int, height: Int,
                             durationMs: Long, ok: Boolean)

  private def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)

  /** Walk one level of an ISO-BMFF box list in [from, to), invoking
    * `visit(type, payloadFrom, payloadTo)` per box. Box = size(u32be) +
    * type(4 ascii); size 1 → 64-bit largesize follows; size 0 → box
    * extends to `to`. */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)
                       (visit: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= to) {
      val sz0 = u32be(b, i)
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val (payload: Long, end: Long) =
        if (sz0 == 1 && i + 16 <= to) (i + 16L, i + u64be(b, i + 8))
        else if (sz0 == 0) (i + 8L, to.toLong)
        else (i + 8L, i + sz0)
      if (end < payload || end > to) return // malformed size — stop
      visit(typ, payload.toInt, end.toInt)
      i = end.toInt
    }
  }

  /** Header-only MP4 metadata: movie duration from `moov/mvhd`
    * (duration/timescale, version 0 and 1 layouts) and display size
    * from the first `moov/trak/tkhd` (16.16 fixed-point width/height).
    * Container arithmetic only — the sample data (`mdat`) is never
    * touched, which is the right cost model for metadata extraction;
    * frame decode would need a codec and stays out of scope. */
  private def mp4Meta(b: Array[Byte]): Option[(Int, Int, Long)] = {
    var w = -1; var h = -1; var durMs = -1L
    walkBoxes(b, 0, b.length) { (typ, from, to) =>
      if (typ == "moov") walkBoxes(b, from, to) { (t2, f2, to2) =>
        if (t2 == "mvhd" && durMs < 0 && to2 - f2 >= 24) {
          val v = b(f2) & 0xff
          val (ts, dur) =
            if (v == 1 && to2 - f2 >= 32)
              (u32be(b, f2 + 20), u64be(b, f2 + 24))
            else (u32be(b, f2 + 12), u32be(b, f2 + 16))
          if (ts > 0) durMs = dur * 1000L / ts
        } else if (t2 == "trak" && w < 0) walkBoxes(b, f2, to2) { (t3, f3, to3) =>
          if (t3 == "tkhd" && w < 0) {
            val v = b(f3) & 0xff
            val off = if (v == 1) 88 else 76 // fixed field layout per version
            if (to3 - f3 >= off + 8) {
              w = (u32be(b, f3 + off) >> 16).toInt
              h = (u32be(b, f3 + off + 4) >> 16).toInt
            }
          }
        }
      }
    }
    if (w > 0 && h > 0 && durMs >= 0) Some((w, h, durMs)) else None
  }

  /** Video decode swap-point, shaped like [[decodeAudioPartition]]:
    * MP4 payloads (ftyp magic) get true display size and duration from
    * the container header; anything else falls back to deterministic
    * byte-derived values so text corpora stay oracle-comparable. */
  def decodeVideoPartition(rows: Iterator[Row]): Iterator[VideoMeta] =
    rows.map { r =>
      val id = r.getAs[Long]("media_id")
      val content = r.getAs[Array[Byte]]("content")
      if (content == null || content.isEmpty)
        VideoMeta(id, 0, 0, 0L, ok = false)
      else {
        val meta = if (looksLikeMp4(content)) mp4Meta(content) else None
        meta match {
          case Some((w, h, ms)) => VideoMeta(id, w, h, ms, ok = true)
          case None =>
            VideoMeta(id,
              160 + (content(0) & 0x7f),
              90 + (content(content.length / 2) & 0x7f),
              content.length.toLong,
              ok = true)
        }
      }
    }

  /** Distributed video decode — same spread-then-batch shape as
    * [[decode]]. */
  def decodeVideo(spark: SparkSession, media: DataFrame,
                  partitions: Int): DataFrame = {
    import spark.implicits._
    repartitionForDecode(media, partitions)
      .select(col("media_id"), col("content"))
      .mapPartitions(decodeVideoPartition)(Encoders.product[VideoMeta])
      .toDF()
  }

  // ------------------------------------------------------------------
  // Video FRAME statistics — the audio-stats companion ([[audioStats]]):
  // real per-byte arithmetic over the payload, not just container
  // headers. MJPEG (concatenated JPEG images — the codec-free motion
  // format) delimits frames with the JPEG SOI marker; the scan is pure
  // byte arithmetic and needs no codec library. The SAME arithmetic
  // runs over EVERY payload (no format branch at all), so the whole
  // decode path sits under the value-level oracle: DuckDB re-derives
  // every byte from hex and recomputes frames/segments/SAD exactly.
  // ------------------------------------------------------------------
  final case class VideoStats(mediaId: Long, nFrames: Long, maxSegBytes: Long,
                              motionSad: Long, ok: Boolean)

  /** Per-payload frame statistics, one pass over the bytes:
    *  - `nFrames`: positions i with b(i..i+2) = FF D8 FF — the JPEG
    *    SOI-then-marker prefix, i.e. MJPEG frame starts. The test is
    *    per-position (overlaps count), which keeps the oracle an exact
    *    positional mirror with no non-overlap bookkeeping.
    *  - `maxSegBytes`: longest segment when the payload is split
    *    BEFORE each frame start (any pre-first-frame prefix is a
    *    segment; a frameless payload is one segment) — the largest
    *    encoded frame, the stat a frame-budgeted loader needs.
    *  - `motionSad`: Σ |b(i) − b(i−1)| over unsigned bytes — the
    *    sum-of-absolute-differences motion proxy, genuinely non-trivial
    *    on any payload. */
  def videoStatsPartition(rows: Iterator[Row]): Iterator[VideoStats] =
    rows.map { r =>
      val id = r.getAs[Long]("media_id")
      val b = r.getAs[Array[Byte]]("content")
      if (b == null || b.isEmpty) VideoStats(id, 0L, 0L, 0L, ok = false)
      else {
        var i = 0; var frames = 0L; var sad = 0L
        var maxSeg = 0L; var segStart = 0
        while (i < b.length) {
          if (i + 2 < b.length && b(i) == 0xff.toByte &&
              b(i + 1) == 0xd8.toByte && b(i + 2) == 0xff.toByte) {
            if (i > segStart) maxSeg = math.max(maxSeg, (i - segStart).toLong)
            frames += 1
            segStart = i
          }
          if (i >= 1) sad += math.abs((b(i) & 0xff) - (b(i - 1) & 0xff))
          i += 1
        }
        maxSeg = math.max(maxSeg, (b.length - segStart).toLong)
        VideoStats(id, frames, maxSeg, sad, ok = true)
      }
    }

  /** Distributed video frame stats — same spread-then-batch shape as
    * [[decode]]; metadata consumers never read the payload. */
  def videoStats(spark: SparkSession, media: DataFrame,
                 partitions: Int): DataFrame = {
    import spark.implicits._
    repartitionForDecode(media, partitions)
      .select(col("media_id"), col("content"))
      .mapPartitions(videoStatsPartition)(Encoders.product[VideoStats])
      .toDF()
  }

  // ------------------------------------------------------------------
  // Perceptual hash (average-hash) + near-duplicate pairing — the
  // image-dedup stage of a multimodal curation pipeline (reference
  // surface: RealEstateImages.py's duplicate-photo screening; the
  // classic aHash construction from the pHash family).
  //
  // The raster stand-in follows the module's codec policy: without
  // image libraries the payload bytes ARE the 1-D luminance signal, so
  // the hash is a REAL average-hash over a real nearest-neighbor
  // downsample — 64 taps at byte offset floor(i·n/64), thresholded at
  // the signal mean — not a fake. Every step is exact integer
  // arithmetic (`tap·64 > Σtaps` instead of an FP mean) expressed as
  // codegen'd Catalyst expressions: no UDF, no mapPartitions, and the
  // oracle re-derives identical bits from hex. Swapping in a real
  // decoder only changes the tap source (decoded 8×8 luma instead of
  // raw bytes); hashing, banding and pairing are unchanged.
  // ------------------------------------------------------------------

  /** Bands in the 64-bit aHash: 8 bands × 8 bits. Hamming-≤-7 pairs are
    * GUARANTEED to share a band (pigeonhole), so banding finds them in
    * one hash-shuffle — the Manku/Das/Sarma blocking, same as
    * [[Similarity.simhashNearDupPairs]]. */
  val aHashBands = 8
  val aHashBits = 64

  /** Per-media aHash fingerprint: (media_id, band0..band7). Columnar
    * and shuffle-free — the fingerprint of a 100 TB media corpus is a
    * map-side projection chain over the payload column.
    *
    * Deliberately CHAINED projections, not one expression: each of the
    * 64 threshold bits compares its tap against the 64-tap sum, so an
    * inline formulation embeds the whole sum tree per bit (~60k
    * Catalyst nodes — optimizer time and driver memory blow up before
    * a single row moves). Materializing taps then the sum as named
    * attributes keeps every subtree single-copy; CollapseProject won't
    * re-inline an alias referenced more than once unless it's cheap,
    * so the shape survives optimization. */
  def aHash(media: DataFrame): DataFrame = {
    val framed = media.select(col("media_id"), col("content"),
      coalesce(octet_length(col("content")), lit(0)).cast(LongType).as("__n"))
    val tapCols = (0 until aHashBits).map { i =>
      val pos = (floor(lit(i.toLong) * col("__n") / lit(aHashBits)) + 1).cast(IntegerType)
      when(col("__n") === 0, lit(0L)).otherwise(
        coalesce(conv(hex(col("content").substr(pos, lit(1))), 16, 10).cast(LongType), lit(0L)))
        .as(s"__t$i")
    }
    val taps = framed.select(col("media_id") +: tapCols: _*)
    val withSum = taps.withColumn("__sum",
      (0 until aHashBits).map(i => col(s"__t$i")).reduce(_ + _))
    val bitsPerBand = aHashBits / aHashBands
    val bands = (0 until aHashBands).map { b =>
      (0 until bitsPerBand).map { j =>
        when(col(s"__t${b * bitsPerBand + j}") * aHashBits > col("__sum"),
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"band$b")
    }
    withSum.select(col("media_id") +: bands: _*)
  }

  /** Perceptual near-duplicate pairs at Hamming distance ≤ `maxHamming`
    * over the 64-bit aHash. Blocking on (band index, band value) finds
    * every such pair with ONE hash-shuffle instead of an n² scan
    * (pigeonhole needs maxHamming < [[aHashBands]]); `maxBucketSize`
    * drops degenerate band buckets before the self-join, the same
    * hygiene as LSH banding. Exact Hamming verifies inside each block
    * as Σ popcount(xor) over the band values — codegen'd, no HOFs. */
  def phashNearDupPairs(media: DataFrame, maxHamming: Int = 7,
                        maxBucketSize: Int = 100): DataFrame = {
    require(maxHamming < aHashBands, "pigeonhole needs maxHamming < aHashBands")
    val fp = aHash(media)
    val bandCols = (0 until aHashBands).map(b => col(s"band$b"))
    // Four consumers (the cap aggregation, its anti-join probe, both
    // self-join sides) would each re-scan the corpus and re-hash the
    // payloads — the fingerprint relation is 9 longs/doc, orders of
    // magnitude smaller than the payload column, so persist it once
    // (same discipline as ngramJaccardPairs' shingle relation).
    // Released by the harness's per-query cache clear.
    val blocked = fp
      .select(col("media_id"), array(bandCols: _*).as("__bands"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bval")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = Similarity.dropOversizedBuckets(blocked, Seq("band", "bval"), maxBucketSize)
    val cand = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.__bands").as("__fa"), col("b.__bands").as("__fb"))
      .distinct()
    val ham = (0 until aHashBands).map { b =>
      bit_count(element_at(col("__fa"), b + 1).bitwiseXOR(element_at(col("__fb"), b + 1)))
    }.reduce(_ + _).cast(LongType)
    cand.withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  private object Encoders {
    def product[T <: Product : scala.reflect.runtime.universe.TypeTag]
      : org.apache.spark.sql.Encoder[T] = org.apache.spark.sql.Encoders.product[T]
  }
}

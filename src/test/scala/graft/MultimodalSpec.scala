package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "hello world", 230L), (2L, "", 0L), (3L, "binary-ish payload", 999L))
      .toDF("id", "payload", "dur"),
    col("id"), col("payload"), lit("text/plain"), lit("unit"), col("dur"))

  test("asMedia produces the typed media schema (modulo nullability)") {
    def shape(s: org.apache.spark.sql.types.StructType): String =
      s.sql.replace(" NOT NULL", "")
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
  }

  test("byte-level ops: size, content key, frame offsets") {
    val r = media.select(
      col("media_id"),
      Multimodal.byteSize(col("content")).as("n"),
      Multimodal.contentKey(col("content")).as("k"),
      size(Multimodal.frameOffsets(col("meta.duration_ms"), 100)).as("frames"))
      .orderBy("media_id").collect()
    assert(r(0).getInt(1) == 11)                  // "hello world" bytes
    assert(r(0).getString(2).length == 32)        // md5 hex
    assert(r(0).getInt(3) == 3)                   // 0,100,200
    assert(r(1).getInt(3) == 1)                   // 0 only
  }

  test("decode plumbing: repartition + per-partition stub decode, deterministic") {
    val out1 = Multimodal.decode(spark, media, 2).orderBy("mediaId").collect()
    val out2 = Multimodal.decode(spark, media, 2).orderBy("mediaId").collect()
    assert(out1.toSeq == out2.toSeq)              // deterministic fake
    assert(out1.length == 3)
    assert(out1.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(!out1(1).getBoolean(3))                // empty payload -> ok=false
    assert(out1(0).getInt(1) >= 64 && out1(0).getInt(2) >= 64)
    // partitioning is real: requested width drives the decode stage
    assert(Multimodal.repartitionForDecode(media, 2).rdd.getNumPartitions == 2)
  }

  test("decode: real PNG/BMP payloads yield true dimensions via javax.imageio") {
    // author real image bytes with the JDK's own encoders — no fixtures
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff00ff) // non-trivial pixel so encoders emit data
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val rows = Seq(
      (1L, imageBytes("png", 123, 45)),
      (2L, imageBytes("bmp", 7, 19)),
      (3L, "not an image at all, just text".getBytes("UTF-8")))
      .toDF("id", "payload")
    val m = Multimodal.asMedia(rows, col("id"), col("payload"),
      lit("image/mixed"), lit("unit"), lit(0L))
    val out = Multimodal.decode(spark, m, 2).orderBy("mediaId").collect()
    assert(out(0).getInt(1) == 123 && out(0).getInt(2) == 45)  // PNG true dims
    assert(out(1).getInt(1) == 7 && out(1).getInt(2) == 19)    // BMP true dims
    assert(out.forall(_.getBoolean(3)))
    // the text payload took the deterministic fallback, not a codec error
    assert(out(2).getInt(1) >= 64 && out(2).getInt(2) >= 64)
  }

  test("resize: real PNG re-rasters to the target; text takes the fallback; empty fails") {
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff00ff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val rows = Seq(
      (1L, imageBytes("png", 40, 30)),
      (2L, "plain text payload".getBytes("UTF-8")),
      (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val m = Multimodal.asMedia(rows, col("id"), col("payload"),
      lit("image/mixed"), lit("unit"), lit(0L))
    val out = Multimodal.resize(spark, m, targetW = 8, targetH = 6, 2)
      .orderBy("mediaId").collect()
    // real path: true input dims, target output dims, a REAL re-encoded
    // PNG whose byte size is what ImageIO produced (non-trivial, small)
    assert(out(0).getInt(1) == 40 && out(0).getInt(2) == 30)
    assert(out(0).getInt(3) == 8 && out(0).getInt(4) == 6)
    assert(out(0).getLong(5) > 0 && out(0).getBoolean(6))
    // determinism of the real path: identical bytes in, identical size out
    val again = Multimodal.resize(spark, m, 8, 6, 2)
      .orderBy("mediaId").collect()
    assert(again(0).getLong(5) == out(0).getLong(5))
    // fallback path: byte-derived input dims, synthetic out payload size
    assert(out(1).getInt(1) >= 64 && out(1).getLong(5) == 8L * 6)
    // empty payload fails closed
    assert(!out(2).getBoolean(6) && out(2).getLong(5) == 0L)
  }

  test("hashFeatures: dims channels in [0,1), deterministic, null-safe") {
    val f = media.select(col("media_id"),
      Multimodal.hashFeatures(col("content"), 4).as("feat"))
      .orderBy("media_id").collect()
    assert(f.forall(_.getSeq[Double](1).length == 4))
    assert(f.forall(_.getSeq[Double](1).forall(v => v >= 0.0 && v < 1.0)))
    val again = media.select(col("media_id"),
      Multimodal.hashFeatures(col("content"), 4).as("feat"))
      .orderBy("media_id").collect()
    assert(f.map(_.getSeq[Double](1)).toSeq == again.map(_.getSeq[Double](1)).toSeq)
    // distinct payloads produce distinct feature vectors
    assert(f.map(_.getSeq[Double](1)).distinct.length == 3)
  }

  test("decodeAudio: real WAV payloads yield true channel/rate/duration") {
    // author real RIFF/WAVE bytes with the JDK's own encoder — no fixtures
    def wavBytes(rate: Float, channels: Int, seconds: Double): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
        true, false)
      val nFrames = (rate * seconds).toLong
      val data = new Array[Byte]((nFrames * fmt.getFrameSize).toInt)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, wavBytes(8000f, 1, 0.5)),   // mono 8 kHz, 500 ms
      (2L, wavBytes(44100f, 2, 0.25)), // stereo 44.1 kHz, 250 ms
      (3L, "definitely not audio".getBytes("UTF-8")))
      .toDF("id", "payload")
    val m = Multimodal.asMedia(rows, col("id"), col("payload"),
      lit("audio/mixed"), lit("unit"), lit(0L))
    val out = Multimodal.decodeAudio(spark, m, 2).orderBy("mediaId").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 8000 &&
      out(0).getLong(3) == 500L)
    assert(out(1).getInt(1) == 2 && out(1).getInt(2) == 44100 &&
      out(1).getLong(3) == 250L)
    assert(out.forall(_.getBoolean(4)))
    // the text payload took the deterministic fallback, not a codec error
    assert(out(2).getInt(1) >= 1 && out(2).getInt(2) >= 8000 &&
      out(2).getLong(3) > 0L)
  }

  test("audioStats: real PCM samples decode from the WAV data chunk only") {
    // author a 16-bit mono WAV around KNOWN samples via the JDK encoder
    def wavOf(samples: Seq[Int]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      // alternating wave: n=4, peak=1000, rms=1000 -> 1_000_000 milli,
      // 3 sign changes. Counting any HEADER byte would break n_samples.
      (1L, wavOf(Seq(1000, -1000, 1000, -1000))),
      // constant positive: zc=0, rms=peak=7
      (2L, wavOf(Seq(7, 7, 7))),
      // raw (non-WAV) payload takes the SAME s16le arithmetic over its
      // bytes: "ab" -> u = 0x62*256 + 0x61 = 25185, one sample
      (3L, "ab".getBytes("UTF-8")),
      (4L, Array.empty[Byte]))
      .toDF("id", "payload")
    val m = Multimodal.asMedia(rows, col("id"), col("payload"),
      lit("audio/mixed"), lit("unit"), lit(0L))
    val out = Multimodal.audioStats(spark, m, 2).orderBy("mediaId")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out(0) == ((1L, 4L, 1000L, 1000000L, 3L, true)), out(0))
    assert(out(1) == ((2L, 3L, 7L, 7000L, 0L, true)), out(1))
    assert(out(2) == ((3L, 1L, 25185L, 25185000L, 0L, true)), out(2))
    assert(out(3) == ((4L, 0L, 0L, 0L, 0L, false)), out(3))
  }

  test("audioStats/decodeAudio: corrupt RIFF chunk sizes fall back, never hang") {
    // Hand-author RIFF/WAVE payloads whose declared chunk size wraps
    // negative as an Int (0xFFFFFFF7 = -9 -> zero-advance infinite
    // loop pre-fix; 0xFFFFFFF8 = -8 -> backwards step) or declares a
    // size beyond the payload. The walk must bail to the raw-bytes
    // fallback instead of hanging an executor task or crashing.
    def riff(chunkId: String, declaredSize: Long, tail: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes("US-ASCII"))
      bos.write(Array[Byte](0, 1, 0, 0)) // riff size, unchecked
      bos.write("WAVE".getBytes("US-ASCII"))
      bos.write(chunkId.getBytes("US-ASCII"))
      val le = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(declaredSize.toInt)
      bos.write(le.array())
      bos.write(tail)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, riff("fmt ", 0xFFFFFFF7L, Array.fill[Byte](32)(3))), // sz=-9: step 0
      (2L, riff("data", 0xFFFFFFF8L, Array.fill[Byte](32)(5))), // sz=-8: step<0
      (3L, riff("data", 1L << 30, Array.fill[Byte](16)(9))))    // sz >> payload
      .toDF("id", "payload")
    val m = Multimodal.asMedia(rows, col("id"), col("payload"),
      lit("audio/bad"), lit("unit"), lit(0L))
    // must complete (no hang), taking the raw-bytes s16le path: sample
    // count = floor(payload len / 2) over the WHOLE payload
    val stats = Multimodal.audioStats(spark, m, 2).orderBy("mediaId").collect()
    assert(stats.length == 3)
    assert(stats.forall(_.getBoolean(5)))                 // ok via fallback
    assert(stats.forall(_.getLong(1) > 0L))               // nSamples > 0
    assert(stats.forall(r => r.getLong(1) >= 0L))         // never negative
    val meta = Multimodal.decodeAudio(spark, m, 2).orderBy("mediaId").collect()
    assert(meta.length == 3 && meta.forall(_.getBoolean(4)))
  }

  test("videoStats: real MJPEG frames count by SOI scan; segments and SAD are exact") {
    // author a REAL MJPEG stream: concatenated JDK-encoded JPEG frames
    // (JPEG escapes 0xFF in entropy data as FF 00, so FF D8 FF appears
    // exactly once per frame — at its SOI)
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(jpeg(8, 8, 0xff0000), jpeg(16, 8, 0x00ff00), jpeg(8, 16, 0x0000ff))
    val mjpeg = frames.flatten.toArray
    val rows = Seq(
      (1L, mjpeg),
      (2L, "plain text payload".getBytes("UTF-8")),
      (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val m = Multimodal.asMedia(rows, col("id"), col("payload"),
      lit("video/mjpeg"), lit("unit"), lit(0L))
    val out = Multimodal.videoStats(spark, m, 2).orderBy("mediaId")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // real MJPEG: one SOI per authored frame; the largest segment is the
    // largest encoded frame; adjacent-byte SAD is positive
    assert(out(0)._2 == 3L, s"expected 3 frames, got ${out(0)}")
    assert(out(0)._3 == frames.map(_.length).max.toLong, out(0))
    assert(out(0)._4 > 0L)
    assert(out(0)._5)
    // text payload: zero frames, one whole-payload segment, exact SAD
    val tb = "plain text payload".getBytes("UTF-8")
    val wantSad = tb.sliding(2).map(p => math.abs((p(1) & 0xff) - (p(0) & 0xff)).toLong).sum
    assert(out(1) == ((2L, 0L, tb.length.toLong, wantSad, true)), out(1))
    assert(out(2) == ((3L, 0L, 0L, 0L, false)), out(2))
  }

  test("decodeVideo: real MP4 container headers yield size and duration") {
    // author real ISO-BMFF bytes by the box grammar — no fixtures
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(typ.getBytes("US-ASCII")); bb.put(payload)
      bb.array()
    }
    def mp4Bytes(w: Int, h: Int, timescale: Int, duration: Long,
                 version: Int): Array[Byte] = {
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0))
      val mvhd =
        if (version == 0) {
          val bb = java.nio.ByteBuffer.allocate(100)
          bb.position(12); bb.putInt(timescale); bb.putInt(duration.toInt)
          bb.array()
        } else {
          val bb = java.nio.ByteBuffer.allocate(112)
          bb.put(0, 1.toByte)
          bb.position(20); bb.putInt(timescale); bb.putLong(duration)
          bb.array()
        }
      val tkhd =
        if (version == 0) {
          val bb = java.nio.ByteBuffer.allocate(84)
          bb.position(76); bb.putInt(w << 16); bb.putInt(h << 16)
          bb.array()
        } else {
          val bb = java.nio.ByteBuffer.allocate(96)
          bb.put(0, 1.toByte)
          bb.position(88); bb.putInt(w << 16); bb.putInt(h << 16)
          bb.array()
        }
      ftyp ++ box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    }
    val rows = Seq(
      (1L, mp4Bytes(640, 360, 600, 3000L, version = 0)),   // 5000 ms
      (2L, mp4Bytes(1920, 1080, 90000, 90000L, version = 1)), // 1000 ms
      (3L, "definitely not a video".getBytes("UTF-8")))
      .toDF("id", "payload")
    val m = Multimodal.asMedia(rows, col("id"), col("payload"),
      lit("video/mixed"), lit("unit"), lit(0L))
    val out = Multimodal.decodeVideo(spark, m, 2).orderBy("mediaId").collect()
    assert(out(0).getInt(1) == 640 && out(0).getInt(2) == 360 &&
      out(0).getLong(3) == 5000L)
    assert(out(1).getInt(1) == 1920 && out(1).getInt(2) == 1080 &&
      out(1).getLong(3) == 1000L)
    assert(out.forall(_.getBoolean(4)))
    // the text payload took the deterministic fallback, not a parse error
    assert(out(2).getInt(1) >= 160 && out(2).getInt(2) >= 90 &&
      out(2).getLong(3) > 0L)
  }

  test("metadata-only projection does not read the binary column (pruned scan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("media_id", "meta.mime")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.split("ReadSchema")(1).contains("content"))
  }

  test("aHash: deterministic bands, hand-checked on a uniform payload") {
    // 64 'a' bytes: every tap = 97, so tap·64 > Σtaps (= 97·64) is false
    // for every bit — all bands must be zero.
    val m = Multimodal.asMedia(
      Seq((1L, "a" * 64)).toDF("id", "payload"),
      col("id"), col("payload"), lit("image/png"), lit("unit"), lit(0L))
    val r = Multimodal.aHash(m).collect().head
    assert((1 to 8).forall(b => r.getLong(b) == 0L))
    // half low / half high bytes: exactly the high half's bits set.
    // taps sample 'a'(97)×32 then 'z'(122)×32; mean sits between, so
    // bands 0..3 are 0 and bands 4..7 are all-ones (255).
    val m2 = Multimodal.asMedia(
      Seq((1L, "a" * 32 + "z" * 32)).toDF("id", "payload"),
      col("id"), col("payload"), lit("image/png"), lit("unit"), lit(0L))
    val r2 = Multimodal.aHash(m2).collect().head
    assert((1 to 4).forall(b => r2.getLong(b) == 0L))
    assert((5 to 8).forall(b => r2.getLong(b) == 255L))
  }

  test("aHash: empty payload hashes to all-zero bands, no error") {
    val m = Multimodal.asMedia(
      Seq((1L, "")).toDF("id", "payload"),
      col("id"), col("payload"), lit("image/png"), lit("unit"), lit(0L))
    val r = Multimodal.aHash(m).collect().head
    assert((1 to 8).forall(b => r.getLong(b) == 0L))
  }

  test("phashNearDupPairs: identical payloads pair at hamming 0; distant ones don't") {
    val m = Multimodal.asMedia(
      Seq((1L, "a" * 32 + "z" * 32), (2L, "a" * 32 + "z" * 32),
          (3L, "z" * 32 + "a" * 32)).toDF("id", "payload"),
      col("id"), col("payload"), lit("image/png"), lit("unit"), lit(0L))
    val pairs = Multimodal.phashNearDupPairs(m, maxHamming = 7, maxBucketSize = 100)
      .orderBy("id_a", "id_b").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L &&
      pairs.head.getLong(2) == 0L)
  }

  test("phashNearDupPairs: pigeonhole needs maxHamming < aHashBands") {
    val m = Multimodal.asMedia(
      Seq((1L, "x")).toDF("id", "payload"),
      col("id"), col("payload"), lit("image/png"), lit("unit"), lit(0L))
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDupPairs(m, maxHamming = 8)
    }
  }
}

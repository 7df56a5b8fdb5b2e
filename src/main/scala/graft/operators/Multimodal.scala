package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample plumbing.
  *
  * The byte-level ops (size, hash, base64, frame offsets) are pure
  * Catalyst expressions. The actual image/audio decode is STUBBED — the
  * codec libraries are not in this container — behind
  * [[decodePartition]], which has the real production signature
  * (per-partition batch iterator, the Scala analog of mapInPandas) and a
  * deterministic fake implementation, so the Spark-side schema,
  * partitioning, and batch shape are real and tested while the codec
  * call is a single marked swap-point.
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

  /** STUB — production swap-point for the real codec. Signature and
    * batch shape are the real ones (partition iterator in, iterator
    * out — the JVM analog of mapInPandas); the body derives
    * deterministic fake dimensions from the payload bytes so the
    * pipeline is testable end-to-end without image libraries.
    */
  def decodePartition(rows: Iterator[Row]): Iterator[DecodedMeta] =
    rows.map { r =>
      val id = r.getAs[Long]("media_id")
      val content = r.getAs[Array[Byte]]("content")
      if (content == null || content.isEmpty) DecodedMeta(id, 0, 0, ok = false)
      else {
        // deterministic fake: dimensions from the first payload bytes
        val w = 64 + (content(0) & 0x7f)
        val h = 64 + (content(content.length / 2) & 0x7f)
        DecodedMeta(id, w, h, ok = true)
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

  private object Encoders {
    def product[T <: Product : scala.reflect.runtime.universe.TypeTag]
      : org.apache.spark.sql.Encoder[T] = org.apache.spark.sql.Encoders.product[T]
  }
}

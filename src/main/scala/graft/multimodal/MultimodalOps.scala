package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with a typed metadata struct —
  * the engine never interprets the bytes outside the decode seam. The
  * decode kernels themselves (JPEG decode, resampling, frame extraction)
  * are STUBBED with deterministic byte-level fakes — the image/audio
  * libraries are not in this container — but every Spark-side contract a
  * real decoder needs is in place and tested: schema, partition-local
  * batched iteration in mapPartitions, per-row 0..n frame fan-out,
  * metadata propagation.
  *
  * Reference analogue: the video batch scan S1 + per-frame kernels C1-C7
  * (pupil_detection_pl.py:94-133, marker_detection.py:29-47) — frames
  * never become a long-lived table; only per-frame feature rows do.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Wrap any table into the media shape for pipeline testing: bytes =
    * UTF-8 of a text column, synthetic dimensions from the byte length. */
  def packAsMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("bytes"),
      struct(
        lit("fake/raw").as("format"),
        (length(col(textCol)) % 640 + 16).cast("int").as("width"),
        (length(col(textCol)) % 480 + 16).cast("int").as("height"),
        (length(col(textCol)) % 8 + 1).cast("int").as("n_frames")).as("meta"))

  /** Feature dimension of the stub decoder. */
  val FeatureDim = 16

  /** STUB decode kernel: a real implementation would JPEG/PNG-decode and
    * run a vision model per batch; the deterministic stand-in is a 16-bin
    * normalized byte histogram. Runs per partition over the raw bytes —
    * exactly where an FFI decoder batch would sit. */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    var j = 0
    while (j < FeatureDim) { hist(j) /= bytes.length; j += 1 }
    hist
  }

  /** Decode/feature-extract: media table → (media_id, features). Batch
    * shape: one mapPartitions pass, rows streamed, no per-row JVM↔native
    * round-trips in a real decoder. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val bIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.map { r =>
        Row(r.getLong(idIdx), decodeStub(r.getAs[Array[Byte]](bIdx)).toSeq)
      }
    }
  }

  /** Frame sampling: fan each media row out to every `stride`-th frame
    * index (0..n_frames) — the S1 "frame-range batch" shape, rows stay
    * partition-local until a downstream shuffle asks otherwise. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("meta"),
      explode(sequence(lit(0),
        greatest(col("meta.n_frames") - 1, lit(0)), lit(stride)))
        .as("frame_index"))

  /** Resize: metadata-only transform (a real decoder would re-encode
    * bytes; dims update is the contract downstream operators read). */
  def resizeMeta(media: DataFrame, scale: Double): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      (col("meta.width") * scale).cast("int").as("width"),
      (col("meta.height") * scale).cast("int").as("height"),
      col("meta.n_frames").as("n_frames")))
}

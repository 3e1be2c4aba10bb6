package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for the training-data pipeline: media payloads
  * as opaque `binary` columns with a typed metadata struct, plus a
  * partition-parallel feature-extraction pass.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment): `decodeStub` computes a deterministic byte histogram in
  * place of a real decoder. Everything around it — binary schema, metadata
  * struct, mapPartitions batching, fixed-width feature vectors, frame
  * sampling — is the real distributed shape: per-partition iteration with no
  * driver collection, constant memory per row, codegen-friendly downstream.
  */
object Multimodal {

  /** Derive a media table from documents: payload = utf8 bytes (stand-in for
    * an image/audio blob), metadata inferred deterministically. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        length(col("text")).cast("bigint").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType)),
    StructField("frame_sample", BinaryType)))

  /** STUB decoder: byte-value histogram (16 bins, L1-normalized) instead of
    * a codec; a real deployment swaps only this function. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1f; i += 1 }
    if (payload.length > 0) {
      var b = 0
      while (b < 16) { bins(b) /= payload.length.toFloat; b += 1 }
    }
    bins
  }

  private val resizeSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("payload", BinaryType)))

  /** STUB resize: a real codec would decode, scale, re-encode; the stub
    * keeps every `stride`-th byte (deterministic downsample) and rescales
    * the metadata dims — the Spark-side shape (binary in/out, metadata
    * propagation, per-partition batching) is the real contract. */
  def resize(media: DataFrame, stride: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizeSchema)
    media.select(col("media_id"), col("kind"),
        col("meta.width"), col("meta.height"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val out = new Array[Byte]((payload.length + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = payload(i * stride); i += 1 }
          org.apache.spark.sql.Row(
            r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            r.getAs[Int]("width") / stride, r.getAs[Int]("height") / stride,
            out)
        }
      }(enc)
  }

  /** Every `n`-th byte as a "frame" (a video codec would seek keyframes);
    * one row per sampled frame — the explode-style shape a frame-level
    * pipeline consumes. */
  def frameSample(media: DataFrame, everyN: Int, maxFrames: Int): DataFrame =
    // zero-length payloads yield zero frames — unguarded, (len-1)/everyN
    // floors to 0 (or -1) and sequence() would emit phantom frame rows
    media.filter(length(col("payload")) > 0)
      .select(col("media_id"), col("kind"),
        posexplode(slice(transform(
          sequence(lit(0), ((length(col("payload")) - 1) / everyN).cast("int")),
          i => substring(col("payload"), (i * everyN + 1).cast("int"), lit(1))),
          1, maxFrames)).as(Seq("frame_no", "frame")))

  /** Partition-parallel featurize: binary → fixed-width float vector +
    * deterministic "frame sample" (first 8 bytes — a codec would seek). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    media.select(col("media_id"), col("kind"), col("meta.n_bytes"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          org.apache.spark.sql.Row(
            r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            r.getAs[Long]("n_bytes"), decodeStub(payload).toSeq,
            payload.take(8))
        }
      }(enc)
  }
}

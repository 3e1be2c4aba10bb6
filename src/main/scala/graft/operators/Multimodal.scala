package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for the training-data pipeline: media payloads
  * as opaque `binary` columns with a typed metadata struct, plus a
  * partition-parallel feature-extraction pass.
  *
  * The decode story is in TWO tiers. REAL codecs run where the JDK ships
  * them: [[imageTable]]/[[decodeImageStats]] decode actual PNG/JPEG bytes
  * with ImageIO (q263/q264) and [[audioTable]]/[[decodeAudioStats]] parse WAV
  * with javax.sound (q280), all as compiled `mapPartitions` kernels whose
  * outputs are hash-checked against closed-form oracles (lossless codecs
  * over generated signals). Only the GENERIC `decodeStub` below — the
  * slot a video/proprietary codec would fill — remains a deterministic
  * byte histogram, and even that is oracle-hash-checked (q74: the
  * histogram is closed-form over an ASCII corpus). Everything around the
  * decode — binary schema, metadata struct, mapPartitions batching,
  * fixed-width feature vectors, frame sampling — is the real distributed
  * shape: per-partition iteration with no driver collection, constant
  * memory per row, codegen-friendly downstream.
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

  // ---- Real image decode kernel (ImageIO) ------------------------------

  /** Deterministic synthetic RGB image: image `id` has dims
    * `w = 8 + id % 9`, `h = 8 + id % 7` and pixel (x,y) channels
    * {{{
    *   r = (31*id + 7*x + 13*y) % 256
    *   g = (17*id + 5*x + 11*y) % 256
    *   b = (23*id + 3*x + 19*y) % 256
    * }}}
    * — a closed form ANY engine can recompute. PNG encoding is lossless,
    * so statistics computed from the DECODED pixels must equal the
    * generator arithmetic exactly: the decode kernel gets a real
    * hash-checkable oracle instead of a rows-only waiver. */
  def synthImage(id: Long, format: String = "png"): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((31 * id + 7 * x + 13 * y) % 256).toInt
        val g = ((17 * id + 5 * x + 11 * y) % 256).toInt
        val b = ((23 * id + 3 * x + 19 * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, baos),
      s"no ImageIO writer for format '$format'")
    baos.toByteArray
  }

  private val imageSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("payload", BinaryType)))

  /** Media table of REAL encoded image files (PNG by default; "jpg" for
    * the lossy path): payload is a decodable image, generated
    * per-partition — no driver-side materialization, embarrassingly
    * parallel, same shape a 100 TB ingest of raw media blobs has. */
  def imageTable(docs: DataFrame, format: String = "png"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageSchema)
    docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id, "image", synthImage(id, format))
      }
    }(enc)
  }

  private val decodeSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("status", StringType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("r_sum", LongType), StructField("g_sum", LongType),
    StructField("b_sum", LongType), StructField("wsum", LongType)))

  /** REAL decode: `ImageIO.read` over the binary payload in a compiled
    * mapPartitions pass — per-row decode, constant memory, no shuffle, no
    * driver collection. Exposes decoded dims + channel count, per-channel
    * pixel sums, and a position-weighted checksum
    * `wsum = Σ (1 + x + y*w)·(r+g+b)` that catches pixel-ORDER errors a
    * plain sum would miss. Undecodable payloads follow the PERMISSIVE
    * rescue-column discipline (q258 / `Sources` JSON rescue): the row
    * survives with `status='corrupt'` and NULL stats — one bad blob can
    * never fail a 100 TB decode job. */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodeSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val decoded =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case None =>
            org.apache.spark.sql.Row(
              id, "corrupt", null, null, null, null, null, null, null)
          case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            var rs = 0L; var gs = 0L; var bs = 0L; var ws = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val rr = (p >> 16) & 0xFF
                val gg = (p >> 8) & 0xFF
                val bb = p & 0xFF
                rs += rr; gs += gg; bs += bb
                ws += (1L + x + y.toLong * w) * (rr + gg + bb)
                x += 1
              }
              y += 1
            }
            org.apache.spark.sql.Row(id, "ok", w, h,
              img.getColorModel.getNumComponents, rs, gs, bs, ws)
        }
      }
    }(enc)
  }

  // ---- Real audio decode kernel (javax.sound WAV) ----------------------

  /** Deterministic synthetic WAV: audio `id` is 8-bit unsigned mono PCM at
    * 8 kHz with `n = 64 + id % 65` samples, sample t = `(37*id + 11*t) %
    * 256` — closed-form, and PCM in a WAV container is LOSSLESS, so stats
    * computed from the DECODED samples equal the generator arithmetic
    * (the audio twin of [[synthImage]]). */
  def synthWav(id: Long): Array[Byte] = {
    val n = (64 + id % 65).toInt
    val data = new Array[Byte](n)
    var t = 0
    while (t < n) { data(t) = ((37 * id + 11 * t) % 256).toByte; t += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Media table of REAL WAV files — same per-partition generation shape
    * as [[imageTable]]. */
  def audioTable(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageSchema)
    docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id, "audio", synthWav(id))
      }
    }(enc)
  }

  private val audioSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("status", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("s_sum", LongType), StructField("wsum", LongType)))

  /** REAL audio decode: `AudioSystem.getAudioInputStream` over the binary
    * payload in a compiled mapPartitions pass — format metadata (rate,
    * channels), sample count, sample sum, and the position-weighted
    * checksum `wsum = Σ (t+1)·s[t]`. Same rescue discipline as
    * [[decodeImageStats]]: an undecodable payload survives with
    * `status='corrupt'` and NULL stats. */
  def decodeAudioStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          var ss = 0L; var ws = 0L
          var t = 0
          while (t < bytes.length) {
            val v = bytes(t) & 0xFF
            ss += v; ws += (t + 1L) * v
            t += 1
          }
          org.apache.spark.sql.Row(id, "ok", fmt.getSampleRate.toInt,
            fmt.getChannels, bytes.length.toLong, ss, ws)
        } catch {
          case scala.util.control.NonFatal(_) =>
            org.apache.spark.sql.Row(
              id, "corrupt", null, null, null, null, null)
        }
      }
    }(enc)
  }

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

package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Real image decode kernel ([[Multimodal.synthImage]] /
  * [[Multimodal.imageTable]] / [[Multimodal.decodeImageStats]]): lossless
  * PNG roundtrip at per-pixel granularity, the lossy JPEG path (dims and
  * channel count survive; pixels need not), and the PERMISSIVE
  * rescue-column discipline for undecodable payloads — junk bytes AND a
  * truncated real PNG — which must never fail the job or drop rows.
  */
class MultimodalDecodeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-mmdec")

  override def afterAll(): Unit = spark.stop()

  private def idsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  test("PNG roundtrip is pixel-exact against the closed-form generator") {
    for (id <- Seq(0L, 1L, 17L, 123L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthImage(id)))
      assert(img.getWidth == (8 + id % 9).toInt)
      assert(img.getHeight == (8 + id % 7).toInt)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xFF) == ((31 * id + 7 * x + 13 * y) % 256).toInt,
          s"R mismatch at id=$id ($x,$y)")
        assert(((p >> 8) & 0xFF) == ((17 * id + 5 * x + 11 * y) % 256).toInt,
          s"G mismatch at id=$id ($x,$y)")
        assert((p & 0xFF) == ((23 * id + 3 * x + 19 * y) % 256).toInt,
          s"B mismatch at id=$id ($x,$y)")
      }
    }
  }

  test("JPEG path decodes with correct dims and 3 channels (lossy pixels)") {
    val media = Multimodal.imageTable(idsDf(0L to 20L), format = "jpg")
    val rows = Multimodal.decodeImageStats(media)
      .select("media_id", "status", "width", "height", "channels")
      .collect()
    assert(rows.length == 21)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "ok", s"jpeg id=$id not decoded")
      assert(r.getInt(2) == (8 + id % 9).toInt)
      assert(r.getInt(3) == (8 + id % 7).toInt)
      assert(r.getInt(4) == 3)
    }
  }

  test("undecodable payloads (junk AND truncated real PNG) follow the" +
      " rescue discipline: row survives, status=corrupt, stats NULL") {
    import spark.implicits._
    val png = Multimodal.synthImage(5L)
    val rows = Seq(
      (1L, png),                                  // healthy
      (2L, "garbage".getBytes("UTF-8")),          // unrecognized header
      (3L, png.take(png.length / 2)),             // truncated mid-stream
      (4L, Array.empty[Byte]))                    // empty payload
      .toDF("media_id", "payload")
    val got = Multimodal.decodeImageStats(rows)
      .orderBy("media_id").collect()
    assert(got.map(_.getString(1)).toSeq ==
      Seq("ok", "corrupt", "corrupt", "corrupt"))
    assert(!got(0).isNullAt(2) && got(0).getInt(2) == (8 + 5 % 9))
    got.drop(1).foreach { r =>
      (2 to 8).foreach(i => assert(r.isNullAt(i),
        s"corrupt row ${r.getLong(0)} leaked a non-null stat at ordinal $i"))
    }
  }

  test("WAV roundtrip is sample-exact; undecodable audio follows the" +
      " rescue discipline") {
    // lossless PCM: decoded bytes == generator bytes
    for (id <- Seq(0L, 7L, 64L)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.synthWav(id)))
      val bytes = ais.readAllBytes()
      assert(bytes.length == (64 + id % 65).toInt)
      bytes.zipWithIndex.foreach { case (b, t) =>
        assert((b & 0xFF) == ((37 * id + 11 * t) % 256).toInt,
          s"sample mismatch at id=$id t=$t")
      }
    }
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.synthWav(3L)),
      (2L, "not-audio".getBytes("UTF-8")),
      (3L, Multimodal.synthWav(3L).take(10))) // truncated header
      .toDF("media_id", "payload")
    val got = Multimodal.decodeAudioStats(rows).orderBy("media_id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("ok", "corrupt", "corrupt"))
    assert(got(0).getInt(2) == 8000 && got(0).getInt(3) == 1)
    got.drop(1).foreach { r =>
      (2 to 6).foreach(i => assert(r.isNullAt(i)))
    }
  }

  test("decode stats equal the generator arithmetic through the full" +
      " distributed pass (multi-partition, no driver collection)") {
    val media = Multimodal.imageTable(idsDf(0L until 64L).repartition(8))
    val got = Multimodal.decodeImageStats(media)
      .agg(sum("r_sum"), sum("g_sum"), sum("b_sum"), sum("wsum"))
      .head()
    var rs = 0L; var gs = 0L; var bs = 0L; var ws = 0L
    for (id <- 0L until 64L) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      for (y <- 0 until h; x <- 0 until w) {
        val r = (31 * id + 7 * x + 13 * y) % 256
        val g = (17 * id + 5 * x + 11 * y) % 256
        val b = (23 * id + 3 * x + 19 * y) % 256
        rs += r; gs += g; bs += b
        ws += (1L + x + y.toLong * w) * (r + g + b)
      }
    }
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((rs, gs, bs, ws)))
  }
}

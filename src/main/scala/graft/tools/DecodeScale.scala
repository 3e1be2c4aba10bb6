package graft.tools

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** SURVEY §6 scale evidence for the real decode kernels (q263/q280): the
  * image and audio decode passes at ×1 (400 media) vs ×64 (25,600),
  * best-of-2 wall each. The claim under test: decode is a compiled
  * per-partition map with no shuffle and no driver collection, so wall
  * scales with rows/parallelism — sublinearly at local[32] until the
  * cores saturate, linearly after, never worse.
  *
  * Usage: `sbt "runMain graft.tools.DecodeScale"`.
  */
object DecodeScale {
  def main(args: Array[String]): Unit = {
    val s = graft.Engine.session(cores = 32, appName = "graft-decode-scale")
    import s.implicits._
    def ids(n: Int) = (0L until n.toLong).toDF("doc_id").repartition(32)
    def best2(tag: String)(run: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      System.err.println(f"[decode-scale] $tag $t%.2fs")
      t
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val img1 = best2("image x1 (400)") {
      noop(Multimodal.decodeImageStats(Multimodal.imageTable(ids(400)))) }
    val img64 = best2("image x64 (25600)") {
      noop(Multimodal.decodeImageStats(Multimodal.imageTable(ids(25600)))) }
    val aud1 = best2("audio x1 (400)") {
      noop(Multimodal.decodeAudioStats(Multimodal.audioTable(ids(400)))) }
    val aud64 = best2("audio x64 (25600)") {
      noop(Multimodal.decodeAudioStats(Multimodal.audioTable(ids(25600)))) }
    println(f"""{"metric":"decode_scale","image_x1":$img1%.3f,"image_x64":$img64%.3f,"image_ratio":${img64 / img1}%.2f,"audio_x1":$aud1%.3f,"audio_x64":$aud64%.3f,"audio_ratio":${aud64 / aud1}%.2f}""")
    s.stop()
  }
}

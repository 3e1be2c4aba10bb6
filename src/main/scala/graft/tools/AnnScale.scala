package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{AnnSearch, IvfPq, PqAnn}

/** SURVEY §6 scale evidence for the ANN family (q44/q347/q348): how do
  * brute-force, PQ-ADC, and IVF-PQ walls grow as the corpus grows ×16/×64,
  * and what recall does the pruned search keep?
  *
  * The corpus replicates the sf0.1 embeddings table with vec_id offsets
  * (the ScaleUp discipline): new ids, same vectors — a crawl with
  * duplication factor N. The coarse stride is FIXED, so nlist grows with
  * the corpus (2000 rows/50 = 40 lists → 2560 at ×64) while nprobe stays 8:
  * the probed fraction shrinks as the corpus grows, which is exactly the
  * IVFADC scaling contract (Jégou et al. 2011 §IV) — per-query work tracks
  * nprobe·(corpus/nlist)·m lookups, not corpus·dim multiplies.
  *
  * Expected shape: brute wall grows ~linearly with the corpus; PQ-ADC grows
  * linearly too but with an m-lookup row cost; IVF-PQ grows sublinearly
  * (probe fraction shrinks). Recall@10 is measured against brute at the
  * SAME scale (the duplicated corpus makes top-k ties adversarial — every
  * original neighbor now has 64 copies, so the shortlist must absorb the
  * duplication; shortlist scales with the factor for the recall row).
  *
  * Usage: sbt "runMain graft.tools.AnnScale"
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, appName = "graft-annscale")
    import spark.implicits._
    val root = "/root/repo/target/annscale"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val base = Engine.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val stride = base.agg(max("id")).head.getLong(0) + 1L
    val queries = base.filter(col("id") < 30).cache()
    queries.count()

    def corpusAt(factor: Int): DataFrame = {
      val out = s"$root/x$factor"
      base.withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
        .select((col("id") + col("__rep") * stride).as("id"), col("embedding"))
        .repartition(math.max(8, factor / 2))
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }

    def best2(label: String)(run: => DataFrame): (Double, Set[(Long, Long)]) = {
      def once(): (Double, Set[(Long, Long)]) = {
        val t0 = System.nanoTime()
        val rows = run.select("qid", "cid").as[(Long, Long)].collect().toSet
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val a = once(); val b = once()
      val best = if (a._1 <= b._1) a else b
      println(f"[annscale] $label wall=${best._1}%.2fs rows=${best._2.size}")
      best
    }

    for (factor <- Seq(1, 16, 64)) {
      val corpus = corpusAt(factor)
      val n = corpus.count()
      println(s"[annscale] ×$factor corpus rows=$n")
      // shortlist absorbs the ×factor duplication of every true neighbor
      val sl = 64 * factor
      val (bw, brute) = best2(s"x$factor brute")(
        AnnSearch.bruteTopK(queries, corpus, 10))
      val (pw, pq) = best2(s"x$factor pq-adc")(
        PqAnn.pqTopK(queries, corpus, 10, m = 16, ncent = 16, stride = 7,
          shortlist = sl))
      val (iw, ivf) = best2(s"x$factor ivf-pq")(
        IvfPq.ivfPqTopK(queries, corpus, 10, centroidStride = 50, nprobe = 8,
          m = 16, ncent = 16, pqStride = 7, shortlist = sl))
      def recall(s: Set[(Long, Long)]) = (brute & s).size.toDouble / brute.size
      println(f"[annscale] ×$factor brute=$bw%.2fs pq=$pw%.2fs ivfpq=$iw%.2fs " +
        f"recall(pq)=${recall(pq)}%.3f recall(ivfpq)=${recall(ivf)}%.3f")
    }
    spark.stop()
  }
}

package graft.tools
import graft._
import graft.operators._
import org.apache.spark.sql.functions._
object PqProbe {
  def main(a: Array[String]): Unit = {
    val spark = Engine.session(cores = 4, appName = "pq-probe")
    import spark.implicits._
    val emb = Engine.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"), col("label"))
    val queries = emb.filter(col("id") < 30)
    val brute = AnnSearch.bruteTopK(queries, emb, 10)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    for (sl <- Seq(32, 64, 96, 128); m <- Seq(8, 16)) {
      val pq = PqAnn.pqTopK(queries, emb, 10, m = m, ncent = 16, stride = 7, shortlist = sl)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      println(s"m=$m shortlist=$sl recall=${(brute & pq).size.toDouble / brute.size}")
    }
    // stride vs Lloyd-trained codebooks (q355/q356): same m/ncent/shortlist,
    // the codebook is the only variable
    for (it <- Seq(0, 2)) {
      val pq = PqAnn.pqTopK(queries, emb, 10, m = 16, ncent = 16, stride = 7,
          shortlist = 64, iters = it)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val ivf = IvfPq.ivfPqTopK(queries, emb, 10, centroidStride = 40,
          nprobe = 4, m = 16, ncent = 16, pqStride = 7, shortlist = 64,
          pqIters = it)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      println(s"iters=$it pqRecall=${(brute & pq).size.toDouble / brute.size} " +
        s"ivfPqRecall=${(brute & ivf).size.toDouble / brute.size}")
    }
    spark.stop()
  }
}

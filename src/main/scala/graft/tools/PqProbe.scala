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
    spark.stop()
  }
}

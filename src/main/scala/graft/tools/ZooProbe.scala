package graft.tools
import graft.Engine
import graft.operators.IndexZooSql
import org.apache.spark.sql.functions._

/** Phase-level wall breakdown of the q382 index-DDL lifecycle (the
  * TxnReadProbe discipline applied to the index zoo): times each
  * statement — reset / CREATE GRAPH / indexed probe / DROP / degraded
  * probe — twice in one session, so registry-persistence overhead
  * (r17: FS entry files + table fingerprinting) is separable from the
  * index build and walk costs. Measured r17 warm: reset+drop are
  * ms-scale, create ~2.4 s (the writeIndex build itself), indexed probe
  * ~1.9 s (the descent's driver-paced jobs) — the registry adds
  * filesystem metadata round-trips only.
  *
  * Usage: sbt "runMain graft.tools.ZooProbe"
  */
object ZooProbe {
  def t[A](l: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[zooprobe] $l%-22s ${(System.nanoTime()-t0)/1e9}%.3fs"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = Engine.session(cores = 32, appName = "zooprobe")
    val e = Engine.table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
    for (i <- 1 to 2) {
      println(s"[zooprobe] ---- iter $i ----")
      t("reset")(IndexZooSql.reset(s))
      e.filter(col("id") < 200).createOrReplaceTempView("zp_corpus")
      e.filter(col("id") < 50).createOrReplaceTempView("zp_queries")
      t("create GRAPH")(IndexZooSql.sql(s, "CREATE VECTOR INDEX zp_vi ON zp_corpus (embedding) AS 'GRAPH' OPTIONS (m=8, m1=4, buckets=16, path='/tmp/zooprobe/vi')"))
      val probe = "VECTOR TOPK ON zp_corpus (embedding) QUERIES zp_queries LIMIT 10 OPTIONS (ef1=8, hops1=2, ef=16, hops=2)"
      t("probe indexed")(IndexZooSql.sql(s, probe).write.format("noop").mode("overwrite").save())
      t("drop")(IndexZooSql.sql(s, "DROP VECTOR INDEX zp_vi"))
      t("probe degraded")(IndexZooSql.sql(s, probe).write.format("noop").mode("overwrite").save())
    }
    s.stop()
  }
}

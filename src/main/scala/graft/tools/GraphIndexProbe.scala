package graft.tools

import graft.Engine
import graft.operators.GraphAnn
import org.apache.spark.sql.functions._

/** Phase-level wall breakdown of the q379–q381 persisted-graph-index
  * lifecycles at the bench SF — the tuning companion of TxnReadProbe.
  * Run: sbt "runMain graft.tools.GraphIndexProbe /root/testdata/sf0.1" */
object GraphIndexProbe {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = 32, appName = "graph-index-probe")
    Engine.registerAll(spark, dir)
    val e = Engine.table(spark, dir, "embeddings").select(
      col("vec_id").as("id"), col("embedding"), col("label"))
    val idx = "/tmp/gidxprobe/idx"
    for (iter <- 1 to 2) {
      println(s"[probe] ---- iteration $iter ----")
      val half = e.filter(col("id") % 4 <= 1)
      val g0 = t("build half_m8")(
        GraphAnn.knnGraph(half, 8).localCheckpoint(true))
      val g1 = t("build halflvl1_m4")(
        GraphAnn.knnGraph(GraphAnn.levelNodes(half, 1), 4)
          .localCheckpoint(true))
      t("writeIndex")(GraphAnn.writeIndex(half, idx, 8, 4, 16,
        g0Opt = Some(g0), g1Opt = Some(g1)))
      t("addBatch 1")(GraphAnn.addBatch(idx, e.filter(col("id") % 4 === 2),
        8, 2, 16, 2))
      t("addBatch 2")(GraphAnn.addBatch(idx, e.filter(col("id") % 4 === 3),
        8, 2, 16, 2))
      t("probeIndex collect")(GraphAnn.probeIndex(
        e.filter(col("id") < 50), idx, 10, 8, 2, 16, 2).collect())
    }
    spark.stop()
  }
}

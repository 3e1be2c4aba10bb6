package graft.tools

import graft.Engine
import graft.operators.TxnMergeOnRead
import org.apache.spark.sql.functions._

/** Phase-level wall breakdown of the q198/q199 bench bodies plus a
  * readAt/changesBetween wall-vs-log-length curve — the measurement VERDICT
  * r15 task 1 asks for ("test the compounding-cost hypothesis: measure
  * changesBetween/readAt wall vs txn-log length"). Run:
  *
  *   sbt "runMain graft.tools.TxnReadProbe /root/testdata/sf0.1"
  *
  * Prints [probe] lines: per-phase walls for the exact query lifecycles and
  * the read wall at growing version counts on one workspace.
  */
object TxnReadProbe {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = 32, appName = "txn-read-probe")
    Engine.registerAll(spark, dir)
    val loc = "/tmp/txnprobe"
    new java.io.File(loc).mkdirs()

    val cust = Engine.table(spark, dir, "customer").select(
      col("c_custkey").cast("bigint").as("ck"), col("c_name").as("nm"),
      round(col("c_acctbal"), 2).as("bal"), col("c_mktsegment").as("seg"))
    val sup = Engine.table(spark, dir, "supplier").select(
      (col("s_suppkey").cast("bigint") + 500000).as("ck"),
      col("s_name").as("nm"), lit(9.99).as("bal"), lit("SUPP").as("seg"))

    for (iter <- 1 to 2) {
      println(s"[probe] ---- q199 lifecycle, iteration $iter ----")
      val root = s"$loc/g199_$iter"
      t("create")(TxnMergeOnRead.create(spark, root, cust))
      t("update")(TxnMergeOnRead.update(spark, root,
        Seq("bal" -> "round(bal + 5, 2)"), "seg = 'BUILDING'"))
      t("delete")(TxnMergeOnRead.delete(spark, root, "seg = 'AUTOMOBILE'"))
      t("insert")(TxnMergeOnRead.insert(spark, root, sup))
      val agg = t("readAt x4 plan")((1L to 4L).map { v =>
        TxnMergeOnRead.readAt(spark, root, v).agg(
          count(lit(1)).as("n_rows"),
          round(sum("bal"), 2).cast("double").as("total_bal"))
          .select(lit(v.toInt).as("version"), col("n_rows"), col("total_bal"))
      }.reduce(_ unionByName _).orderBy("version"))
      t("readAt x4 collect")(agg.collect())
      t("cdc (1,4] collect")(
        TxnMergeOnRead.changesBetween(spark, root, 1L, 4L)
          .select("change", "ck", "nm", "bal", "seg")
          .orderBy("change", "ck").collect())
    }

    // wall vs log length: one workspace, growing version chain
    println("[probe] ---- readAt head-wall vs version-chain length ----")
    val root2 = s"$loc/grow"
    TxnMergeOnRead.create(spark, root2, cust)
    var v = 1L
    for (gen <- 1 to 24) {
      TxnMergeOnRead.update(spark, root2,
        Seq("bal" -> "round(bal + 1, 2)"), s"ck % 37 = ${gen % 37}")
      v += 1
      if (gen % 4 == 0) {
        t(f"readAt(head=$v%2d)")(
          TxnMergeOnRead.readAt(spark, root2, v).agg(sum("bal")).collect())
        t(f"cdc(1,$v%2d]")(
          TxnMergeOnRead.changesBetween(spark, root2, 1L, v)
            .agg(count(lit(1))).collect())
      }
    }
    spark.stop()
  }
}

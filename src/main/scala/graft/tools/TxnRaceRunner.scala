package graft.tools

import graft.operators.TxnMergeOnRead
import org.apache.spark.sql.functions._

/** Child-process writer for the CROSS-PROCESS txn-log race spec: a
  * separate JVM (own SparkSession, own FileSystem client) committing
  * `n` single-row-batch inserts tagged with `tag` against a shared table
  * root. The atomic-create commit contract the log relies on
  * (`FileSystem.create` with overwrite=false on the entry file, plus
  * temp-then-rename) is a FILESYSTEM guarantee, not a JVM-lock one — this
  * runner lets `TxnCrossProcessSpec` prove that with genuinely separate
  * processes instead of racing threads in one JVM.
  *
  * Usage: `java -cp <cp> graft.tools.TxnRaceRunner <root> <tag> <n>`
  * Exits 0 iff all `n` inserts committed.
  */
object TxnRaceRunner {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: TxnRaceRunner <root> <tag> <n>")
    val (root, tag, n) = (args(0), args(1), args(2).toInt)
    val spark = graft.Engine.session(cores = 2, appName = s"graft-race-$tag")
    try {
      var i = 0
      while (i < n) {
        TxnMergeOnRead.insert(spark, root,
          spark.range(i, i + 1).select(
            (col("id") * 2 + (if (tag == "a") 0 else 1)).as("k"),
            lit(tag).as("writer"),
            col("id").as("seq")))
        i += 1
      }
    } finally spark.stop()
  }
}

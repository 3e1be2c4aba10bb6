package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Harness lint (the r13 q353 lesson): the driver's row-hash
    * canonicalization breaks on string values containing embedded newlines
    * — a value-identical result still hashes red. No checked output value
    * may contain a newline; any query whose written result has one FAILS
    * here (output deleted so the round records a loud failure, not a
    * silent hash mismatch). Checks every column whose type embeds strings
    * (top-level, array, struct) by casting to string; binary columns are
    * exempt (their bytes are compared byte-wise, not line-canonicalized). */
  private def lintNoNewlines(spark: SparkSession, path: String,
      name: String): Unit = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    def hasString(dt: DataType): Boolean = dt match {
      case StringType => true
      case ArrayType(et, _) => hasString(et)
      case MapType(k, v, _) => hasString(k) || hasString(v)
      case StructType(fs) => fs.exists(f => hasString(f.dataType))
      case _ => false
    }
    val written = spark.read.parquet(path)
    val cols = written.schema.fields
      .filter(f => hasString(f.dataType)).map(_.name)
    if (cols.nonEmpty) {
      val bad = written.filter(cols.map(c =>
        col(c).cast("string").rlike("[\\n\\r]")).reduce(_ || _))
      if (!bad.isEmpty) {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        throw new IllegalStateException(
          s"$name: result strings contain embedded newlines — the driver " +
            "hash canonicalization breaks on them (r13 q353); emit " +
            "md5(text) or a substituted text instead")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [queryName...]")
    val (sfDir, outDir) = (args(0), args(1))
    // optional filter: run only the named queries (local iteration aid; the
    // driver always runs the full dump)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Engine.session(cores = cpus, appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Per-query watchdog: one hung query must not stall the whole
    // correctness dump. Each query runs on its own interruptible thread —
    // cancelJobGroup only stops submitted Spark jobs, so a driver-side hang
    // (analysis, file listing) additionally gets a thread interrupt; a
    // global-EC Future would leak the stuck thread and keep the stale query
    // running concurrently with later ones.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "300").toLong
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
      val run = pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          lintNoNewlines(spark, s"$outDir/$name", name)
        }
      })
      try {
        run.get(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          run.cancel(true) // interrupt driver-side work too
          System.err.println(s"[verify] $name failed: timeout after ${timeoutSec}s")
        case e: java.util.concurrent.ExecutionException =>
          System.err.println(s"[verify] $name failed: ${e.getCause.getMessage}")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        pool.shutdownNow()
        spark.sparkContext.clearJobGroup()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

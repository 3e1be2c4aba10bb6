package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
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

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is fully executed into the `noop` sink
  * (computes every output column and row; a bare `count()` would let column
  * pruning skip most of the work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, appName = "graft-bench")
    // JVM/codegen warmup on the smallest SF so per-query numbers measure the
    // plan, not first-call JIT + classloading; registerAll so no query pays
    // first-call view registration.
    try {
      Engine.registerAll(spark, sfDir)
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // best-of-2 per query: the first pass pays JIT/codegen-cache/page-cache
    // warmup, the second measures the steady-state plan (what a resident
    // engine on a cluster delivers; parquet + codegen beats an
    // InMemoryRelation cache here, so no explicit caching).
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val dt = times.min
      System.err.println(f"[bench] $name $dt%.2fs (runs: ${times.map(t => f"$t%.2f").mkString(",")})")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

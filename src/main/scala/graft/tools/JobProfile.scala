package graft.tools

import graft.{Engine, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-Spark-job wall breakdown of one registered query's timed region —
  * the "where do a lifecycle query's seconds go" measurement the
  * optimization guide (§1) asks for before touching anything. A
  * SparkListener tallies every job fired while the query body + noop sink
  * run; the report shows job count, per-job wall and call site, plus the
  * gap between summed job time and the region wall (= driver-side work:
  * log/footer reads, FS round-trips, planning).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_QUERY=<names,csv> \
  *        sbt "runMain graft.tools.JobProfile"
  */
object JobProfile {

  private final case class JobRow(id: Int, wallMs: Long, site: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q240_txn_data_skipping")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ITERS", "2").toInt
    val spark = Engine.session(cores =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, appName = "graft-jobprofile")
    Engine.registerAll(spark, sfDir)
    scala.util.Try(graft.queries.TpcdsLite.register(spark))

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
    // SQL-execution id → call-site description: AQE stage-materialization
    // jobs carry only the execution id; the SQLExecutionStart event knows
    // which action (graft frame) started it.
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId,
              s.description.linesIterator.take(1).mkString.trim)
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val fromExec = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execDesc.get(id.toLong)))
        val site = fromExec
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(js.stageInfos.lastOption.map(si =>
            si.details.linesIterator.filter(_.contains("graft"))
              .take(1).mkString.trim match {
              case "" => si.name
              case g => g
            }))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          rows.add(JobRow(je.jobId, je.time - t0, site))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to iters).foreach { it =>
        rows.clear(); starts.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async — give it a beat to drain before reporting
        Thread.sleep(300)
        val jobs = rows.toArray(Array.empty[JobRow]).sortBy(-_.wallMs)
        val sumMs = jobs.map(_.wallMs).sum
        println(f"[jobprofile] ==== $name iter $it: wall $wall%.2fs, " +
          f"${jobs.length} jobs, job-sum ${sumMs / 1e3}%.2fs, " +
          f"driver-gap ${wall - sumMs / 1e3}%.2fs ====")
        val bySite = jobs.groupBy(_.site).toSeq
          .map { case (s, js) => (s, js.length, js.map(_.wallMs).sum) }
          .sortBy(-_._3)
        bySite.take(20).foreach { case (s, n, ms) =>
          println(f"[jobprofile]   $s%-40s n=$n%-4d sum=${ms / 1e3}%.2fs")
        }
        jobs.take(12).foreach(j =>
          println(f"[jobprofile]   top job ${j.id}%-5d ${j.wallMs / 1e3}%.2fs  ${j.site}"))
      }
    }
    spark.stop()
  }
}

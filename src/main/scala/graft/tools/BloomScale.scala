package graft.tools

import graft.Engine

/** SURVEY §6 scale evidence for the q163 runtime bloom-filter semi-join
  * reduction: the same selective fact⋈dim shuffle join at ×64, bloom on vs
  * off (best-of-2 each). The bloom side (filtered orders keys) is built
  * once per query and pushed into the lineitem scan; at 20% dim selectivity
  * it should drop ~80% of the fact rows before the exchange — the win that
  * scales with fact size.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_scale64 sbt "runMain graft.tools.BloomScale"
  */
object BloomScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale64")
    val s = Engine.session(cores = 32, appName = "graft-bloomscale")
    Engine.registerAll(s, dir)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val q = """SELECT l_returnflag, count(*) AS n,
      ROUND(CAST(sum(l_quantity) AS DOUBLE), 2) AS sq
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY l_returnflag"""
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def best2(label: String): Double = {
      val planHasBloom = s.sql(q).queryExecution.optimizedPlan.toString.contains("might_contain")
      val ts = (1 to 2).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        s.sql(q).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      shuffleBytes.set(0)
      s.sql(q).write.format("noop").mode("overwrite").save()
      Thread.sleep(1000) // listener events drain asynchronously
      println(f"[bloomscale] $label bloom-in-plan=$planHasBloom best=${ts.min}%.2fs " +
        f"shuffleMB=${shuffleBytes.get / 1e6}%.1f (runs: ${ts.map(t => f"$t%.2f").mkString(",")})")
      ts.min
    }
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val off = best2("bloom OFF")
    val off2 = best2("bloom OFF again")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val on = best2("bloom ON  (default creationSideThreshold)")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "256MB")
    val on2 = best2("bloom ON  (creationSideThreshold=256MB)")
    println(f"[bloomscale] off=$off%.2f offAgain=$off2%.2f on=$on%.2f onBig=$on2%.2f")
    s.stop()
  }
}

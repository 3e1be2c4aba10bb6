package graft.tools

import graft.{Engine, SparkEntry}

/** Prints the executed plan of one registered query against an arbitrary SF
  * dir — the scaling experiments' "did the plan shape change at ×N" check.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_QUERY=<name> \
  *        sbt "runMain graft.tools.PlanDump" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q100_tpch_q5_shape")
      .split(",").map(_.trim)
    val spark = Engine.session(appName = "graft-plandump")
    try names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // final AQE-decided plan
      println(s"===== $name @ $sfDir =====")
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}

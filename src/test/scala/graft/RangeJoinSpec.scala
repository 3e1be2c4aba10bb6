package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Binned range-join contracts ([[graft.operators.RangeJoin]]): exact
  * agreement with the naive inequality join (including bin-boundary
  * points and intervals spanning many bins, each pair met exactly once),
  * and the plan property the binning exists for — an EQUI join, never a
  * nested loop. */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-range")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private lazy val points = Seq(
    (1, 1L, 0L), (1, 2L, 100L), (1, 3L, 250L), (1, 4L, 300L), (2, 5L, 100L)
  ).toDF("k", "pid", "ts")
  private lazy val intervals = Seq(
    (1, 10L, 0L, 100L),    // spans bins 0 and 1 at width 100
    (1, 11L, 90L, 310L),   // spans 4 bins
    (2, 12L, 150L, 200L)   // no point inside
  ).toDF("k", "iid", "lo", "hi")

  test("agrees with the naive inequality join; boundaries inclusive, pairs unique") {
    val got = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "ts", "lo", "hi", binWidth = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    val naive = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("p.ts") >= col("i.lo") && col("p.ts") <= col("i.hi"))
      .select(col("p.pid"), col("i.iid")).as[(Long, Long)]
      .collect().toSeq.sorted
    assert(got === naive)
    // spot-check the edges: ts=100 sits on both intervals' bounds/interior;
    // ts=0 only in [0,100]; k=2 point misses its interval entirely
    assert(got === Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)))
  }

  test("plan: shuffled equi join on (key, bin), no nested loop") {
    val df = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "lo", "hi", binWidth = 100L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"binned range join must stay an equi join:\n$plan")
    assert(plan.contains("__bin"), "join keys must include the bin")
  }
}

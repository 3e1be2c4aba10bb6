package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SparkSessionExtensions surface: the injected PointLookup rule rewrites
  * OR-chains to IN, and the matchpath logical operator plans through the
  * injected strategy with exactly one shuffle + sort. */
class ExtensionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-ext")
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("PointLookupRule rewrites an OR-chain of equalities to IN") {
    val df = Engine.table(spark, dir, "lineitem")
      .filter(col("l_linenumber") === 1 || col("l_linenumber") === 2 ||
        col("l_linenumber") === 3 || col("l_linenumber") === 4)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains(" IN (") || opt.contains("l_linenumber#") && opt.contains("IN"),
      s"expected IN rewrite, got:\n$opt")
    assert(!opt.contains(" OR "), s"OR-chain survived:\n$opt")
  }

  test("PointLookupRule keeps mixed disjunctions correct") {
    val df = Engine.table(spark, dir, "lineitem")
      .filter((col("l_linenumber") === 1 || col("l_linenumber") === 2 ||
        col("l_linenumber") === 3) || col("l_quantity") > 49)
    val direct = Engine.table(spark, dir, "lineitem")
      .filter(col("l_linenumber").isin(1, 2, 3) || col("l_quantity") > 49)
    assert(df.count() == direct.count())
    assert(df.queryExecution.optimizedPlan.toString.contains("IN"))
  }

  test("matchpath operator equals the flatMapGroups implementation") {
    val events = Engine.table(spark, dir, "events")
    val viaPlan = plans.MatchPathPlan(events,
        Map("error" -> "e", "purchase" -> "p", "signup" -> "s"), "s[xe]*p")
      .select("user_id", "start_event", "end_event", "n_steps")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaGroups = operators.MatchPath.matchPath(spark, events,
        { case "error" => 'e'; case "purchase" => 'p'; case "signup" => 's'
          case _ => 'x' }, "s[xe]*p")
      .select("user_id", "start_event", "end_event", "n_steps")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaPlan.nonEmpty)
    assert(viaPlan == viaGroups)
  }

  test("matchpath attempts a match at every row (overlapping matches emit), both paths") {
    // three consecutive errors for one user: pattern 'ee' must emit the
    // overlapping spans (0,1) AND (1,2) — the reference tries every row as
    // a start (MatchPath.java:81); find()-style resume would emit only one
    val events = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "error", 1.0),
      (1L, 11L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "error", 1.0),
      (1L, 12L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), "error", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val viaGroups = operators.MatchPath.matchPath(spark, events,
        { case "error" => 'e'; case _ => 'x' }, "ee")
      .select("start_event", "end_event").as[(Long, Long)].collect().toSet
    assert(viaGroups == Set((10L, 11L), (11L, 12L)), s"got $viaGroups")
    val viaPlan = plans.MatchPathPlan(events, Map("error" -> "e"), "ee")
      .select("start_event", "end_event").as[(Long, Long)].collect().toSet
    assert(viaPlan == viaGroups)
    // zero-width-capable patterns must not throw (empty matches skipped)
    val zw = operators.MatchPath.matchPath(spark, events,
        { case "error" => 'e'; case _ => 'x' }, "x*")
      .collect()
    assert(zw.isEmpty)
  }

  test("join hints steer the strategy (BROADCAST vs SHUFFLE_HASH vs MERGE)") {
    Engine.registerAll(spark, dir)
    def planOf(hint: String): String = {
      val df = spark.sql(s"SELECT /*+ $hint(n) */ n_name, s_suppkey FROM supplier s " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(planOf("BROADCAST").contains("BroadcastHashJoin"))
    assert(planOf("SHUFFLE_HASH").contains("ShuffledHashJoin"))
    assert(planOf("MERGE").contains("SortMergeJoin"))
  }

  test("matchpath physical plan: one shuffle, one sort, then the operator") {
    val df = plans.MatchPathPlan(Engine.table(spark, dir, "events"),
      Map("error" -> "e", "purchase" -> "p"), "ep")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("MatchPath ep"), s)
    assert("Exchange hashpartitioning".r.findAllIn(s).length <= 2,
      s"unexpected extra shuffles:\n$s") // final+initial AQE sections print once each
  }
}

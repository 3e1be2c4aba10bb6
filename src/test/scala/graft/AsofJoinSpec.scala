package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** AS-OF join contracts ([[graft.operators.AsofJoin]]): inclusive-tie
  * backward match, left-outer NULLs, tolerance cut-off, and the scale
  * property the union-and-carry shape exists for — ONE hash exchange,
  * no range-join fan-out. */
class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-asof")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private lazy val left = Seq(
    (1, 2L, "a"), (1, 5L, "b"), (2, 9L, "c"), (3, 4L, "d")
  ).toDF("k", "ts", "x")
  private lazy val right = Seq(
    (1, 1L, 100.0), (1, 5L, 200.0), (2, 10L, 300.0)
  ).toDF("k", "rts", "v")

  test("backward match with inclusive ties; no-match rows stay NULL") {
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .orderBy("k", "ts")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1, 2L, "a", 1L, 100.0),   // latest at-or-before 2 is rts=1
      (1, 5L, "b", 5L, 200.0),   // tie: rts=5 matches ts=5 (inclusive)
      (2, 9L, "c", null, null),  // only future right rows for k=2
      (3, 4L, "d", null, null))) // key with no right rows at all
  }

  test("tolerance nulls out stale matches without dropping rows") {
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
        tolerance = Some(lit(1L)))
      .orderBy("k", "ts")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, 2L, 1L),    // age 1 ≤ tolerance
      (1, 5L, 5L),    // age 0
      (2, 9L, null),
      (3, 4L, null)))
  }

  test("plan: one hash exchange, no join node (the no-fan-out contract)") {
    val df = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val (start, end) = (full.indexOf("== Final Plan =="),
      full.indexOf("== Initial Plan =="))
    val plan = if (start >= 0 && end > start) full.substring(start, end) else full
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one hash exchange:\n$plan")
    assert(!plan.contains("Join"),
      s"as-of must not plan a join (range-join fan-out):\n$plan")
  }

  test("duplicate right (keys, ts): checkUnique rejects; default never fans out") {
    val dupRight = right.unionByName(Seq((1, 1L, 999.0)).toDF("k", "rts", "v"))
    val e = intercept[IllegalArgumentException](
      AsofJoin.asofJoin(left, dupRight, Seq("k"), "ts", "rts",
        checkUnique = true))
    assert(e.getMessage.contains("duplicate"))
    // without the check the contract degrades to arbitrary-payload, NEVER
    // row explosion: output cardinality stays |left| and the carried value
    // is one of the two tied rows
    val got = AsofJoin.asofJoin(left, dupRight, Seq("k"), "ts", "rts")
    assert(got.count() === left.count(), "as-of output must not fan out")
    val v = got.filter(col("k") === 1 && col("ts") === 2L)
      .select("v").head().getDouble(0)
    assert(v === 100.0 || v === 999.0, "carried payload is one of the ties")
    // the clean input passes the eager check
    assert(AsofJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      checkUnique = true).count() === left.count())
  }
}

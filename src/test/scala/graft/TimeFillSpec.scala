package graft

import graft.operators.TimeFill
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Gap-fill/forward-fill contracts ([[graft.operators.TimeFill]]): dense
  * spine per key between its own bounds, NULL observations in gaps with
  * last-observation carry, no fill before the first observation of a
  * later-starting key. */
class TimeFillSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-timefill")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("per-key spine, gaps NULL, forward carry, multi value columns") {
    val obs = Seq(
      (1, 0L, Some(10.0), Some(1L)), (1, 30L, Some(40.0), None),
      (2, 20L, Some(5.0), Some(7L))
    ).toDF("k", "b", "v", "c")
    val got = TimeFill.gapFillForward(obs, Seq("k"), "b", step = 10L,
        valueCols = Seq("v", "c"))
      .orderBy("k", "b")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(4)), Option(r.get(3)), Option(r.get(5))))
    // columns: k, b, v, c, v_ffill, c_ffill (ffill appended after)
    assert(got.toSeq === Seq(
      (1, 0L, Some(10.0), Some(10.0), Some(1L), Some(1L)),
      (1, 10L, None, Some(10.0), None, Some(1L)),
      (1, 20L, None, Some(10.0), None, Some(1L)),
      (1, 30L, Some(40.0), Some(40.0), None, Some(1L)), // c NULL at 30: carry keeps 1
      (2, 20L, Some(5.0), Some(5.0), Some(7L), Some(7L))),
      "spine bounded per key; a NULL observed value does not reset the carry")
  }

  test("duplicate (keys, bucket): checkUnique rejects eagerly; default fans out") {
    val dup = Seq(
      (1, 0L, Some(10.0)), (1, 0L, Some(20.0)), (1, 20L, Some(30.0))
    ).toDF("k", "b", "v")
    val e = intercept[IllegalArgumentException](
      TimeFill.gapFillForward(dup, Seq("k"), "b", step = 10L,
        valueCols = Seq("v"), checkUnique = true))
    assert(e.getMessage.contains("duplicate"))
    // the documented violation mode WITHOUT the check: each duplicate
    // bucket multiplies its spine row through the left join (3-bucket
    // spine, bucket 0 doubled → 4 rows) — why the eager check exists
    assert(TimeFill.gapFillForward(dup, Seq("k"), "b", step = 10L,
      valueCols = Seq("v")).count() === 4)
    // clean input passes the check unchanged
    val clean = Seq((1, 0L, Some(10.0)), (1, 20L, Some(30.0))).toDF("k", "b", "v")
    assert(TimeFill.gapFillForward(clean, Seq("k"), "b", step = 10L,
      valueCols = Seq("v"), checkUnique = true).count() === 3)
  }
}

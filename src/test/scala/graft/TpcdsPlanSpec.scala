package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan assertions for the TPC-DS perf sample (q265–q272): the
  * canonical 100 TB star-schema properties — DPP prunes the partitioned
  * fact through the date_dim filter, dimensions broadcast, shared
  * dimension scans reuse one exchange, and nothing falls back to a
  * cartesian/broadcast-nested-loop join (the single-row scalar-subquery
  * cross join of query88 is the one sanctioned exception).
  */
class TpcdsPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-dsplan")
  val dir = "/root/testdata/sf0.001" // unused by the lite tables; Qd contract

  override def afterAll(): Unit = spark.stop()

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val start = s.indexOf("== Final Plan ==")
    val end = s.indexOf("== Initial Plan ==")
    if (start >= 0 && end > start) s.substring(start, end) else s
  }

  test("q265 (query3): DPP prunes the date-partitioned fact; dims broadcast") {
    val s = finalPlan("q265_tpcds_q3")
    assert(s.contains("dynamicpruning") || s.contains("DynamicPruning"),
      s"expected dynamic partition pruning on ss_sold_date_sk:\n$s")
    assert(s.contains("BroadcastHashJoin"), "dimensions should broadcast")
    assert(!s.contains("CartesianProduct"), "no cartesian in a star join")
  }

  test("q266 (query88): the 8 channel subqueries REUSE shared dimension" +
      " broadcasts instead of rescanning") {
    val s = finalPlan("q266_tpcds_q88")
    assert(s.contains("ReusedExchange"),
      "identical store/household_demographics broadcasts should plan once")
    assert(s.contains("BroadcastHashJoin"), "dimensions should broadcast")
  }

  test("q267/q268/q270/q271/q272: no cartesian products, dims broadcast") {
    for (q <- Seq("q267_tpcds_q12", "q268_tpcds_q27", "q270_tpcds_q51",
        "q271_tpcds_q17", "q272_tpcds_q64", "q279_tpcds_q70",
        "q281_tpcds_q32", "q282_tpcds_q46", "q283_tpcds_q94",
        "q284_tpcds_q58", "q285_tpcds_q87", "q286_tpcds_q97",
        "q287_tpcds_q89", "q288_tpcds_q43", "q290_tpcds_q21",
        "q291_tpcds_q22", "q292_tpcds_q39", "q293_tpcds_q72",
        "q294_tpcds_q67", "q295_tpcds_q95", "q296_tpcds_q31",
        "q297_tpcds_q82", "q298_tpcds_q40", "q299_tpcds_q50",
        "q300_tpcds_q66", "q301_tpcds_q7", "q302_tpcds_q15",
        "q303_tpcds_q26", "q304_tpcds_q42", "q305_tpcds_q45",
        "q306_tpcds_q48", "q307_tpcds_q73", "q308_tpcds_q96",
        "q309_tpcds_q25", "q310_tpcds_q29", "q311_tpcds_q52",
        "q312_tpcds_q55", "q313_tpcds_q68", "q314_tpcds_q79",
        "q315_tpcds_q84", "q316_tpcds_q98", "q317_tpcds_q92",
        "q318_tpcds_q13", "q319_tpcds_q19", "q320_tpcds_q20",
        "q321_tpcds_q54", "q322_tpcds_q65", "q323_tpcds_q71",
        "q324_tpcds_q75", "q325_tpcds_q76", "q326_tpcds_q80",
        "q327_tpcds_q85", "q329_tpcds_q91", "q330_tpcds_q93",
        "q331_tpcds_q18")) {
      val s = finalPlan(q)
      assert(!s.contains("CartesianProduct"), s"$q planned a cartesian")
      assert(!s.contains("BroadcastNestedLoopJoin"), s"$q planned a BNLJ")
      assert(s.contains("BroadcastHashJoin"), s"$q should broadcast dims")
    }
  }

  test("q328 (query90): the am/pm ratio's only non-hash join is the" +
      " sanctioned 1-row scalar cross") {
    val s = finalPlan("q328_tpcds_q90")
    assert(s.contains("BroadcastHashJoin"), "dimension joins should broadcast")
    // the single cross joins two 1-row scalar aggregates — the query88
    // shape; anything beyond one is a planning bug
    val crosses = "BroadcastNestedLoopJoin|CartesianProduct".r
      .findAllIn(s).size
    assert(crosses <= 1, s"expected at most the 1-row scalar cross:\n$s")
  }

  test("q265 filters reach the parquet scans (pushdown on fact and dims)") {
    // the FULL plan string: broadcast-side scans live in their own AQE
    // query-stage sections outside the first Final Plan segment
    val df = SparkEntry.queries("q265_tpcds_q3")(spark, dir)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("EqualTo(i_manufact_id,7)"),
      "item filter did not reach the item scan")
    assert(s.contains("EqualTo(d_moy,12)"),
      "date filter did not reach the date_dim scan")
  }

  test("q270 (query51): the executed FULL OUTER join preserves both" +
      " channels' unmatched (item, day) rows") {
    val s = finalPlan("q270_tpcds_q51")
    assert(s.contains("FullOuter"), s"expected a FullOuter join:\n$s")
  }
}

package graft

import graft.operators.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Exact integer PageRank ([[graft.operators.PageRank]]): hand-computed
  * micro-unit values on a tiny graph, dangling/sink conventions, iterate
  * convergence direction, duplicate-edge dedup, and flat plan size across
  * iterations (the bounded-lineage discipline).
  */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-pr")

  override def afterAll(): Unit = spark.stop()

  private def edges(es: (Long, Long)*): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  private def ranks(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one iteration matches the hand-computed integer recurrence") {
    // 1 -> 2, 1 -> 3, 2 -> 3: deg(1)=2, deg(2)=1; r0 = 1e6 each
    // r1(1) = 150000 (no in-edges)
    // r1(2) = 150000 + 850000 * (1e6 DIV 2) DIV 1e6 = 150000 + 425000
    // r1(3) = 150000 + 850000 * (500000 + 1000000) DIV 1e6 = 150000 + 1275000
    val r = ranks(PageRank.run(edges(1L -> 2L, 1L -> 3L, 2L -> 3L), iters = 1))
    assert(r == Map(1L -> 150000L, 2L -> 575000L, 3L -> 1425000L))
  }

  test("second iteration folds the first's ranks, exactly") {
    // continuing: r2(2) = 150000 + 850000*(150000 DIV 2) DIV 1e6 = 213750
    // r2(3) = 150000 + 850000*(75000 + 575000) DIV 1e6 = 702500
    val r = ranks(PageRank.run(edges(1L -> 2L, 1L -> 3L, 2L -> 3L), iters = 2))
    assert(r == Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
  }

  test("a sink vertex keeps only its teleport share as a source of mass") {
    // 1 <-> 2 symmetric cycle: mass is conserved through the cycle
    val r = ranks(PageRank.run(edges(1L -> 2L, 2L -> 1L), iters = 5))
    assert(r(1L) == r(2L)) // symmetry preserved exactly
    assert(r(1L) >= 999995L && r(1L) <= 1000000L) // ~1e6 minus DIV dust
  }

  test("duplicate edges count once") {
    val a = ranks(PageRank.run(edges(1L -> 2L, 1L -> 2L, 1L -> 3L), iters = 2))
    val b = ranks(PageRank.run(edges(1L -> 2L, 1L -> 3L), iters = 2))
    assert(a == b)
  }

  test("plan size stays flat across iterations (lineage is cut per step)") {
    val e = edges((1L to 200L).map(i => i -> (i % 40 + 1)): _*)
    def planLen(it: Int): Int =
      PageRank.run(e, iters = it).queryExecution.analyzed.toString.length
    val p2 = planLen(2)
    val p6 = planLen(6)
    assert(p6 <= p2 * 2,
      s"plan grew with iterations ($p2 -> $p6): lineage not being cut")
  }

  test("high damping vs zero damping bracket the structure") {
    val es = edges(1L -> 3L, 2L -> 3L, 3L -> 1L)
    val zero = ranks(PageRank.run(es, iters = 3, dampingMicro = 0L))
    assert(zero.values.toSet == Set(1000000L)) // pure teleport: all equal
    val full = ranks(PageRank.run(es, iters = 3, dampingMicro = 1000000L))
    assert(full(3L) > full(1L) && full(1L) > full(2L))
  }
}

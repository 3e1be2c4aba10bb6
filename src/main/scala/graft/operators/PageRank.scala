package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank (Brin & Page 1998) in EXACT integer arithmetic —
  * the iterative-graph workload (link authority over a web/citation/
  * entity graph) on plain DataFrames: no GraphX, no driver-side state
  * beyond the loop counter. The reference has no iterative operator at
  * all (its closest is the user re-running a query per step); Spark's
  * contribution is that each iteration is ONE join + ONE aggregation,
  * both shuffle-partitioned on the vertex key.
  *
  * Exactness: ranks live in MICRO-units (initial rank = 1e6 per vertex)
  * and every step is integer arithmetic with non-negative operands —
  * `contrib = r DIV deg`, `r' = (1e6 − d) + d · Σcontrib DIV 1e6` — so
  * truncating and flooring division coincide and the result is bit-equal
  * across engines (the oracle replays the same recurrence in SQL). The
  * dangling-vertex convention is the droppable-mass variant (a sink
  * vertex keeps its teleport share only), documented and mirrored by the
  * oracle. Overflow bound: `d · Σcontrib` stays under 2^63 for graphs up
  * to ~1e7 vertices at these units; rescale the units for larger graphs.
  *
  * Scale shape: per iteration, contributions = edges ⋈ ranks ⋈ degrees on
  * `src` (all three hash-partitioned on the same key — AQE reuses the
  * exchange), then one groupBy(dst) with map-side partial sums. Lineage
  * is cut every iteration with an eager `localCheckpoint`, and the
  * superseded generation's blocks are dropped immediately (the bounded
  * two-generation discipline of [[Dedup.connectedComponents]]), so
  * storage and plan size stay flat in the iteration count.
  */
object PageRank {

  /** Run `iters` exact integer PageRank steps over `edges` (`src`,`dst`
    * long columns; duplicates deduped). Returns `(v, r)` — vertex and
    * micro-unit rank. `dampingMicro` = d · 1e6 (default 0.85). */
  def run(edges: DataFrame, iters: Int,
      dampingMicro: Long = 850000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(dampingMicro >= 0L && dampingMicro <= 1000000L,
      "dampingMicro in [0, 1e6]")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val teleport = 1000000L - dampingMicro
    var r = nodes.withColumn("r", lit(1000000L)).localCheckpoint()
    for (_ <- 1 to iters) {
      val sums = e
        .join(r.withColumnRenamed("v", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("v"), expr("r DIV deg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("s"))
      val next = nodes.join(sums, Seq("v"), "left")
        .select(col("v"),
          (lit(teleport) +
            expr(s"${dampingMicro}L * coalesce(s, 0L) DIV 1000000L")).as("r"))
        .localCheckpoint() // eager: materializes before the old gen drops
      dropSupersededRanks(r, nodes, e, deg)
      r = next
    }
    r
  }

  /** Unpersist the previous rank generation's checkpoint blocks, keeping
    * the loop-invariant inputs (nodes/edges/degrees) persisted. */
  private def dropSupersededRanks(old: DataFrame, keep: DataFrame*): Unit = {
    val keepIds = keep.flatMap(_.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }).toSet
    old.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD if !keepIds(l.rdd.id) =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without the nested-loop trap: `p.ts BETWEEN
  * i.lo AND i.hi` carries no equi-condition, so Catalyst can only plan
  * BroadcastNestedLoopJoin/cartesian for it — O(|P|·|I|) compared pairs,
  * the classic scale cliff. The standard fix (Spark's own range-join
  * binning in Databricks runtime, the interval-tree alternative in
  * single-node engines) is BINNING: explode each interval into the
  * fixed-width bins it overlaps, bin each point once, equi-join on
  * `(keys…, bin)` and re-check the exact bounds. The join becomes a plain
  * shuffled equi-join — broadcastable, AQE-skew-handled, codegen'd — and
  * each (point, interval) pair meets EXACTLY once (in the point's bin),
  * so no dedup pass is needed. Cost: |I| · (len/binWidth + 1) exploded
  * rows; pick binWidth near the typical interval length so each interval
  * lands in O(1) bins.
  *
  * Timestamps are expected non-negative (epoch-style); `DIV` truncation
  * equals floor there, keeping bin assignment exact in integer space (no
  * double rounding at 2^53).
  */
object RangeJoin {

  /** Inner join of `points` to every same-key interval containing them
    * (bounds inclusive). Non-key column names must be disjoint. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, lo: String, hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.filterNot(keys.contains)
      .intersect(intervals.columns.filterNot(keys.contains))
    require(overlap.isEmpty,
      s"rename colliding non-key columns: ${overlap.mkString(", ")}")
    val binned = intervals.withColumn("__bin",
      explode(sequence(expr(s"$lo DIV $binWidth"), expr(s"$hi DIV $binWidth"))))
    points.withColumn("__bin", expr(s"$pointTs DIV $binWidth"))
      .join(binned, keys :+ "__bin")
      .filter(col(pointTs) >= col(lo) && col(pointTs) <= col(hi))
      .drop("__bin")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — the point-in-time join time-series engines ship natively
  * (kdb+ `aj`, pandas `merge_asof`, DuckDB/QuestDB `ASOF JOIN`) and the
  * reference engine lacks: for every left row, the single right row with
  * the LARGEST right timestamp ≤ the left timestamp, per key (ties
  * inclusive), as a left-outer match.
  *
  * Spark-first shape — compose, don't hand-roll a SortMergeExec: the naive
  * formulations are a range join (`l.k = r.k AND r.ts <= l.ts` then
  * windowed argmax — the intermediate explodes to every EARLIER right row
  * per left row) or a per-key `mapPartitions` merge (imperative, loses
  * codegen). The union-and-carry trick does it with ONE hash shuffle and
  * zero fan-out: tag both sides, union them narrow, and per key in
  * `(ts, side)` order let `last(payload, ignoreNulls)` carry the most
  * recent right payload forward into each left row — right rows sort
  * BEFORE left rows at equal ts, which is exactly the inclusive-tie
  * contract. Cost is sort-within-shuffle of |L|+|R| narrow rows, the same
  * bound a native as-of merge pays, and AQE/skew handling apply since it
  * is a plain window over a plain exchange.
  *
  * `tolerance` (optional, same unit as the timestamp columns) nulls out
  * matches older than `leftTs - tolerance` — pandas merge_asof semantics —
  * without a second pass: the carried payload keeps its own ts to compare.
  *
  * Right-side rows must be unique per (keys, ts); pre-aggregate ties
  * upstream (the deterministic argmax idiom) or the carried row is the
  * union-order-dependent one. Either way the output NEVER fans out — each
  * left row yields exactly one output row (the window carries, it does not
  * join), so a violated contract degrades to nondeterministic payload
  * choice, not row explosion. `checkUnique = true` buys an eager assertion
  * (one narrow count over the right side) for pipelines that would rather
  * fail than carry an arbitrary tie.
  */
object AsofJoin {

  /** Left-outer as-of join: all `left` columns, plus `right`'s non-key
    * columns (NULL when no right row is at or before). `leftTs`/`rightTs`
    * must be mutually comparable (both numeric or both timestamps). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None,
      checkUnique: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi key")
    if (checkUnique) {
      val dup = right.groupBy((keys :+ rightTs).map(col): _*)
        .count().filter(col("count") > 1).limit(1).count()
      require(dup == 0, s"as-of right side has duplicate (${keys.mkString(",")}" +
        s", $rightTs) rows — pre-aggregate ties (argmax) or the carried " +
        "payload is an arbitrary one of them")
    }
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTs).toSeq
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"rename right columns colliding with left: ${payloadCols.intersect(leftCols).mkString(", ")}")
    // narrow union: keys, ts, side tag, right payload (null on left rows)
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        struct((col(rightTs).as("__rts") +:
          payloadCols.map(col)): _*).as("__p")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__p").dataType).as("__p")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = tolerance.fold(col("__m").isNotNull)(tol =>
      col("__m").isNotNull && col("__ts") - col("__m.__rts") <= tol)
    carried.select(
      leftCols.map(c => if (c == leftTs) col("__ts").as(c) else col(c)) ++
        Seq(when(inTol, col("__m.__rts")).otherwise(lit(null))
          .as(s"matched_$rightTs")) ++
        payloadCols.map(p =>
          when(inTol, col(s"__m.$p")).otherwise(lit(null)).as(p)): _*)
  }
}

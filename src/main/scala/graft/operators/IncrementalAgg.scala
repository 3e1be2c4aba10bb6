package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a [[TxnMergeOnRead]]
  * table's CDC feed — the consumption pattern the change feed exists for:
  * a downstream GROUP BY kept in sync at O(changes + touched groups) per
  * refresh, never O(table). This is classic incremental view maintenance
  * for distributive aggregates (COUNT/SUM; AVG derives) — the
  * delta-propagation rule of Gupta & Mumick's "Maintenance of Materialized
  * Views" (SIGMOD Record 1995), the machinery behind Delta Live Tables /
  * warehouse materialized views; the reference has no such surface (its
  * `ALTER MATERIALIZED VIEW ... REBUILD` era recomputes), so this is a
  * beyond-reference pipeline operator, like the dedup/ANN family.
  *
  * MIN/MAX (optional `minMaxCols`) get the paper's treatment for
  * aggregates that are NOT self-maintainable under deletion: inserts
  * tighten extrema in the delta fold for free, while a refresh whose
  * range deleted from a group recomputes exactly THOSE groups with one
  * semi-joined scan of the table (the departed row may have been the
  * extremum) — O(rows of touched groups), still never O(table) for
  * refreshes whose deletes are group-local.
  *
  * Contract: CDC events are self-inverse — an insert contributes
  * `(+1, +x)` to its group, a delete `(-1, -x)` (delete events carry the
  * FULL dead row, which is exactly why [[TxnMergeOnRead]] pays those
  * bytes), and an UPDATE is its two events, so any mix of DML folds into
  * per-group adjustments by one narrow aggregation over the range's delta
  * dirs. Groups whose count reaches zero vanish (they may be resurrected
  * later — state carries no tombstones because count 0 IS the tombstone).
  *
  * State layout: `stateDir/v<version>/` holds the aggregate parquet as of
  * that table version; the directory NAME carries the version, the
  * highest one is current, and a refresh writes temp-then-rename so a
  * concurrent reader never sees a half-written state (same discipline as
  * the txn log's own commits). Old state dirs are the caller's retention
  * decision ([[prune]]).
  *
  * A refresh across a RESTORE fails loudly (the underlying
  * [[TxnMergeOnRead.changesBetween]] guard): the feed's events would
  * include changes the restore undid — re-[[init]] the state instead.
  */
object IncrementalAgg {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statePath(stateDir: String, v: Long): Path =
    new Path(s"$stateDir/v" + f"$v%020d")

  /** Highest materialized version, or None before [[init]]. */
  def currentStateVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val f = fs(spark, stateDir)
    val d = new Path(stateDir)
    if (!f.exists(d)) return None
    f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong)
      .sorted.lastOption
  }

  /** The per-group adjustment of a change frame: +1/+x for inserts,
    * -1/-x for deletes, partial-aggregated before any shuffle. With
    * min/max columns it additionally carries the INSERT-side extrema and
    * a delete count — min/max are monotone under inserts but not under
    * deletes, so `del_cnt > 0` marks the groups [[refresh]] must
    * recompute (the standard IVM treatment for aggregates that are not
    * self-maintainable under deletion). */
  private def deltaAgg(changes: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String]): DataFrame = {
    val sign = when(col("change") === "insert", lit(1L)).otherwise(lit(-1L))
    val ins = col("change") === "insert"
    // sums land as DOUBLE in both init and refresh so the state schema is
    // stable across materializations regardless of the source column type
    val aggs =
      sumCols.map(c => sum(sign * col(c)).cast("double").as(s"sum_$c")) ++
      minMaxCols.flatMap(c => Seq(
        min(when(ins, col(c))).as(s"ins_min_$c"),
        max(when(ins, col(c))).as(s"ins_max_$c"))) ++
      (if (minMaxCols.isEmpty) Nil
       else Seq(sum(when(ins, lit(0L)).otherwise(lit(1L))).as("del_cnt")))
    changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("cnt"), aggs: _*)
  }

  private def writeState(spark: SparkSession, stateDir: String, v: Long,
      state: DataFrame): Unit = {
    val f = fs(spark, stateDir)
    val tmp = new Path(s"$stateDir/.tmp_${java.util.UUID.randomUUID().toString.take(12)}")
    state.write.parquet(tmp.toString)
    if (!f.rename(tmp, statePath(stateDir, v))) {
      f.delete(tmp, true) // another refresh materialized this version first
    }
  }

  /** Materialize the aggregate from the CURRENT table snapshot — the one
    * O(table) pass, paid once (and after a RESTORE). Returns the pinned
    * table version the state reflects. */
  def init(spark: SparkSession, root: String, stateDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty && sumCols.nonEmpty,
      "need at least one group column and one sum column")
    val v = TxnMergeOnRead.currentVersion(spark, root)
    val snap = TxnMergeOnRead.read(spark, root)
    val state = snap.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c)).cast("double").as(s"sum_$c")) ++
        minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)
    writeState(spark, stateDir, v, state)
    v
  }

  /** Advance the state to the table head by consuming ONLY the CDC range
    * `(stateVersion, head]`: one narrow delta aggregation over the range's
    * delta dirs, one outer merge against the prior state, zero-count
    * groups dropped. Returns (fromVersion, toVersion); equal = no-op (no
    * state written). */
  def refresh(spark: SparkSession, root: String,
      stateDir: String): (Long, Long) = {
    val fromV = currentStateVersion(spark, stateDir).getOrElse(
      throw new IllegalStateException(
        s"no state at $stateDir — IncrementalAgg.init first"))
    val toV = TxnMergeOnRead.currentVersion(spark, root)
    if (toV == fromV) return (fromV, toV)
    require(toV > fromV, s"table at version $toV is BELOW the state's $fromV" +
      " — was the table recreated? re-init the state")
    val prior = read(spark, stateDir)
    val groupCols = prior.columns.takeWhile(_ != "cnt").toSeq
    val sumCols = prior.columns.dropWhile(_ != "cnt").drop(1)
      .filter(_.startsWith("sum_")).map(_.stripPrefix("sum_")).toSeq
    val minMaxCols = prior.columns.filter(_.startsWith("min_"))
      .map(_.stripPrefix("min_")).toSeq
    // throws on a range spanning a RESTORE — the documented re-init case
    val changes = TxnMergeOnRead.changesBetween(spark, root, fromV, toV)
    val delta = deltaAgg(changes, groupCols, sumCols, minMaxCols)
    val merged = prior.as("p").join(delta.as("d"), groupCols, "full_outer")
      .select(groupCols.map(col) ++
        Seq((coalesce(col("p.cnt"), lit(0L)) +
          coalesce(col("d.cnt"), lit(0L))).as("cnt")) ++
        sumCols.map(c => (coalesce(col(s"p.sum_$c"), lit(0.0)) +
          coalesce(col(s"d.sum_$c"), lit(0.0))).as(s"sum_$c")) ++
        // inserts only tighten extrema (least/greatest skip nulls, so a
        // new group takes the insert value and an insert-free group keeps
        // the prior); groups with deletes are marked for recompute below
        minMaxCols.flatMap(c => Seq(
          least(col(s"p.min_$c"), col(s"d.ins_min_$c")).as(s"min_$c"),
          greatest(col(s"p.max_$c"), col(s"d.ins_max_$c")).as(s"max_$c"))) ++
        (if (minMaxCols.isEmpty) Nil
         else Seq(coalesce(col("d.del_cnt"), lit(0L)).as("_del"))): _*)
      .filter(col("cnt") > 0)
    val finalState =
      if (minMaxCols.isEmpty) merged
      else {
        // min/max are NOT self-maintainable under deletion: the departed
        // row may have BEEN the extremum. Recompute exactly the groups the
        // range deleted from — one semi-joined scan of the table at toV,
        // O(rows of touched groups), never the groups deletes missed.
        val dirty = merged.filter(col("_del") > 0)
          .select(groupCols.map(col): _*)
        val recomputed = TxnMergeOnRead.readAt(spark, root, toV)
          .join(dirty, groupCols, "left_semi")
          .groupBy(groupCols.map(col): _*)
          .agg(minMaxCols.flatMap(c => Seq(min(col(c)).as(s"r_min_$c"),
            max(col(c)).as(s"r_max_$c"))).head,
            minMaxCols.flatMap(c => Seq(min(col(c)).as(s"r_min_$c"),
              max(col(c)).as(s"r_max_$c"))).tail: _*)
        merged.as("b").join(recomputed.as("r"), groupCols, "left_outer")
          .select(groupCols.map(col) ++ Seq(col("b.cnt").as("cnt")) ++
            sumCols.map(c => col(s"b.sum_$c").as(s"sum_$c")) ++
            minMaxCols.flatMap(c => Seq(
              when(col("b._del") > 0, col(s"r.r_min_$c"))
                .otherwise(col(s"b.min_$c")).as(s"min_$c"),
              when(col("b._del") > 0, col(s"r.r_max_$c"))
                .otherwise(col(s"b.max_$c")).as(s"max_$c"))): _*)
      }
    writeState(spark, stateDir, toV, finalState)
    (fromV, toV)
  }

  /** The current materialized aggregate. */
  def read(spark: SparkSession, stateDir: String): DataFrame = {
    val v = currentStateVersion(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no state at $stateDir"))
    spark.read.parquet(statePath(stateDir, v).toString)
  }

  /** Drop all state versions below the current one. */
  def prune(spark: SparkSession, stateDir: String): Unit = {
    val f = fs(spark, stateDir)
    currentStateVersion(spark, stateDir).foreach { cur =>
      f.listStatus(new Path(stateDir)).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("v") &&
          p.getName.stripPrefix("v").toLong < cur)
        .foreach(p => f.delete(p, true))
    }
  }
}

package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level min/max data skipping — the stats half of the lakehouse
  * skipping story whose layout half is [[ZOrder]]. Delta Lake records
  * per-file column stats in its log and prunes files whose [min,max]
  * interval cannot satisfy the predicate before any parquet footer is
  * opened (Delta Lake paper, VLDB 2020 §4.2 "data skipping"); Iceberg
  * keeps the same bounds in manifest entries. The reference era's nearest
  * ideas are static partition pruning and ORC SARGs
  * (`ql/src/java/org/apache/hadoop/hive/ql/io/sarg/SearchArgumentImpl.java`)
  * — both need either a partitioned layout or an opened reader per file;
  * file-grain stats prune from METADATA alone, which at 100 TB (hundreds
  * of thousands of files) is the difference between a driver-side filter
  * over a stats table and a cluster-wide footer storm.
  *
  * Spark-first shape: stats for a data directory are ONE aggregate over it
  * grouped by `input_file_name()` — min/max per orderable column at the
  * column's native type — written as a tiny parquet sidecar
  * (`<dir>/_file_stats/`, underscore-hidden so data scans never see it).
  * Pruning evaluates the band predicate AGAINST THE STATS TABLE with
  * Spark's own comparison/coercion semantics (`max_c >= lo AND min_c <=
  * hi`), so stats-vs-band typing can never diverge from data-vs-band
  * typing; an all-NULL file has NULL bounds, the conjunct evaluates to
  * NULL, and the file is skipped — correct, because a range predicate
  * rejects NULL anyway. Pruning is a performance decision only: callers
  * re-apply the full predicate to the surviving rows, so a missing or
  * stale-schema sidecar degrades to a full scan, never to a wrong answer.
  */
object DataSkipping {

  /** Sidecar dir name. The underscore prefix makes it invisible to Spark's
    * file discovery on the parent (same convention hiding `_SUCCESS`). */
  val STATS_DIR = "_file_stats"

  /** A closed-interval predicate `column BETWEEN lo AND hi` (point lookup =
    * `lo == hi`). Bands on several columns AND together. */
  final case class Band(column: String, lo: Any, hi: Any) {
    def predicate: Column = col(column).between(lit(lo), lit(hi))
  }

  /** Residual row filter for a band set (what pruning callers re-apply). */
  def predicateOf(bands: Seq[Band]): Column =
    bands.map(_.predicate).reduce(_ && _)

  private def orderable(t: DataType): Boolean = t match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** Compute and write the stats sidecar for one flat parquet directory.
    * One narrow aggregate job over the dir (min/max read straight off the
    * scan, grouped by file); output is one tiny parquet file. Idempotent
    * (overwrite) — safe to re-run after a rewrite or for a backfill. */
  def collect(spark: SparkSession, dataPath: String): Unit = {
    val p = new Path(dataPath)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return
    val df = spark.read.parquet(dataPath)
    val cols = df.schema.fields.filter(fd => orderable(fd.dataType)).toSeq
    val aggs = count(lit(1)).as("cnt") +: cols.flatMap(c => Seq(
      min(col(s"`${c.name}`")).as(s"min_${c.name}"),
      max(col(s"`${c.name}`")).as(s"max_${c.name}")))
    df.groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dataPath/$STATS_DIR")
  }

  /** Files of `dataPath` that can satisfy `bands`, as absolute paths.
    * `None` = no usable stats (no sidecar, or no band column present in
    * it) — scan everything; `Some(Nil)` = the whole dir is pruned. */
  def survivors(spark: SparkSession, dataPath: String,
      bands: Seq[Band]): Option[Seq[String]] = {
    val sp = new Path(s"$dataPath/$STATS_DIR")
    val f = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(sp)) return None
    val st = spark.read.parquet(sp.toString)
    val preds = bands.flatMap { b =>
      if (st.columns.contains(s"min_${b.column}"))
        Some(col(s"`max_${b.column}`") >= lit(b.lo) &&
          col(s"`min_${b.column}`") <= lit(b.hi))
      else None // column unknown to this sidecar: no constraint from it
    }
    if (preds.isEmpty) None
    else Some(st.filter(preds.reduce(_ && _)).select("file")
      .collect().map(r => s"$dataPath/${r.getString(0)}").toSeq)
  }

  /** Pruned read of one flat parquet dir: stats-surviving files only, with
    * the residual filter applied. Equals `read.parquet(dir).filter(bands)`
    * by construction. */
  def readPruned(spark: SparkSession, dataPath: String,
      bands: Seq[Band]): DataFrame = {
    val base = survivors(spark, dataPath, bands) match {
      case None => spark.read.parquet(dataPath)
      case Some(Nil) => spark.read.parquet(dataPath).limit(0)
      case Some(files) => spark.read.parquet(files: _*)
    }
    base.filter(predicateOf(bands))
  }
}

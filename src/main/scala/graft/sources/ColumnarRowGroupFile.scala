package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Columnar row-group container — the Spark re-expression of the
  * reference's RCFile (`ql/src/java/org/apache/hadoop/hive/ql/io/
  * RCFile.java:58` — "Record Columnar File": rows batched into row groups,
  * each stored COLUMN-wise with a key section of column/cell lengths
  * followed by the concatenated column bytes, so a reader materializes only
  * the requested columns and skips the rest by length arithmetic).
  *
  * This is a faithful re-expression of the *layout idea* (row groups,
  * column-major value section, length-indexed lazy column skip), not a
  * byte-compatible port: the pinned environment has no Hive serde jars to
  * produce or validate real RCFile bytes, so the container writes its own
  * magic (`GRCF1`). What IS preserved — and spec-asserted — is the format's
  * defining property: reading a column subset touches only that subset's
  * bytes (`readBytesTouched` in the spec counts them).
  *
  * Scale shape: the writer emits one file per Spark partition through an
  * RDD (no driver collect); the reader parallelizes per file via
  * `binaryFiles`. Row groups bound memory on both sides — a 100 TB table is
  * partitions × row groups, never a whole-file buffer (binaryFiles hands the
  * reader one file at a time, so files should stay at row-group-friendly
  * sizes, as with the reference's 4 MB default row-group target).
  */
object ColumnarRowGroupFile {

  private val Magic = Array[Byte]('G', 'R', 'C', 'F', '1')

  /** Live byte-accounting counter: the reader is LAZY (one decoded row
    * group at a time), so touched bytes are known only after consumption. */
  private[graft] final class Touched { var bytes: Long = 0L }

  /** Serialize one row group (column-major, length-prefixed). A NULL cell
    * writes length -1 and no value bytes — the RCFile text serde's \N
    * analog, so NULL survives the round-trip instead of collapsing to "". */
  private[graft] def writeGroup(out: DataOutputStream,
      rows: Seq[Array[String]], nCols: Int): Unit = {
    out.writeInt(rows.length)
    var c = 0
    while (c < nCols) {
      val cells = rows.map(r => if (r(c) == null) null else r(c).getBytes("UTF-8"))
      // key section for this column: total bytes then per-cell lengths
      out.writeInt(cells.map(b => if (b == null) 0 else b.length).sum)
      cells.foreach(b => out.writeInt(if (b == null) -1 else b.length))
      // value section: concatenated cell bytes
      cells.foreach(b => if (b != null) out.write(b))
      c += 1
    }
  }

  /** Parse the row groups in `bytes` LAZILY — one decoded group in memory
    * at a time (the documented RCFile bound; an eager whole-file Vector
    * would peak at ~2x file size) — materializing ONLY `wanted` column
    * indices (others are skipped by their length header — the RCFile lazy
    * decompression analog). Rows have width wanted.length; `Touched`
    * accumulates materialized value bytes as groups are consumed. */
  private[graft] def readGroups(bytes: Array[Byte], nCols: Int,
      wanted: Seq[Int]): (Iterator[Array[String]], Touched) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = new Array[Byte](Magic.length)
    in.readFully(magic)
    require(magic.sameElements(Magic), "not a GRCF1 container")
    val want = wanted.toSet
    val touched = new Touched
    val groups: Iterator[Iterator[Array[String]]] =
      new Iterator[Iterator[Array[String]]] {
        override def hasNext: Boolean = in.available() > 0
        override def next(): Iterator[Array[String]] = {
          val nRows = in.readInt()
          val cols = new Array[Array[String]](nCols)
          var c = 0
          while (c < nCols) {
            val totalBytes = in.readInt()
            if (want(c)) {
              val lens = Array.fill(nRows)(in.readInt())
              val col = new Array[String](nRows)
              var r = 0
              while (r < nRows) {
                if (lens(r) < 0) col(r) = null // -1: NULL cell, no bytes
                else {
                  val b = new Array[Byte](lens(r))
                  in.readFully(b)
                  col(r) = new String(b, "UTF-8")
                }
                r += 1
              }
              touched.bytes += totalBytes
              cols(c) = col
            } else {
              // lazy skip: per-cell lengths + the column's value bytes.
              // skipBytes may under-skip on a truncated container;
              // unchecked, the next readInt would misparse value bytes as a
              // row count — fail cleanly instead (materialized columns get
              // this for free via readFully).
              val toSkip = 4 * nRows + totalBytes
              val skipped = in.skipBytes(toSkip)
              require(skipped == toSkip,
                s"truncated container: column $c wanted $toSkip skip bytes, got $skipped")
            }
            c += 1
          }
          (0 until nRows).iterator.map { r =>
            val row = new Array[String](wanted.length)
            var i = 0
            while (i < wanted.length) { row(i) = cols(wanted(i))(r); i += 1 }
            row
          }
        }
      }
    (groups.flatten, touched)
  }

  /** Write `df` (all columns stringified; NULLs preserved) as one container
    * file per partition under `path`, with a JOB-LEVEL commit: every task
    * stages into a job-scoped sibling directory, and only after all tasks
    * succeed does the driver stamp `_SUCCESS` and swap the staging dir into
    * place — the reference FileSinkOperator's stage-then-move contract
    * (`ql/.../exec/FileSinkOperator.java` via `Utilities.mvFileToFinalPath`).
    * A job that fails midway leaves the PREVIOUS dataset untouched at
    * `path`; `read` refuses an uncommitted directory (no `_SUCCESS`), so
    * partial output is never silently returned as complete.
    *
    * Within the staging dir, each task writes to an attempt-unique tmp name
    * and publishes with a rename, so a speculative/retried attempt never
    * interleaves bytes into a part file — first publisher wins. */
  def write(df: DataFrame, path: String, rowsPerGroup: Int = 4096): Unit = {
    val nCols = df.columns.length
    val strs: RDD[Array[String]] = df
      .select(df.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
      .rdd.map(r => Array.tabulate(nCols)(r.getString))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val rootFs = root.getFileSystem(conf.value)
    // job-scoped staging sibling: the live dataset at `path` stays readable
    // (old data) until the atomic swap below
    val staging = s"$path-staging-${java.util.UUID.randomUUID()}"
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    rootFs.mkdirs(stagingPath)
    try {
      strs.foreachPartition { it =>
        // one container per partition; empty partitions write nothing
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val file = new org.apache.hadoop.fs.Path(s"$staging/part-$pid.grcf")
          val tmp = new org.apache.hadoop.fs.Path(
            s"$staging/.part-$pid-attempt-${tc.taskAttemptId()}.grcf.tmp")
          val fs = file.getFileSystem(conf.value)
          // stream each row group straight to the filesystem: peak task memory
          // is ONE row group (the documented RCFile-writer property), not the
          // whole partition's container
          val out = new DataOutputStream(
            new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16))
          try {
            out.write(Magic)
            it.grouped(rowsPerGroup).foreach(g => writeGroup(out, g, nCols))
            out.flush()
          } finally out.close()
          if (!fs.rename(tmp, file)) {
            // another attempt of this partition already published — drop ours
            fs.delete(tmp, false)
          }
        }
      }
      // job commit: _SUCCESS marks the staging dir complete, then swap.
      // The delete→rename window is the only non-atomic instant; a crash
      // there leaves NO dataset (read fails cleanly on missing _SUCCESS)
      // rather than a silent partial one.
      rootFs.create(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"), true).close()
      rootFs.delete(root, true)
      if (!rootFs.rename(stagingPath, root))
        throw new java.io.IOException(s"commit failed: rename $staging -> $path")
    } catch {
      case t: Throwable =>
        rootFs.delete(stagingPath, true) // abort: drop staging, keep old data
        throw t
    }
  }

  /** Read `wanted` columns (by name) back as a string-typed DataFrame.
    * Requires the job-commit marker `_SUCCESS` — a directory from a failed
    * or in-flight write fails loudly instead of being returned as a
    * (partial) dataset. An empty COMMITTED dataset (zero part files but
    * `_SUCCESS` present) reads back empty. */
  def read(spark: SparkSession, path: String, allCols: Seq[String],
      wanted: Seq[String]): DataFrame = {
    val idx = wanted.map(allCols.indexOf)
    require(idx.forall(_ >= 0), s"unknown columns in $wanted (have $allCols)")
    val nCols = allCols.length
    val schema = StructType(wanted.map(StructField(_, StringType)))
    val glob = new org.apache.hadoop.fs.Path(s"$path/part-*.grcf")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")),
      s"no committed GRCF dataset at $path (missing _SUCCESS — write failed or in flight)")
    val matches = Option(fs.globStatus(glob)).map(_.length).getOrElse(0)
    if (matches == 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val rows = spark.sparkContext.binaryFiles(s"$path/part-*.grcf")
      .flatMap { case (_, pds) => readGroups(pds.toArray(), nCols, idx)._1 }
      .map(a => Row.fromSeq(a.toSeq))
    spark.createDataFrame(rows, schema)
  }
}

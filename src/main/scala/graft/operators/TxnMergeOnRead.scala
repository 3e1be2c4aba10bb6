package graft.operators

import java.util.UUID

import scala.collection.immutable.SortedMap
import scala.util.{Success, Try}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read DML under **concurrent writers**: an optimistic
  * transaction log giving snapshot-isolated reads and first-committer-wins
  * writes, closing the single-writer assumption [[MergeOnReadDml]] documents.
  *
  * The reference serializes writers through the metastore's transaction
  * manager: `metastore/.../txn/TxnHandler.java:104` hands out write ids from
  * a SQL-backed sequence and `ql/.../io/AcidUtils.java:226` has every reader
  * filter delta directories by the committed-transaction list — the
  * directory listing alone is never trusted. The same split — an authority
  * for "what is committed" separate from the data files — is how the
  * open-source lakehouse formats do multi-writer ACID without a lock server
  * (Delta Lake's `_delta_log` of atomically-created ordinal entries,
  * VLDB 2020; Apache Iceberg's snapshot pointer), and that is the shape
  * re-expressed here, because on a 1000-executor cluster an embedded
  * metastore does not exist and a log of atomic file creations does.
  *
  * Layout:
  * {{{
  *   root/_txnlog/00000000000000000001.json   one atomically-created entry
  *                                            per committed version
  *   root/base_<uuid>/                        full rows + __row_id
  *   root/delta_<uuid>/{insert,delete}/       uncommitted until a log entry
  *                                            references the dir
  * }}}
  *
  * Data directories are uuid-named, so concurrent writers never contend on
  * a path; a directory not referenced by the log is invisible garbage, never
  * data. COMMIT is one `FileSystem.create(path, overwrite = false)` of the
  * next ordinal log entry: exactly one of N racing writers wins the name,
  * the losers re-read the log, re-check conflicts, and retry at the next
  * ordinal. Create-exclusive is atomic on HDFS (and object stores with
  * preconditions); on the local filesystem Hadoop's exists-then-create has a
  * sliver of a race, so commits also serialize through a per-root JVM lock —
  * exact for local[n] (one JVM by definition), and the documented deployment
  * contract everywhere else is "the FS create-exclusive must be atomic",
  * the same contract the lakehouse log stores state.
  *
  * Isolation semantics (snapshot isolation, first committer wins):
  *  - Readers replay the log to a version and never look at directory
  *    listings, so a half-staged or abandoned write is unobservable and
  *    reads are repeatable for a pinned version.
  *  - INSERT appends rows that did not exist in any snapshot; it commutes
  *    with every concurrent action and commits without conflict checks.
  *  - UPDATE/DELETE read a snapshot, stage (delete-events, new-versions)
  *    from it, and at commit time abort-and-recompute if any version
  *    committed above their snapshot also carried delete events (a
  *    concurrent UPDATE/DELETE may have touched the same rows — recomputing
  *    on the new snapshot is the lost-update guard; concurrent INSERTs and
  *    compactions do not conflict because row ids are never reused and
  *    compaction preserves them).
  *  - Compaction entries claim the folded version prefix; deltas committed
  *    while the compactor ran stay live on top of the new base, so
  *    compaction needs no retry loop at all.
  */
object TxnMergeOnRead {

  private val RID = "__row_id"
  private val LOG_DIR = "_txnlog"
  private val MAX_COMMIT_ATTEMPTS = 50

  /** One committed version. `folds` is the version prefix a compaction
    * supersedes (0 for plain DML entries). Entries are tiny ([[Entry]] is a
    * fixed-width line, not a manifest): the row data lives in parquet, the
    * log only names directories — the property that keeps log replay O(log
    * length) metadata work no matter the table size. */
  private case class Entry(version: Long, action: String, dir: String,
      folds: Long)

  private object Entry {
    // fixed field order, no JSON library needed (none is on the classpath)
    def render(e: Entry): String =
      s"""{"version":${e.version},"action":"${e.action}","dir":"${e.dir}","folds":${e.folds}}"""
    private val P =
      """\{"version":(\d+),"action":"(\w+)","dir":"([^"]*)","folds":(\d+)\}""".r
    def parse(s: String): Entry = s.trim match {
      case P(v, a, d, f) => Entry(v.toLong, a, d, f.toLong)
      case other => throw new IllegalStateException(s"corrupt log entry: $other")
    }
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def entryPath(root: String, version: Long): Path =
    new Path(s"$root/$LOG_DIR/" + f"$version%020d" + ".json")

  /** Committed entries in version order (version v lives in file v — the
    * filename is the authority, the body is checked against it). */
  private def readLog(f: FileSystem, root: String): Seq[Entry] = {
    val dir = new Path(s"$root/$LOG_DIR")
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .sortBy(_.getName)
      .map { p =>
        val in = f.open(p)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val e = Entry.parse(body)
        val named = p.getName.stripSuffix(".json").toLong
        require(e.version == named,
          s"log entry $named declares version ${e.version}")
        e
      }
  }

  /** The live state at a log prefix: current base dir plus committed delta
    * dirs in version order. Replay is pure fold over the entries. */
  private def liveState(log: Seq[Entry]): (String, SortedMap[Long, Entry]) = {
    var base: String = null
    var deltas = SortedMap.empty[Long, Entry]
    log.foreach { e =>
      e.action match {
        case "create" => base = e.dir; deltas = SortedMap.empty
        case "insert" | "mutate" => deltas += (e.version -> e)
        case "compact" =>
          base = e.dir
          deltas = deltas.rangeFrom(e.folds + 1)
      }
    }
    require(base != null, "table has no create entry")
    (base, deltas)
  }

  /** Serialize local-FS commits per root within this JVM (see scaladoc). */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  /** Try to commit `e` at exactly version `e.version`. True iff this writer
    * won that ordinal. */
  private def tryCommit(f: FileSystem, root: String, e: Entry): Boolean =
    lockFor(root).synchronized {
      val p = entryPath(root, e.version)
      if (f.exists(p)) return false
      val out =
        try f.create(p, false)
        catch { case _: java.io.IOException => return false } // lost the race
      try out.write(Entry.render(e).getBytes("UTF-8")) finally out.close()
      true
    }

  private def withRid(df: DataFrame, txn: Long): DataFrame =
    df.withColumn(RID, struct(lit(txn).as("txn"),
      monotonically_increasing_id().as("seq")))

  /** Create the table: base data + log entry 1. Not concurrency-safe against
    * itself (two creates of the same table is a caller bug, reported). */
  def create(spark: SparkSession, root: String, df: DataFrame): Unit = {
    val f = fs(spark, root)
    f.delete(new Path(root), true)
    val dir = s"base_${UUID.randomUUID().toString.take(12)}"
    withRid(df, 1L).write.parquet(s"$root/$dir")
    require(tryCommit(f, root, Entry(1L, "create", dir, 0L)),
      s"concurrent create of $root")
  }

  private def readDir(spark: SparkSession, root: String, dir: String,
      kind: String): Option[DataFrame] = {
    val p = s"$root/$dir/$kind"
    if (fs(spark, root).exists(new Path(p))) Some(spark.read.parquet(p))
    else None
  }

  /** Snapshot as of the given log prefix, with row ids. */
  private def snapshotAt(spark: SparkSession, root: String,
      log: Seq[Entry]): DataFrame = {
    val (base, deltas) = liveState(log)
    val baseDf = spark.read.parquet(s"$root/$base")
    val withIns = deltas.values.toSeq.flatMap(e => readDir(spark, root, e.dir, "insert"))
      .reduceOption(_ unionByName _)
      .fold(baseDf)(ins => baseDf.unionByName(ins))
    // delete events carry the full dead row (CDF-style) but the snapshot
    // only needs the id — parquet column pruning keeps this read narrow
    deltas.values.toSeq.flatMap(e => readDir(spark, root, e.dir, "delete"))
      .map(_.select(col(RID)))
      .reduceOption(_ union _)
      .fold(withIns)(del => withIns.join(del, Seq(RID), "left_anti"))
  }

  /** Snapshot read at the latest committed version (user-facing). */
  def read(spark: SparkSession, root: String): DataFrame =
    snapshotAt(spark, root, readLog(fs(spark, root), root)).drop(RID)

  /** Latest committed version — a pinnable snapshot handle. */
  def currentVersion(spark: SparkSession, root: String): Long =
    readLog(fs(spark, root), root).lastOption.map(_.version).getOrElse(0L)

  /** Time-travel read at a pinned version (repeatable-read contract).
    * Valid while the version's data dirs survive: [[compact]] garbage-
    * collects the dirs it folds, so pinned reads at or below a later
    * compaction's `folds` fail once GC runs (the retention-window
    * tradeoff every log-structured table format has). */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame =
    snapshotAt(spark, root,
      readLog(fs(spark, root), root).takeWhile(_.version <= version)).drop(RID)

  /** Net row-level changes (CDC) committed in versions `(fromV, toV]` —
    * the incremental-consumption contract (Delta Lake's change data feed,
    * Iceberg's incremental scan): a downstream job that processed version
    * `fromV` reads only what happened since, never the table. An UPDATE
    * surfaces as its two events (delete of the old version, insert of the
    * new); a row born and deleted inside the range nets out to nothing.
    *
    * Scale shape: reads ONLY the range's delta directories — delete events
    * store the full dead row (the Delta-CDF `_change_data` tradeoff: the
    * writer pays O(changed rows) extra bytes so no consumer ever rescans
    * the table; the snapshot read path still prunes those files to the id
    * column), so CDC cost is O(changes in range) with the table size
    * nowhere in the bound. The two anti-joins below are delta-vs-delta
    * (both sides are change sets, broadcast-able in the normal CDC regime).
    * Same dir-survival contract as [[readAt]]: a compaction inside or above
    * the range GCs the dirs this replay needs, so CDC ranges must stay
    * within the retention window. */
  def changesBetween(spark: SparkSession, root: String, fromV: Long,
      toV: Long): DataFrame = {
    val f = fs(spark, root)
    val log = readLog(f, root)
    val range = log.filter(e => e.version > fromV && e.version <= toV)
    val born = range.flatMap(e => readDir(spark, root, e.dir, "insert"))
      .reduceOption(_ unionByName _)
    val dead = range.flatMap(e => readDir(spark, root, e.dir, "delete"))
      .reduceOption(_ unionByName _)
    // rows born then killed inside the range net out of BOTH sides
    val inserted = born.map(i =>
      dead.fold(i)(d => i.join(d.select(col(RID)), Seq(RID), "left_anti")))
    val deleted = dead.map(d =>
      born.fold(d)(i => d.join(i.select(col(RID)), Seq(RID), "left_anti")))
    val tagged =
      inserted.map(_.drop(RID).withColumn("change", lit("insert"))).toSeq ++
      deleted.map(_.drop(RID).withColumn("change", lit("delete"))).toSeq
    tagged.reduceOption(_ unionByName _).getOrElse(
      snapshotAt(spark, root, log.takeWhile(_.version <= fromV))
        .drop(RID).withColumn("change", lit("")).limit(0))
  }

  /** Stage delete/insert halves under a uuid dir. The dir is invisible until
    * a log entry references it, so staging needs no temp-dir dance. */
  private def stage(spark: SparkSession, root: String,
      delete: Option[DataFrame], insert: Option[DataFrame]): String = {
    val dir = s"delta_${UUID.randomUUID().toString.take(12)}"
    delete.foreach(_.write.parquet(s"$root/$dir/delete"))
    insert.foreach(_.write.parquet(s"$root/$dir/insert"))
    dir
  }

  /** INSERT INTO: stage once, then take the next free ordinal. New rows
    * cannot collide with any concurrent action (ids are fresh), so no
    * conflict check and no recompute — losing a commit race only means
    * retrying the one-file create. */
  def insert(spark: SparkSession, root: String, rows: DataFrame): Unit = {
    val f = fs(spark, root)
    val log0 = readLog(f, root)
    // the schema lookup reads parquet footers that a concurrent compaction's
    // GC can delete under us — re-resolve against the fresh log in that case
    // (the one data-dir read INSERT does; its staged rows are caller data)
    val cols = (0 to 3).view.map { attempt =>
      val log = if (attempt == 0) log0 else readLog(f, root)
      Try(snapshotAt(spark, root, log).columns.filter(_ != RID).toSeq)
    }.collectFirst { case Success(c) => c }
      .getOrElse(throw new IllegalStateException(
        s"cannot resolve schema of $root"))
    // rid txn = a fresh uuid-derived tag, not the commit version (unknown
    // until the race resolves); uniqueness is all the id contract needs
    val tag = math.abs(UUID.randomUUID().getLeastSignificantBits)
    val dir = stage(spark, root, None,
      Some(withRid(rows.select(cols.map(col): _*), tag)))
    var v = log0.lastOption.map(_.version).getOrElse(0L) + 1
    var attempts = 0
    while (!tryCommit(f, root, Entry(v, "insert", dir, 0L))) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"insert into $root livelocked")
      v = readLog(f, root).last.version + 1
    }
  }

  /** Shared optimistic loop for UPDATE/DELETE: compute against the latest
    * snapshot, then commit unless a version above the snapshot also carried
    * delete events (concurrent mutation → recompute). `stageFrom` returns
    * None when the predicate matches nothing — committing an empty mutation
    * would serialize against other writers for no effect, so it no-ops. */
  private def mutate(spark: SparkSession, root: String,
      stageFrom: DataFrame => Option[(Option[DataFrame], Option[DataFrame])]): Unit = {
    val f = fs(spark, root)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts <= MAX_COMMIT_ATTEMPTS, s"mutation of $root livelocked")
      val log0 = readLog(f, root)
      val snapV = log0.lastOption.map(_.version).getOrElse(0L)
      stageFrom(snapshotAt(spark, root, log0)) match {
        case None => done = true // nothing matched on this snapshot
        case Some((del, ins)) =>
          val dir = stage(spark, root, del, ins)
          var v = snapV + 1
          var committed = false
          var conflicted = false
          while (!committed && !conflicted) {
            // first committer wins: anyone who landed a mutation above our
            // snapshot may have consumed the rows we matched
            conflicted = readLog(f, root)
              .exists(e => e.version > snapV && e.action == "mutate")
            if (!conflicted) {
              committed = tryCommit(f, root, Entry(v, "mutate", dir, 0L))
              if (!committed) v = readLog(f, root).last.version + 1
            }
          }
          if (committed) done = true
          else f.delete(new Path(s"$root/$dir"), true) // abandoned stage
      }
    }
  }

  /** DELETE WHERE cond under snapshot isolation (3VL: NULL cond keeps).
    * The staged delete event keeps the whole dead row, not just its id —
    * O(deleted rows) extra write bytes that buy [[changesBetween]] its
    * no-table-scan contract; readers prune back down to the id column. */
  def delete(spark: SparkSession, root: String, cond: String): Unit =
    mutate(spark, root, { snap =>
      val del = snap.filter(coalesce(expr(cond), lit(false)))
      if (del.isEmpty) None else Some((Some(del), None))
    })

  /** UPDATE SET ... WHERE cond under snapshot isolation: delete events plus
    * re-inserted new versions, the reference's two-event UPDATE encoding.
    * SET expressions see the pre-update row. */
  def update(spark: SparkSession, root: String,
      set: Seq[(String, String)], cond: String): Unit =
    mutate(spark, root, { snap =>
      val matched = snap.filter(coalesce(expr(cond), lit(false)))
      val cols = snap.columns.filter(_ != RID).toSeq
      val byLower = cols.map(c => c.toLowerCase -> c).toMap
      val setMap = set.map { case (k, v) =>
        byLower.getOrElse(k.toLowerCase, throw new IllegalArgumentException(
          s"UPDATE SET references unknown column '$k'")) -> v
      }.toMap
      // no persist needed for half-consistency: the snapshot is a pinned
      // log prefix over immutable files, so the delete and insert halves
      // evaluate `matched` to the same rows by determinism
      if (matched.isEmpty) None
      else {
        val tag = math.abs(UUID.randomUUID().getLeastSignificantBits)
        val newVersions = matched.select(cols.map { c =>
          setMap.get(c).map(e => expr(e).as(c)).getOrElse(col(c))
        }: _*)
        Some((Option(matched), // full old rows: the CDC delete events
          Option(withRid(newVersions, tag))))
      }
    })

  /** Major compaction: fold the snapshot at version V into a new base whose
    * log entry claims `folds = V`. Deltas committed above V while the fold
    * ran stay live on top of the new base (row ids survive the fold, so
    * their delete events still resolve) — compaction therefore never
    * conflicts and never retries; it only re-reads the log for a free
    * ordinal. Superseded data dirs are deleted only after the entry is
    * committed; a crash before that leaves garbage, never corruption.
    * The immediate GC here assumes no reader or in-flight mutation still
    * holds a pre-compaction snapshot (true in the specs/queries); a
    * production deployment separates the fold from the delete and defers
    * the latter by a retention window (the vacuum contract), which is a
    * scheduling policy on top of this protocol, not a change to it. */
  def compact(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val log0 = readLog(f, root)
    val snapV = log0.lastOption.map(_.version).getOrElse(0L)
    val (oldBase, oldDeltas) = liveState(log0)
    val dir = s"base_${UUID.randomUUID().toString.take(12)}"
    snapshotAt(spark, root, log0).write.parquet(s"$root/$dir")
    var v = snapV + 1
    var attempts = 0
    while (!tryCommit(f, root, Entry(v, "compact", dir, snapV))) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"compact of $root livelocked")
      v = readLog(f, root).last.version + 1
    }
    (oldBase +: oldDeltas.values.toSeq.map(_.dir))
      .foreach(d => f.delete(new Path(s"$root/$d"), true))
  }
}

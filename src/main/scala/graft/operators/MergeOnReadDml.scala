package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level DML with **merge-on-read** semantics — the write-optimized half
  * of the reference's ACID design, complementing [[CopyOnWriteDml]] (the
  * read-optimized rewrite).
  *
  * The reference keeps a base plus per-transaction delta directories and
  * merges them in every reader: `ql/.../io/AcidUtils.java:226-228` (base_N /
  * delta_x_y layout), `ql/.../io/orc/VectorizedOrcAcidRowBatchReader.java`
  * (delete events applied via an in-memory registry keyed by ROW__ID), and a
  * background compactor folds deltas back into a new base
  * (`ql/.../txn/compactor/Worker.java:53`). An UPDATE is a delete event plus
  * an insert of the new row version (`UpdateDeleteSemanticAnalyzer`).
  *
  * Spark-first re-expression, same layout algebra over parquet:
  *
  *   root/base_N/            full rows + `__row_id`  (all txns <= N folded in)
  *   root/delta_T/delete/    one column `__row_id`   (rows deleted at txn T)
  *   root/delta_T/insert/    full rows + `__row_id`  (rows added at txn T)
  *
  * A snapshot read is `(base UNION ALL insert-deltas) LEFT ANTI JOIN
  * delete-deltas ON __row_id`. A row id is a `(txn, seq)` struct — the
  * reference's (writeId, bucket, rowId) triple: ids are never reused, so
  * delete events form a set and the merge needs no ordering — exactly why
  * the reference's delete registry can be an unordered hash set.
  *
  * Scale shape (the 100 TB contract):
  *  - A write costs O(changed rows): the base is never rewritten, which is
  *    the entire point of merge-on-read for frequent small mutations over a
  *    huge table (CoW would rewrite a partition per touched row).
  *  - The read-side anti-join needs no hint: delete-deltas are a parquet
  *    relation with file-size stats, so Catalyst broadcasts them while they
  *    are small (the common case, and the moral equivalent of the
  *    reference's in-memory delete-event registry) and falls back to a
  *    shuffled anti-join when they outgrow the threshold — the case where
  *    the reference's reader OOMs instead.
  *  - Reads degrade linearly in accumulated delta volume; [[compact]] is the
  *    major compaction that restores base-only scans and deletes the folded
  *    deltas, same lifecycle as the reference's Worker.
  */
object MergeOnReadDml {

  private val RID = "__row_id"

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (kind, txn) pairs present under root, e.g. base_1, delta_2. */
  private def listTxns(spark: SparkSession, root: String): Seq[(String, Long)] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith("base_") => ("base", n.stripPrefix("base_").toLong)
      case n if n.startsWith("delta_") => ("delta", n.stripPrefix("delta_").toLong)
    }
  }

  private def nextTxn(spark: SparkSession, root: String): Long =
    (listTxns(spark, root).map(_._2) :+ 0L).max + 1

  /** Fresh per-transaction row ids: a (txn, seq) STRUCT — the reference's
    * (writeId, bucket, rowId) ROW__ID triple collapsed to two fields, since
    * monotonically_increasing_id already encodes (partition << 33 | row).
    * The struct never collides for any partition count or txn count (no
    * bit-packing budget to outgrow), equality-joins like any column, and is
    * never reused — which is what lets delete events be an unordered set. */
  private def withRid(df: DataFrame, txn: Long): DataFrame =
    df.withColumn(RID, struct(lit(txn).as("txn"),
      monotonically_increasing_id().as("seq")))

  /** Create the table: write base_1 from `df`. */
  def create(spark: SparkSession, root: String, df: DataFrame): Unit = {
    val f = fs(spark, root)
    f.delete(new Path(root), true)
    withRid(df, 1L).write.mode("overwrite").parquet(s"$root/base_1")
  }

  /** Current snapshot including the internal row id. */
  private def snapshotWithRid(spark: SparkSession, root: String): DataFrame = {
    val txns = listTxns(spark, root)
    val baseTxn = txns.collect { case ("base", t) => t }.max
    val deltaTxns = txns.collect { case ("delta", t) if t > baseTxn => t }.sorted
    val base = spark.read.parquet(s"$root/base_$baseTxn")
    val f = fs(spark, root)
    def part(t: Long, kind: String): Option[DataFrame] = {
      val p = s"$root/delta_$t/$kind"
      if (f.exists(new Path(p))) Some(spark.read.parquet(p)) else None
    }
    // the rid dedup over the (small) delta union heals the one crash window
    // compactMinor has: a folded delta published but its source deltas not
    // yet deleted leaves I∖D rows present twice under the same never-reused
    // rid. Duplicate DELETE events need no healing (anti-join is a set op).
    val withInserts = deltaTxns.flatMap(part(_, "insert"))
      .reduceOption(_ unionByName _) match {
      case Some(ins) => base.unionByName(ins.dropDuplicates(RID))
      case None => base
    }
    val deletes = deltaTxns.flatMap(part(_, "delete"))
    deletes.reduceOption(_ union _) match {
      case Some(del) => withInserts.join(del, Seq(RID), "left_anti")
      case None => withInserts
    }
  }

  /** Snapshot read (user-facing: no internal columns). */
  def read(spark: SparkSession, root: String): DataFrame =
    snapshotWithRid(spark, root).drop(RID)

  /** Atomic transaction commit: stage the delta's delete/insert halves under
    * a dot-dir (invisible to [[listTxns]]), then ONE rename publishes the
    * whole txn. Without this an UPDATE would surface its delete events
    * before its insert half lands — a crash between the two writes reads as
    * data loss, where the reference's reader never sees an uncommitted
    * writeId (`AcidUtils.getAcidState` filters by the committed-txn list).
    * Re-committing an existing txn id replaces it — the idempotence that
    * makes streaming-batch retries exactly-once ([[insertAt]]). */
  private def commitDelta(spark: SparkSession, root: String, txn: Long,
      delete: Option[DataFrame], insert: Option[DataFrame]): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(s"$root/.txn_$txn")
    f.delete(tmp, true) // failed-attempt debris
    delete.foreach(_.write.mode("overwrite").parquet(s"$tmp/delete"))
    insert.foreach(_.write.mode("overwrite").parquet(s"$tmp/insert"))
    val target = new Path(s"$root/delta_$txn")
    f.delete(target, true) // idempotent re-commit of the same txn
    require(f.rename(tmp, target), s"commit rename failed for txn $txn")
  }

  /** DELETE WHERE cond: one delete-delta of the matching row ids. Rows where
    * cond is not TRUE survive (3VL, as in HiveQL and [[CopyOnWriteDml]]). */
  def delete(spark: SparkSession, root: String, cond: String): Unit = {
    val txn = nextTxn(spark, root)
    val del = snapshotWithRid(spark, root)
      .filter(coalesce(expr(cond), lit(false)))
      .select(col(RID))
    commitDelta(spark, root, txn, Some(del), None)
  }

  /** UPDATE SET ... WHERE cond: delete events for the matched rows plus an
    * insert-delta with their new versions — the reference's two-event
    * encoding of UPDATE. SET expressions see the pre-update row. */
  def update(spark: SparkSession, root: String,
      set: Seq[(String, String)], cond: String): Unit = {
    val txn = nextTxn(spark, root)
    val snap = snapshotWithRid(spark, root)
    val matched = snap.filter(coalesce(expr(cond), lit(false)))
    // columns resolved case-insensitively against the table, as in CoW
    val cols = snap.columns.filter(_ != RID).toSeq
    val byLower = cols.map(c => c.toLowerCase -> c).toMap
    val setMap = set.map { case (k, v) =>
      byLower.getOrElse(k.toLowerCase, throw new IllegalArgumentException(
        s"UPDATE SET references unknown column '$k'")) -> v
    }.toMap
    // materialize the match once: the delete and insert halves must see the
    // same row set even though they are two writes
    matched.persist()
    try {
      val newVersions = matched.select(cols.map { c =>
        setMap.get(c).map(e => expr(e).as(c)).getOrElse(col(c))
      }: _*)
      commitDelta(spark, root, txn,
        Some(matched.select(col(RID))), Some(withRid(newVersions, txn)))
    } finally matched.unpersist()
  }

  /** INSERT INTO: one insert-delta. */
  def insert(spark: SparkSession, root: String, rows: DataFrame): Unit =
    insertAt(spark, root, rows, nextTxn(spark, root))

  /** INSERT INTO at a CALLER-CHOSEN txn id — the idempotent form for
    * streaming ingest: keying the txn by the micro-batch id makes a retried
    * batch REPLACE its own delta instead of minting a new one, which is what
    * turns the sink's at-least-once batch delivery into exactly-once table
    * state (the reference's TransactionBatch abort/reopen contract). The id
    * must be above the current base txn and owned by this writer. */
  def insertAt(spark: SparkSession, root: String, rows: DataFrame,
      txn: Long): Unit = {
    val baseTxn = listTxns(spark, root).collect { case ("base", t) => t }.max
    // a txn at or below the base would write a delta the snapshot filter
    // (`t > baseTxn`) silently ignores — fail loudly instead of losing rows
    require(txn > baseTxn,
      s"insertAt txn $txn is not above base txn $baseTxn (superseded by compaction)")
    val cols = snapshotWithRid(spark, root).columns.filter(_ != RID).toSeq
    commitDelta(spark, root, txn, None,
      Some(withRid(rows.select(cols.map(col): _*), txn)))
  }

  /** Minor compaction: fold the accumulated deltas into ONE delta without
    * touching the base — the reference's `CompactionType.MINOR`
    * (`ql/.../txn/compactor/CompactorMR.java`, many small delta_x_y dirs →
    * one delta_x_y'). With never-reused row ids the fold is pure set
    * algebra: delete events that hit a delta-born row annihilate with it
    * (`(base ∪ I) \ D = (base \ (D∖I)) ∪ (I ∖ D)`), so the new delta is
    * insert = I∖D and delete = D∖I. Read cost drops from one union+anti-join
    * per accumulated txn to exactly one of each, while the base — the 100 TB
    * part — is neither read nor written. */
  def compactMinor(spark: SparkSession, root: String): Unit = {
    val txns = listTxns(spark, root)
    val baseTxn = txns.collect { case ("base", t) => t }.max
    val deltaTxns = txns.collect { case ("delta", t) if t > baseTxn => t }
    if (deltaTxns.isEmpty) return
    val txn = nextTxn(spark, root)
    val f = fs(spark, root)
    def parts(kind: String): Seq[DataFrame] = deltaTxns.sorted.flatMap { t =>
      val p = s"$root/delta_$t/$kind"
      if (f.exists(new Path(p))) Some(spark.read.parquet(p)) else None
    }
    val inserts = parts("insert").reduceOption(_ unionByName _)
    val deletes = parts("delete").reduceOption(_ union _)
    // stage via a tmp dir: the folded delta reads the dirs it replaces
    val tmp = s"$root/.compact_$txn"
    f.delete(new Path(tmp), true) // failed-attempt debris
    inserts.foreach { i =>
      deletes.fold(i)(d => i.join(d, Seq(RID), "left_anti"))
        .write.mode("overwrite").parquet(s"$tmp/insert")
    }
    deletes.foreach { d =>
      inserts.fold(d)(i => d.join(i.select(col(RID)), Seq(RID), "left_anti"))
        .write.mode("overwrite").parquet(s"$tmp/delete")
    }
    // publish must succeed BEFORE the sources are deleted — a failed rename
    // with the deletions already issued would drop every un-compacted txn.
    // A crash AFTER the rename but before the deletions is healed at read
    // time by snapshotWithRid's rid dedup (the folded rows and their
    // originals share ids).
    require(f.rename(new Path(tmp), new Path(s"$root/delta_$txn")),
      s"minor-compaction publish rename failed for txn $txn")
    deltaTxns.foreach(t => f.delete(new Path(s"$root/delta_$t"), true))
  }

  /** Major compaction: fold every delta into a new base and delete the
    * superseded directories — `txn/compactor/Worker.java:53`. Afterwards a
    * snapshot read is a plain base scan (no anti-join). */
  def compact(spark: SparkSession, root: String): Unit = {
    val txn = nextTxn(spark, root)
    val folded = snapshotWithRid(spark, root)
    folded.write.mode("overwrite").parquet(s"$root/base_$txn")
    val f = fs(spark, root)
    listTxns(spark, root).filter(_._2 < txn).foreach { case (kind, t) =>
      f.delete(new Path(s"$root/${kind}_$t"), true)
    }
  }
}

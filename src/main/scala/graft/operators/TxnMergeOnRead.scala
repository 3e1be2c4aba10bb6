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
  *   root/_txnlog/00000000000000000007.json   one atomically-renamed entry
  *                                            per committed version
  *   root/_txnlog/00000000000000000016.ckpt   checkpoint: reconciled state
  *                                            at version 16 (see below)
  *   root/base_<uuid>/                        full rows + __row_id
  *   root/delta_<uuid>/{insert,delete}/       uncommitted until a log entry
  *                                            references the dir
  * }}}
  *
  * Surface (one lakehouse table in ~15 calls):
  * {{{
  *   create / read / readAt(v) / currentVersion      snapshots + time travel
  *   changesBetween(from, to)                        CDC, O(changes in range)
  *   insert / insertBatch(key, rows)                 append; exactly-once form
  *   update / delete / merge                         row-grain optimistic DML
  *   compact / compactMinor                          MAJOR (O(table)) / MINOR
  *                                                   (O(deltas)) folds
  *   vacuum(retainVersions, pruneLog)                the only place data dies
  *   addColumns / restore(v)                         metadata-only schema
  *                                                   evolution + rollback
  *   checkpoint                                      explicit metadata fold
  *   readPruned(bands) / analyze / scanProfile       file-level data
  *                                                   skipping ([[DataSkipping]])
  * }}}
  *
  * Data directories are uuid-named, so concurrent writers never contend on
  * a path; a directory not referenced by the log is invisible garbage, never
  * data. COMMIT is write-temp-then-atomic-rename: the entry body is fully
  * written to `_txnlog/.tmp_<uuid>` and then renamed (no-overwrite) onto the
  * next ordinal — exactly one of N racing writers wins the name, and a
  * visible entry file is ALWAYS complete, so a writer that dies mid-commit
  * leaves only an invisible temp file and can never burn an ordinal (the
  * same discipline as Delta's HDFS LogStore, which puts a commit into the
  * log via temp-file + atomic rename). Rename-without-overwrite is atomic
  * on HDFS; on the local filesystem (where `rename` can clobber) commits
  * also serialize through a per-root JVM lock — exact for local[n] (one JVM
  * by definition), and the documented deployment contract everywhere else
  * is "the FS rename-without-overwrite must be atomic", the contract the
  * lakehouse log stores state.
  *
  * '''Checkpoints — O(tail) metadata, not O(all versions ever).''' Without
  * them, every read and every commit would re-open every entry file ever
  * committed, an unbounded driver-side cost at production commit rates. A
  * checkpoint file at version V (Delta's `_last_checkpoint` shape) stores
  * the RECONCILED state at V — base dir, live delta entries, burned batch
  * keys with their canonical versions, added columns — so a reader loads
  * one checkpoint plus the entries above it: the per-operation metadata
  * cost is O(entries since the last checkpoint), flat in the table's
  * age. One is written automatically every [[checkpointInterval]] commits
  * (by whichever writer lands the multiple — best-effort, a failed
  * checkpoint never fails the commit), and on demand via [[checkpoint]].
  * Checkpoint size is O(live state): live deltas are bounded by compaction
  * cadence; batch keys accrue one short line per ingested batch (the same
  * growth Delta carries for SetTransaction actions). Entry files below a
  * checkpoint stay on disk for time travel / CDC below it (the slow path
  * replays them) until [[vacuum]]`(pruneLog = true)` retires them, after
  * which history below the oldest checkpoint fails with a clear error.
  *
  * Isolation semantics (snapshot isolation, first committer wins):
  *  - Readers replay the log to a version and never look at directory
  *    listings, so a half-staged or abandoned write is unobservable and
  *    reads are repeatable for a pinned version.
  *  - INSERT appends rows that did not exist in any snapshot; it commutes
  *    with every concurrent action and commits without conflict checks.
  *  - UPDATE/DELETE read a snapshot, stage (delete-events, new-versions)
  *    from it, and at commit time abort-and-recompute only if a version
  *    committed above their snapshot deleted one of the SAME rows — the
  *    conflict grain is the row-id set, not the table: the log entry
  *    records a compact footprint summary of the staged delete (per-tag
  *    seq ranges), summaries that can't intersect clear without any data
  *    read, and only a possible overlap pays the exact delete-vs-delete
  *    semi-join (both sides pruned to the id column). Mutations with
  *    disjoint footprints — different partitions, different tenants, the
  *    normal state of a busy 100 TB table — therefore commit concurrently
  *    without recompute, mirroring the reference's partition-grain locks
  *    (`metastore/.../txn/TxnHandler.java` enqueueLockWithRetry) and
  *    Delta/Iceberg file-grain conflict detection, but exact to the row.
  *    A competing mutate whose delete dir was RETIRED by vacuum while our
  *    snapshot was pinned is treated as a conflict (recompute), never
  *    silently cleared: "no delete half was ever staged" (footprint `-`)
  *    is provably safe, "the log references a dir that is gone" is a stale
  *    snapshot, and clearing it would commit a lost update.
  *    Phantoms are permitted (a concurrent INSERT a mutation's predicate
  *    would have matched is not a conflict) — snapshot isolation, the same
  *    write-conflict contract as Delta's WriteSerializable default.
  *  - Compaction entries claim the folded version prefix; insert/mutate
  *    deltas committed while the compactor ran stay live on top of the new
  *    base. Two compactions (major or minor) must not fold concurrently —
  *    the loser's fold would re-apply rows the winner already folded — so
  *    a compactor aborts (returns false) when another compaction landed
  *    above its snapshot; the reference serializes compactions the same
  *    way through the Initiator's queue.
  *  - Data-dir GC is [[vacuum]]'s job, never the compactor's: superseded
  *    dirs survive until they fall out of the retention window, so pinned
  *    [[readAt]]/[[changesBetween]] snapshots keep working across
  *    compactions — the lakehouse retention contract.
  */
object TxnMergeOnRead {

  private val RID = "__row_id"
  private val LOG_DIR = "_txnlog"
  private val MAX_COMMIT_ATTEMPTS = 50

  /** Commits at multiples of this version interval write a checkpoint.
    * Tunable seam for specs (smaller interval = more boundary coverage);
    * production default keeps per-op metadata at ≤16 entry opens. */
  private[graft] var checkpointInterval: Long = 16L

  /** One committed version. `folds` is the version prefix a compaction
    * supersedes (0 for plain DML entries; the restore target for restore
    * entries). `fp` is a mutate entry's delete footprint summary:
    * `tag:minSeq:maxSeq` items joined by `;`, or `*` when the mutation
    * touched rows from more than [[FP_MAX_TAGS]] writer tags (then only the
    * exact rid check can clear it). Entries are tiny ([[Entry]] is a
    * fixed-width line, not a manifest): the row data lives in parquet, the
    * log only names directories — the property that keeps log replay cheap
    * no matter the table size. */
  private case class Entry(version: Long, action: String, dir: String,
      folds: Long, fp: String = "")

  private object Entry {
    // fixed field order, no JSON library needed (none is on the classpath)
    def render(e: Entry): String =
      s"""{"version":${e.version},"action":"${e.action}","dir":"${e.dir}","folds":${e.folds},"fp":"${e.fp}"}"""
    private val P =
      """\{"version":(\d+),"action":"(\w+)","dir":"([^"]*)","folds":(\d+),"fp":"([^"]*)"\}""".r
    // pre-round-10 logs used a 4-field form without "fp"; parse it with
    // fp = "" (which the conflict path treats conservatively — always
    // exact-checked) so old tables stay readable
    private val P4 =
      """\{"version":(\d+),"action":"(\w+)","dir":"([^"]*)","folds":(\d+)\}""".r
    def parse(s: String): Entry = s.trim match {
      case P(v, a, d, f, fp) => Entry(v.toLong, a, d, f.toLong, fp)
      case P4(v, a, d, f) => Entry(v.toLong, a, d, f.toLong, "")
      case other => throw new IllegalStateException(s"corrupt log entry: $other")
    }
  }

  /** Reconciled log state at `version`: everything a reader needs to
    * continue the replay from there without opening older entry files.
    * `batchCanon` maps each batch-insert fp (`b:<key>`) ever committed at
    * or below `version` — including restored-away ones (keys stay burned)
    * — to its canonical (lowest) version. */
  private case class Ckpt(version: Long, base: String,
      deltas: SortedMap[Long, Entry], batchCanon: Map[String, Long],
      cols: Vector[(String, String)],
      constraints: Vector[(String, String)] = Vector.empty)

  /** A loaded log: the latest usable checkpoint (if any) plus the entries
    * strictly above it, in version order. `floor` is the oldest version the
    * view can truncate to without re-reading pre-checkpoint entry files. */
  private case class View(ckpt: Option[Ckpt], tail: Seq[Entry]) {
    def floor: Long = ckpt.map(_.version).getOrElse(0L)
    def lastVersion: Long = tail.lastOption.map(_.version).getOrElse(floor)
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def entryPath(root: String, version: Long): Path =
    new Path(s"$root/$LOG_DIR/" + f"$version%020d" + ".json")

  private def ckptPath(root: String, version: Long): Path =
    new Path(s"$root/$LOG_DIR/" + f"$version%020d" + ".ckpt")

  private def readBody(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** One listing of the log dir → (entry files, checkpoint files), each as
    * (version-from-filename, path), unsorted. Temp files are invisible. */
  private def listLog(f: FileSystem, root: String)
      : (Seq[(Long, Path)], Seq[(Long, Path)]) = {
    val dir = new Path(s"$root/$LOG_DIR")
    if (!f.exists(dir)) return (Seq.empty, Seq.empty)
    val all = f.listStatus(dir).toSeq.map(_.getPath)
    def ver(p: Path, suffix: String): Long =
      p.getName.stripSuffix(suffix).toLong
    (all.filter(_.getName.endsWith(".json")).map(p => (ver(p, ".json"), p)),
      all.filter(_.getName.endsWith(".ckpt")).map(p => (ver(p, ".ckpt"), p)))
  }

  /** Parse entry files (sorted by caller). Rename-committed entries are
    * always complete, so every visible file must parse — a failure is real
    * corruption, reported immediately. */
  private def readEntryFiles(f: FileSystem, files: Seq[(Long, Path)]): Seq[Entry] =
    files.sortBy(_._1).map { case (named, p) =>
      val e = Entry.parse(readBody(f, p))
      require(e.version == named, s"log entry $named declares version ${e.version}")
      e
    }

  // ---- checkpoint serialization (line-oriented, deterministic) ----------

  private def renderCkpt(c: Ckpt): String = {
    val sb = new StringBuilder
    sb.append("v=").append(c.version).append('\n')
    sb.append("base=").append(c.base).append('\n')
    c.deltas.values.foreach(e => sb.append("d=").append(Entry.render(e)).append('\n'))
    c.batchCanon.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append("b=").append(k).append(':').append(v).append('\n') }
    c.cols.foreach { case (n, t) =>
      sb.append("c=").append(n).append('=').append(t).append('\n') }
    c.constraints.foreach { case (n, e) =>
      sb.append("k=").append(n).append('=').append(e).append('\n') }
    sb.toString
  }

  private def parseCkpt(s: String): Ckpt = {
    var version = -1L
    var base: String = null
    var deltas = SortedMap.empty[Long, Entry]
    var batch = Map.empty[String, Long]
    var cols = Vector.empty[(String, String)]
    var constraints = Vector.empty[(String, String)]
    s.linesIterator.filter(_.nonEmpty).foreach { line =>
      val i = line.indexOf('=')
      require(i > 0, s"corrupt checkpoint line: $line")
      (line.substring(0, i), line.substring(i + 1)) match {
        case ("v", v) => version = v.toLong
        case ("base", b) => base = b
        case ("d", d) => val e = Entry.parse(d); deltas += (e.version -> e)
        case ("b", kv) =>
          val j = kv.lastIndexOf(':') // batch keys may themselves contain ':'
          batch += kv.substring(0, j) -> kv.substring(j + 1).toLong
        case ("c", nt) =>
          val j = nt.indexOf('=')
          cols :+= (nt.substring(0, j), nt.substring(j + 1))
        case ("k", ne) => // CHECK constraint: name=expr (name has no '=')
          val j = ne.indexOf('=')
          constraints :+= (ne.substring(0, j), ne.substring(j + 1))
        case _ => throw new IllegalStateException(s"corrupt checkpoint line: $line")
      }
    }
    require(version > 0 && base != null, "corrupt checkpoint: missing header")
    Ckpt(version, base, deltas, batch, cols, constraints)
  }

  /** Write a checkpoint file via temp + rename; content at a version is
    * deterministic, so two writers racing the same checkpoint are
    * idempotent and the loser's rename failure is ignored. */
  private def writeCkptFile(f: FileSystem, root: String, c: Ckpt): Unit = {
    val p = ckptPath(root, c.version)
    if (f.exists(p)) return
    val tmp = new Path(s"$root/$LOG_DIR/.tmp_${UUID.randomUUID().toString.take(12)}")
    val out = f.create(tmp, true)
    try out.write(renderCkpt(c).getBytes("UTF-8")) finally out.close()
    val ok = try f.rename(tmp, p) catch { case _: java.io.IOException => false }
    if (!ok) f.delete(tmp, false)
  }

  // ---- view loading ------------------------------------------------------

  private def prunedError(root: String, oldest: Long): Nothing =
    throw new IllegalStateException(
      s"history of $root below version $oldest was pruned by vacuum; " +
      "time travel, CDC, and restore below the oldest checkpoint are unavailable")

  /** Full replay from entry files alone (the slow path for history below a
    * checkpoint). Fails with a clear error once vacuum has pruned them. */
  private def fullView(f: FileSystem, root: String): View = {
    val (entryFiles, ckptFiles) = listLog(f, root)
    val es = readEntryFiles(f, entryFiles)
    // pruned history: the entry chain no longer starts at version 1 — or
    // is gone entirely, with only checkpoints (and their tails) remaining
    if (es.headOption.exists(_.version != 1L) ||
        (es.isEmpty && ckptFiles.nonEmpty)) {
      val oldest = ckptFiles.map(_._1).sorted.headOption
        .orElse(es.headOption.map(_.version)).getOrElse(1L)
      prunedError(root, oldest)
    }
    View(None, es)
  }

  /** Latest usable checkpoint + tail — the O(entries since last checkpoint)
    * fast path every operation takes. Falls back to full replay when a tail
    * RESTORE targets a version below the checkpoint (its state needs the
    * older entries). */
  private def readView(f: FileSystem, root: String): View = {
    val (entryFiles, ckptFiles) = listLog(f, root)
    val ck = ckptFiles.sortBy(-_._1).iterator
      .map { case (v, p) => Try(parseCkpt(readBody(f, p))).toOption
        .filter(_.version == v) }
      .collectFirst { case Some(c) => c }
    ck match {
      case None =>
        val es = readEntryFiles(f, entryFiles)
        if (es.nonEmpty && es.head.version != 1L)
          prunedError(root, es.head.version)
        View(None, es)
      case Some(c) =>
        val tail = readEntryFiles(f, entryFiles.filter(_._1 > c.version))
        if (tail.exists(e => e.action == "restore" && e.folds < c.version))
          fullView(f, root)
        else View(Some(c), tail)
    }
  }

  /** The view truncated to versions ≤ v. Below the checkpoint floor this
    * degrades to full replay (clear error if pruned). */
  private def truncateView(f: FileSystem, root: String, view: View,
      v: Long): View =
    if (v >= view.floor) View(view.ckpt, view.tail.takeWhile(_.version <= v))
    else View(None, fullView(f, root).tail.takeWhile(_.version <= v))

  /** Head version from file NAMES alone — no file opens. */
  private def lastVersionOnDisk(f: FileSystem, root: String): Long = {
    val (entryFiles, ckptFiles) = listLog(f, root)
    (entryFiles.map(_._1) ++ ckptFiles.map(_._1)).foldLeft(0L)(math.max)
  }

  /** Entries strictly above version v, opened by name filter — the conflict
    * scan's working set (small: only what landed since our snapshot). */
  private def entriesAbove(f: FileSystem, root: String, v: Long): Seq[Entry] =
    readEntryFiles(f, listLog(f, root)._1.filter(_._1 > v))

  /** The live state at a view: current base dir plus committed delta dirs in
    * version order. Replay is a pure fold over checkpoint state + tail.
    *
    * Batch-keyed inserts dedup FIRST-WINS here: two [[insertBatch]] calls
    * racing the same key can both slip past the committed-check and both
    * win an ordinal (check-then-act is not atomic across writers); the
    * log cannot retract an entry, so the READER is the authority — only
    * the lowest-versioned entry per batch key counts, later ones are
    * invisible garbage vacuum may retire. Deterministic at every prefix,
    * so time travel and folds agree. */
  private def liveStateV(f: FileSystem, root: String,
      view: View): (String, SortedMap[Long, Entry]) = {
    var base: String = view.ckpt.map(_.base).orNull
    var deltas = view.ckpt.map(_.deltas).getOrElse(SortedMap.empty[Long, Entry])
    var seenBatch: Set[String] =
      view.ckpt.map(_.batchCanon.keySet).getOrElse(Set.empty)
    // restore targets at or above the floor are states this forward pass
    // has ALREADY folded (versions are contiguous ordinals) — memoize each
    // post-entry state so a restore (or chain of restores) is an O(1)
    // lookup, not a refold of its prefix (which would go exponential on a
    // restore-heavy tail)
    val at = scala.collection.mutable.Map.empty[Long, (String, SortedMap[Long, Entry])]
    view.tail.foreach { e =>
      e.action match {
        case "create" => base = e.dir; deltas = SortedMap.empty
        case "insert" if e.fp.startsWith("b:") =>
          if (!seenBatch(e.fp)) {
            seenBatch += e.fp
            deltas += (e.version -> e)
          }
        case "insert" | "mutate" => deltas += (e.version -> e)
        case "compact" =>
          base = e.dir
          deltas = deltas.rangeFrom(e.folds + 1)
        case "minor" => // folds deltas ≤ folds into one delta, base untouched
          deltas = deltas.rangeFrom(e.folds + 1) + (e.version -> e)
        case "schema" => () // metadata-only: handled by addedCols/snapshotAt
        case "constraint" => () // metadata-only: handled by constraintsV
        case "restore" => // head becomes the state at version `folds`
          val (b, d) =
            if (e.folds == view.floor && view.ckpt.isDefined)
              (view.ckpt.get.base, view.ckpt.get.deltas)
            else at.getOrElse(e.folds,
              liveStateV(f, root, truncateView(f, root, view, e.folds)))
          base = b; deltas = d
      }
      at(e.version) = (base, deltas)
    }
    require(base != null, s"table at $root has no create entry")
    (base, deltas)
  }

  /** Canonical (lowest) version per batch-insert fp across the whole view —
    * checkpoint keys win over tail re-occurrences by construction. */
  private def batchCanonOf(view: View): Map[String, Long] = {
    val tailMap = view.tail
      .filter(e => e.action == "insert" && e.fp.startsWith("b:"))
      .groupBy(_.fp).map { case (k, es) => k -> es.map(_.version).min }
    tailMap ++ view.ckpt.map(_.batchCanon).getOrElse(Map.empty)
  }

  /** Columns ADDED by schema entries in the view (`ALTER TABLE ADD
    * COLUMNS` re-expression): `(name, typeDDL)` in declaration order. A
    * restore rolls the schema back with the data (columns added between
    * the target and the restore vanish from the head). */
  private def addedColsV(f: FileSystem, root: String,
      view: View): Vector[(String, String)] = {
    var acc = view.ckpt.map(_.cols).getOrElse(Vector.empty)
    val at = scala.collection.mutable.Map.empty[Long, Vector[(String, String)]]
    view.tail.foreach { e =>
      e.action match {
        // "schema" = ALTER TABLE ADD COLUMNS; an "insert" whose fp carries
        // a "c:" marker is a mergeSchema INSERT — data and schema in ONE
        // atomic entry. The lowercase-dedup makes two racing mergeSchema
        // writers adding the same column converge (first declaration wins,
        // including its type) instead of doubling the projection.
        case a if a == "schema" ||
            (a == "insert" && e.fp.startsWith("c:")) =>
          val have = scala.collection.mutable.Set(acc.map(_._1.toLowerCase): _*)
          e.fp.stripPrefix("c:").split(";").filter(_.nonEmpty).foreach { it =>
            val Array(n, t) = it.split("=", 2)
            if (have.add(n.toLowerCase)) acc :+= ((n, t))
          }
        case "restore" =>
          acc =
            if (e.folds == view.floor && view.ckpt.isDefined) view.ckpt.get.cols
            else at.getOrElse(e.folds,
              addedColsV(f, root, truncateView(f, root, view, e.folds)))
        case _ => ()
      }
      at(e.version) = acc
    }
    acc
  }

  /** CHECK constraints in force at the view's head: `(name, sqlExpr)`
    * in declaration order — the fold mirrors [[addedColsV]] (checkpoint
    * seed, add/drop entries, restore recursion: rolling below a
    * constraint's version REMOVES it, metadata and data revert
    * together). */
  private def constraintsV(f: FileSystem, root: String,
      view: View): Vector[(String, String)] = {
    val b64 = java.util.Base64.getUrlDecoder
    var acc = view.ckpt.map(_.constraints).getOrElse(Vector.empty)
    val at = scala.collection.mutable.Map.empty[Long, Vector[(String, String)]]
    view.tail.foreach { e =>
      e.action match {
        case "constraint" =>
          val body = e.fp.stripPrefix("k:")
          if (body.startsWith("-")) acc = acc.filterNot(_._1 == body.drop(1))
          else {
            val Array(n, enc) = body.stripPrefix("+").split("=", 2)
            acc :+= (n, new String(b64.decode(enc), "UTF-8"))
          }
        case "restore" =>
          acc =
            if (e.folds == view.floor && view.ckpt.isDefined)
              view.ckpt.get.constraints
            else at.getOrElse(e.folds,
              constraintsV(f, root, truncateView(f, root, view, e.folds)))
        case _ => ()
      }
      at(e.version) = acc
    }
    acc
  }

  /** Fail iff `rows` violates any constraint in force — SQL semantics: a
    * CHECK passes on TRUE **or NULL**, violates only on FALSE. One
    * aggregate job counts every constraint at once over the STAGED rows
    * only (never the table); all violated names are reported together. */
  private def enforceConstraints(rows: DataFrame,
      constraints: Seq[(String, String)], op: String, root: String): Unit = {
    if (constraints.isEmpty) return
    val counts = rows.agg(
      sum(when(!coalesce(expr(constraints.head._2), lit(true)), 1L)
        .otherwise(0L)).as(constraints.head._1),
      constraints.tail.map { case (n, c) =>
        sum(when(!coalesce(expr(c), lit(true)), 1L)).as(n) }: _*).head()
    val violated = constraints.indices
      .filter(i => !counts.isNullAt(i) && counts.getLong(i) > 0)
      .map(i => s"${constraints(i)._1} CHECK (${constraints(i)._2}): " +
        s"${counts.getLong(i)} row(s)")
    if (violated.nonEmpty) throw new IllegalArgumentException(
      s"$op on $root violates constraint(s) ${violated.mkString("; ")}")
  }

  // ---- generated columns (Delta GENERATED ALWAYS AS) -------------------
  //
  // A generated column is stored as TWO pieces of existing, checkpoint- and
  // restore-proof metadata: its materialized data (an ordinary column,
  // computed at write time — so file-level min/max data skipping applies,
  // the Delta partition-pruning pairing) and a RESERVED CHECK constraint
  // `__gen_<col>` whose expression is `<col> <=> (<defining expr>)`. The
  // constraint is the enforcement net (a writer that SUPPLIES the column
  // with inconsistent values fails loudly, Delta's behavior) and the
  // defining expression is recovered from it when a write path must
  // COMPUTE the column (INSERT/batch-insert omitting it; UPDATE/MERGE
  // recomputing it after SET). Riding the constraint machinery means
  // checkpoints seed declarations past pruned logs and a RESTORE below the
  // declaration removes data and metadata together — for free.

  private val GEN = "__gen_"

  /** Parse generated-column declarations out of the constraint set. */
  private def gensFrom(constraints: Seq[(String, String)]): Seq[(String, String)] =
    constraints.collect { case (n, e) if n.startsWith(GEN) =>
      val c = n.substring(GEN.length)
      val pre = s"$c <=> ("
      require(e.startsWith(pre) && e.endsWith(")"),
        s"corrupt generated-column constraint $n: $e")
      c -> e.substring(pre.length, e.length - 1)
    }

  /** Generated columns in force at the current head: (name, definingExpr). */
  def generatedColsOf(spark: SparkSession, root: String): Seq[(String, String)] =
    gensFrom(constraintsOf(spark, root))

  /** `rows` with every DECLARED generated column the writer did NOT supply
    * computed from its defining expression; supplied values pass through
    * and are verified by the reserved CHECK instead. */
  private def applyGens(rows: DataFrame, gens: Seq[(String, String)]): DataFrame = {
    val have = rows.columns.map(_.toLowerCase).toSet
    gens.filterNot { case (n, _) => have(n.toLowerCase) }
      .foldLeft(rows) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
  }

  /** Best-effort checkpoint at `version` when it lands on the interval —
    * derived purely from metadata (no Spark jobs), never fails the commit. */
  private def maybeCheckpoint(f: FileSystem, root: String, version: Long): Unit =
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      Try(writeCheckpointAt(f, root, version))

  private def writeCheckpointAt(f: FileSystem, root: String,
      version: Long): Unit = {
    val view = truncateView(f, root, readView(f, root), version)
    val (b, d) = liveStateV(f, root, view)
    writeCkptFile(f, root,
      Ckpt(version, b, d, batchCanonOf(view), addedColsV(f, root, view),
        constraintsV(f, root, view)))
  }

  /** Explicitly checkpoint the current head (vacuum and tooling hook; the
    * per-[[checkpointInterval]] automatic one usually suffices). */
  def checkpoint(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val v = lastVersionOnDisk(f, root)
    if (v > 0) writeCheckpointAt(f, root, v)
  }

  /** Commit timestamps per surviving version — the entry FILE's
    * modification time, monotonized by a running max exactly as Delta
    * adjusts its commit timestamps (a clock-skewed or retried commit must
    * not make time travel non-monotonic in version). */
  def commitTimestamps(spark: SparkSession, root: String): Seq[(Long, Long)] = {
    val f = fs(spark, root)
    val (entryFiles, _) = listLog(f, root)
    var last = 0L
    entryFiles.sortBy(_._1).map { case (v, p) =>
      last = math.max(f.getFileStatus(p).getModificationTime, last)
      (v, last)
    }
  }

  /** The newest version whose (monotonized) commit timestamp is ≤
    * `epochMs` — Delta's `TIMESTAMP AS OF` resolution. A timestamp before
    * the earliest SURVIVING entry fails loudly (that history was never
    * committed, or vacuum pruned it). */
  def versionAtTime(spark: SparkSession, root: String, epochMs: Long): Long = {
    val ts = commitTimestamps(spark, root)
    require(ts.nonEmpty, s"no committed log entries at $root")
    val ok = ts.takeWhile(_._2 <= epochMs)
    if (ok.isEmpty) throw new IllegalArgumentException(
      s"timestamp $epochMs ms precedes the earliest available version " +
      s"${ts.head._1} (committed ${ts.head._2} ms) of $root — that history " +
      "was never committed, or was pruned by vacuum")
    ok.last._1
  }

  /** [[readAt]] resolved by wall clock instead of version. */
  def readAtTime(spark: SparkSession, root: String, epochMs: Long): DataFrame =
    readAt(spark, root, versionAtTime(spark, root, epochMs))

  /** The commit history as a DataFrame (Delta's DESCRIBE HISTORY shape):
    * one row per SURVIVING log entry — version, action, the dir it
    * references, the prefix a fold claims (or a restore's target), the
    * footprint/batch-key slot, and the (monotonized) commit timestamp.
    * After `vacuum(pruneLog = true)` the pruned prefix is summarized by
    * its checkpoint's version instead of per-entry rows (the entries no
    * longer exist — that is the point). */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, root)
    val (entryFiles, ckptFiles) = listLog(f, root)
    val tsOf = commitTimestamps(spark, root).toMap
    val entries = readEntryFiles(f, entryFiles).map(e =>
      (e.version, e.action, e.dir, e.folds, e.fp, tsOf.getOrElse(e.version, 0L)))
    val ckpts = ckptFiles.sortBy(_._1).map { case (v, p) =>
      (v, "checkpoint", f"$v%020d.ckpt", 0L, "",
        f.getFileStatus(p).getModificationTime)
    }
    (entries ++ ckpts).sortBy(r => (r._1, r._2))
      .toDF("version", "action", "dir", "folds", "detail", "ts")
  }

  /** One-row table metadata summary (Delta `DESCRIBE DETAIL`): location,
    * head version, latest usable checkpoint (−1 = none), live
    * insert-bearing dir/file/byte counts at the head snapshot, enforced
    * CHECK-constraint count, and the declared generated columns —
    * metadata and file listings only, no Spark job. The capacity-planning
    * twin of [[history]]: numbers a compaction/vacuum policy reads
    * (many small live files → compact; dirs ≫ checkpoint interval →
    * raise cadence). */
  def detail(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, root)
    val view = readView(f, root)
    val (base, deltas) = liveStateV(f, root, view)
    val dirs = (s"$root/$base" +:
      deltas.values.toSeq.map(e => s"$root/${e.dir}/insert"))
      .filter(p => f.exists(new Path(p)))
    val files = dirs.flatMap(p => f.listStatus(new Path(p)).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    })
    val cons = constraintsV(f, root, view)
    val gens = gensFrom(cons)
    Seq((root, view.lastVersion, view.ckpt.map(_.version).getOrElse(-1L),
      dirs.size.toLong, files.size.toLong, files.map(_.getLen).sum,
      (cons.size - gens.size).toLong, gens.map(_._1).mkString(",")))
      .toDF("location", "version", "checkpoint_version", "num_live_dirs",
        "num_files", "size_bytes", "num_constraints", "generated_columns")
  }

  /** Test seam: widens [[insertBatch]]'s check-to-commit window so a spec
    * can deterministically manufacture the same-key double-commit the
    * reader-side first-wins dedup neutralizes. No-op in production. */
  private[graft] var pauseBeforeBatchCommit: () => Unit = () => ()

  /** Test seam: invoked after a mutation pins its snapshot version and
    * before it computes/stages, so a spec can deterministically order
    * "writer B's snapshot predates writer A's commit" by parking B's
    * DRIVER thread here (a blocking in-plan UDF would occupy task slots
    * and starve the other writer's jobs). No-op in production. */
  private[graft] var pauseAfterSnapshot: () => Unit = () => ()

  /** Test seam: invoked after [[insert]] stages its data dir and before
    * its first commit attempt, so a spec can deterministically land a
    * RACING mergeSchema insert in between — the only window where the
    * diverged-type retry (winning-type re-stage + lossy-narrowing abort)
    * is reachable. No-op in production. */
  private[graft] var pauseAfterInsertStage: () => Unit = () => ()

  /** Serialize local-FS commits per root within this JVM (see scaladoc). */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  /** Try to commit `e` at exactly version `e.version` by temp-write +
    * atomic no-overwrite rename. True iff this writer won that ordinal.
    * A visible entry is always complete: a writer dying anywhere in here
    * leaves at most an invisible `.tmp_*` file, never a claimed-but-empty
    * ordinal, so co-writers can never livelock on a dead writer's commit. */
  private def tryCommit(f: FileSystem, root: String, e: Entry): Boolean = {
    val won = lockFor(root).synchronized {
      val p = entryPath(root, e.version)
      if (f.exists(p)) false
      else {
        val tmp = new Path(
          s"$root/$LOG_DIR/.tmp_${UUID.randomUUID().toString.take(12)}")
        val out = f.create(tmp, true)
        try out.write(Entry.render(e).getBytes("UTF-8")) finally out.close()
        val ok = try f.rename(tmp, p)
        catch { case _: java.io.IOException => false } // lost the race
        if (!ok) f.delete(tmp, false)
        ok
      }
    }
    if (won) maybeCheckpoint(f, root, e.version)
    won
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
    DataSkipping.collect(spark, s"$root/$dir")
    require(tryCommit(f, root, Entry(1L, "create", dir, 0L)),
      s"concurrent create of $root")
  }

  /** CREATE with generated columns (Delta `GENERATED ALWAYS AS`; declared
    * at create time only, as in Delta). Each `(name, sqlExpr)` column is
    * materialized from the DATA columns of `df` — an expression may also
    * reference a generated column declared EARLIER in `gens` (resolved as
    * a lateral column alias at create; every write path re-applies the
    * expressions in declaration order, so chained definitions stay
    * consistent, while a forward reference fails analysis here) — then
    * declared via the reserved `__gen_` CHECK (see the generated-columns
    * comment block). From then on every write path
    * computes the column when the writer omits it and VERIFIES it when
    * supplied; UPDATE/MERGE recompute it after SET, and SET-ting it
    * directly is rejected. Because the values are materialized, file
    * stats collected by create/compact/analyze make band predicates on
    * the generated column prune files — the `date GENERATED ALWAYS AS
    * (CAST(ts AS DATE))` partition-pruning idiom without a partition
    * layout. */
  def createGenerated(spark: SparkSession, root: String, df: DataFrame,
      gens: Seq[(String, String)]): Unit = {
    require(gens.nonEmpty, "createGenerated needs at least one generated column")
    require(gens.map(_._1.toLowerCase).distinct.size == gens.size,
      "duplicate generated column name")
    val base = df.columns.map(_.toLowerCase).toSet
    gens.foreach { case (n, e) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad generated column name '$n'")
      require(!base(n.toLowerCase),
        s"generated column '$n' collides with a data column")
      require(e.nonEmpty && !e.contains("\n"), s"bad generated expression '$e'")
    }
    // one projection: earlier gens are visible to later ones as lateral
    // column aliases; a FORWARD reference fails analysis here
    val mat = df.select(df.columns.map(col) ++
      gens.map { case (n, e) => expr(e).as(n) }: _*)
    create(spark, root, mat)
    gens.foreach { case (n, e) =>
      addConstraintImpl(spark, root, s"$GEN$n", s"$n <=> ($e)") }
  }

  /** Cached parquet RELATIONS for committed data dirs. A base/delta dir is
    * immutable once its log entry is visible (uuid-named, written before
    * commit, deleted only by vacuum), so the relation — file listing +
    * footer schema, the two driver round-trips `spark.read.parquet` pays
    * eagerly — is reusable across every later snapshot/CDC/conflict read.
    * Measured (JobProfile, q217 at sf0.1): 22 footer-read jobs per
    * lifecycle run, ~0.5 s of job time plus the driver-side listings, all
    * of it re-deriving metadata of dirs that cannot have changed. The
    * cache mirrors what Spark's own `filesourcePartitionFileCacheSize`
    * does for catalog tables (optimization guide §6) — metadata caching,
    * never row data, never keyed on input-corpus content. Callers that
    * need absence-tolerance still check existence first; a vacuumed dir's
    * entry is dropped on the next miss (size-capped against leak). */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def readParquetCached(spark: SparkSession, path: String): DataFrame = {
    if (relCache.size > 4096) relCache.clear()
    relCache.computeIfAbsent((spark, path), _ => spark.read.parquet(path))
  }

  private def readDir(spark: SparkSession, root: String, dir: String,
      kind: String): Option[DataFrame] = {
    val p = s"$root/$dir/$kind"
    if (fs(spark, root).exists(new Path(p))) Some(readParquetCached(spark, p))
    else None
  }

  /** Declared column set at a view — base-dir footer schema (one CACHED
    * footer read) plus `ALTER TABLE ADD COLUMNS` metadata, in snapshot
    * column order. Replaces the previous schema-resolution idiom
    * (`snapshotAtV(...).schema`), which analyzed the full union-anti-join
    * snapshot plan and re-read every live delta dir's footer just to name
    * the columns — O(live dirs) driver round-trips per INSERT on a growing
    * chain. */
  private def declaredFields(spark: SparkSession, f: FileSystem, root: String,
      view: View): Seq[org.apache.spark.sql.types.StructField] = {
    val (base, _) = liveStateV(f, root, view)
    val baseSchema = readParquetCached(spark, s"$root/$base").schema
    val added = addedColsV(f, root, view)
      .filterNot { case (n, _) => baseSchema.fieldNames.contains(n) }
    baseSchema.fields.filter(_.name != RID).toSeq ++
      added.map { case (n, t) => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t)) }
  }

  /** Snapshot as of the given view, with row ids. Schema evolution
    * is schema-on-read, the reference's ADD COLUMNS semantics: files
    * written before a schema entry simply lack the column, the union
    * tolerates it (allowMissingColumns) and the final projection fills
    * NULL at the declared type — no data file is ever rewritten for a
    * schema change. */
  private def snapshotAtV(spark: SparkSession, root: String,
      view: View): DataFrame = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, view)
    val baseDf = readParquetCached(spark, s"$root/$base")
    val withIns = deltas.values.toSeq.flatMap(e => readDir(spark, root, e.dir, "insert"))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
      .fold(baseDf)(ins => baseDf.unionByName(ins, allowMissingColumns = true))
    // delete events carry the full dead row (CDF-style) but the snapshot
    // only needs the id — parquet column pruning keeps this read narrow
    val merged = deltas.values.toSeq.flatMap(e => readDir(spark, root, e.dir, "delete"))
      .map(_.select(col(RID)))
      .reduceOption(_ union _)
      .fold(withIns)(del => withIns.join(del, Seq(RID), "left_anti"))
    val added = addedColsV(f, root, view).filterNot { case (n, _) =>
      baseDf.columns.contains(n) }
    val filled = added.foldLeft(merged) { case (df, (n, t)) =>
      if (df.columns.contains(n)) df else df.withColumn(n, lit(null).cast(t))
    }
    // canonical column order: base data cols, then added cols, rid last
    val order = (baseDf.columns.filter(_ != RID).toSeq ++
      added.map(_._1).filterNot(baseDf.columns.contains)).distinct :+ RID
    filled.select(order.map(col): _*)
  }

  /** Snapshot read at the latest committed version (user-facing). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val f = fs(spark, root)
    snapshotAtV(spark, root, readView(f, root)).drop(RID)
  }

  /** Latest committed version — a pinnable snapshot handle. */
  def currentVersion(spark: SparkSession, root: String): Long =
    lastVersionOnDisk(fs(spark, root), root)

  /** Time-travel read at a pinned version (repeatable-read contract).
    * Valid while the version's data dirs survive: compactions never delete
    * data, so pinned reads keep working across them until [[vacuum]]
    * retires the dirs outside its retention window (the tradeoff every
    * log-structured table format has). Below the oldest checkpoint the
    * replay needs the pre-checkpoint entry files — present until
    * `vacuum(pruneLog = true)` retires those too (then: clear error). */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val f = fs(spark, root)
    snapshotAtV(spark, root,
      truncateView(f, root, readView(f, root), version)).drop(RID)
  }

  /** Backfill/refresh [[DataSkipping]] stats sidecars for every live
    * insert-bearing dir of the head snapshot (one tiny aggregate per dir).
    * [[compact]]/[[compactMinor]]/[[create]] collect automatically — stats
    * ride the folds, so high-frequency ingest pays nothing per write —
    * and an ingest-heavy table between folds calls this to cover its
    * fresh deltas (the reference's `ANALYZE TABLE … COMPUTE STATISTICS`
    * posture, but per-file rather than per-table). */
  def analyze(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, readView(f, root))
    DataSkipping.collect(spark, s"$root/$base")
    deltas.values.toSeq.map(e => s"$root/${e.dir}/insert")
      .filter(p => f.exists(new Path(p)))
      .foreach(p => DataSkipping.collect(spark, p))
  }

  /** Build per-file Bloom sidecars for `cols` over every live
    * insert-bearing dir (auto-sized per dir — deltas are small, the base
    * is not, and each dir's filter is sized to ITS largest file). Rerun
    * after compaction, like [[analyze]]. */
  def analyzeBloom(spark: SparkSession, root: String, cols: Seq[String],
      bitsPerKey: Int = 12): Unit = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, readView(f, root))
    (s"$root/$base" +: deltas.values.toSeq.map(e => s"$root/${e.dir}/insert"))
      .filter(p => f.exists(new Path(p)))
      .foreach(p => BloomIndex.collectAuto(spark, p, cols, bitsPerKey))
  }

  /** (base dir name, insert-delta dir names) of the head snapshot —
    * observability for specs probing per-dir index sidecars directly. */
  def liveBase(spark: SparkSession, root: String): (String, Seq[String]) = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, readView(f, root))
    (base, deltas.values.toSeq.map(e => s"${e.dir}/insert"))
  }

  /** Build per-file EWAH posting sidecars ([[BitmapIndex]]) for `cols`
    * over every live insert-bearing dir — the BITMAP index kind's build
    * pass; rerun after compaction, like [[analyze]]/[[analyzeBloom]]. */
  def analyzeBitmap(spark: SparkSession, root: String,
      cols: Seq[String]): Unit = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, readView(f, root))
    (s"$root/$base" +: deltas.values.toSeq.map(e => s"$root/${e.dir}/insert"))
      .filter(p => f.exists(new Path(p)))
      .foreach(p => BitmapIndex.collect(spark, p, cols))
  }

  /** Delete one kind of index sidecar dir (`_file_stats` /
    * `_bloom_index`) across the head snapshot's insert-bearing dirs —
    * DROP INDEX support. Metadata-only: pruned reads degrade to full
    * scans of the affected dirs, never to wrong answers. */
  def dropSidecars(spark: SparkSession, root: String,
      sidecarDir: String): Unit = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, readView(f, root))
    (s"$root/$base" +: deltas.values.toSeq.map(e => s"$root/${e.dir}/insert"))
      .foreach { p =>
        val sp = new Path(s"$p/$sidecarDir")
        if (f.exists(sp)) f.delete(sp, true)
      }
  }

  /** (files kept, files total) for a point probe — [[scanProfile]]'s
    * Bloom twin. */
  def scanProfilePoint(spark: SparkSession, root: String, column: String,
      values: Seq[Any]): (Long, Long) = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, readView(f, root))
    val paths = s"$root/$base" +:
      deltas.values.toSeq.map(e => s"$root/${e.dir}/insert")
    paths.filter(p => f.exists(new Path(p))).map { p =>
      val total = f.listStatus(new Path(p)).count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val kept = BitmapIndex.survivors(spark, p, column, values)
        .orElse(BloomIndex.survivors(spark, p, column, values))
        .map(_.size).getOrElse(total)
      (kept.toLong, total.toLong)
    }.foldLeft((0L, 0L)) { case ((k, t), (a, b)) => (k + a, t + b) }
  }

  /** One insert-bearing dir, pruned by its stats sidecar when one exists:
    * `None` = dir absent or wholly pruned; no sidecar = full dir. */
  private def loadDirPrunedBy(spark: SparkSession, root: String,
      path: String, surv: String => Option[Seq[String]]): Option[DataFrame] = {
    if (!fs(spark, root).exists(new Path(path))) None
    else surv(path) match {
      case None => Some(spark.read.parquet(path))
      case Some(Nil) => None
      case Some(files) => Some(spark.read.parquet(files: _*))
    }
  }

  /** Snapshot read with FILE-LEVEL DATA SKIPPING: equals
    * `read(root).filter(band₁ AND band₂ …)` by construction, but files
    * whose stats intervals cannot satisfy the bands are never opened —
    * Delta's stats-based skipping (VLDB 2020 §4.2) on this log. Pruning
    * applies to the base and to insert deltas; delete dirs are always
    * applied in full (a delete can only remove surviving rows, and the
    * scan of a delete dir is already pruned to the id column). Combined
    * with `compact(clusterBy = …)` ([[ZOrder]]), a selective predicate on
    * any clustered dimension touches ~files^(1/k) of a k-D clustered base
    * instead of all of it — the 100 TB slice-query path. Safe everywhere:
    * a dir without a sidecar, or a band column a sidecar predates, just
    * scans fully; the residual predicate is re-applied to surviving rows. */
  def readPruned(spark: SparkSession, root: String,
      bands: Seq[DataSkipping.Band]): DataFrame = {
    require(bands.nonEmpty, "readPruned needs at least one band")
    readPrunedBy(spark, root,
      p => DataSkipping.survivors(spark, p, bands),
      DataSkipping.predicateOf(bands))
  }

  /** Pruned POINT-LOOKUP read of the head snapshot (`column IN values`):
    * per-dir file pruning via the [[BloomIndex]] sidecars
    * ([[analyzeBloom]] builds them), deletes applied in full, residual
    * IN-filter re-applied — the q246 lookup on the ACID table: at 100 TB
    * a key probe touches the files whose filters admit the key, not the
    * table, and correctness never depends on the index (a missing sidecar
    * degrades that dir to a full scan). */
  def readPrunedPoint(spark: SparkSession, root: String, column: String,
      values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "readPrunedPoint needs at least one value")
    // exact BITMAP postings outrank the probabilistic BLOOM filters when
    // a dir carries both sidecars; either alone is authoritative for its
    // own dir, a dir with neither scans in full
    readPrunedBy(spark, root,
      p => BitmapIndex.survivors(spark, p, column, values)
        .orElse(BloomIndex.survivors(spark, p, column, values)),
      col(column).isin(values: _*))
  }

  /** Shared pruned-snapshot assembly: `surv` names each insert-bearing
    * dir's surviving files (None = no usable sidecar → whole dir), the
    * residual predicate re-applies the full condition. Deletes are always
    * applied in full — pruning is performance-only. */
  private def readPrunedBy(spark: SparkSession, root: String,
      surv: String => Option[Seq[String]],
      residual: org.apache.spark.sql.Column): DataFrame = {
    val f = fs(spark, root)
    val view = readView(f, root)
    val (base, deltas) = liveStateV(f, root, view)
    val basePath = s"$root/$base"
    val schemaDf = readParquetCached(spark, basePath)
    val parts = loadDirPrunedBy(spark, root, basePath, surv).toSeq ++
      deltas.values.toSeq.flatMap(e =>
        loadDirPrunedBy(spark, root, s"$root/${e.dir}/insert", surv))
    val withIns = parts
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(schemaDf.limit(0))
    val merged = deltas.values.toSeq
      .flatMap(e => readDir(spark, root, e.dir, "delete"))
      .map(_.select(col(RID)))
      .reduceOption(_ union _)
      .fold(withIns)(del => withIns.join(del, Seq(RID), "left_anti"))
    val added = addedColsV(f, root, view).filterNot { case (n, _) =>
      schemaDf.columns.contains(n) }
    val filled = added.foldLeft(merged) { case (df, (n, t)) =>
      if (df.columns.contains(n)) df else df.withColumn(n, lit(null).cast(t))
    }
    val order = (schemaDf.columns.filter(_ != RID).toSeq ++
      added.map(_._1).filterNot(schemaDf.columns.contains)).distinct
    filled.select(order.map(col): _*)
      .filter(residual)
  }

  /** (files kept, files total) across the head snapshot's insert-bearing
    * dirs for a band set — the observability hook specs and benches use to
    * PROVE skipping happened. Dirs without usable stats count as all-kept. */
  def scanProfile(spark: SparkSession, root: String,
      bands: Seq[DataSkipping.Band]): (Long, Long) = {
    val f = fs(spark, root)
    val (base, deltas) = liveStateV(f, root, readView(f, root))
    val paths = s"$root/$base" +:
      deltas.values.toSeq.map(e => s"$root/${e.dir}/insert")
    paths.filter(p => f.exists(new Path(p))).map { p =>
      val total = f.listStatus(new Path(p)).count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val kept = DataSkipping.survivors(spark, p, bands)
        .map(_.size).getOrElse(total)
      (kept.toLong, total.toLong)
    }.foldLeft((0L, 0L)) { case ((k, t), (a, b)) => (k + a, t + b) }
  }

  /** Net row-level changes (CDC) committed in versions `(fromV, toV]` —
    * the incremental-consumption contract (Delta Lake's change data feed,
    * Iceberg's incremental scan): a downstream job that processed version
    * `fromV` reads only what happened since, never the table. An UPDATE
    * surfaces as its two events (delete of the old version, insert of the
    * new); a row born and deleted inside the range nets out to nothing.
    *
    * A range that spans a RESTORE entry is REJECTED loudly: the range's
    * events would include changes the restore undid, so handing them to an
    * incremental consumer silently corrupts it — consume up to the restore
    * version, resync, then consume above it.
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
    val view0 = readView(f, root)
    val view = if (fromV >= view0.floor) view0 else fullView(f, root)
    val inRange = view.tail.filter(e => e.version > fromV && e.version <= toV)
    inRange.find(_.action == "restore").foreach { r =>
      throw new IllegalStateException(
        s"CDC range ($fromV, $toV] of $root spans the RESTORE at version " +
        s"${r.version}: its events include changes the restore undid. " +
        s"Consume (…, ${r.version - 1}], resync, then (${r.version}, …].")
    }
    // only insert/mutate entries CARRY changes: a minor compaction's folded
    // delta is a re-encoding of changes already logged at their own
    // versions, and create/compact entries name bases — reading either
    // would double-count. Batch-keyed inserts count at their CANONICAL
    // (lowest) version only, matching liveState's first-wins dedup.
    val canon = batchCanonOf(view)
    val range = inRange.filter(e =>
      (e.action == "insert" || e.action == "mutate") &&
      (!e.fp.startsWith("b:") || canon(e.fp) == e.version))
    val born = range.flatMap(e => readDir(spark, root, e.dir, "insert"))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    val dead = range.flatMap(e => readDir(spark, root, e.dir, "delete"))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    // rows born then killed inside the range net out of BOTH sides
    val inserted = born.map(i =>
      dead.fold(i)(d => i.join(d.select(col(RID)), Seq(RID), "left_anti")))
    val deleted = dead.map(d =>
      born.fold(d)(i => d.join(i.select(col(RID)), Seq(RID), "left_anti")))
    val tagged =
      inserted.map(_.drop(RID).withColumn("change", lit("insert"))).toSeq ++
      deleted.map(_.drop(RID).withColumn("change", lit("delete"))).toSeq
    tagged.reduceOption(_.unionByName(_, allowMissingColumns = true)).map { df =>
      // normalize to the canonical column set AT toV (schema entries in
      // the prefix): events from before an ADD COLUMNS read NULL there
      val prefix = truncateView(f, root, view, toV)
      val (b, _) = liveStateV(f, root, prefix)
      val baseCols = readParquetCached(spark, s"$root/$b").columns
        .filter(_ != RID).toSeq
      val added = addedColsV(f, root, prefix).filterNot(c => baseCols.contains(c._1))
      val filled = added.foldLeft(df) { case (d, (n, t)) =>
        if (d.columns.contains(n)) d else d.withColumn(n, lit(null).cast(t))
      }
      val order = (baseCols ++ added.map(_._1)).distinct :+ "change"
      filled.select(order.map(col): _*)
    }.getOrElse(
      snapshotAtV(spark, root, truncateView(f, root, view, fromV))
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

  /** Footprint summaries with more tags than this collapse to `*` (always
    * exact-checked) so the log entry stays one bounded line. */
  private val FP_MAX_TAGS = 8

  /** Footprint summary of a staged delete: per writer-tag min/max seq of
    * the touched row ids — one narrow agg over the staged parquet (reads
    * only the rid column), collected driver-side at ≤ FP_MAX_TAGS+1 rows.
    * `-` encodes the EMPTY footprint (no delete half — an insert-only
    * MERGE): provably disjoint from everything. */
  private def footprint(spark: SparkSession, root: String, dir: String): String = {
    if (!fs(spark, root).exists(new Path(s"$root/$dir/delete"))) return "-"
    val rows = readParquetCached(spark, s"$root/$dir/delete")
      .groupBy(col(s"$RID.txn").as("t"))
      .agg(min(col(s"$RID.seq")).as("lo"), max(col(s"$RID.seq")).as("hi"))
      .limit(FP_MAX_TAGS + 1).collect()
    if (rows.isEmpty) "-"
    else if (rows.length > FP_MAX_TAGS) "*"
    else rows.map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getLong(2)}")
      .sorted.mkString(";")
  }

  private def fpParse(s: String): Option[Map[Long, (Long, Long)]] =
    if (s == "*" || s.isEmpty) None
    else if (s == "-") Some(Map.empty)
    else Some(s.split(";").iterator.map { it =>
      val Array(t, a, b) = it.split(":")
      t.toLong -> (a.toLong, b.toLong)
    }.toMap)

  /** False only when the two summaries PROVE disjointness (no shared tag, or
    * shared tags with non-overlapping seq ranges) — the metadata-only fast
    * path; true means "pay the exact rid check". */
  private def fpMayOverlap(a: String, b: String): Boolean =
    (fpParse(a), fpParse(b)) match {
      case (Some(x), Some(y)) => x.exists { case (t, (lo, hi)) =>
        y.get(t).exists { case (lo2, hi2) => lo <= hi2 && lo2 <= hi } }
      case _ => true
    }

  /** Exact row-grain conflict test: do the two staged deletes share a row
    * id? Both sides are change sets pruned to the rid column — delta-vs-
    * delta work, never a table scan.
    *
    * "No delete half" and "dir gone" are NOT the same answer: a competing
    * entry whose dir exists but has no delete/ subdir provably staged no
    * deletes (safe to clear), while a dir the log references that is
    * absent was retired by vacuum — our pinned snapshot predates the
    * retention window and the overlap can no longer be checked, so it
    * conservatively counts as a conflict (the caller recomputes on a fresh
    * snapshot) instead of silently committing a potential lost update. */
  private def ridsIntersect(spark: SparkSession, root: String,
      dirA: String, dirB: String): Boolean = {
    val f = fs(spark, root)
    if (!f.exists(new Path(s"$root/$dirB")))
      return true // competing dir vacuumed under our pinned snapshot
    (readDir(spark, root, dirA, "delete"), readDir(spark, root, dirB, "delete")) match {
      case (Some(a), Some(b)) =>
        !a.select(col(RID)).join(b.select(col(RID)), Seq(RID), "left_semi").isEmpty
      case _ => false // a side that staged no delete events cannot overlap
    }
  }

  /** INSERT INTO: stage once, then take the next free ordinal. New rows
    * cannot collide with any concurrent action (ids are fresh), so no
    * conflict check and no recompute — losing a commit race only means
    * retrying the one-file create.
    *
    * `mergeSchema` (Delta's `mergeSchema=true` write option): columns of
    * `rows` unknown to the table are DECLARED by this same commit — the
    * insert entry carries the `c:name=type` marker a schema entry would,
    * so data and schema land in ONE atomic log entry (no window where the
    * rows are visible but their columns are not), older files read NULL
    * for the new columns, and a RESTORE below this version removes both
    * together. Two racing mergeSchema inserts declaring the same column
    * converge (first declaration wins its type — the fold dedups).
    * Without the flag, the insert PROJECTS to the table schema and
    * unknown columns are ignored — the pre-existing write contract (the
    * reference's INSERT resolves by position/projection, not by name). */
  def insert(spark: SparkSession, root: String, rows: DataFrame,
      mergeSchema: Boolean = false): Unit = {
    val f = fs(spark, root)
    val view0 = readView(f, root)
    // the schema lookup reads the BASE dir's parquet footer, which a
    // concurrent compaction's GC can delete under us — re-resolve against
    // the fresh log in that case (the one data-dir read INSERT does; its
    // staged rows are caller data)
    val fields = (0 to 3).view.map { attempt =>
      val view = if (attempt == 0) view0 else readView(f, root)
      Try(declaredFields(spark, f, root, view))
    }.collectFirst { case Success(c) => c }
      .getOrElse(throw new IllegalStateException(
        s"cannot resolve schema of $root"))
    val newCols: Seq[(String, String)] = if (!mergeSchema) Nil else {
      val have = fields.map(_.name.toLowerCase).toSet
      rows.schema.fields.filterNot(fd => have(fd.name.toLowerCase))
        .map { fd =>
          val t = fd.dataType.sql
          require(fd.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"bad evolved column name '${fd.name}'")
          require(!t.contains("=") && !t.contains(";") && !t.contains("\""),
            s"cannot evolve schema with type '$t'")
          fd.name -> t
        }.toSeq
    }
    val cons = constraintsV(f, root, view0)
    // cast every staged column to its DECLARED type: the physical parquet
    // type must match the table declaration even when the inserting
    // DataFrame carries a divergent type (e.g. an evolved column supplied
    // as INT where an earlier mergeSchema writer declared BIGINT), or a
    // later snapshot's unionByName against other writers' files fails
    // analysis / silently coerces
    val genApplied = applyGens(rows, gensFrom(cons))
    def castStage(evolvedTypes: Map[String, String]): DataFrame = {
      val staged = genApplied.select(
        fields.map(fd => col(fd.name).cast(fd.dataType).as(fd.name)) ++
          newCols.map { case (n, t) =>
            col(n).cast(evolvedTypes.getOrElse(n.toLowerCase, t)).as(n) }: _*)
      enforceConstraints(staged, cons, "INSERT", root)
      staged
    }
    // rid txn = a fresh uuid-derived tag, not the commit version (unknown
    // until the race resolves); uniqueness is all the id contract needs
    val tag = UUID.randomUUID().getLeastSignificantBits & Long.MaxValue
    var dir = stage(spark, root, None, Some(withRid(castStage(Map.empty), tag)))
    pauseAfterInsertStage()
    val marker = if (newCols.isEmpty) ""
      else "c:" + newCols.map { case (n, t) => s"$n=$t" }.mkString(";")
    var v = view0.lastVersion + 1
    var attempts = 0
    while (!tryCommit(f, root, Entry(v, "insert", dir, 0L, marker))) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"insert into $root livelocked")
      if (newCols.isEmpty) v = lastVersionOnDisk(f, root) + 1
      else {
        // a racing mergeSchema writer may have DECLARED one of our evolved
        // columns with a different type — its earlier declaration wins the
        // schema fold (our duplicate marker dedups away), so our data files
        // must carry the WINNING type, not the one we staged with
        val nview = readView(f, root)
        v = nview.lastVersion + 1
        val winning = addedColsV(f, root, nview)
          .map { case (n, t) => n.toLowerCase -> t }.toMap
        val divergedCols = newCols.filter { case (n, t) =>
          winning.get(n.toLowerCase).exists(w => !w.equalsIgnoreCase(t)) }
        if (divergedCols.nonEmpty) {
          // the winning declaration may be NARROWER than ours (INT where
          // we staged BIGINT): a plain cast would silently wrap/truncate
          // values that don't fit — validate by round-trip (cast to the
          // winning type and back must be value-preserving; NULL-safe so
          // genuinely-null inputs pass) and fail the insert loudly instead
          // of committing corrupted values (Delta fails or widens, never
          // narrows silently)
          val lossy = divergedCols.map { case (n, t) =>
            val w = winning(n.toLowerCase)
            !(col(n).cast(t).cast(w).cast(t) <=> col(n).cast(t))
          }.reduce(_ || _)
          if (!genApplied.filter(lossy).isEmpty) {
            f.delete(new Path(s"$root/$dir"), true) // abandoned stage
            throw new IllegalArgumentException(
              s"insert into $root aborted: a concurrent writer declared " +
              divergedCols.map { case (n, t) =>
                s"$n as ${winning(n.toLowerCase)} (we staged $t)" }
                .mkString(", ") +
              " and at least one staged value does not fit the winning " +
              "type; re-ingest with the declared type")
          }
          // the superseded stage dir is referenced by nothing — delete it
          // before re-staging or every retry leaks an orphan dir
          f.delete(new Path(s"$root/$dir"), true)
          dir = stage(spark, root, None, Some(withRid(castStage(winning), tag)))
        }
      }
    }
  }

  /** Point-in-time ROLLBACK (Delta RESTORE / Iceberg rollback; the
    * reference's nearest analog is dropping the uncommitted-txn deltas
    * AcidUtils filters out): ONE metadata-only log entry — the head
    * becomes the state at `toVersion`, every commit in between is undone,
    * and the undone versions stay time-travel-readable until [[vacuum]]
    * retires their dirs, so a bad backfill reverts in O(1) metadata where
    * a rewrite would be O(table). Mutations racing a restore conflict on
    * it and recompute against the restored state; compactions racing it
    * abort (their fold would resurrect undone rows); a CDC range must not
    * span a restore ([[changesBetween]] rejects one that does).
    * Batch keys stay BURNED across a restore — a replay of an undone
    * [[insertBatch]] key does not re-apply (the log remembers the key even
    * when its entry is invisible); re-ingest rolled-back batches under
    * fresh keys.
    *
    * Fail-loudly guards: every data dir of the target state must exist
    * BEFORE the commit (a target outside the retention window is rejected
    * with the vacuum named), and is re-verified AFTER winning the ordinal —
    * a vacuum racing the commit itself is reported immediately with the
    * recovery step (restore to the pre-restore head, whose dirs the window
    * always retains) instead of surfacing later as a broken scan. */
  def restore(spark: SparkSession, root: String, toVersion: Long): Unit = {
    val f = fs(spark, root)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"restore of $root livelocked")
      val view = readView(f, root)
      val snapV = view.lastVersion
      require(toVersion >= 1 && toVersion <= snapV,
        s"restore target $toVersion outside committed range [1, $snapV]")
      val target = truncateView(f, root, view, toVersion)
      val (b, ds) = liveStateV(f, root, target)
      def missing(): Seq[String] = (b +: ds.values.toSeq.map(_.dir))
        .filterNot(d => f.exists(new Path(s"$root/$d")))
      val miss = missing()
      require(miss.isEmpty, s"cannot restore $root to version $toVersion: " +
        s"dir(s) ${miss.mkString(", ")} were retired by vacuum " +
        "(target outside the retention window)")
      done = tryCommit(f, root, Entry(snapV + 1, "restore", "", toVersion))
      if (done) {
        val miss2 = missing()
        if (miss2.nonEmpty) throw new IllegalStateException(
          s"restore of $root to version $toVersion committed as version " +
          s"${snapV + 1}, but a concurrent vacuum retired " +
          s"${miss2.mkString(", ")} during the commit; restore to version " +
          s"$snapV (the pre-restore head) to recover")
      }
    }
  }

  /** ALTER TABLE ADD COLUMNS without touching a single data file — the
    * reference's schema-on-read evolution
    * (`ql/.../DDLTask.java alterTable` ADDCOLS: metadata-only, old
    * partitions keep their files and read NULL for the new columns). One
    * metadata-only log entry records `(name, typeDDL)` pairs; every
    * reader fills NULL at the declared type for files predating it, and
    * time travel below the entry still shows the OLD schema — at 100 TB
    * this is the difference between an O(1) metadata commit and an
    * O(table) rewrite. Commutes with concurrent DML (mutations carry
    * whatever schema their snapshot had; the union is tolerant), but a
    * duplicate column name is rejected against the committed head on
    * every retry. */
  def addColumns(spark: SparkSession, root: String,
      cols: Seq[(String, String)]): Unit = {
    require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
    cols.foreach { case (n, t) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad column name '$n'")
      require(t.nonEmpty && !t.contains("=") && !t.contains(";") && !t.contains("\""),
        s"bad type DDL '$t'")
    }
    val f = fs(spark, root)
    val marker = "c:" + cols.map { case (n, t) => s"$n=$t" }.mkString(";")
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"addColumns on $root livelocked")
      val view = readView(f, root)
      val existing = snapshotAtV(spark, root, view).columns.map(_.toLowerCase).toSet
      cols.foreach { case (n, _) =>
        require(!existing.contains(n.toLowerCase),
          s"column '$n' already exists on $root")
      }
      val v = view.lastVersion + 1
      done = tryCommit(f, root, Entry(v, "schema", "", 0L, marker))
    }
  }

  /** CHECK constraints in force at the current head. */
  def constraintsOf(spark: SparkSession, root: String): Seq[(String, String)] = {
    val f = fs(spark, root)
    constraintsV(f, root, readView(f, root))
  }

  /** ADD a CHECK constraint (Delta `ALTER TABLE ADD CONSTRAINT` /
    * `delta.constraints.*`; the reference era has only RELY NOVALIDATE
    * informational PK/FK — no enforced row predicate): one metadata-only
    * log entry after validating the EXISTING table satisfies the
    * predicate (one filtered scan, the Delta shape). From its version on,
    * every INSERT / batch insert / UPDATE / MERGE checks its STAGED rows
    * — O(staged), never O(table) — and fails loudly naming the
    * constraint. SQL 3VL: a CHECK passes on TRUE or NULL, violates only
    * on FALSE. A RESTORE below the constraint's version removes it (data
    * and metadata revert together). Known window, as in Delta: a write
    * whose snapshot predates the constraint commit validates against the
    * older set — constraints serialize with DATA through the log order,
    * not with in-flight computations. */
  def addConstraint(spark: SparkSession, root: String, name: String,
      condExpr: String): Unit = {
    require(!name.startsWith(GEN),
      s"constraint prefix '$GEN' is reserved for generated columns " +
        "(declare them via createGenerated)")
    addConstraintImpl(spark, root, name, condExpr)
  }

  private def addConstraintImpl(spark: SparkSession, root: String,
      name: String, condExpr: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad constraint name '$name'")
    require(condExpr.nonEmpty && !condExpr.contains("\n"),
      s"bad constraint expression '$condExpr'")
    val f = fs(spark, root)
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(condExpr.getBytes("UTF-8"))
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"addConstraint on $root livelocked")
      val view = readView(f, root)
      require(!constraintsV(f, root, view).exists(_._1 == name),
        s"constraint '$name' already exists on $root")
      val bad = snapshotAtV(spark, root, view)
        .filter(!coalesce(expr(condExpr), lit(true))).limit(1).count()
      require(bad == 0, s"cannot add constraint '$name' CHECK ($condExpr): " +
        s"existing rows of $root violate it")
      val v = view.lastVersion + 1
      done = tryCommit(f, root, Entry(v, "constraint", "", 0L, s"k:+$name=$enc"))
    }
  }

  /** DROP a CHECK constraint — one metadata-only entry. */
  def dropConstraint(spark: SparkSession, root: String, name: String): Unit = {
    require(!name.startsWith(GEN),
      s"'$name' declares a generated column; generated-column " +
        "expressions cannot be dropped (as in Delta)")
    val f = fs(spark, root)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"dropConstraint on $root livelocked")
      val view = readView(f, root)
      require(constraintsV(f, root, view).exists(_._1 == name),
        s"no constraint '$name' on $root")
      val v = view.lastVersion + 1
      done = tryCommit(f, root, Entry(v, "constraint", "", 0L, s"k:-$name"))
    }
  }

  /** Idempotent (exactly-once) batch INSERT — the streaming-ingest commit
    * contract: Structured Streaming's `foreachBatch` re-delivers a batch id
    * after a failure, and the reference's Hive Streaming API answers the
    * same problem with TransactionBatch commit-or-abort
    * (`hcatalog/streaming/.../TransactionBatch.java`). The log entry
    * records the batch key in its `fp` slot (`b:<key>`), so a replayed
    * batch finds its key already committed and no-ops — appends become
    * exactly-once across retries with no external dedup state: the log IS
    * the sink's transaction record, exactly why streaming ingest belongs
    * on an ACID table. Checkpoints carry every burned key forward, so the
    * guarantee is unaffected by log pruning. Returns true iff THIS call
    * appended (false = already committed; the staged duplicate is
    * discarded). */
  def insertBatch(spark: SparkSession, root: String, batchKey: String,
      rows: DataFrame): Boolean = {
    require(batchKey.matches("[A-Za-z0-9_.:-]+"),
      s"batch key must be log-entry-safe, got '$batchKey'")
    val marker = s"b:$batchKey"
    val f = fs(spark, root)
    def committed(): Boolean = {
      val view = readView(f, root)
      view.ckpt.exists(_.batchCanon.contains(marker)) ||
        view.tail.exists(e => e.action == "insert" && e.fp == marker)
    }
    if (committed()) return false
    val bview = readView(f, root)
    val cols = declaredFields(spark, f, root, bview).map(_.name)
    val cons = constraintsV(f, root, bview)
    val staged = applyGens(rows, gensFrom(cons)).select(cols.map(col): _*)
    enforceConstraints(staged, cons, "INSERT BATCH", root)
    val tag = UUID.randomUUID().getLeastSignificantBits & Long.MaxValue
    val dir = stage(spark, root, None, Some(withRid(staged, tag)))
    var attempts = 0
    var done = false
    var appended = false
    while (!done) {
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"insertBatch into $root livelocked")
      if (committed()) { // a racing retry of the SAME batch beat us
        f.delete(new Path(s"$root/$dir"), true)
        done = true
      } else {
        pauseBeforeBatchCommit() // test seam: widen the check-to-commit window
        val v = lastVersionOnDisk(f, root) + 1
        if (tryCommit(f, root, Entry(v, "insert", dir, 0L, marker))) {
          done = true; appended = true
        }
      }
    }
    appended
  }

  /** Shared optimistic loop for UPDATE/DELETE: compute against the latest
    * snapshot, then commit unless a version above the snapshot deleted one
    * of the SAME rows (row-overlap conflict → recompute; disjoint
    * concurrent mutations commit without recompute — see the isolation
    * scaladoc). `stageFrom` returns None when the predicate matches
    * nothing — committing an empty mutation would serialize against other
    * writers for no effect, so it no-ops. The conflict scan opens ONLY the
    * entries above the pinned snapshot (selected by file name) — O(what
    * landed since), never a log replay. Returns the number of snapshot
    * computations (1 = committed without recompute). */
  private def mutate(spark: SparkSession, root: String,
      stageFrom: DataFrame => Option[(Option[DataFrame], Option[DataFrame])]): Int = {
    val f = fs(spark, root)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts <= MAX_COMMIT_ATTEMPTS, s"mutation of $root livelocked")
      val view0 = readView(f, root)
      val snapV = view0.lastVersion
      pauseAfterSnapshot()
      stageFrom(snapshotAtV(spark, root, view0)) match {
        case None => done = true // nothing matched on this snapshot
        case Some((del, ins)) =>
          // the new versions an UPDATE/MERGE writes must satisfy the
          // constraints in force at the pinned snapshot (deletes cannot
          // violate a CHECK)
          ins.foreach(i => enforceConstraints(i.drop(RID),
            constraintsV(f, root, view0), "UPDATE/MERGE", root))
          val dir = stage(spark, root, del, ins)
          val myFp = footprint(spark, root, dir)
          // versions proven row-disjoint stay cleared across ordinal races
          val cleared = scala.collection.mutable.Set.empty[Long]
          var v = snapV + 1
          var committed = false
          var conflicted = false
          while (!committed && !conflicted) {
            // first committer wins ON OVERLAP: a mutation above our snapshot
            // conflicts only if it deleted a row we also touch — summary
            // fast path first, exact rid semi-join only on possible overlap.
            // A RESTORE above the snapshot conflicts unconditionally: the
            // rows this stage references may no longer exist at the head.
            conflicted = entriesAbove(f, root, snapV).exists { e =>
              val competing = !cleared(e.version) &&
                (e.action == "mutate" || e.action == "restore")
              val hit = competing && (e.action == "restore" ||
                (fpMayOverlap(myFp, e.fp) &&
                  ridsIntersect(spark, root, dir, e.dir)))
              if (competing && !hit) cleared += e.version
              hit
            }
            if (!conflicted) {
              committed = tryCommit(f, root, Entry(v, "mutate", dir, 0L, myFp))
              if (!committed) v = lastVersionOnDisk(f, root) + 1
            }
          }
          if (committed) done = true
          else f.delete(new Path(s"$root/$dir"), true) // abandoned stage
      }
    }
    attempts
  }

  /** DELETE WHERE cond under snapshot isolation (3VL: NULL cond keeps).
    * The staged delete event keeps the whole dead row, not just its id —
    * O(deleted rows) extra write bytes that buy [[changesBetween]] its
    * no-table-scan contract; readers prune back down to the id column.
    * Returns the snapshot-computation count (1 = no recompute). */
  def delete(spark: SparkSession, root: String, cond: String): Int =
    mutate(spark, root, { snap =>
      val del = snap.filter(coalesce(expr(cond), lit(false)))
      if (del.isEmpty) None else Some((Some(del), None))
    })

  /** UPDATE SET ... WHERE cond under snapshot isolation: delete events plus
    * re-inserted new versions, the reference's two-event UPDATE encoding.
    * SET expressions see the pre-update row. Returns the snapshot-
    * computation count (1 = no recompute). */
  def update(spark: SparkSession, root: String,
      set: Seq[(String, String)], cond: String): Int = {
    val gens = generatedColsOf(spark, root)
    val genLower = gens.map(_._1.toLowerCase).toSet
    set.foreach { case (k, _) =>
      require(!genLower(k.toLowerCase),
        s"cannot UPDATE SET generated column '$k' (it is recomputed " +
          "from its defining expression)")
    }
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
        val tag = UUID.randomUUID().getLeastSignificantBits & Long.MaxValue
        // SET sees the pre-update row; generated columns are then
        // recomputed over the POST-set values (Delta's behavior when a
        // base column changes) — withColumn keeps their position
        val newVersions = gens.foldLeft(matched.select(cols.map { c =>
          setMap.get(c).map(e => expr(e).as(c)).getOrElse(col(c))
        }: _*)) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
        Some((Option(matched), // full old rows: the CDC delete events
          Option(withRid(newVersions, tag))))
      }
    })
  }

  /** Three-clause MERGE under snapshot isolation — the reference's ACID
    * `sqlmerge.q` surface (matched-delete wins over matched-update, then
    * not-matched-insert) on the CONCURRENT-writer log. Staged as ONE
    * delta: delete events for every matched row the merge removes or
    * rewrites (full old rows — the CDC contract), insert rows for the
    * updated new versions plus the not-matched inserts; matched rows
    * neither deleted nor updated stay untouched (no spurious events).
    * Commits through the same row-grain optimistic loop as UPDATE/DELETE —
    * the footprint is the matched-and-mutated row set, so a concurrent
    * mutation of different rows never forces a recompute, and an
    * insert-only merge (nothing matched) commits conflict-free like
    * INSERT. SET/INSERT expressions resolve against aliases `t` (target)
    * and `s` (source) — or the caller's own names via
    * `targetAlias`/`sourceAlias` (the textual MERGE INTO surface passes
    * the statement's aliases through) — the reference's MERGE scoping.
    *
    * Conditional clauses (the full `sqlmerge.q` shape): `matchedSetCond`
    * guards the update clause (`WHEN MATCHED AND c THEN UPDATE`) — a
    * matched row satisfying neither the delete nor the update condition
    * stays untouched with NO events; `notMatchedCond` guards the insert
    * clause (`WHEN NOT MATCHED AND c THEN INSERT`) — unmatched source
    * rows failing it are simply dropped. Delete wins over update for a
    * row satisfying both, Hive's precedence. 3VL throughout: a NULL
    * condition does not take the clause.
    *
    * Cardinality check: a target row matching more than one source row
    * errors (`cardinality_violation`). Returns the snapshot-computation
    * count. */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      onCond: String,
      matchedSet: Seq[(String, String)] = Nil,
      matchedDelete: Option[String] = None,
      notMatchedInsert: Option[Seq[(String, String)]] = None,
      checkCardinality: Boolean = true,
      targetAlias: String = "t", sourceAlias: String = "s",
      matchedSetCond: Option[String] = None,
      notMatchedCond: Option[String] = None): Int = {
    require(targetAlias != sourceAlias,
      s"MERGE aliases must differ, got '$targetAlias' twice")
    val gens = generatedColsOf(spark, root)
    val genLower = gens.map(_._1.toLowerCase).toSet
    matchedSet.foreach { case (k, _) =>
      require(!genLower(k.toLowerCase),
        s"cannot MERGE SET generated column '$k' (it is recomputed " +
          "from its defining expression)")
    }
    mutate(spark, root, { snap =>
      val tcols = snap.columns.filter(_ != RID).toSeq
      val byLower = tcols.map(c => c.toLowerCase -> c).toMap
      val src = source
      val j = snap.as(targetAlias).join(src.as(sourceAlias), expr(onCond), "inner")
      if (checkCardinality) {
        val dups = j.groupBy(col(s"$targetAlias.$RID")).count()
          .filter(col("count") > 1).limit(1).count()
        require(dups == 0, s"MERGE cardinality violation: a row of $root " +
          "matches more than one source row")
      }
      val delCond = matchedDelete
        .map(c => coalesce(expr(c), lit(false))).getOrElse(lit(false))
      val updCond = matchedSetCond
        .map(c => coalesce(expr(c), lit(false))).getOrElse(lit(true))
      val toDelete = j.filter(delCond)
      val toUpdate =
        if (matchedSet.nonEmpty) j.filter(!delCond && updCond) else j.limit(0)
      // dead rows keep their rid + full old values (CDC delete events);
      // project the t side BEFORE the union (the joined frame carries both
      // aliases' columns, whose names may collide)
      def tSide(df: DataFrame) = df.select(
        (tcols.map(c => col(s"$targetAlias.$c").as(c)) :+
          col(s"$targetAlias.$RID").as(RID)): _*)
      val dead = tSide(toDelete).unionByName(tSide(toUpdate))
      val setMap = matchedSet.map { case (k, v) =>
        byLower.getOrElse(k.toLowerCase, throw new IllegalArgumentException(
          s"MERGE SET references unknown column '$k'")) -> v
      }.toMap
      // generated columns recompute over the POST-set values (SET on them
      // is rejected above), keeping their position via withColumn
      val updatedNew = gens.foldLeft(toUpdate.select(tcols.map { c =>
        setMap.get(c).map(e => expr(e).as(c))
          .getOrElse(col(s"$targetAlias.$c").as(c))
      }: _*)) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
      val inserted = notMatchedInsert.map { ins =>
        val resolved = ins.map { case (k, v) =>
          byLower.getOrElse(k.toLowerCase, throw new IllegalArgumentException(
            s"MERGE INSERT references unknown column '$k'")) -> v
        }
        require(resolved.map(_._1).distinct.size == resolved.size,
          "MERGE INSERT assigns the same column more than once")
        val insMap = resolved.toMap
        // a generated column may be omitted (computed) or supplied
        // (verified by its reserved CHECK); data columns must be covered
        require(tcols.forall(c => insMap.contains(c) || genLower(c.toLowerCase)),
          s"INSERT clause must cover all target columns of $root")
        val unmatched = src.as(sourceAlias)
          .join(snap.as(targetAlias), expr(onCond), "left_anti")
        val base = notMatchedCond
          .map(c => unmatched.filter(coalesce(expr(c), lit(false))))
          .getOrElse(unmatched)
          .select(tcols.filter(insMap.contains)
            .map(c => expr(insMap(c)).as(c)): _*)
        applyGens(base, gens).select(tcols.map(col): _*)
      }
      val newRows = inserted.fold(updatedNew)(updatedNew.unionByName(_))
      val anyDead = !dead.isEmpty
      val anyNew = !newRows.isEmpty
      if (!anyDead && !anyNew) None // merge matched/inserted nothing: no-op
      else {
        val tag = UUID.randomUUID().getLeastSignificantBits & Long.MaxValue
        (Some((if (anyDead) Some(dead) else None,
          if (anyNew) Some(withRid(newRows, tag)) else None)))
      }
    })
  }

  /** Shared compactor commit loop: take the next free ordinal UNLESS another
    * compaction (major or minor) landed above our snapshot — then abort and
    * let the caller discard the staged fold (racing folds would re-apply
    * rows the winner already folded; see the isolation scaladoc). Insert/
    * mutate entries landing concurrently never abort a fold: their deltas
    * stay live on top of it. */
  private def commitFold(f: FileSystem, root: String, snapV: Long,
      mk: Long => Entry): Boolean = {
    var v = snapV + 1
    var attempts = 0
    while (true) {
      val racedFold = entriesAbove(f, root, snapV).exists(e =>
        e.action == "compact" || e.action == "minor" || e.action == "restore")
      if (racedFold) return false
      if (tryCommit(f, root, mk(v))) return true
      attempts += 1
      require(attempts < MAX_COMMIT_ATTEMPTS, s"compact of $root livelocked")
      v = lastVersionOnDisk(f, root) + 1
    }
    false
  }

  /** MAJOR compaction: fold the snapshot at version V into a new base whose
    * log entry claims `folds = V` — O(table) work that resets reads to a
    * plain scan. Row ids survive the fold, so deltas committed above V while
    * it ran still resolve on top of the new base. Superseded dirs are NOT
    * deleted — that is [[vacuum]]'s retention-window decision, so pinned
    * [[readAt]]/[[changesBetween]] below V keep working. Returns false iff
    * another compaction raced this one (the fold is discarded; rerun).
    *
    * `clusterBy` (optional) z-orders the new base on the given columns
    * ([[ZOrder.cluster]], Delta's `OPTIMIZE ... ZORDER BY`): each of the
    * `clusterFiles` output files covers a narrow hyper-rectangle of the
    * filter space, so selective predicates on ANY clustered column skip
    * whole files/row groups on parquet footer stats — the compaction is
    * exactly where a 100 TB table buys its layout back. */
  def compact(spark: SparkSession, root: String,
      clusterBy: Seq[String] = Nil, clusterFiles: Int = 32): Boolean = {
    val f = fs(spark, root)
    val view0 = readView(f, root)
    val snapV = view0.lastVersion
    val dir = s"base_${UUID.randomUUID().toString.take(12)}"
    val snap = snapshotAtV(spark, root, view0)
    val out =
      if (clusterBy.isEmpty) snap
      else ZOrder.cluster(snap, clusterBy, clusterFiles)
    out.write.parquet(s"$root/$dir")
    val won = commitFold(f, root, snapV, v => Entry(v, "compact", dir, snapV))
    if (!won) f.delete(new Path(s"$root/$dir"), true)
    else DataSkipping.collect(spark, s"$root/$dir") // tight per-file stats
    won
  }

  /** MINOR compaction — the reference's MINOR/MAJOR split
    * (`ql/.../txn/compactor/CompactorMR.java`: MINOR merges delta files
    * only, MAJOR rewrites the base): fold the committed deltas into ONE
    * delta without touching the base, so high-frequency ingest pays
    * O(deltas committed since the last fold), never O(table). The folded
    * delta is the NET of the range — rows born and killed inside it vanish
    * from both halves; deletes of base rows survive with their full dead
    * row (the CDC contract). Content-wise the table is unchanged (the
    * minor entry's version has the same snapshot as the one before it).
    * Returns false iff another compaction raced this one. */
  def compactMinor(spark: SparkSession, root: String): Boolean = {
    val f = fs(spark, root)
    val view0 = readView(f, root)
    val snapV = view0.lastVersion
    val (_, deltas) = liveStateV(f, root, view0)
    if (deltas.isEmpty) return true // nothing to fold
    val dirs = deltas.values.toSeq.map(_.dir)
    // deltas from different schema epochs union tolerant (ADD COLUMNS)
    val ins = dirs.flatMap(d => readDir(spark, root, d, "insert"))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    val del = dirs.flatMap(d => readDir(spark, root, d, "delete"))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    val netIns = ins.map(i =>
      del.fold(i)(d => i.join(d.select(col(RID)), Seq(RID), "left_anti")))
    val netDel = del.map(d =>
      ins.fold(d)(i => d.join(i.select(col(RID)), Seq(RID), "left_anti")))
    val dir = stage(spark, root, netDel, netIns)
    val won = commitFold(f, root, snapV, v => Entry(v, "minor", dir, snapV))
    if (!won) f.delete(new Path(s"$root/$dir"), true)
    else if (netIns.nonEmpty) DataSkipping.collect(spark, s"$root/$dir/insert")
    won
  }

  /** Retention-window GC — the only place data directories die. Keeps every
    * dir some snapshot in the last `retainVersions` versions still needs;
    * deletes log-REFERENCED dirs that fell out of the window (superseded by
    * compactions). Unreferenced data dirs are never touched: they are
    * in-flight writers' stages, not garbage (abandoned stages are deleted
    * by their own writer). Stray `.tmp_*` files inside `_txnlog` ARE swept:
    * they are dead writers' unfinished commit bodies (a live writer whose
    * temp is swept just loses that rename and retries). After a vacuum,
    * [[readAt]]/[[changesBetween]] below the window fail on the missing
    * dirs — the documented retention tradeoff every log-structured table
    * format has.
    *
    * With `pruneLog = true` the log METADATA is bounded too: a checkpoint
    * is written at the window edge and every entry file at or below it is
    * retired (checkpoints below it as well) — the per-table file count
    * stops growing with commit history. History below the window then
    * fails with an explicit "pruned by vacuum" error instead of a missing-
    * parquet scan error; above it, nothing changes (state at or above the
    * edge replays from the checkpoint). Default false: entries stay, so
    * sub-window time travel keeps working where the dirs happen to survive.
    *
    * Safe to run concurrently with writers: new commits only reference
    * fresh uuid dirs plus dirs live at the current head, which the window
    * always retains; the head is re-checked right before deletion and the
    * plan recomputed if a commit (e.g. a RESTORE resurrecting an old
    * version) landed meanwhile, closing the compute-to-delete window. */
  def vacuum(spark: SparkSession, root: String, retainVersions: Int,
      pruneLog: Boolean = false): Unit = {
    require(retainVersions >= 1, "retention window must include the head")
    val f = fs(spark, root)
    var guard = 0
    var settled = false
    while (!settled) {
      guard += 1
      val (entryFiles, ckptFiles) = listLog(f, root)
      if (entryFiles.isEmpty && ckptFiles.isEmpty) return
      val view = readView(f, root)
      val maxV = view.lastVersion
      val keepFrom = math.max(1L, maxV - retainVersions + 1)
      // the oldest version whose state is still reconstructible (entries
      // from 1, or the oldest checkpoint after a previous prune)
      val entries = readEntryFiles(f, entryFiles)
      val lowest =
        if (entries.headOption.exists(_.version == 1L)) 1L
        else ckptFiles.map(_._1).sorted.headOption.getOrElse(maxV)
      val lo = math.max(keepFrom, lowest)
      val needed = (lo to maxV).flatMap { v =>
        val (b, ds) = liveStateV(f, root, truncateView(f, root, view, v))
        b +: ds.values.toSeq.map(_.dir)
      }.toSet
      // candidates: every dir any surviving entry OR checkpoint references
      // (metadata-only entries carry no dir — the empty string must never
      // reach the delete path: Path("$root/") is the table root)
      val ckpts = ckptFiles.flatMap { case (v, p) =>
        Try(parseCkpt(readBody(f, p))).toOption.filter(_.version == v) }
      val candidates = (entries.map(_.dir) ++
        ckpts.flatMap(c => c.base +: c.deltas.values.toSeq.map(_.dir)))
        .filter(_.nonEmpty).toSet
      val doomed = candidates -- needed
      if (lastVersionOnDisk(f, root) != maxV && guard < 5) {
        () // a commit (possibly a RESTORE) landed while planning: recompute
      } else {
        doomed.foreach(d => f.delete(new Path(s"$root/$d"), true))
        // dead writers' unfinished commit temp files
        f.listStatus(new Path(s"$root/$LOG_DIR")).toSeq.map(_.getPath)
          .filter(_.getName.startsWith(".tmp_"))
          .foreach(p => f.delete(p, false))
        if (pruneLog) {
          Try(writeCheckpointAt(f, root, keepFrom))
          if (f.exists(ckptPath(root, keepFrom))) {
            entryFiles.filter(_._1 <= keepFrom).foreach(p => f.delete(p._2, false))
            ckptFiles.filter(_._1 < keepFrom).foreach(p => f.delete(p._2, false))
          }
        }
        settled = true
      }
    }
  }
}

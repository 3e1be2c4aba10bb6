package graft

import java.io.File
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.util.{Failure, Success, Try}

import graft.operators.TxnMergeOnRead
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Concurrency contract of the optimistic transaction log
  * ([[graft.operators.TxnMergeOnRead]]) — the reference's committed-txn-list
  * semantics (`metastore/.../txn/TxnHandler.java:104`,
  * `ql/.../io/AcidUtils.java:226`) re-expressed as a lakehouse-style log:
  *
  *  - N racing INSERT writers: every delta survives (the single-writer
  *    implementation loses deltas to txn-id collisions — this is the defect
  *    the log closes), each gets a distinct log ordinal;
  *  - racing overlapping UPDATEs serialize first-committer-wins: the final
  *    value equals SOME serial order of the increments (here: all applied,
  *    since an increment recomputed on the winner's snapshot still matches);
  *  - a reader never observes a torn UPDATE (delete half visible, insert
  *    half not): row count is invariant under concurrent update load;
  *  - snapshot pinning: a version handle re-read after later commits still
  *    returns the old state (repeatable read);
  *  - compaction concurrent with a mutation loses nothing: the mutation's
  *    delta stays live on top of the new base (`folds` claims only the
  *    prefix the fold actually read);
  *  - abandoned stages (conflict losers) are unreferenced by the log and
  *    invisible to readers.
  */
class TxnMorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 8, appName = "graft-txnmor")

  override def afterAll(): Unit = spark.stop()

  private val base = "/root/repo/target/txnmorspec"

  private def mk(root: String, n: Int = 200): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
    TxnMergeOnRead.create(spark, root,
      spark.range(0, n).select(col("id").as("k"), (col("id") * 10).as("v")))
  }

  /** Run the thunks concurrently (all released together), propagate the
    * first failure. */
  private def racing(thunks: Seq[() => Unit]): Unit = {
    val pool = Executors.newFixedThreadPool(thunks.size)
    val gate = new CountDownLatch(1)
    val results = thunks.map { t =>
      pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
        def call(): Try[Unit] = { gate.await(); Try(t()) }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers hung")
    results.map(_.get()).collect { case Failure(e) => throw e }
    ()
  }

  test("racing inserts: no delta lost, distinct ordinals") {
    val root = s"$base/ins"
    mk(root)
    val writers = (0 until 8).map { w => () =>
      TxnMergeOnRead.insert(spark, root,
        spark.range(0, 10).select((col("id") + 1000 + w * 100).as("k"),
          lit(-1L).as("v")))
    }
    racing(writers)
    val got = TxnMergeOnRead.read(spark, root)
    assert(got.count() === 200 + 8 * 10)
    // every writer's batch is fully present
    assert(got.filter(col("k") >= 1000).count() === 80)
    assert(TxnMergeOnRead.currentVersion(spark, root) === 1 + 8)
  }

  test("racing overlapping updates serialize (no lost update)") {
    val root = s"$base/upd"
    mk(root)
    // 4 writers each add 1 to v of the SAME row set; a lost update would
    // leave some row with fewer than 4 increments, a torn one a duplicate
    val writers = (0 until 4).map { _ => () =>
      TxnMergeOnRead.update(spark, root, Seq("v" -> "v + 1"), "k < 50")
    }
    racing(writers)
    val got = TxnMergeOnRead.read(spark, root)
    assert(got.count() === 200)
    assert(got.filter(col("k") < 50).filter(col("v") =!= col("k") * 10 + 4)
      .count() === 0, "every touched row has exactly 4 increments")
    assert(got.filter(col("k") >= 50).filter(col("v") =!= col("k") * 10)
      .count() === 0, "untouched rows unchanged")
  }

  test("reader never sees a torn update; pinned version is repeatable") {
    val root = s"$base/torn"
    mk(root)
    val pinned = TxnMergeOnRead.currentVersion(spark, root)
    @volatile var stop = false
    @volatile var torn: Option[Long] = None
    val reader = new Thread(() => {
      while (!stop && torn.isEmpty) {
        val c = TxnMergeOnRead.read(spark, root).count()
        if (c != 200) torn = Some(c)
      }
    })
    reader.start()
    try (0 until 5).foreach { i =>
      TxnMergeOnRead.update(spark, root, Seq("v" -> s"v + 1"), s"k % 5 = $i")
    } finally { stop = true; reader.join(120000) }
    assert(torn.isEmpty, s"reader saw a torn snapshot: count $torn")
    // repeatable read at the pinned pre-update version
    val old = TxnMergeOnRead.readAt(spark, root, pinned)
    assert(old.filter(col("v") =!= col("k") * 10).count() === 0)
    // and the head now has every update applied
    assert(TxnMergeOnRead.read(spark, root)
      .filter(col("v") =!= col("k") * 10 + 1).count() === 0)
  }

  test("compaction concurrent with a mutation loses neither") {
    val root = s"$base/cmp"
    mk(root)
    TxnMergeOnRead.update(spark, root, Seq("v" -> "v + 1"), "k < 10")
    racing(Seq(
      () => TxnMergeOnRead.compact(spark, root),
      () => TxnMergeOnRead.insert(spark, root,
        spark.range(0, 5).select((col("id") + 5000).as("k"), lit(0L).as("v")))))
    val got = TxnMergeOnRead.read(spark, root)
    assert(got.count() === 205)
    assert(got.filter(col("k") < 10).filter(col("v") =!= col("k") * 10 + 1)
      .count() === 0, "pre-compaction update survives the fold")
    assert(got.filter(col("k") >= 5000).count() === 5,
      "insert racing the compactor survives")
  }

  test("delete vs update race on the same rows is serial (3VL delete)") {
    val root = s"$base/dvu"
    mk(root)
    racing(Seq(
      () => TxnMergeOnRead.delete(spark, root, "k >= 100 AND k < 150"),
      () => TxnMergeOnRead.update(spark, root, Seq("v" -> "v + 1"),
        "k >= 100 AND k < 150")))
    val got = TxnMergeOnRead.read(spark, root)
    // either serial order deletes the 50 rows: upd;del deletes the new
    // versions, del;upd updates nothing (no rows match)
    assert(got.count() === 150)
    assert(got.filter(col("k") >= 100 && col("k") < 150).count() === 0)
    assert(got.filter(col("v") =!= col("k") * 10).count() === 0)
  }

  test("CDC: born-and-deleted inside the range nets out; updates split") {
    val root = s"$base/cdc"
    mk(root, n = 10)                                                   // v1
    TxnMergeOnRead.insert(spark, root,
      spark.range(100, 103).select(col("id").as("k"),
        (col("id") * 10).as("v")))                                     // v2
    TxnMergeOnRead.update(spark, root, Seq("v" -> "v + 1"), "k = 5")   // v3
    TxnMergeOnRead.delete(spark, root, "k >= 100")                     // v4
    // full range: the v2 rows died at v4 → net zero; k=5 is one
    // delete (old version) + one insert (new version)
    val full = TxnMergeOnRead.changesBetween(spark, root, 1L, 4L)
    assert(full.filter(col("k") >= 100).count() === 0,
      "rows born and deleted inside the range must net out")
    assert(full.filter(col("k") === 5 && col("change") === "delete")
      .select("v").head().getLong(0) === 50)
    assert(full.filter(col("k") === 5 && col("change") === "insert")
      .select("v").head().getLong(0) === 51)
    assert(full.count() === 2)
    // sub-ranges see the birth and the death individually
    assert(TxnMergeOnRead.changesBetween(spark, root, 1L, 2L)
      .agg(count(lit(1)), sum(when(col("change") === "insert", 1).otherwise(0)))
      .head().toSeq === Seq(3L, 3L))
    assert(TxnMergeOnRead.changesBetween(spark, root, 3L, 4L)
      .agg(count(lit(1)), sum(when(col("change") === "delete", 1).otherwise(0)))
      .head().toSeq === Seq(3L, 3L))
    // empty range → empty frame with the table schema + change column
    assert(TxnMergeOnRead.changesBetween(spark, root, 4L, 4L).count() === 0)
  }

  test("empty-match mutation no-ops without consuming an ordinal") {
    val root = s"$base/noop"
    mk(root)
    val v0 = TxnMergeOnRead.currentVersion(spark, root)
    TxnMergeOnRead.update(spark, root, Seq("v" -> "v + 1"), "k < 0")
    TxnMergeOnRead.delete(spark, root, "k < 0")
    assert(TxnMergeOnRead.currentVersion(spark, root) === v0)
    assert(TxnMergeOnRead.read(spark, root)
      .filter(col("v") =!= col("k") * 10).count() === 0)
  }
}

package graft

import graft.operators.MergeOnReadDml
import java.io.File
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Merge-on-read DML contract beyond the q151/q152 oracle checks:
  *
  *  - a mutation must NOT rewrite the base (O(changed rows) writes are the
  *    entire point — the reference appends delta_x_y dirs,
  *    `ql/.../io/AcidUtils.java:226-228`);
  *  - the snapshot anti-join must disappear after compaction (reads become
  *    plain base scans, `ql/.../txn/compactor/Worker.java:53`);
  *  - delete events must hit rows born in insert-deltas, not just base rows
  *    (the reference keys deletes by ROW__ID, which spans both);
  *  - a NULL predicate keeps the row (3VL, same as CopyOnWriteDml).
  */
class MergeOnReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-mor")

  override def afterAll(): Unit = spark.stop()

  private val base = "/root/repo/target/morspec"

  private def mk(root: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
    val df = spark.range(0, 300).select(
      col("id").as("k"), concat(lit("v"), col("id")).as("v"),
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c").as("p"))
    MergeOnReadDml.create(spark, root, df)
  }

  private def parquetFiles(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("update/delete leave base files physically untouched") {
    val root = s"$base/t1"
    mk(root)
    val before = parquetFiles(s"$root/base_1")
    MergeOnReadDml.update(spark, root, Seq("v" -> "concat(v, '!')"), "k % 10 = 0")
    MergeOnReadDml.delete(spark, root, "k >= 290")
    assert(parquetFiles(s"$root/base_1") == before,
      "merge-on-read mutations must append deltas, not rewrite the base")
    val got = MergeOnReadDml.read(spark, root)
    assert(got.count() == 290)
    assert(got.filter(col("v") === "v0!").count() == 1)
    assert(got.filter(col("k") === 295).count() == 0)
  }

  test("delta volume is O(changed rows)") {
    val root = s"$base/t2"
    mk(root)
    MergeOnReadDml.update(spark, root, Seq("v" -> "upper(v)"), "k < 7")
    val del = spark.read.parquet(s"$root/delta_2/delete")
    val ins = spark.read.parquet(s"$root/delta_2/insert")
    assert(del.count() == 7 && ins.count() == 7)
  }

  test("delete events reach rows born in insert-deltas") {
    val root = s"$base/t3"
    mk(root)
    MergeOnReadDml.insert(spark, root,
      spark.range(1000, 1010).select(col("id").as("k"),
        lit("late").as("v"), lit("z").as("p")))
    MergeOnReadDml.delete(spark, root, "k = 1005")
    val got = MergeOnReadDml.read(spark, root).filter(col("p") === "z")
    assert(got.count() == 9)
    assert(got.filter(col("k") === 1005).count() == 0)
  }

  test("NULL predicate keeps the row (3VL)") {
    val root = s"$base/t4"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
    MergeOnReadDml.create(spark, root, spark.sql(
      "SELECT * FROM VALUES (1, CAST(NULL AS INT)), (2, 5) AS t(k, x)"))
    MergeOnReadDml.delete(spark, root, "x > 3") // NULL > 3 -> NULL -> keep
    assert(MergeOnReadDml.read(spark, root).count() == 1)
    assert(MergeOnReadDml.read(spark, root).head.getInt(0) == 1)
  }

  test("minor compaction folds deltas into one, base untouched") {
    val root = s"$base/t6"
    mk(root)
    MergeOnReadDml.update(spark, root, Seq("v" -> "concat(v, '!')"), "k % 10 = 0") // txn 2
    MergeOnReadDml.insert(spark, root,
      spark.range(1000, 1010).select(col("id").as("k"),
        lit("late").as("v"), lit("z").as("p")))                                    // txn 3
    MergeOnReadDml.delete(spark, root, "k = 1005 OR k = 7")                        // txn 4
    val preRows = MergeOnReadDml.read(spark, root).orderBy("k").collect()
    val baseBefore = parquetFiles(s"$root/base_1")
    MergeOnReadDml.compactMinor(spark, root)
    assert(parquetFiles(s"$root/base_1") == baseBefore,
      "minor compaction must not touch the base")
    val deltaDirs = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("delta_"))
    assert(deltaDirs.length == 1, s"expected one folded delta, got ${deltaDirs.toSeq}")
    val postRows = MergeOnReadDml.read(spark, root).orderBy("k").collect()
    assert(postRows.sameElements(preRows), "minor compaction must not change the snapshot")
    // delete of delta-born k=1005 annihilated against its insert event;
    // delete of base-born k=7 must survive as a delete event
    val folded = deltaDirs.head
    val ins = spark.read.parquet(s"$root/$folded/insert")
    val del = spark.read.parquet(s"$root/$folded/delete")
    assert(ins.filter(col("k") === 1005).count() == 0)
    assert(ins.count() == 30 + 9) // 30 updated versions + 9 surviving late rows
    assert(del.count() == 30 + 1) // 30 update-deletes (base rids) + k=7
  }

  test("txn staging dirs are invisible to readers; re-commit is idempotent") {
    val root = s"$base/t8"
    mk(root)
    // a torn/in-flight txn (crash before the publish rename) must not be read
    val f = new File(s"$root/.txn_99/delete"); f.mkdirs()
    spark.range(0, 5).select(col("id").as("__row_id"))
      .write.mode("overwrite").parquet(f.getPath)
    assert(MergeOnReadDml.read(spark, root).count() == 300,
      "uncommitted staging must be invisible")
    org.apache.commons.io.FileUtils.deleteQuietly(new File(s"$root/.txn_99"))
    // idempotent re-commit: same txn id written twice = one delta, no dup rows
    val rows = spark.range(1000, 1010).select(col("id").as("k"),
      lit("late").as("v"), lit("z").as("p"))
    MergeOnReadDml.insertAt(spark, root, rows, txn = 7)
    MergeOnReadDml.insertAt(spark, root, rows, txn = 7) // the "retried batch"
    assert(MergeOnReadDml.read(spark, root).count() == 310,
      "a retried txn must replace its delta, not duplicate it")
  }

  test("streaming ingest commits one insert-delta per micro-batch") {
    val root = s"$base/t7"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
    graft.streaming.StreamOps.morIngest(spark, "/root/testdata/sf0.001", root, nFiles = 4)
    val deltas = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("delta_"))
    assert(deltas.length == 4, s"one txn per micro-batch: got ${deltas.toSeq}")
    val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(graft.operators.MergeOnReadDml.read(spark, root).count() == expected,
      "exactly-once: table state must equal the replayed feed")
    graft.operators.MergeOnReadDml.compactMinor(spark, root)
    assert(graft.operators.MergeOnReadDml.read(spark, root).count() == expected)
  }

  test("compaction folds deltas, removes them, and drops the anti-join") {
    val root = s"$base/t5"
    mk(root)
    MergeOnReadDml.update(spark, root, Seq("v" -> "concat(v, '!')"), "k % 10 = 0")
    MergeOnReadDml.delete(spark, root, "k >= 290")
    val preRows = MergeOnReadDml.read(spark, root).orderBy("k").collect()
    val prePlan = MergeOnReadDml.read(spark, root).queryExecution.executedPlan.toString
    assert(prePlan.contains("Anti"), "pre-compaction read must merge delete events")
    MergeOnReadDml.compact(spark, root)
    val postRows = MergeOnReadDml.read(spark, root).orderBy("k").collect()
    assert(postRows.sameElements(preRows), "compaction must not change the snapshot")
    val postPlan = MergeOnReadDml.read(spark, root).queryExecution.executedPlan.toString
    assert(!postPlan.contains("Anti"), "post-compaction read must be a plain scan")
    val names = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet
    assert(!names.exists(_.startsWith("delta_")), "folded deltas must be deleted")
    // and new deltas stack on the compacted base
    MergeOnReadDml.delete(spark, root, "k = 1")
    assert(MergeOnReadDml.read(spark, root).count() == preRows.length - 1)
  }

  test("insertAt with a txn at or below the base fails loudly (not silent loss)") {
    val root = s"$base/t6"
    mk(root)
    MergeOnReadDml.delete(spark, root, "k = 0")
    MergeOnReadDml.compact(spark, root) // base txn advances past 1
    val rows = spark.range(900, 903).select(
      col("id").as("k"), concat(lit("v"), col("id")).as("v"), lit("a").as("p"))
    intercept[IllegalArgumentException](
      MergeOnReadDml.insertAt(spark, root, rows, 1L))
    // a fresh txn above the base still lands
    MergeOnReadDml.insert(spark, root, rows)
    assert(MergeOnReadDml.read(spark, root).filter("k >= 900").count() == 3)
  }

  test("a crash between minor-compaction publish and source deletion reads clean") {
    val root = s"$base/t7"
    mk(root)
    MergeOnReadDml.update(spark, root, Seq("v" -> "concat(v, '!')"), "k < 5")
    val n = MergeOnReadDml.read(spark, root).count()
    // simulate the crash window: the folded delta (same row ids) published
    // while an original delta still exists — copy delta_2 to delta_9
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(s"$root/delta_2"),
      fs, new org.apache.hadoop.fs.Path(s"$root/delta_9"), false, conf)
    val healed = MergeOnReadDml.read(spark, root)
    assert(healed.count() == n, "duplicated row ids must read as one row")
    assert(healed.filter("k < 5").count() == 5)
  }
}

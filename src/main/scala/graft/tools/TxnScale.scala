package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

import graft.Engine
import graft.operators.TxnMergeOnRead
import org.apache.spark.sql.functions._

/** SURVEY §6 scale evidence for the transaction-log write paths (round 9):
  * three contracts measured at sf0.1 and ×64 —
  *
  *  1. **Disjoint-contention throughput** (q197 family): N writers race
  *     UPDATEs with pairwise-disjoint row footprints. With row-grain
  *     conflict detection every writer must commit its FIRST computation
  *     (attempts == 1, no recompute traffic) at any table size — the
  *     pre-round-9 table-grain check forced N·(N−1)/2 recomputes here.
  *  2. **Incremental-ingest wall** (q200 family): a fixed-size batch
  *     anti-joins the corpus on the hash projection only. The wall may
  *     track the (narrow, single-column) hash scan but must stay far
  *     below a full-width corpus read — the "never rescan the text"
  *     claim, with the full read measured alongside as the yardstick.
  *  3. **Minor vs major compaction** (q204 family): after K delta
  *     commits, `compactMinor` folds O(deltas) while `compact` rewrites
  *     O(table) — at ×64 the minor wall must stay roughly flat while the
  *     major wall tracks the table.
  *  4. **Metadata path flat in version count** (round 10): the per-op
  *     driver cost of loading the log must NOT grow with how many versions
  *     ever committed — that is what checkpoints buy. Measured as the
  *     driver-side plan-construction wall (`read(...).schema`: view load +
  *     parquet footers, no job) and `currentVersion` at ~12 versions vs
  *     ~500 versions; the checkpointed ratio must stay ~1 while a forced
  *     full replay (`readAt` below the oldest checkpoint) at the same
  *     version count shows the O(versions) cost the checkpoint removed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.TxnScale"
  */
object TxnScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale64")
    val s = Engine.session(cores = 32, appName = "graft-txnscale")
    val tag = new java.io.File(dir).getName

    def timed(label: String)(work: => Unit): Double = {
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      work
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[txnscale] $label ${dt}%.2fs")
      dt
    }

    // ---- 1. disjoint contention --------------------------------------
    val root1 = s"/tmp/graft_txn_disj_$tag"
    val li = Engine.table(s, dir, "lineitem").select(
      col("l_orderkey").cast("bigint").as("ok"), col("l_linenumber").as("ln"),
      col("l_quantity").cast("double").as("qty"), col("l_returnflag").as("rf"))
    TxnMergeOnRead.create(s, root1, li)
    val rows = TxnMergeOnRead.read(s, root1).count()
    val writers = 4
    val attempts = new java.util.concurrent.atomic.AtomicIntegerArray(writers)
    val disjWall = timed(s"$writers disjoint racing updates") {
      val pool = Executors.newFixedThreadPool(writers)
      val futs = (0 until writers).map { w =>
        pool.submit(new Callable[Unit] {
          def call(): Unit = attempts.set(w, TxnMergeOnRead.update(s, root1,
            Seq("qty" -> "qty + 1"), s"ok % 4096 = ${w * 128}"))
        })
      }
      pool.shutdown()
      futs.foreach(_.get(600, TimeUnit.SECONDS))
      require(pool.awaitTermination(1, TimeUnit.SECONDS))
    }
    val atts = (0 until writers).map(attempts.get)
    println(s"[txnscale] disjoint attempts per writer: ${atts.mkString(",")}" +
      s" (all 1 = zero recompute traffic)")

    // ---- 2. incremental ingest ---------------------------------------
    val root2 = s"/tmp/graft_txn_ingest_$tag"
    val d = Engine.table(s, dir, "documents").select(col("doc_id"), col("text"))
    TxnMergeOnRead.create(s, root2,
      d.withColumn("h", md5(col("text"))))
    val corpusN = TxnMergeOnRead.read(s, root2).count()
    // fixed-size batch: half novel, half duplicating corpus docs
    val batch = d.limit(2000).withColumn("doc_id", col("doc_id") + 10000000L)
      .unionByName(d.limit(2000).withColumn("text", concat(col("text"), lit(" novel")))
        .withColumn("doc_id", col("doc_id") + 20000000L))
      .withColumn("h", md5(col("text")))
      .localCheckpoint(true) // batch build cost is not the measurement
    val ingest = timed("incremental ingest (4k batch)") {
      val bdd = batch.groupBy("h")
        .agg(min(struct(col("doc_id"), col("text"))).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"), col("h"))
      val novel = bdd.join(TxnMergeOnRead.read(s, root2).select("h"),
        Seq("h"), "left_anti")
      TxnMergeOnRead.insert(s, root2, novel)
    }
    val full = timed("full-width corpus read (yardstick)") {
      TxnMergeOnRead.read(s, root2)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- 3. minor vs major compaction --------------------------------
    // each flavor folds an IDENTICAL freshly built 6-delta table (a shared
    // table would hand the second fold different state), best-of-2 to tame
    // page-cache noise; the build is not the measurement
    val root3 = s"/tmp/graft_txn_cmp_$tag"
    def buildDeltaTable(): Unit = {
      TxnMergeOnRead.create(s, root3, li)
      (0 until 6).foreach { i =>
        TxnMergeOnRead.update(s, root3,
          Seq("qty" -> "qty + 1"), s"ok % 8192 = ${i * 512}")
      }
    }
    val minor = (1 to 2).map { i =>
      buildDeltaTable()
      timed(s"minor compaction (6 deltas) #$i") {
        require(TxnMergeOnRead.compactMinor(s, root3), "uncontended fold commits")
      }
    }.min
    val major = (1 to 2).map { i =>
      buildDeltaTable()
      timed(s"major compaction (same table) #$i") {
        require(TxnMergeOnRead.compact(s, root3), "uncontended fold commits")
      }
    }.min

    // ---- 4. metadata path: flat in version count ---------------------
    // restore commits are metadata-only (one log entry, no Spark job), so
    // they grow the version count in seconds; each targets head-1, which
    // keeps every target inside the checkpointed fast path
    val root4 = s"/tmp/graft_txn_meta_$tag"
    TxnMergeOnRead.create(s, root4,
      s.range(0, 10000).select(col("id").as("k"), col("id").as("v")))
    TxnMergeOnRead.insert(s, root4,
      s.range(0, 10).select((col("id") + 100000).as("k"), col("id").as("v")))
    def metaWall(): (Double, Double) = {
      val t0 = System.nanoTime()
      (0 until 100).foreach(_ => TxnMergeOnRead.currentVersion(s, root4))
      val cv = (System.nanoTime() - t0) / 1e9 / 100
      val t1 = System.nanoTime()
      (0 until 20).foreach(_ => TxnMergeOnRead.read(s, root4).schema)
      val rd = (System.nanoTime() - t1) / 1e9 / 20
      (cv, rd)
    }
    while (TxnMergeOnRead.currentVersion(s, root4) < 12)
      TxnMergeOnRead.restore(s, root4, TxnMergeOnRead.currentVersion(s, root4) - 1)
    val (cvSmall, rdSmall) = metaWall()
    while (TxnMergeOnRead.currentVersion(s, root4) < 512)
      TxnMergeOnRead.restore(s, root4, TxnMergeOnRead.currentVersion(s, root4) - 1)
    val (cvBig, rdBig) = metaWall()
    // the cost checkpoints removed: replay below the oldest checkpoint
    // opens every pre-checkpoint entry file ever committed
    val t2 = System.nanoTime()
    (0 until 20).foreach(_ => TxnMergeOnRead.readAt(s, root4, 2L).schema)
    val rdFull = (System.nanoTime() - t2) / 1e9 / 20
    // the remaining growth is the log-dir LISTING (O(files on disk)) —
    // pruning the log bounds that too: per-op cost returns to the
    // small-table figure at the same 512-version history
    TxnMergeOnRead.vacuum(s, root4, retainVersions = 16, pruneLog = true)
    val (cvPruned, rdPruned) = metaWall()
    println(f"[txnscale] metadata: currentVersion ${cvSmall * 1e3}%.1fms@12v " +
      f"${cvBig * 1e3}%.1fms@512v ${cvPruned * 1e3}%.1fms@512v-pruned " +
      f"(pruned/small ${cvPruned / cvSmall}%.2f) | " +
      f"read-plan ${rdSmall * 1e3}%.1fms@12v ${rdBig * 1e3}%.1fms@512v " +
      f"${rdPruned * 1e3}%.1fms@512v-pruned (ckpt ratio ${rdBig / rdSmall}%.2f) | " +
      f"full-replay readAt ${rdFull * 1e3}%.1fms@512v " +
      f"(${rdFull / rdBig}%.1fx the checkpointed path)")

    println(f"[txnscale] dir=$dir rows=$rows corpus=$corpusN " +
      f"disjWall=$disjWall%.2fs attempts=${atts.mkString("/")} " +
      f"ingest=$ingest%.2fs fullRead=$full%.2fs ingest/full=${ingest / full}%.2f " +
      f"minor=$minor%.2fs major=$major%.2fs minor/major=${minor / major}%.2f")
    s.stop()
  }
}

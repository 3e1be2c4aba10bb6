package graft.tools

import graft.Engine
import graft.operators.{IncrementalAgg, TxnMergeOnRead}
import org.apache.spark.sql.functions._

/** SURVEY §6 scale evidence for the transaction-log CDC path (round 8):
  * time an incremental consumer (`changesBetween`) against a full snapshot
  * read of the same table, at sf0.1 and at ×64. The claim under test:
  * CDC wall is O(changes in range) — the full-row delete events mean no
  * consumer ever rescans the table — so while the snapshot read and the
  * UPDATE itself grow with the table, the CDC read of the same update's
  * events stays flat.
  *
  * Round 10 adds the consumer the feed exists for: an incrementally
  * maintained materialized aggregate ([[IncrementalAgg]]). The claim: a
  * refresh after a small change folds only the change range — its wall
  * tracks the CDC read, not the from-scratch GROUP BY over the snapshot,
  * and the gap widens with table size.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.CdcScale"
  */
object CdcScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale64")
    val s = Engine.session(cores = 32, appName = "graft-cdcscale")
    val root = s"/tmp/graft_cdc_${new java.io.File(dir).getName}"

    def best2(label: String)(work: => Unit): Double = {
      val ts = (1 to 2).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        work
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cdcscale] $label best=${ts.min}%.2fs " +
        f"(runs: ${ts.map(t => f"$t%.2f").mkString(",")})")
      ts.min
    }

    // one-time table build (not the measurement)
    // k: a unique row key (the driver's lineitem is TPC-H-ISH — (ok, ln)
    // pairs repeat — and the replication section needs a real primary key)
    val li = Engine.table(s, dir, "lineitem").select(
      col("l_orderkey").cast("bigint").as("ok"), col("l_linenumber").as("ln"),
      col("l_quantity").cast("double").as("qty"),
      col("l_extendedprice").cast("double").as("price"),
      col("l_returnflag").as("rf"))
      .withColumn("k", monotonically_increasing_id())
    TxnMergeOnRead.create(s, root, li)
    val rows = TxnMergeOnRead.read(s, root).count()

    // ~0.1% of rows change: the update pays a snapshot scan (grows with
    // the table, as any predicate-matched DML must)...
    val v0 = TxnMergeOnRead.currentVersion(s, root)
    val upd = best2("update ~0.1%")(TxnMergeOnRead.update(s, root,
      Seq("qty" -> "qty + 1"), "ok % 1024 = 0"))
    val v1 = TxnMergeOnRead.currentVersion(s, root)

    // ...but its CONSUMPTION doesn't: CDC reads only the range's deltas
    val cdc = best2("cdc read") {
      TxnMergeOnRead.changesBetween(s, root, v0, v1)
        .write.format("noop").mode("overwrite").save()
    }
    val nChanges = TxnMergeOnRead.changesBetween(s, root, v0, v1).count()
    val full = best2("full snapshot read") {
      TxnMergeOnRead.read(s, root).write.format("noop").mode("overwrite").save()
    }
    println(f"[cdcscale] dir=$dir rows=$rows changes=$nChanges " +
      f"update=$upd%.2fs cdc=$cdc%.2fs fullRead=$full%.2fs cdc/full=${cdc / full}%.2f")

    // incremental materialized aggregate: refresh after a ~0.1% change vs
    // recomputing the same GROUP BY from the snapshot
    val state = s"${root}_agg"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(state))
    IncrementalAgg.init(s, root, state, Seq("rf"), Seq("qty", "price"))
    // each timed run refreshes over a fresh pending ~0.1% change; the
    // update itself stays OUTSIDE the timed region (its snapshot scan is
    // the write path's cost, measured above)
    val incr = (1 to 2).map { i =>
      TxnMergeOnRead.update(s, root, Seq("qty" -> "qty + 1"), s"ok % 2048 = $i")
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      IncrementalAgg.refresh(s, root, state)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cdcscale] incremental agg refresh #$i ${dt}%.2fs")
      dt
    }.min
    val scratch = best2("from-scratch agg over the snapshot") {
      TxnMergeOnRead.read(s, root).groupBy("rf")
        .agg(count(lit(1)).as("cnt"), sum("qty").as("sum_qty"),
          sum("price").as("sum_price"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[cdcscale] incrAgg refresh=$incr%.2fs scratchAgg=$scratch%.2fs " +
      f"refresh/scratch=${incr / scratch}%.2f")

    // materialized-view rewrite (round 10): a fresh MV answers the same
    // GROUP BY from its state parquet — wall should be near-constant in
    // table size (the state has O(groups) rows), vs the scratch aggregate
    // above which scans the table
    graft.operators.TxnSql.register("cdcscale_t", root)
    graft.operators.MatView.drop(s, "cdcscale_mv")
    graft.operators.MatView.create(s, "cdcscale_mv",
      "SELECT rf, count(*) AS c, sum(qty) AS sq, sum(price) AS sp " +
      "FROM cdcscale_t GROUP BY rf")
    val mvq = "SELECT rf, count(*) AS c, sum(qty) AS sq FROM cdcscale_t GROUP BY rf"
    val mv = best2("mv rewrite answer") {
      val df = s.sql(graft.operators.TxnSql.rewriteReads(s, mvq))
      val rw = graft.operators.MatView.tryRewrite(s, df)
      require(rw.isDefined, "MV must be fresh and matching here")
      rw.get.write.format("noop").mode("overwrite").save()
    }
    println(f"[cdcscale] mvAnswer=$mv%.2fs scratchAgg=$scratch%.2fs " +
      f"mv/scratch=${mv / scratch}%.2f")

    // CDC replication (round 10): sync after a ~0.1% change pays the feed
    // read + ONE merge on the replica; re-bootstrap rewrites the table.
    // The sync/bootstrap gap is the point of following a feed.
    val dst = s"${root}_repl"
    val ckpt = s"${root}_repl_ckpt"
    val boot = best2("replication bootstrap (init)") {
      graft.operators.ChangeFeed.init(s, root, dst, ckpt)
    }
    val syncT = (1 to 2).map { i =>
      TxnMergeOnRead.update(s, root,
        Seq("qty" -> "qty + 1"), s"ok % 4096 = $i")
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      graft.operators.ChangeFeed.sync(s, root, dst, ckpt, Seq("k"))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cdcscale] replication sync #$i ${dt}%.2fs")
      dt
    }.min
    println(f"[cdcscale] replSync=$syncT%.2fs bootstrap=$boot%.2fs " +
      f"sync/bootstrap=${syncT / boot}%.2f")
    s.stop()
  }
}

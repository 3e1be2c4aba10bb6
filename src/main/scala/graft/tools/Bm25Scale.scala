package graft.tools

import graft.Engine
import graft.operators.Retrieval
import org.apache.spark.sql.functions.col

/** SURVEY §6 scale evidence for the BM25 index split (round 8): time the
  * one-time index BUILD and the partition-pruned PROBE separately, at
  * sf0.1 and at ×64. The claim under test: probe wall is decoupled from
  * the corpus scan — the probe reads only the probed terms' bucket
  * directories (static IN on the `tb` partition column), so it grows with
  * the probed posting lists, not with a corpus rescan; the build is the
  * amortized one-time cost, exactly the ivfWriteIndex pattern.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.Bm25Scale"
  */
object Bm25Scale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale64")
    val s = Engine.session(cores = 32, appName = "graft-bm25scale")
    val docs = Engine.table(s, dir, "documents").select(col("doc_id"), col("text"))
    val queries = Seq(1 -> Seq("dup"), 2 -> Seq("spark", "join"),
      3 -> Seq("customer", "order", "fast"))
    val idx = s"/tmp/graft_bm25idx_${new java.io.File(dir).getName}"

    def best2(label: String)(work: => Unit): Double = {
      val ts = (1 to 2).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        work
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bm25scale] $label best=${ts.min}%.2fs " +
        f"(runs: ${ts.map(t => f"$t%.2f").mkString(",")})")
      ts.min
    }

    val build = best2("index build")(Retrieval.bm25WriteIndex(docs, idx))
    val probe = best2("probe k=10") {
      val n = Retrieval.bm25TopKIndexed(s, idx, queries, k = 10).count()
      require(n > 0, "probe returned no rows")
    }
    val oneShot = best2("one-shot (index-free)") {
      val n = Retrieval.bm25TopK(docs, queries, k = 10).count()
      require(n > 0, "one-shot returned no rows")
    }
    println(f"[bm25scale] dir=$dir build=$build%.2fs probe=$probe%.2fs " +
      f"oneShot=$oneShot%.2fs probe/oneShot=${probe / oneShot}%.2f")

    // INCREMENTAL INGEST (r17): the claim bm25AddBatch makes at 100 TB —
    // growing the index costs the BATCH's own two aggregation passes, not
    // a corpus rebuild. Build on 3/4 of the corpus, time ONE 1/4 batch
    // append, and compare against the full rebuild wall above; then check
    // the grown index probes identically to the one-shot build (the
    // delta-fold equivalence, asserted here at scale too, and the probe
    // wall is unchanged — generation row count per term bucket grows by
    // the batch count, not the corpus).
    val idxInc = s"${idx}_inc"
    // each timed append runs against a fresh 3/4 prime (untimed), so the
    // measurement isolates the BATCH cost
    val addRuns = (1 to 2).map { _ =>
      Retrieval.bm25WriteIndex(docs.filter(col("doc_id") % 4 =!= 0), idxInc)
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      Retrieval.bm25AddBatch(docs.filter(col("doc_id") % 4 === 0), idxInc)
      (System.nanoTime() - t0) / 1e9
    }
    val addW = addRuns.min
    println(f"[bm25scale] addBatch 1/4 corpus best=$addW%.2fs " +
      f"(runs: ${addRuns.map(t => f"$t%.2f").mkString(",")})")
    val ref = Retrieval.bm25TopKIndexed(s, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val grownProbe = best2("probe grown index k=10") {
      val got = Retrieval.bm25TopKIndexed(s, idxInc, queries, k = 10)
        .collect().map(_.toSeq).toSet
      require(got == ref, "grown index probe diverged from one-shot build")
    }
    println(f"[bm25scale] ingest: fullRebuild=$build%.2fs " +
      f"addBatch=$addW%.2fs grownProbe=$grownProbe%.2fs (rows equal)")
    s.stop()
  }
}

package graft.tools

import graft.Engine
import graft.operators.Retrieval
import org.apache.spark.sql.functions.col

/** SURVEY §6 scale evidence for the positional retrieval family (r15:
  * q373 phrase / q374 proximity / q378 snippets). Claims under test:
  *
  *  1. the PROBE reads only the phrase terms' bucket directories of the
  *     persisted positional index (static IN on `tb`) — its wall tracks
  *     the probed posting lists, while the index-free one-shot pays a
  *     full corpus retokenize every query; the probe/one-shot ratio is
  *     the decoupling measure (the Bm25Scale methodology).
  *  2. proximity's ±w window never becomes a range join — the bucketed
  *     equi-join keeps its wall within a small factor of exact phrase
  *     search at every scale.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.PhraseScale"
  * (point SF_DIR at a ScaleUp output for the ×N points).
  */
object PhraseScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Engine.session(cores = 32, appName = "graft-phrasescale")
    val docs = Engine.table(s, dir, "documents").select(col("doc_id"), col("text"))
    val phrases = Seq(1 -> Seq("spark", "join"), 2 -> Seq("big", "big"),
      3 -> Seq("the", "line", "sort"))
    val prox = Seq(1 -> Seq("spark", "join"),
      2 -> Seq("customer", "order", "fast"))
    val idx = s"/tmp/graft_phraseidx_${new java.io.File(dir).getName}"

    def best2(label: String)(work: => Unit): Double = {
      val ts = (1 to 2).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        work
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[phrasescale] $label best=${ts.min}%.2fs " +
        f"(runs: ${ts.map(t => f"$t%.2f").mkString(",")})")
      ts.min
    }

    val build = best2("index build")(Retrieval.phraseWriteIndex(docs, idx))
    val probe = best2("phrase probe k=10") {
      val n = Retrieval.phraseTopKIndexed(s, idx, phrases, k = 10).count()
      require(n > 0, "phrase probe returned no rows")
    }
    val proxP = best2("proximity probe w=3 k=10") {
      val n = Retrieval.proximityTopKIndexed(s, idx, prox, w = 3, k = 10).count()
      require(n > 0, "proximity probe returned no rows")
    }
    val snip = best2("snippets w=3 k=5 (one-shot)") {
      val n = Retrieval.snippetTopK(docs, prox, w = 3, k = 5).count()
      require(n > 0, "snippets returned no rows")
    }
    val snipIdx = best2("snippets w=3 k=5 (indexed)") {
      val n = Retrieval.snippetTopKIndexed(s, idx, prox, w = 3, k = 5).count()
      require(n > 0, "indexed snippets returned no rows")
    }
    val oneShot = best2("phrase one-shot (index-free)") {
      val n = Retrieval.phraseTopK(docs, phrases, k = 10).count()
      require(n > 0, "one-shot returned no rows")
    }
    // proximity one-shot: the ratio partner for the ±w window claim
    val proxOne = best2("proximity one-shot (index-free)") {
      val n = Retrieval.proximityTopK(docs, prox, w = 3, k = 10).count()
      require(n > 0, "one-shot proximity returned no rows")
    }
    // rrfHybridIndexed: persisted-BM25 lexical lists fused with dense
    // anchor lists — the probe side is term-bucket-pruned, the dense side
    // one bounded corpus scan; the claim is the fused probe wall tracks
    // the bounded lists, not the corpus (r15 VERDICT task 6)
    val bmIdx = s"/tmp/graft_bm25idx_${new java.io.File(dir).getName}"
    val bmBuild = best2("bm25 index build")(
      Retrieval.bm25WriteIndex(docs, bmIdx))
    val emb = Engine.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val anchors = {
      import s.implicits._
      // three anchor ids guaranteed present at any replication factor
      val ids = emb.select(col("id")).orderBy("id").limit(3)
        .as[Long].collect()
      Map(1 -> ids(0), 2 -> ids(1), 3 -> ids(2))
    }
    val hybridQs = Seq(1 -> Seq("dup"), 2 -> Seq("spark", "join"),
      3 -> Seq("customer", "order", "fast"))
    val hybrid = best2("rrfHybridIndexed n=20 k=10") {
      val n = Retrieval.rrfHybridIndexed(s, bmIdx, emb, hybridQs,
        anchors, n = 20, k = 10).count()
      require(n > 0, "hybrid fusion returned no rows")
    }
    println(f"[phrasescale] dir=$dir build=$build%.2fs probe=$probe%.2fs " +
      f"prox=$proxP%.2fs proxOne=$proxOne%.2fs snip=$snip%.2fs " +
      f"snipIdx=$snipIdx%.2fs oneShot=$oneShot%.2fs " +
      f"bmBuild=$bmBuild%.2fs hybrid=$hybrid%.2fs " +
      f"probe/oneShot=${probe / oneShot}%.2f " +
      f"prox/proxOne=${proxP / proxOne}%.2f")
    s.stop()
  }
}

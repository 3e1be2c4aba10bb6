package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the tokenizer-side operator of a
  * training-data pipeline (the reference has no tokenizer surface; this
  * extends the pack like [[Quantize]] does for embeddings).
  *
  * Classic byte-pair encoding trains on the word-frequency dictionary, not
  * the raw corpus: ONE corpus-wide shuffle builds `(word, freq)`, and every
  * merge iteration is an aggregation over that dict — at crawl scale the
  * dict is millions of rows where the corpus is billions, so the iterative
  * part runs on a table ~10³–10⁶× smaller than the input. The driver holds
  * only the per-iteration argmax pair and the final merge list
  * (O(nMerges) — the same bounded-collect contract as
  * [[AnnSearch]]'s centroids).
  *
  * Determinism: pair score ties break on the (left, right) component pair
  * ascending (NOT the concatenated string — the two differ when one left
  * token is a prefix of another), so the learned merge sequence is a pure
  * function of the corpus — rerun-stable and replayable by the spec's
  * sequential driver-side implementation. Pair counting weights every
  * adjacent occurrence (overlaps included), matching the oracle's
  * positional expansion in q184. Segmentation is by Unicode code point
  * ([[codePointSegs]]), matching the oracle's `substr`/`string_split`
  * character semantics on supplementary-plane text.
  */
object BpeTrain {

  /** Corpus word-frequency dictionary: the one corpus-wide shuffle. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ", -1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Initial BPE segmentation: one element per Unicode CODE POINT (a
    * surrogate pair stays one token), matching the oracle's `substr` /
    * `string_split(w, '')` character semantics. */
  private[graft] def codePointSegs(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var j = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out(j) = w.substring(i, i + n)
      i += n
      j += 1
    }
    out
  }

  /** Adjacent character-pair frequencies over the initial (per-code-point)
    * segmentation, weighted by word frequency — BPE iteration zero, the
    * oracle-checkable surface (q184). Top `k` by (count desc, pair asc). */
  def pairCounts(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = wordFreq(docs).as[(String, Long)]
      .mapPartitions(_.flatMap { case (w, f) =>
        val cp = codePointSegs(w)
        (0 until cp.length - 1).iterator.map(i => (cp(i) + cp(i + 1), f))
      })
      .toDF("pair", "wf")
    pairs.groupBy("pair").agg(sum("wf").as("cnt"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("pair"))))
      .filter(col("rk") <= k)
      .select(col("rk").cast("long").as("rk"), col("pair"), col("cnt"))
  }

  /** One left-to-right non-overlapping merge pass of (a, b) → a+b. */
  private[graft] def mergeSegs(segs: Array[String], a: String,
      b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](segs.length)
    var i = 0
    while (i < segs.length) {
      if (i < segs.length - 1 && segs(i) == a && segs(i + 1) == b) {
        out += a + b; i += 2
      } else { out += segs(i); i += 1 }
    }
    out.toArray
  }

  /** Free a superseded localCheckpoint generation. Dataset.unpersist is a
    * no-op here (checkpoint blocks live on the internal RDD, not in the
    * CacheManager) — unpersist the LogicalRDD leaf directly, the
    * [[Dedup.connectedComponents]] storage contract: two generations live
    * at once, not O(nMerges). */
  private def unpersistCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  private def pairScores(seg: Dataset[(String, Array[String], Long)])
      : DataFrame = {
    val spark = seg.sparkSession
    import spark.implicits._
    seg.mapPartitions(_.flatMap { case (_, segs, f) =>
        (0 until segs.length - 1).iterator.map(i => (segs(i), segs(i + 1), f))
      })
      .toDF("a", "b", "wf")
      .groupBy("a", "b").agg(sum("wf").as("cnt"))
  }

  /** Learn `nMerges` BPE merges. Each iteration aggregates pair scores over
    * the dict, collects ONLY the argmax row, and applies the merge in a
    * narrow map; the superseded segmentation generation is unpersisted (two
    * generations live at once — the [[Dedup.connectedComponents]] storage
    * contract). Stops early when no pair remains. Returns
    * (rk, left, right, merged, score). */
  def trainMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive (got $nMerges)")
    val spark = docs.sparkSession
    import spark.implicits._
    var seg: Dataset[(String, Array[String], Long)] =
      wordFreq(docs).as[(String, Long)]
        .map { case (w, f) => (w, codePointSegs(w), f) }
    seg = seg.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var done = false
    var it = 0
    while (it < nMerges && !done) {
      val top = pairScores(seg)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((it + 1L, a, b, a + b, cnt))
        val next = seg.map { case (w, segs, f) => (w, mergeSegs(segs, a, b), f) }
          .localCheckpoint()
        unpersistCheckpoint(seg)
        seg = next
      }
      it += 1
    }
    unpersistCheckpoint(seg)
    merges.toSeq.toDF("rk", "left", "right", "merged", "score")
  }

  /** Apply a learned merge list to each word (merges in rank order — the
    * standard BPE inference rule) and report per-doc token counts: raw
    * whitespace words, post-BPE subword tokens, and the compression ratio.
    * The merge list is tiny (O(vocab)) and ships as a broadcast closure;
    * the pass itself is narrow and shuffle-free. */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        val ms = bc.value
        rows.map { case (id, t) =>
          val ws = TextFeatures.words(t)
          var nTok = 0L
          ws.foreach { w =>
            var segs = codePointSegs(w)
            ms.foreach { case (a, b) => segs = mergeSegs(segs, a, b) }
            // an empty word is one (empty) token — string_split semantics,
            // and what the oracle's trim/split encoding yields
            nTok += math.max(segs.length, 1)
          }
          (id, ws.length.toLong, nTok,
            TextFeatures.round6(nTok.toDouble / math.max(ws.length, 1)))
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_tokens", "tokens_per_word")
  }
}

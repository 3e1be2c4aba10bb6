package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over the document corpus — BM25 (the Okapi
  * formula in its "Lucene" always-positive idf form, ln(1 + (N−df+0.5)/
  * (df+0.5))) as a distributed inverted-index scoring op. The reference
  * engine has no ranked retrieval, but a training-data pipeline needs it
  * constantly (RAG indexing, quality-by-query probes, targeted corpus
  * slicing), so it joins the dedup/ANN family as a first-class extension op.
  *
  * Determinism/oracle strategy (matches the pack-wide convention): the idf
  * is quantized to int64 micro-units immediately after the one `ln`, and
  * each posting's contribution is quantized again after the tf saturation
  * product — so the per-document score is an exact int64 SUM (order-free,
  * reproducible under any shuffle/AQE reordering), not a float sum. DuckDB
  * mirrors the identical IEEE ops on identical doubles; the only rounding
  * boundaries are per distinct (df) and per posting — verified green at
  * both SFs.
  *
  * Scale shape (100 TB): this is the index-then-probe pattern of
  * [[AnnSearch.ivfWriteIndex]] —
  *  - the corpus-wide stats (`tf`, `dl`, N/avgdl) are the one-time index
  *    build: two partial-aggregated shuffles over the token stream; the
  *    only driver materialization is the 2-scalar (N, avgdl) row;
  *  - a query probe touches ONLY the postings of its terms: the tiny
  *    (query_id, term) table broadcasts into the postings scan (an equi-join
  *    a bloom/DPP filter can push to the source when postings are written
  *    bucketed by term), df is aggregated for the probed terms alone, and
  *    candidates reduce through [[AnnSearch.partitionTopK]]'s bounded heaps
  *    before the global rank — the window input is O(partitions×|queries|×k),
  *    so a stop-word-ish term with 1e9 postings cannot pile its candidates
  *    into one window partition.
  */
object Retrieval {

  /** Tokenize on single spaces (the corpus convention shared with every
    * shingle/blocklist oracle in the pack: `string_split(text, ' ')`,
    * empties dropped). */
  private def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")

  /** BM25 top-k per query. `queries` = (query_id, terms); duplicate terms in
    * one query score like Lucene's default (each occurrence adds — callers
    * dedupe if they want pure OR semantics).
    *
    * Ranking key is the exact int64 micro-unit score (`wq` desc, doc_id asc)
    * — ties are bit-stable across engines; `score` = wq/1e6 rounded to 4
    * decimals for display.
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(queries.nonEmpty, "need at least one query")
    val spark = docs.sparkSession
    import spark.implicits._

    val tok = postings(docs)
    // index stats: term frequencies, then doc lengths DERIVED from tf
    // (dl = Σ_term tf) — the token stream is scanned and shuffled exactly
    // once; the second aggregation runs over the much smaller tf relation
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // the TWO corpus scalars (N, avgdl) — a bounded O(1) driver
    // materialization (the collectCentroids contract), traded for keeping
    // the scoring plan free of the 1-row BroadcastNestedLoopJoin a
    // crossJoin scalar-attach would plan. avgdl is one IEEE division on
    // exact integer aggregates — bit-identical to the oracle's.
    val gRow = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl")).head()
    val nDocs = gRow.getLong(0)
    val avgdl = gRow.getDouble(1)

    val qt = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    // df only for the probed terms: the broadcast semi-filter runs BEFORE
    // the per-term count, so the aggregation is over matched postings only
    val dfT = tf.join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    // idf in int64 micro-units — the single transcendental, quantized at
    // the per-distinct-df grain (O(|query terms|) rounding boundaries)
    val idf = dfT
      .withColumn("idfq",
        round(log((lit(nDocs).cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1e6)).cast("long"))
      .select(col("term"), col("idfq"))

    // per-posting contribution, quantized to int64 so the per-doc score is
    // an exact order-free SUM. tf saturation: tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    val tfD = col("tf").cast("double")
    val scored = tf.join(broadcast(qt), Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(idf), Seq("term"))
      .withColumn("w",
        round(col("idfq") * ((tfD * (lit(k1) + lit(1.0))) /
          (tfD + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * (col("dl").cast("double") / lit(avgdl)))))).cast("long"))
      .groupBy("query_id", "doc_id").agg(sum("w").as("wq"))

    // bounded partition-local heaps before the global rank (AnnSearch's
    // top-k reduction — wq < 2^53 so the double round-trip is exact)
    AnnSearch.partitionTopK(
        scored.select(col("query_id").cast("long").as("qid"),
          col("doc_id").as("cid"), col("wq").cast("double").as("cos")), k)
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").cast("int").as("query_id"), col("cid").as("doc_id"),
        col("rk").cast("bigint").as("rk"),
        round(col("cos").cast("long") / lit(1e6), 4).as("score"))
  }

  /** Two-stage hybrid retrieval — the standard RAG shape: a cheap lexical
    * candidate stage ([[bm25TopK]], `kCand` per query) re-ranked by
    * embedding cosine against a per-query anchor vector, keep `k`.
    * `queryVec` maps each query to its anchor's id in `emb` (in production
    * the anchor is the encoded query; anchoring to a corpus vector keeps
    * the pipeline self-contained and oracle-checkable). Cosine uses the
    * shared int64 quantization ([[AnnSearch.quantized]] + codegen'd
    * [[graft.functions.DotI64]]) — bit-identical across engines.
    *
    * Scale shape: the candidate set (|queries|×kCand rows) and the anchor
    * vectors (|queries| rows) BROADCAST into the corpus-embedding scan —
    * the embedding table never shuffles and is touched by exactly one
    * narrow probe join, the [[AnnSearch.bruteTopK]] corpus-side contract.
    */
  def bm25RerankTopK(docs: DataFrame, emb: DataFrame,
      queries: Seq[(Int, Seq[String])], queryVec: Map[Int, Long],
      kCand: Int, k: Int): DataFrame = {
    require(k >= 1 && kCand >= k, s"need kCand >= k >= 1 (got $kCand, $k)")
    require(queries.forall(q => queryVec.contains(q._1)),
      "every query needs an anchor vector id in queryVec")
    val spark = docs.sparkSession
    import spark.implicits._
    val cand = bm25TopK(docs, queries, kCand)
      .select(col("query_id"), col("doc_id"), col("rk").as("bm25_rk"))
    // quantization costs a kernel pass per row, so it runs AFTER each probe
    // filter: anchors quantize |queries| rows (static IN pushed to the
    // scan), candidates quantize ≤ |queries|×kCand survivors of the
    // broadcast semi-probe — never the whole embedding table
    val qv = queryVec.toSeq.toDF("query_id", "qvec_id")
    val anchors = AnnSearch.quantized(
        emb.filter(col("id").isin(queryVec.values.toSeq.map(Long.box): _*)))
      .join(broadcast(qv), col("id") === col("qvec_id"))
      .select(col("query_id"), col("qe").as("aqe"), col("n2").as("an"))
    val cv = AnnSearch.quantized(
      emb.join(broadcast(cand.select("doc_id").distinct()),
        col("id") === col("doc_id"), "left_semi"))
    val scored = cv.join(
        broadcast(cand.join(broadcast(anchors), Seq("query_id"))),
        col("id") === col("doc_id"))
      .withColumn("cos",
        AnnSearch.dotI64(col("aqe"), col("qe")).cast("double") /
          sqrt(col("an").cast("double") * col("n2").cast("double")))
    scored
      .withColumn("rerank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("doc_id"))))
      .filter(col("rerank") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25_rk"),
        col("rerank").cast("bigint").as("rerank"),
        round(col("cos"), 6).as("cos"))
  }
}

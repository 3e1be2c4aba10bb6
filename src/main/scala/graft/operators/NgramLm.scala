package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality scoring — the classic
  * "perplexity filter" of a web-crawl training pipeline (CCNet trains a
  * KenLM model on a clean reference corpus and buckets crawl documents into
  * head/middle/tail by per-token log-probability; Gopher and the Llama data
  * recipes apply the same split).
  *
  * The model here is an add-one-smoothed bigram LM trained on a
  * deterministic reference slice of the corpus itself
  * (`doc_id % 10 < 3` — the stand-in for "Wikipedia" in CCNet's setup):
  *
  *   P(c | p) = (count(p,c) + 1) / (ctx(p) + V)
  *
  * with `ctx(p)` the training occurrences of context `p` and `V` the
  * training vocabulary (distinct successor tokens). Every token sequence is
  * anchored by a `<s>` sentence-start marker so one-token documents still
  * score. Per-token log-probs are quantized to int64 micro-units after the
  * single `ln` (the [[Retrieval]] idf trick): the per-doc score is an exact
  * integer SUM — summation-order-free, so the DuckDB oracle hash-matches
  * bit-for-bit.
  *
  * Distributed shape (the 100 TB story):
  *   - bigram generation is a zero-shuffle codegen pass
  *     (`split` → `filter` → `zip_with(slice, slice)` → `explode`);
  *   - per-doc bigram counts partial-aggregate before the shuffle
  *     (map-side combine, the tf shape);
  *   - the model is dictionary-sized (unique bigrams of the reference — at
  *     crawl scale ~10²–10⁴× smaller than the token stream), so scoring is
  *     two hash equi-joins on uniform keys, corpus never broadcast;
  *   - the head/middle/tail split is a window over the PER-DOC score table
  *     (one narrow row per doc). `ntile` gives the exact CCNet tertiles and
  *     is what the oracle mirrors; at 100 TB the production path is
  *     [[bucketByCutoffs]] — approx-quantile cutoffs from a sample,
  *     broadcast as plain comparisons, no total order (the spec proves the
  *     two agree on balanced data).
  *
  * Reference framing: the reference engine has no LM surface — this extends
  * the training-pipeline pack the way [[BpeTrain]] does for tokenization.
  */
object NgramLm {

  /** micro-unit quantizer for one log-prob */
  private def qlp(c2: Column, c1: Column, v: Column): Column =
    round(log((c2 + lit(1)).cast("double") / (c1.cast("double") + v)) * lit(1e6))
      .cast("long")

  /** `(doc_id, p, c)` bigram stream with the `<s>` anchor, empty tokens
    * dropped. Zero shuffle: array ops fuse into the scan. */
  def bigrams(docs: DataFrame): DataFrame = {
    val t = concat(array(lit("<s>")),
      filter(split(col("text"), " ", -1), x => x =!= lit("")))
    docs
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), explode(
        zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (p, c) => struct(p.as("p"), c.as("c")))).as("b"))
      .select(col("doc_id"), col("b.p"), col("b.c"))
  }

  /** Bigram model over the reference slice: `(p, c, c2)` counts. */
  def model(docs: DataFrame, refPred: Column): DataFrame =
    bigrams(docs.filter(refPred)).groupBy("p", "c")
      .agg(count(lit(1)).as("c2"))

  /** Per-doc LM score: `(doc_id, n_bigrams, sum_qlp, avg_qlp)`.
    * `sum_qlp` is the exact int64 micro-unit log-prob sum; `avg_qlp` its
    * per-bigram mean re-quantized (the negated perplexity proxy). */
  def score(docs: DataFrame, refPred: Column): DataFrame = {
    val m = model(docs, refPred)
    val ctx = m.groupBy("p").agg(sum("c2").as("c1"))
    val v = m.agg(countDistinct("c").cast("double").as("vv"))
    val dbc = bigrams(docs).groupBy("doc_id", "p", "c")
      .agg(count(lit(1)).as("k"))
    dbc
      .join(m, Seq("p", "c"), "left")
      .join(ctx, Seq("p"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("k"),
        qlp(coalesce(col("c2"), lit(0L)), coalesce(col("c1"), lit(0L)),
          col("vv")).as("q"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"), sum(col("k") * col("q")).as("sum_qlp"))
      .withColumn("avg_qlp",
        round(col("sum_qlp").cast("double") / col("n_bigrams")).cast("long"))
  }

  /** CCNet head/middle/tail by exact tertiles of `avg_qlp` (highest
    * log-prob = lowest perplexity = head). Total-order window — the oracle
    * surface; see [[bucketByCutoffs]] for the no-total-order scale path. */
  def perplexityBuckets(docs: DataFrame, refPred: Column): DataFrame =
    score(docs, refPred)
      .withColumn("tile", ntile(3).over(
        Window.orderBy(col("avg_qlp").desc, col("doc_id"))))
      .withColumn("bucket",
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle").otherwise("tail"))
      .select("doc_id", "n_bigrams", "sum_qlp", "avg_qlp", "bucket")

  /** Scale path: bucket by precomputed cutoffs (e.g. `approx_percentile`
    * over a sample) — plain comparisons, zero shuffle past the score table,
    * no total order. `hi`/`lo` are avg_qlp thresholds: ≥ hi → head,
    * ≥ lo → middle, else tail. */
  def bucketByCutoffs(scored: DataFrame, hi: Long, lo: Long): DataFrame =
    scored.withColumn("bucket",
      when(col("avg_qlp") >= hi, "head")
        .when(col("avg_qlp") >= lo, "middle").otherwise("tail"))
}

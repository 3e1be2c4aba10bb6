package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling") — the
  * published recipe for choosing pre-training documents that *look like* a
  * target corpus: hashed n-gram bag-of-words models of the target and raw
  * distributions, per-document importance weight = Σ count(f)·log(p(f)/q(f)),
  * then Gumbel top-k resampling by weight.
  *
  * Everything is deterministic and cross-engine bit-exact in the pack's
  * house style:
  *   - features are unigrams + bigrams hashed to `buckets` ids with the
  *     shared 60-bit md5-prefix hash (the [[CorpusOps]] idiom — DuckDB
  *     computes the identical key);
  *   - both distributions are add-one smoothed; each `ln` is quantized to
  *     int64 micro-units immediately (the [[Retrieval]] idf trick), so a
  *     bucket's log-ratio λ(f) is one integer and a document's weight is an
  *     exact order-free integer SUM;
  *   - the Gumbel key derives from a keyed md5 (`-ln(-ln u)` with
  *     `u = (h60+1)/2^60+1`), re-quantized once — no engine RNG anywhere.
  *
  * Distributed shape (the 100 TB story): feature extraction is one narrow
  * codegen pass (split → filter → zip_with → explode); per-doc feature
  * counts partial-aggregate before their shuffle (the tf shape); the model
  * is at most `buckets` rows — λ broadcasts into the scoring join, so the
  * corpus is never shuffled by the model; the per-doc weight is a second
  * key-partitioned aggregate. The top-k window in [[resample]] runs over the
  * one-narrow-row-per-doc score table and is the oracle surface; at
  * production scale selection is a broadcast weight threshold from a sampled
  * quantile (the [[NgramLm.bucketByCutoffs]] pattern) — Gumbel keys make
  * that equivalent to weighted sampling without replacement.
  *
  * Reference framing: the reference engine has no data-selection surface —
  * this extends the training-pipeline pack alongside [[NgramLm]] (quality
  * perplexity) and [[CorpusOps]] (mixing/sampling).
  */
object Dsir {

  /** first 60 bits of md5 as a non-negative long — the shared cross-engine
    * hash (≡ `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` in DuckDB) */
  private def h60c(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** micro-unit quantizer of one smoothed log-prob `ln((c+1)/(tot+B))` */
  private def qln(c: Column, tot: Column, buckets: Int): Column =
    round(log((c + lit(1)).cast("double") / (tot + lit(buckets.toDouble)))
      * lit(1e6)).cast("long")

  /** Hashed n-gram feature counts `(doc_id, f, k, tgt)`: unigrams + bigrams
    * over whitespace tokens, bucketed by h60 mod `buckets`, with the
    * target-membership flag evaluated once per doc and carried through the
    * narrow explode (so the model build needs no second corpus join). Zero
    * shuffle until the count's partial agg; empty-text docs emit no rows
    * (re-attached by [[importance]]). */
  def features(docs: DataFrame, targetPred: Column, buckets: Int): DataFrame = {
    val t = filter(split(col("text"), " ", -1), x => x =!= lit(""))
    val grams = concat(col("t"),
      zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (p, c) => concat(p, lit(" "), c)))
    docs.select(col("doc_id"), targetPred.as("tgt"), t.as("t"))
      .select(col("doc_id"), col("tgt"), explode(grams).as("ng"))
      .select(col("doc_id"), col("tgt"),
        (h60c(col("ng")) % lit(buckets.toLong)).as("f"))
      .groupBy("doc_id", "f")
      .agg(count(lit(1)).as("k"), first(col("tgt")).as("tgt"))
  }

  /** Per-bucket integer log-ratio `λ(f) = qln_target(f) − qln_raw(f)`, from
    * ONE aggregation pass over the feature counts (raw and target counts as
    * conditional sums). At most `buckets` rows — broadcastable by
    * construction. */
  def logRatios(fc: DataFrame, buckets: Int): DataFrame = {
    val counts = fc.groupBy("f").agg(sum("k").as("cr"),
      coalesce(sum(when(col("tgt"), col("k"))), lit(0L)).as("ct"))
    val tot = counts.agg(sum("cr").cast("double").as("nr"),
      sum("ct").cast("double").as("nt"))
    counts.crossJoin(broadcast(tot))
      .select(col("f"),
        (qln(col("ct"), col("nt"), buckets)
          - qln(col("cr"), col("nr"), buckets)).as("lam"))
  }

  /** Per-doc importance: `(doc_id, n_feats, logw)` with
    * `logw = Σ k·λ(f)` (exact int64). Docs with no features score 0. */
  def importance(docs: DataFrame, targetPred: Column, buckets: Int): DataFrame = {
    val fc = features(docs, targetPred, buckets)
    val imp = fc
      .join(broadcast(logRatios(fc, buckets)), Seq("f"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_feats"), sum(col("k") * col("lam")).as("logw"))
    docs.select("doc_id").join(imp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw"), lit(0L)).as("logw"))
  }

  /** Gumbel top-k resampling: `g = logw + round(−ln(−ln u)·1e6)` with `u`
    * a keyed-hash uniform; `sel` marks the `k` largest keys (tie → lower
    * doc_id). Gumbel-keyed top-k IS weighted sampling without replacement
    * (Efraimidis-Spirakis), so the selected set is a faithful importance
    * resample — deterministically. The total-order window runs over one
    * narrow row per doc (the oracle surface); the scale path thresholds `g`
    * against a sampled quantile cutoff instead. */
  def resample(docs: DataFrame, targetPred: Column, buckets: Int,
      seed: String, k: Int): DataFrame =
    gumbelKeys(docs, targetPred, buckets, seed)
      .withColumn("sel", row_number().over(
        Window.orderBy(col("g").desc, col("doc_id"))) <= k)
      .select("doc_id", "n_feats", "logw", "g", "sel")

  /** The keyed score table `(doc_id, n_feats, logw, g)` both selectors
    * share — one narrow row per doc. */
  def gumbelKeys(docs: DataFrame, targetPred: Column, buckets: Int,
      seed: String): DataFrame = {
    val u = (h60c(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
      .cast("double") + lit(1.0)) / lit(1152921504606846977.0)
    importance(docs, targetPred, buckets)
      .withColumn("g", col("logw")
        + round(-log(-log(u)) * lit(1e6)).cast("long"))
  }

  /** Scale path ([[NgramLm.bucketByCutoffs]] shape): `sel` by comparing the
    * Gumbel key against a precomputed cutoff (e.g. `approx_percentile` over
    * a sample sized to the target fraction) — a broadcast comparison over
    * the keyed table, zero shuffle past it and no total order anywhere, so
    * selection cost stays flat per partition at any corpus size. Agrees
    * with [[resample]] whenever the cutoff is the k-th largest key (exact
    * at distinct keys — the Gumbel jitter makes ties measure-zero; an
    * approximate cutoff trades the exact k for a bounded rank error, the
    * documented approx-quantile contract). */
  def selectByCutoff(keyed: DataFrame, gCutoff: Long): DataFrame =
    keyed.withColumn("sel", col("g") >= gCutoff)
      .select("doc_id", "n_feats", "logw", "g", "sel")
}

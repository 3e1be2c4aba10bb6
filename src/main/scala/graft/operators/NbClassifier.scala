package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised text classification for corpus curation — the
  * "fastText classifier" stage of the LLM data pipelines (CCNet, Wenzek et
  * al. 2020, trains a linear classifier to keep Wikipedia-like pages;
  * LLaMA, Touvron et al. 2023, filters CommonCrawl with a
  * references-vs-random classifier; fastText itself, Joulin et al. 2016,
  * is the usual implementation and its headline task is language ID),
  * re-expressed as multinomial Naive Bayes with add-1 smoothing — the
  * closed-form member of the same linear-classifier family: training is
  * ONE counting aggregate (no iterations, no learning rate), scoring is a
  * broadcast join, and the decision function is the same
  * `argmax_c (log prior_c + Σ_w m_w · log p_c(w))` linear form fastText
  * learns by SGD. The reference engine has nothing in this family; its
  * nearest surface is the ngram frequency UDAFs
  * (`ql/.../udf/generic/GenericUDAFnGrams.java`) this reuses per class.
  *
  * Scale shape (the 100 TB contract):
  *  - the MODEL is dictionary-sized — `|vocab| × |classes|` log-prob rows
  *    plus one meta row per class — and is BROADCAST to score; the corpus
  *    is never shuffled by the model (same posture as [[NgramLm]]).
  *  - TRAINING is two map-side-combined aggregates over the labeled set
  *    (token counts per class, doc counts per class); the labeled set in
  *    production is a tiny fraction of the corpus.
  *  - SCORING is tokenize → per-(doc, token) count (one shuffle on doc
  *    id) → broadcast-join token log-probs → per-(doc, class) sum →
  *    per-doc argmax window (hash-partitioned by doc id, no global sort).
  *    Row amplification through scoring is bounded by |distinct tokens
  *    per doc| × |classes|: the (doc, token) count rows multiply only by
  *    the class count at the broadcast join (a few classes, not vocab),
  *    then collapse back to |docs| × |classes| before the argmax — no
  *    stage ever materializes |docs| × |vocab|.
  *
  * Determinism: no RNG anywhere (the train/held-out split is the caller's
  * keyed predicate), smoothing is exact rational `(n+1)/(N+V)`, and every
  * log is QUANTIZED to integer micro-nats (`round(ln·10⁶)` as LONG — the
  * [[Dsir]] fixed-point discipline) so scores are integer sums: bit-exact
  * under any summation order, any partitioning, and any engine. Argmax
  * ties break on class name.
  */
object NbClassifier {

  /** Lower-cased maximal `[a-z]+` runs — the shared cross-engine
    * tokenization (`regexp_split_to_array(lower(text),'[^a-z]+')` on the
    * oracle side). */
  def tokens(docs: DataFrame, idCols: Seq[String], textCol: String): DataFrame =
    docs.select(idCols.map(col) :+
        explode(split(lower(col(textCol)), "[^a-z]+")).as("w"): _*)
      .filter(length(col("w")) > 0)

  /** `round(ln(x)·10⁶)` as LONG — integer micro-nats. */
  private def qlog(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(log(x) * lit(1e6)).cast("long")

  /** A trained model: `tokenLp(c, w, lp)` — `ln((n_cw+1)/(N_c+V))` per
    * in-vocabulary token; `classMeta(c, priorLp, defaultLp)` — log prior
    * `ln(docs_c/docs)` and the unseen-token smoothing mass
    * `ln(1/(N_c+V))`. All logs in integer micro-nats; both frames
    * dictionary-sized, both broadcast at scoring. */
  final case class NbModel(tokenLp: DataFrame, classMeta: DataFrame)

  /** Fit multinomial NB on labeled docs (`labelCol` is the class). */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): NbModel = {
    val tok = tokens(docs, Seq(idCol, labelCol), textCol)
    val cw = tok.groupBy(col(labelCol).as("c"), col("w"))
      .agg(count(lit(1)).as("n"))
    val nc = cw.groupBy("c").agg(sum("n").as("nTot"))
    val v = cw.select("w").distinct().count()
    val docsPerClass = docs.groupBy(col(labelCol).as("c"))
      .agg(count(lit(1)).as("d"))
    val totalDocs = docs.count()
    val tokenLp = cw.join(nc, "c")
      .select(col("c"), col("w"),
        qlog((col("n") + lit(1)).cast("double") /
          (col("nTot") + lit(v)).cast("double")).as("lp"))
    val classMeta = docsPerClass.join(nc, Seq("c"), "left")
      .select(col("c"),
        qlog(col("d").cast("double") / lit(totalDocs.toDouble)).as("priorLp"),
        qlog(lit(1.0) / (coalesce(col("nTot"), lit(0L)) + lit(v))
          .cast("double")).as("defaultLp"))
    NbModel(tokenLp, classMeta)
  }

  /** Score docs against every class and keep the argmax:
    * `(idCol, pred, margin)` where `margin` is the winning score minus the
    * runner-up's (0 when only one class exists — nothing to beat). Ties
    * break on class name.
    *
    * Row-amplification bound: both crossJoins below multiply by the
    * BROADCAST class list only — the per-token one amplifies the
    * (doc, distinct-token) counts to at most `|that| × |classes|` narrow
    * rows (a handful of classes in practice, never `|vocab|`), collapsing
    * back to `|docs| × |classes|` at the score aggregate; the empty-doc
    * one amplifies only the tokenless remainder. No stage is ever
    * `|docs| × |vocab|`, and the corpus is never shuffled by the model. */
  def predict(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val dt = tokens(docs, Seq(idCol), textCol)
      .groupBy(idCol, "w").agg(count(lit(1)).as("m"))
    val classes = broadcast(model.classMeta)
    val perClassTok = dt.crossJoin(classes.select("c"))
      .join(broadcast(model.tokenLp), Seq("c", "w"), "left")
    val scored = perClassTok
      .join(classes, "c")
      .groupBy(col(idCol), col("c"))
      .agg((first("priorLp") +
        sum(col("m") * coalesce(col("lp"), col("defaultLp")))).as("score"))
    // docs with ZERO tokens never enter dt: give them prior-only scores
    val empty = docs.select(col(idCol))
      .join(dt.select(idCol).distinct(), Seq(idCol), "left_anti")
      .crossJoin(classes.select(col("c"), col("priorLp").as("score")))
    val all = scored.unionByName(empty.select(col(idCol), col("c"), col("score")))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("c"))
    all.withColumn("rn", row_number().over(w))
      .withColumn("margin",
        col("score") - coalesce(
          lead(col("score"), 1).over(w), col("score")))
      .filter(col("rn") === 1)
      .select(col(idCol), col("c").as("pred"), col("margin"))
  }
}

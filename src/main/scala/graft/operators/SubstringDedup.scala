package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication, the ExactSubstr recipe of Lee et al. 2021
  * ("Deduplicating Training Data Makes Language Models Better"): spans that
  * appear verbatim in more than one document are CUT from every document
  * (the paper shows train-set substring dedup beats whole-doc dedup for LM
  * quality). The reference engine has no such surface — this extends the
  * training-pipeline pack next to [[Dedup]] (whole-doc/near-dup) and
  * [[TextNGrams]].
  *
  * Distributed re-expression: the paper builds one giant suffix array —
  * inherently single-machine. The shuffle-friendly equivalent is a k-token
  * shingle inventory (granularity: only duplicated runs of ≥ k tokens are
  * caught, the same resolution every fingerprint method accepts —
  * [[graft.queries.Pipeline]] q49 winnowing makes the identical tradeoff):
  *
  *  1. explode each doc into its k-shingles with start positions — one
  *     narrow codegen pass, no shuffle;
  *  2. document frequency per shingle hash (ONE shuffle, partial-agg
  *     combines upstream) → the duplicated-hash set;
  *  3. join marks back (second shuffle, both sides narrow ids+hashes);
  *  4. per-doc island merge of overlapping [i, i+k-1] mark intervals — a
  *     doc_id-partitioned window (running max of interval ends), so the
  *     merge parallelizes per doc with NO global order anywhere;
  *  5. cut: tokens inside any island drop via an index-aware array filter
  *     against the doc's own (join-materialized) island list — map-side,
  *     codegen, O(tokens × islands) per doc.
  *
  * Every hash is the cross-engine md5 of the space-joined tokens, so a
  * DuckDB oracle reproduces the op bit-for-bit.
  */
object SubstringDedup {

  /** `(doc_id, n_tokens, n_removed, clean_text)` — duplicated cross-doc
    * runs of ≥ k tokens excised from every document carrying them. Docs
    * with fewer than k tokens (or nothing duplicated) pass through. */
  def dedupSubstrings(docs: DataFrame, k: Int = 5): DataFrame = {
    val t = filter(split(col("text"), " ", -1), x => x =!= lit(""))
    val tok = docs.select(col("doc_id"), t.as("t"))
    // shingle starts 1..n-k+1 (guard: Spark's sequence() runs DESCENDING
    // for start > stop, so short docs must map to an empty array)
    val sh = tok.select(col("doc_id"),
        explode(when(size(col("t")) >= k,
          sequence(lit(1), size(col("t")) - (k - 1))).otherwise(
          array().cast("array<int>"))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", slice(col("t"), col("i"), lit(k)))).as("h"))
    val dup = sh.groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") > 1)
      .select("h")
    val marks = sh.join(dup, Seq("h"))
      .select(col("doc_id"), col("i").as("lo"), (col("i") + k - 1).as("hi"))
    // island merge: an interval starts a new island iff it begins past the
    // running max end of everything before it (doc-partitioned, lo-ordered)
    val byDoc = Window.partitionBy("doc_id").orderBy("lo")
    val prevMax = max("hi").over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = marks
      .withColumn("fresh",
        when(col("lo") > coalesce(prevMax, lit(-1)), 1).otherwise(0))
      .withColumn("island", sum("fresh").over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("lo").as("lo"), max("hi").as("hi"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("lo"), col("hi"))).as("isl"))
    tok.join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("t")).as("n_tokens"),
        when(col("isl").isNull, col("t")).otherwise(
          // 1-based positions against the island ranges; `isl` is a
          // join-materialized attribute, safe inside the lambda
          filter(col("t"), (_, ix) => !exists(col("isl"),
            r => ix + 1 >= r("lo") && ix + 1 <= r("hi")))).as("clean"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("clean"))).as("n_removed"),
        concat_ws(" ", col("clean")).as("clean_text"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** n-gram frequency analysis over a text column.
  *
  * Hive analog: `ngrams` / `context_ngrams` UDAFs
  * (`ql/.../udf/generic/GenericUDAFnGrams.java`,
  * `GenericUDAFContextNGrams.java`, registered at
  * `exec/FunctionRegistry.java:402-403`). Hive's versions are heap-bounded
  * *estimates*; ours are exact — computed as a distributed explode →
  * partial+final count → top-k, which stays scalable because the
  * intermediate is (ngram, partial count) pairs, never a per-group buffer.
  */
object TextNGrams {

  /** Tokenize: whitespace split, empties dropped. All codegen'd HOFs. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** The array of n-grams (space-joined) of `words`. */
  def ngramsOf(words: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(words) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(words, i, lit(n))))

  /** Exact top-k n-grams by frequency over `text`; ties broken by ngram.
    * Output: (ngram STRING, freq BIGINT). */
  def topK(df: DataFrame, text: Column, n: Int, k: Int): DataFrame =
    df.select(explode(ngramsOf(tokens(text), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("ngram"))
      .limit(k)

  /** Hive context_ngrams: count the words that fill the null slots of
    * `context` (e.g. Seq(Some("the"), None) = words following "the").
    * Exact top-k. Output: (gram STRING, freq BIGINT) where gram is the
    * space-joined filler words. */
  def contextTopK(df: DataFrame, text: Column,
      context: Seq[Option[String]], k: Int): DataFrame = {
    val n = context.length
    val grams = df.select(explode(ngramsOf(tokens(text), n)).as("gram"))
      .select(split(col("gram"), " ").as("ws"))
    val matches = context.zipWithIndex.collect { case (Some(w), i) =>
      element_at(col("ws"), i + 1) === w
    }.reduceOption(_ && _).getOrElse(lit(true))
    val fillers = context.zipWithIndex.collect { case (None, i) =>
      element_at(col("ws"), i + 1)
    }
    grams.filter(matches)
      .select(concat_ws(" ", fillers: _*).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("gram"))
      .limit(k)
  }
}

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
  *
  * The tokenize+gram stage is a compiled flatMap ([[TextFeatures]] rationale:
  * Catalyst HOF lambdas re-evaluate a referenced non-attribute producer per
  * element — the split ran O(words²) per doc in the HOF formulation).
  */
object TextNGrams {

  /** Whitespace tokens, empties dropped. */
  private def toks(t: String): Array[String] = t.split(" ", -1).filter(_.nonEmpty)

  private def grams(t: String, n: Int): Iterator[String] = {
    val ws = toks(t)
    if (ws.length < n) Iterator.empty
    else (0 to ws.length - n).iterator.map(i => ws.slice(i, i + n).mkString(" "))
  }

  /** Exact top-k n-grams by frequency over `text`; ties broken by ngram.
    * Output: (ngram STRING, freq BIGINT). */
  def topK(df: DataFrame, text: Column, n: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(text.cast("string")).as[String]
      .mapPartitions(_.flatMap(t => grams(t, n)))
      .toDF("ngram")
      .groupBy("ngram").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("ngram"))
      .limit(k)
  }

  /** Hive context_ngrams: count the words that fill the null slots of
    * `context` (e.g. Seq(Some("the"), None) = words following "the").
    * Exact top-k. Output: (gram STRING, freq BIGINT) where gram is the
    * space-joined filler words. */
  def contextTopK(df: DataFrame, text: Column,
      context: Seq[Option[String]], k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = context.length
    val ctx = context.toArray
    df.select(text.cast("string")).as[String]
      .mapPartitions(_.flatMap { t =>
        val ws = toks(t)
        (0 to ws.length - n).iterator.flatMap { i =>
          var ok = true
          var j = 0
          while (ok && j < n) {
            ctx(j) match {
              case Some(w) => ok = ws(i + j) == w
              case None => ()
            }
            j += 1
          }
          if (ok) {
            val fillers = for ((c, j) <- ctx.zipWithIndex if c.isEmpty)
              yield ws(i + j)
            Iterator.single(fillers.mkString(" "))
          } else Iterator.empty
        }
      })
      .toDF("gram")
      .groupBy("gram").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("gram"))
      .limit(k)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters over an unbounded domain: a Misra–Gries frequent-items
  * sketch (Misra & Gries 1982; the "space-saving" family) followed by an
  * exact recount of the sketch's candidates — the classic two-pass scheme
  * that returns EXACT heavy hitters in O(m) memory per task no matter how
  * many distinct values the column has. The reference ships the same idea
  * as its ngram estimator (`ql/.../udf/generic/GenericUDAFnGrams.java` —
  * a bounded frequency map with periodic trim, approximate counts); the
  * two-pass form trades one extra narrow scan for exactness.
  *
  * Why not a plain `GROUP BY … HAVING count ≥ T` at 100 TB: that shuffles
  * EVERY distinct value (url, user id, shingle) — the aggregation state
  * is the domain size. Here pass 1 is a mergeable m-entry summary (map
  * partial aggregation, merge = counter-join + trim — mergeability per
  * Agarwal et al. 2012, "Mergeable Summaries"), so the only shuffle is
  * O(m) rows; pass 2 recounts ONLY candidate values via a broadcast
  * semi-join (no full-domain shuffle, candidate rows only). The
  * Misra–Gries guarantee makes pass 2 complete: with m counters every
  * value of true frequency > N/(m+1) survives the sketch, so for any
  * threshold T > N/(m+1) the recounted-and-filtered candidates are
  * EXACTLY the values with count ≥ T — bit-equal to the full GROUP BY,
  * provably, which is what the oracle checks.
  */
object HeavyHitters {

  /** Mergeable Misra–Gries summary over strings with `m` counters. The
    * finished value is the candidate set (counts inside the sketch are
    * estimates and deliberately not exposed — the exact pass recounts). */
  final class MisraGries(m: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(m >= 1, "need at least one counter")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(v) => b.updated(x, v + 1)
        case None if b.size < m => b.updated(x, 1L)
        case None => // decrement-all step: drops counters hitting zero
          b.flatMap { case (k, v) => if (v > 1) Some(k -> (v - 1)) else None }
      }

    /** Counter-join then subtract the (m+1)-th largest weight from all —
      * the standard MG merge preserving the N/(m+1) guarantee. */
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = a ++ b.map { case (k, v) => k -> (a.getOrElse(k, 0L) + v) }
      if (sum.size <= m) sum
      else {
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
        sum.flatMap { case (k, v) =>
          if (v - cut > 0) Some(k -> (v - cut)) else None }
      }
    }

    def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Candidate heavy hitters of `valueCol`: ≤ m values, guaranteed to
    * include every value with true count > N/(m+1). One pass, O(m) state
    * per task, O(m) rows shuffled. */
  def candidates(df: DataFrame, valueCol: Column, m: Int): Seq[String] = {
    val agg = udaf(new MisraGries(m), Encoders.STRING)
    df.select(agg(valueCol.cast("string")).as("cand"))
      .collect().head.getSeq[String](0)
  }

  /** One-pass bounded summary of `valueCol` — the ≤m-entry counter map
    * itself, which is what an INCREMENTAL pipeline persists between
    * batches: summaries are mergeable (Agarwal et al. 2012), and the
    * merge of per-batch summaries carries the SAME N_total/(m+1)
    * guarantee as a single pass over the union, so heavy hitters can be
    * tracked forever in O(m) state with no rescan. Driver-side size is
    * ≤m entries. */
  def summarize(df: DataFrame, valueCol: Column, m: Int): Map[String, Long] = {
    val agg = udaf(new MisraGriesCounters(m), Encoders.STRING)
    df.select(agg(valueCol.cast("string")).as("s"))
      .collect().head.getMap[String, Long](0).toMap
  }

  /** Merge two persisted summaries under the m-counter bound. */
  def mergeSummaries(a: Map[String, Long], b: Map[String, Long],
      m: Int): Map[String, Long] = new MisraGries(m).merge(a, b)

  /** [[MisraGries]] with the counter map as the finished value (for
    * [[summarize]]; the candidate-only form deliberately hides the
    * in-sketch estimates). */
  final class MisraGriesCounters(m: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    private val inner = new MisraGries(m)
    def zero: Map[String, Long] = inner.zero
    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      inner.reduce(b, x)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      inner.merge(a, b)
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** EXACT heavy hitters from an externally-maintained candidate set
    * (e.g. a merged incremental summary): recount candidates only via
    * the broadcast semi-join, filter by `minCount`. The caller owns the
    * guarantee that `minCount` exceeds the summary's error bound. */
  def exactFromCandidates(df: DataFrame, valueCol: Column,
      cand: Seq[String], minCount: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val candDf = cand.toDF("value")
    df.select(valueCol.cast("string").as("value"))
      .join(broadcast(candDf), "value")
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** EXACT heavy hitters `(value, cnt)` with count ≥ `minCount`, valid for
    * any `minCount > N/(m+1)` (enforced): sketch pass for candidates, then
    * an exact recount of candidate rows only (broadcast semi-join — the
    * corpus never group-bys its full domain). */
  def exact(df: DataFrame, valueCol: Column, m: Int,
      minCount: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    require(minCount > n / (m + 1),
      s"minCount=$minCount is below the sketch guarantee N/(m+1)=" +
        s"${n / (m + 1)}: raise minCount or the counter budget m")
    exactFromCandidates(df, valueCol, candidates(df, valueCol, m), minCount)
  }
}

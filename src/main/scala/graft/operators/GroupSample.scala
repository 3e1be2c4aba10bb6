package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Consistent per-group bottom-k (minwise) sampling: a uniform
  * without-replacement sample of k rows per group, keyed by a
  * deterministic md5 hash, computed as a MERGEABLE bottom-k sketch
  * (Cohen & Kaplan 2007, "Summarizing data using bottom-k sketches";
  * mergeability per Agarwal et al. 2012). The reference's sampling
  * surface is TABLESAMPLE (`ql/.../parse/SplitSample.java` — percent /
  * bucket / first-N of the WHOLE table); per-group uniform sampling there
  * requires the rank-over-random window idiom, which is what the oracle
  * runs.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY hash)` at 100 TB:
  * the window shuffles and SORTS every row of the corpus just to keep k
  * per group. Here the sketch is an ordinary aggregation: map-side
  * partials keep ≤ k (hash, id) pairs per group, so the shuffle carries
  * O(groups × k) rows per input partition and nothing is globally
  * sorted. Spark plans the typed buffer through ObjectHashAggregate with
  * its sort-based spill fallback, so state stays bounded even with many
  * groups per partition.
  *
  * The hash is the repo's standard keyed md5 (`md5(seed || ":" || id)`,
  * 60-bit hex prefix — cross-engine bit-exact), so "random" is
  * deterministic, append-stable, and rerun-stable: the same row keeps the
  * same draw across engines and across reruns, and the sample of a grown
  * corpus differs only where new rows displace old ones — the property
  * that makes the sample CONSISTENT for incremental pipelines (and makes
  * the result hash-checkable against the window-idiom oracle).
  */
object GroupSample {

  /** Mergeable bottom-k summary over (hash, id) pairs: keeps the k
    * smallest by (hash, id), ascending. Ties (md5 collisions) break on id
    * so the result is total-order deterministic. */
  final class BottomK(k: Int)
      extends Aggregator[(Long, Long), Vector[(Long, Long)], Seq[Long]] {
    require(k >= 1, "need k >= 1")

    private val ord = Ordering.Tuple2[Long, Long]

    def zero: Vector[(Long, Long)] = Vector.empty

    def reduce(b: Vector[(Long, Long)], x: (Long, Long)): Vector[(Long, Long)] =
      // fast path: buffer full and x above the current k-th smallest —
      // O(1) for almost every row once the sketch saturates
      if (b.length == k && ord.gteq(x, b.last)) b
      else {
        val i = b.indexWhere(ord.gt(_, x))
        val ins = if (i < 0) b :+ x else (b.take(i) :+ x) ++ b.drop(i)
        if (ins.length > k) ins.dropRight(1) else ins
      }

    def merge(a: Vector[(Long, Long)], b: Vector[(Long, Long)]): Vector[(Long, Long)] = {
      // merge two sorted runs, truncate to k
      val out = Vector.newBuilder[(Long, Long)]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    /** ids of the k minimum hashes, in hash order (deterministic). */
    def finish(b: Vector[(Long, Long)]): Seq[Long] = b.map(_._2)

    def bufferEncoder: Encoder[Vector[(Long, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Bounded top-k by VALUE per group — the generalized form of the
    * minwise sample (same mergeable bounded-buffer machinery, but ordered
    * by a caller value instead of a hash draw): keeps the k largest
    * `(value, id)` pairs, value DESC with id ASC tie-break, as ≤k-entry
    * map-side partials. The window idiom (`row_number() OVER (PARTITION
    * BY g ORDER BY v DESC)`) shuffles and sorts every row to keep k; this
    * shuffles O(groups×k). Stored internally as (−value, id) ascending so
    * the [[BottomK]] insert/merge logic is shared by construction. */
  final class TopKByValue(k: Int)
      extends Aggregator[(Long, Long), Vector[(Long, Long)], Seq[(Long, Long)]] {
    private val inner = new BottomK(k)
    def zero: Vector[(Long, Long)] = inner.zero
    def reduce(b: Vector[(Long, Long)], x: (Long, Long)): Vector[(Long, Long)] = {
      require(x._1 != Long.MinValue, "value Long.MinValue unsupported (negation)")
      inner.reduce(b, (-x._1, x._2))
    }
    def merge(a: Vector[(Long, Long)], b: Vector[(Long, Long)]): Vector[(Long, Long)] =
      inner.merge(a, b)
    def finish(b: Vector[(Long, Long)]): Seq[(Long, Long)] =
      b.map { case (nv, id) => (-nv, id) } // value DESC, id ASC — rank order
    def bufferEncoder: Encoder[Vector[(Long, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  }

  /** Exact top-k rows per group by `valueCol` (integral), DESC with
    * `idCol` ASC tie-break: returns `(groupCols..., rk, idCol, valueCol)`
    * with `rk` 1-based — bit-equal to the rank-over-value window idiom,
    * at O(groups×k) shuffle cost. */
  def topKBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKByValue(k), ExpressionEncoder[(Long, Long)]())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(valueCol).cast("long"), col(idCol).cast("long")).as("_top"))
      .select(groupCols.map(col) :+
        posexplode(col("_top")).as(Seq("_pos", "_pair")): _*)
      .select(groupCols.map(col) :+ (col("_pos") + 1).cast("int").as("rk") :+
        col("_pair._2").as(idCol) :+ col("_pair._1").as(valueCol): _*)
  }

  /** 60-bit md5-prefix of `seed:id` — the repo's cross-engine hash. */
  def drawHash(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed), lit(":"), id.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Uniform k-per-group sample of `df`: returns `(groupCols..., idCol)`
    * rows of the selected sample (join back on the id for payload
    * columns). One aggregation, O(groups × k) shuffled rows, no window
    * sort. */
  def bottomK(df: DataFrame, groupCols: Seq[String], idCol: String,
      seed: String, k: Int): DataFrame = {
    val agg = udaf(new BottomK(k), ExpressionEncoder[(Long, Long)]())
    df.select(groupCols.map(col) :+ drawHash(seed, col(idCol)).as("_h")
        :+ col(idCol).as("_id"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("_h"), col("_id")).as("_sample"))
      .select(groupCols.map(col) :+ explode(col("_sample")).as(idCol): _*)
  }
}

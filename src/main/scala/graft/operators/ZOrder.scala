package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * layout lever behind Delta's `OPTIMIZE ... ZORDER BY` and the classic
  * UB-tree literature (Orenstein & Merrett 1984; Bayer's UB-tree): sort a
  * table by the bit-interleaving of its filter columns' bucket ids so that
  * every output FILE covers a narrow hyper-rectangle of the filter space.
  * Parquet then answers a selective predicate on ANY clustered column by
  * skipping whole files/row groups on footer min/max stats — where a
  * single-column sort leaves every non-leading column's per-file range at
  * the full domain (no skipping at all). The reference engine has no
  * multi-dimensional clustering (its nearest ideas are bucketing and list
  * bucketing, both single-key); at 100 TB this is the difference between
  * a 2-D slice query scanning ~1/√files and scanning everything.
  *
  * Spark-first shape: per-column min/max is ONE aggregate; bucket ids are
  * `width_bucket` (codegen'd); the z-value is a fixed sum of shift/mask
  * terms (pure bit arithmetic, stays inside whole-stage codegen);
  * `repartitionByRange(z)` gives each output partition a contiguous
  * z-range (range exchange with sampling — no global sort), and
  * `sortWithinPartitions(z)` orders row groups inside each file. Order
  * survives the trailing projection that drops the helper column (a
  * projection is narrow), so the written files inherit the clustering.
  *
  * Uniform buckets (not quantiles) keep the build one pass; heavy skew in
  * a filter column degrades its skipping toward the single-sort case but
  * never below it — swap in approx-quantile boundaries upstream if a
  * column needs it.
  */
object ZOrder {

  /** Cluster `df` into `numFiles` z-ordered output partitions on `cols`.
    * Content-preserving: same rows, different physical order/layout. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bitsPerCol: Int = 10): DataFrame = {
    require(cols.size >= 2,
      "z-order needs at least two columns (one column = plain sort)")
    require(cols.size * bitsPerCol <= 62, "z-value must fit in a long")
    require(numFiles > 0, "numFiles must be positive")
    // numeric projection for bucketing: DATE needs the timestamp hop
    // (a direct date→double cast is NULL, which would collapse the whole
    // dimension into one bucket and silently disable its skipping)
    def num(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.DateType =>
          col(c).cast("timestamp").cast("double")
        case _ => col(c).cast("double")
      }
    val stats = df.agg(
      lit(0).as("_"),
      cols.flatMap(c => Seq(
        min(num(c)).as(s"lo_$c"),
        max(num(c)).as(s"hi_$c"))): _*).head()
    val n = 1 << bitsPerCol
    val buckets = cols.zipWithIndex.map { case (c, ci) =>
      val lo = Option(stats.getAs[Any](s"lo_$c"))
        .map(_.toString.toDouble).getOrElse(0.0)
      val hi0 = Option(stats.getAs[Any](s"hi_$c"))
        .map(_.toString.toDouble).getOrElse(1.0)
      val hi = if (hi0 > lo) hi0 else lo + 1.0
      // width_bucket is 1-based and returns n+1 at the upper bound;
      // clamp into [0, n-1] and send NULL to 0
      val b = width_bucket(coalesce(num(c), lit(lo)),
        lit(lo), lit(hi), lit(n)) - 1
      (greatest(lit(0L), least(lit(n - 1L), b)), ci)
    }
    val ncols = cols.size
    val z = (0 until bitsPerCol).flatMap { i =>
      buckets.map { case (b, ci) =>
        shiftleft(shiftright(b, i).bitwiseAND(1), i * ncols + ci)
      }
    }.reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

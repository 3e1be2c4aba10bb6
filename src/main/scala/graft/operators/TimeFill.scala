package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill + forward fill — the resampling step every
  * metrics/feature pipeline runs after bucketing (kdb+ `fills`, pandas
  * `resample().ffill()`, TimescaleDB `time_bucket_gapfill` + `locf`):
  * densify each key's sparse bucket series to a regular spine and carry
  * the last observation into the gaps. The reference engine has no such
  * surface; with [[AsofJoin]] and [[RangeJoin]] this completes the
  * time-series trio.
  *
  * Spark-first shape: per-key bounds are one partial-aggregated groupBy;
  * the spine is a generated `sequence()` EXPLODE off those bounds (spine
  * rows never shuffle as input — they are born on the executors); one
  * left join attaches the sparse observations; one per-key window carries
  * `last(value, ignoreNulls)` forward. Spine size is bounded by
  * (range/step) per key — the caller picks the step, exactly the
  * time_bucket_gapfill contract. No global order anywhere.
  */
object TimeFill {

  /** Densify `(keys…, bucket, value…)` rows to every `step`-spaced bucket
    * between each key's min and max observed bucket. Output columns:
    * keys…, bucket, and for each value column `v`: the observed `v`
    * (NULL in gaps) and `v_ffill` (last observation carried forward).
    * Input must have at most one row per (keys, bucket) — pre-aggregate
    * upstream: a duplicate bucket would DUPLICATE its spine row through
    * the left join (unlike [[AsofJoin]], which only mis-picks a payload).
    * `checkUnique = true` asserts that eagerly (one narrow count) instead
    * of letting the fan-out surface downstream. */
  def gapFillForward(obs: DataFrame, keys: Seq[String], bucket: String,
      step: Long, valueCols: Seq[String],
      checkUnique: Boolean = false): DataFrame = {
    require(step > 0, "step must be positive")
    require(valueCols.nonEmpty, "need at least one value column")
    if (checkUnique) {
      val dup = obs.groupBy((keys :+ bucket).map(col): _*)
        .count().filter(col("count") > 1).limit(1).count()
      require(dup == 0, s"gap-fill input has duplicate (${keys.mkString(",")}" +
        s", $bucket) rows — pre-aggregate upstream or each duplicate " +
        "bucket multiplies its spine row through the join")
    }
    val bounds = obs.groupBy(keys.map(col): _*)
      .agg(min(col(bucket)).as("__lo"), max(col(bucket)).as("__hi"))
    val spine = bounds.select(keys.map(col) :+
      explode(sequence(col("__lo"), col("__hi"), lit(step))).as(bucket): _*)
    val joined = spine.join(obs, keys :+ bucket, "left")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, 0)
    valueCols.foldLeft(joined) { (df, v) =>
      df.withColumn(s"${v}_ffill", last(col(v), ignoreNulls = true).over(w))
    }
  }
}

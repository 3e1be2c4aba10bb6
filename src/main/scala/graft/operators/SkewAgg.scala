package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed grouping keys — the Spark-first
  * re-expression of Hive's `hive.groupby.skewindata` two-MR-stage plan
  * (`parse/SemanticAnalyzer.java:5879` genGroupByPlan2MR): stage 1 groups on
  * (key, salt) computing partial aggregates so a hot key spreads over
  * `nSalts` reducers; stage 2 merges the partials per key.
  *
  * Spark's map-side partial aggregation already bounds per-key skew for
  * decomposable aggregates UNLESS the map-side hash degrades (many distinct
  * keys per mapper) — the explicit salt guarantees the bound regardless.
  * Result is identical to a direct groupBy for any decomposable aggregate;
  * avg is derived as merged sum / merged count.
  *
  * The salt is `pmod(hash(saltBy), nSalts)` — deterministic per row (safe
  * under task retries), uniform when `saltBy` varies within a hot key.
  */
object SkewAgg {

  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBy: Column, nSalts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltBy), lit(nSalts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        // count(valueCol), not count(*): SQL avg/count skip NULLs, and the
        // contract is exact equality with a direct groupBy
        count(col(valueCol)).as("__n"),
        sum(col(valueCol)).as("__sum"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__sum")).as("sv"),
        min(col("__min")).as("mn"),
        max(col("__max")).as("mx"))
      .withColumn("av", col("sv") / col("n"))
  }
}

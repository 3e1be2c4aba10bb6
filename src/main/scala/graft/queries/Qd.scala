package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark build plus (when SQL-expressible) the DuckDB
  * oracle. Column names are aliased identically on both sides and every
  * query ends in a deterministic ORDER BY so the driver's hash compare is
  * stable. Float aggregates are rounded on BOTH sides to mask summation-order
  * ulp differences between engines.
  */
final case class Qd(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object Qd {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Qd =
    Qd(name, Some(oracle.stripMargin), build)

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): Qd =
    Qd(name, None, build)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — queries map (one per implemented operator, SURVEY.md §2)
  * plus DuckDB oracle SQL per query. Column names are aliased identically on
  * both sides; every query ends in a deterministic ORDER BY.
  */
object SparkEntry {

  private def packs: Seq[Qd] =
    Aggregates.all ++ Relational.all ++ Windows.all ++ Functions.all ++
      Functions2.all ++ Functions3.all ++ Pipeline.all ++ Generators.all ++ Sources.all ++
      Ddl.all ++ Dml.all ++ StreamingQ.all ++ Advanced.all ++ Headline.all ++
      Procedural.all ++ Corpus.all ++ Shaping.all ++ Tpcds.all ++ KvHandlerQ.all ++
      AuthQ.all ++ ConstraintsQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}

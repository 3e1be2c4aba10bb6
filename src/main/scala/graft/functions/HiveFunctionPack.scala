package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Registers the Hive built-in functions Spark lacks (or whose semantics
  * differ), per SURVEY.md §2.8. Reference registry:
  * `ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:183-492`.
  *
  * Spark 4 covers almost the whole 255-function surface natively; this pack
  * adds the genuine gaps. Idempotent.
  */
object HiveFunctionPack {

  def register(spark: SparkSession): Unit = synchronized {
    // field(needle, h1, h2, ...) — 1-based index of needle among the
    // haystack args, 0 if absent (FunctionRegistry.java:255 "field").
    spark.udf.register("field", (needle: String, hay: Seq[String]) => {
      if (needle == null) 0 else hay.indexOf(needle) + 1
    })
  }
}

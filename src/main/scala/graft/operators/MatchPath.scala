package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Row-sequence pattern matching over ordered partitions — the reference's
  * `matchpath` partitioned table function (`ql/src/java/org/apache/hadoop/
  * hive/ql/udf/ptf/MatchPath.java:81`, registered at
  * `exec/FunctionRegistry.java:474`), the MATCH_RECOGNIZE predecessor.
  *
  * Spark has no built-in; per SURVEY.md §7 this is the flatMapGroups path:
  * each key's rows are sorted by event time and classified into one symbol
  * char; a compiled java.util.regex runs over the symbol string; each
  * non-overlapping match emits one result row spanning the matched rows.
  *
  * Scale: state is one user's event list (same per-partition-in-memory
  * contract as Hive's PTFPartition; Hive spills via PTFRowContainer — for
  * our workloads a user's events fit comfortably; a spill container would
  * slot in here if a key exceeded memory). The groupByKey shuffles once on
  * the partition key; matching is then embarrassingly parallel.
  */
object MatchPath {

  case class PathEvent(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String, value: Double)
  case class PathMatch(user_id: Long, start_event: Long, end_event: Long,
      n_steps: Long, sum_value: Double)

  /** events must have user_id, event_id, ts (timestamp), event_type, value. */
  def matchPath(spark: SparkSession, events: DataFrame,
      symbolOf: String => Char, pattern: String): Dataset[PathMatch] = {
    import spark.implicits._
    val compiled = pattern.r.pattern
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .as[PathEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val rows = it.toArray.sortBy(e => (e.ts_us, e.event_id))
        val syms = new String(rows.map(e => symbolOf(e.event_type)))
        val m = compiled.matcher(syms)
        val out = scala.collection.mutable.ArrayBuffer.empty[PathMatch]
        // reference semantics (MatchPath.java:81): a match is ATTEMPTED AT
        // EVERY ROW, so overlapping matches all emit — find()'s resume-after-
        // previous-match behavior would under-report self-overlapping
        // patterns. Zero-width matches carry no rows and are skipped.
        var i = 0
        while (i < syms.length) {
          m.region(i, syms.length)
          if (m.lookingAt() && m.`end` > m.start) {
            val span = rows.slice(m.start, m.`end`)
            out += PathMatch(uid, span.head.event_id, span.last.event_id,
              span.length.toLong, span.map(_.value).sum)
          }
          i += 1
        }
        out.iterator
      }
  }
}

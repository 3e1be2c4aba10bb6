package graft.queries

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Streaming queries (SURVEY.md §2.11). Results come from real
  * StreamingQuery executions (file source → memory sink) and are verified
  * against batch DuckDB aggregates — the stream must converge to the exact
  * batch answer after the replay.
  */
object StreamingQ {

  val all: Seq[Qd] = Seq(

    Qd("q70_stream_hourly_window",
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start,
        |  event_type, count(*) AS n, ROUND(sum(value), 4) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""") { (s, dir) =>
      StreamOps.hourlyTypeCounts(s, dir).orderBy("hour_start", "event_type")
    },

    Qd("q71_stream_user_state",
      """SELECT user_id, count(*) AS n, ROUND(sum(value), 4) AS sv,
        |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_sec
        |FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      StreamOps.userRunningTotals(s, dir).orderBy("user_id")
    }
  )
}

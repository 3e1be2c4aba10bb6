package graft.queries

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window function / PTF surface — SURVEY.md §2.5.
  *
  * Hive anchors: spec `parse/WindowingSpec.java:214-257` (ROWS/RANGE frames),
  * execution `udf/ptf/WindowingTableFunction.java:69`, functions
  * `exec/FunctionRegistry.java:456-468` (row_number, rank, dense_rank,
  * percent_rank, cume_dist, ntile, first_value, last_value, lead, lag).
  *
  * Scale: window partitions here are bounded (per-customer, per-priority);
  * Spark's WindowExec spills per-partition buffers, matching Hive's
  * PTFRowContainer spill behavior for free.
  */
object Windows {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    // Ranking family over a deterministic order (tie-broken by key).
    Qd("q26_window_rank",
      """SELECT c_custkey, c_mktsegment,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  ntile(4) OVER w AS nt
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rn""") { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          ntile(4).over(w).as("nt"))
        .orderBy("c_mktsegment", "rn")
    },

    // ROWS frames: running sum, moving average, lead/lag, first_value.
    Qd("q27_window_rows_frames",
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER w AS rn,
        |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
        |  round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_orderstatus, 1) OVER w AS next_status,
        |  first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m3 = w.rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("rn"),
          round(sum(col("o_totalprice")).over(cum), 2).as("run_total"),
          round(avg(col("o_totalprice")).over(m3), 4).as("mavg3"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_orderstatus"), 1).over(w).as("next_status"),
          first_value(col("o_totalprice")).over(cum).as("first_price"))
        .orderBy("o_custkey", "rn")
    },

    // Multiple PARTITION BY specs in one SELECT (reference
    // `windowing_multipartitioning.q`): each distinct partitioning is its
    // own sort+shuffle stage; the planner chains the Window execs rather
    // than recomputing the scan.
    Qd("q142_window_multipartition",
      """SELECT o_orderkey,
        |  CAST(rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk_cust,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn_prio,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus), 2) AS tp_status
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      val wc = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wp = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val ws = Window.partitionBy(col("o_orderstatus"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          rank().over(wc).cast("long").as("rk_cust"),
          row_number().over(wp).cast("long").as("rn_prio"),
          round(sum(col("o_totalprice")).over(ws), 2).as("tp_status"))
        .orderBy("o_orderkey")
    },

    // RANGE frame with a numeric value boundary (WindowingSpec.java:214-257
    // value-boundary case): peers by price band, not row count.
    Qd("q28_window_range_frame",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(count(*) OVER w AS BIGINT) AS n_in_band,
        |  round(sum(o_totalprice) OVER w, 2) AS sum_in_band
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          count(lit(1)).over(w).as("n_in_band"),
          round(sum(col("o_totalprice")).over(w), 2).as("sum_in_band"))
        .orderBy("o_orderkey")
    },

    // Gap-based sessionization over the events table (the batch analog of
    // the streaming ingest demo, SURVEY.md §2.11): lag + conditional sum.
    Qd("q29_sessionize_gap",
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events)
        |SELECT user_id,
        |  CAST(1 + sum(CASE WHEN pts IS NOT NULL
        |                    AND date_diff('second', pts, ts) > 1800
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("pts", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("pts").isNotNull &&
            (unix_timestamp(col("ts")) - unix_timestamp(col("pts"))) > 1800, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg((lit(1) + sum(col("new_s"))).cast("bigint").as("n_sessions"))
        .orderBy("user_id")
    },

    // Native session windows (session_window aggregation — exceeds Hive,
    // which sessionizes via lag()+cumsum): must equal the q29 gap formula.
    Qd("q102_session_window",
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events)
        |SELECT user_id,
        |  CAST(1 + sum(CASE WHEN pts IS NOT NULL
        |                    AND epoch_us(ts) - epoch_us(pts) >= 1800000000
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("bigint").as("n_sessions"))
        .orderBy("user_id")
    },

    // IGNORE NULLS in first_value/last_value/lag (WindowingSpec null
    // handling) — error events' values nulled out, windows must skip them.
    Qd("q92_window_ignore_nulls",
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT user_id, event_id,
        |  ROUND(first_value(v IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS fv,
        |  ROUND(last_value(v IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS lv,
        |  ROUND(lag(v IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id), 4) AS prev_v
        |FROM e WHERE user_id < 50 ORDER BY user_id, event_id""") { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events").filter(col("user_id") < 50)
        .withColumn("v", when(col("event_type") === "error", lit(null))
          .otherwise(col("value")))
        .select(col("user_id"), col("event_id"),
          round(first(col("v"), ignoreNulls = true).over(wAll), 4).as("fv"),
          round(last(col("v"), ignoreNulls = true).over(wAll), 4).as("lv"),
          round(lag(col("v"), 1, null, ignoreNulls = true).over(w), 4).as("prev_v"))
        .orderBy("user_id", "event_id")
    },

    // Cohort retention matrix — the product-analytics staple (cohort =
    // first-activity epoch week; cell = distinct users of that cohort
    // active at each week offset). Two shuffles total: the per-user min
    // (map-side combinable) and the distinct+count, with the cohort
    // assignment joined back on user_id — no window, no self-join per
    // offset. Weeks are integer epoch-division so the matrix is exact.
    Qd("q251_cohort_retention",
      """WITH a AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM a GROUP BY 1),
        |j AS (SELECT DISTINCT f.cohort, a.wk - f.cohort AS offs, a.user_id
        |      FROM a JOIN f USING (user_id))
        |SELECT cohort, offs, CAST(count(*) AS BIGINT) AS n_users
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      val a = t(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) DIV 604800").as("wk"))
      val f = a.groupBy("user_id").agg(min("wk").as("cohort"))
      a.join(f, "user_id")
        .select(col("cohort"), (col("wk") - col("cohort")).as("offs"),
          col("user_id")).distinct()
        .groupBy("cohort", "offs").agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "offs")
    },

    // Batch HOPPING (sliding) windows — `window(ts, '1 hour', '30
    // minutes')`: every event lands in exactly two overlapping windows,
    // assigned by Spark's window TVF in ordinary batch mode (the tumbling
    // form is q70; the hop form is what dashboards smooth with). The
    // oracle unrolls the two assignments per event explicitly (offset 0
    // and −30 min bucket starts, filtered to windows that really contain
    // the event — the generate-offsets formulation Spark's TVF compiles
    // to internally).
    Qd("q262_hopping_window",
      """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |           event_type, value FROM events),
        |w AS (SELECT (sec // 1800) * 1800 - o.off AS ws, event_type, value
        |      FROM e CROSS JOIN (SELECT unnest([0, 1800]) AS off) o
        |      WHERE sec >= (sec // 1800) * 1800 - o.off
        |        AND sec < (sec // 1800) * 1800 - o.off + 3600)
        |SELECT ws AS window_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n, ROUND(sum(value), 4) AS sv
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
        .select(unix_timestamp(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("sv"))
        .orderBy("window_start", "event_type")
    }
  )
}

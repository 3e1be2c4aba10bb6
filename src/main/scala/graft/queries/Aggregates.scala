package graft.queries

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Aggregation surface — SURVEY.md §2.4 (GroupByOperator
  * `ql/.../exec/GroupByOperator.java:72`, UDAF registry
  * `exec/FunctionRegistry.java:376-406`, grouping sets
  * `plan/GroupByDesc.java:65`). Catalyst gives partial+final hash agg with
  * spill for free; these queries pin down the semantics.
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    // TPC-H Q1 shape: multi-aggregate hash agg over a pushed filter.
    Qd("q01_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Statistical UDAFs (FunctionRegistry.java:376-406: std/stddev_samp/
    // variance/var_samp/covar_pop/covar_samp/corr). Rounded: both engines use
    // numerically-stable one-pass updates that differ in low-order bits.
    Qd("q18_agg_stats",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 3) AS sd_price,
        |  round(stddev_pop(l_extendedprice), 3) AS sdp_price,
        |  round(var_samp(l_quantity), 3) AS var_qty,
        |  round(var_pop(l_quantity), 3) AS varp_qty,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covp_qp,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 3).as("sd_price"),
          round(stddev_pop(col("l_extendedprice")), 3).as("sdp_price"),
          round(var_samp(col("l_quantity")), 3).as("var_qty"),
          round(var_pop(col("l_quantity")), 3).as("varp_qty"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("covp_qp"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
        .orderBy("l_returnflag")
    },

    // Exact COUNT(DISTINCT) — Hive expands via HiveExpandDistinctAggregatesRule
    // (CalcitePlanner.java:1140); Catalyst's Expand does the same.
    Qd("q19_count_distinct",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // collect_set / collect_list (FunctionRegistry.java:399-400) — sorted for
    // determinism (Hive makes no order guarantee either); joined to one
    // string so the driver's row-sort can rank the column.
    Qd("q20_collect",
      """SELECT n_regionkey,
        |  list_aggr(list(DISTINCT n_name ORDER BY n_name), 'string_agg', ',') AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""") { (s, dir) =>
      t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_set(col("n_name"))), ",").as("nations"))
        .orderBy("n_regionkey")
    },

    // Exact percentile with linear interpolation (GenericUDAFPercentile).
    Qd("q21_percentile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy("l_returnflag")
    },

    // histogram_numeric (GenericUDAFHistogramNumeric — Spark's implementation
    // follows the same NumericHistogram algorithm) + approximate aggregates
    // (Spark bonus over Hive 2.1). The results are engine-specific, so the
    // oracle is a KNOWN-ANSWER VECTOR (the q76 discipline): the input is a
    // deterministic single-partition generated sequence — immune to testdata
    // regeneration, and with exactly one ordered input partition every
    // sketch (NumericHistogram, KLL quantile, HLL++) builds and merges
    // deterministically — and DuckDB serves the expected outputs as
    // literals while Spark COMPUTES them. Algorithm equivalence with the
    // reference NumericHistogram stays asserted in NumericHistogramSpec.
    Qd("q22_histogram_approx", Q22_ORACLE) { (s, dir) =>
      q22Input(s).groupBy(col("g"))
        .agg(to_json(expr("histogram_numeric(x, 5)")).as("hist"),
          approx_count_distinct(col("k")).as("approx_nd"),
          expr("percentile_approx(x, 0.5, 1000)").as("approx_p50"))
        .orderBy("g")
    },

    // GROUPING SETS + grouping_id (plan/GroupByDesc.java:65,89-94) via the
    // SQL surface. Group keys coalesced to a sentinel so null ordering
    // differences between engines can't bite.
    Qd("q23_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rflag, lstatus""") { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
          |  coalesce(l_linestatus, 'ALL') AS lstatus,
          |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          |  round(sum(l_quantity), 2) AS sum_qty,
          |  count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY gid, rflag, lstatus""".stripMargin)
    },

    // CUBE via the DataFrame API (Hive: WITH CUBE row replication).
    Qd("q24_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, rflag, lstatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("bigint").as("gid"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("gid"), col("sum_price"))
        .orderBy("gid", "rflag", "lstatus")
    },

    // ROLLUP via the DataFrame API.
    Qd("q25_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  round(sum(o_totalprice), 2) AS total, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""") { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("bigint").as("gid"),
          round(sum(col("o_totalprice")), 2).as("total"),
          count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("total"), col("n"))
        .orderBy("gid", "status", "priority")
    },

    // ewah_bitmap family (GenericUDAFEWAHBitmap + GenericUDFEWAHBitmapAnd/
    // Or/Empty): per-group compressed bitmaps of customer keys, combined
    // with AND/OR and counted — the oracle reproduces the set algebra with
    // DISTINCT-set joins. The bitmap itself never leaves the engine (its
    // words are engine-specific), only the cardinalities do.
    Qd("q119_ewah_bitmap",
      """WITH u AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |     h AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderpriority = '2-HIGH')
        |SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_urgent,
        |  CAST((SELECT count(*) FROM h) AS BIGINT) AS n_high,
        |  CAST((SELECT count(*) FROM u JOIN h USING (o_custkey)) AS BIGINT) AS n_and,
        |  CAST((SELECT count(*) FROM (SELECT o_custkey FROM u
        |        UNION SELECT o_custkey FROM h)) AS BIGINT) AS n_or,
        |  ((SELECT count(*) FROM u JOIN h USING (o_custkey)) = 0) AS is_empty""") { (s, dir) =>
      graft.functions.HiveFunctionPack.register(s)
      t(s, dir, "orders").createOrReplaceTempView("orders")
      val bm = s.sql("""
        SELECT o_orderpriority, ewah_bitmap(CAST(o_custkey AS BIGINT)) AS bm
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderpriority""")
      bm.createOrReplaceTempView("g119_bm")
      s.sql("""
        SELECT ewah_bitmap_count(u.bm) AS n_urgent,
          ewah_bitmap_count(h.bm) AS n_high,
          ewah_bitmap_count(ewah_bitmap_and(u.bm, h.bm)) AS n_and,
          ewah_bitmap_count(ewah_bitmap_or(u.bm, h.bm)) AS n_or,
          ewah_bitmap_empty(ewah_bitmap_and(u.bm, h.bm)) AS is_empty
        FROM (SELECT bm FROM g119_bm WHERE o_orderpriority = '1-URGENT') u
        CROSS JOIN (SELECT bm FROM g119_bm WHERE o_orderpriority = '2-HIGH') h""")
    },

    // Multi-column count(DISTINCT a, b) (GenericUDAFCount over several
    // expressions) alongside a plain aggregate — Spark plans the mix through
    // an Expand-based rewrite, the reason multiple/multi-column distincts
    // don't force separate scans. TPC-H columns are non-null, so Hive's
    // any-null-excludes-row distinct semantics coincide.
    Qd("q130_multi_col_distinct",
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  (SELECT count(*) FROM (
        |     SELECT DISTINCT l_partkey, l_suppkey FROM lineitem li2
        |     WHERE li2.l_returnflag = li.l_returnflag) d) AS nd_ps
        |FROM lineitem li GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_ps"))
        .orderBy("l_returnflag")
    },

    // Exact top-k per group as a bounded-heap aggregation
    // ([[graft.operators.GroupSample.topKBy]] — ≤k (value,id) pairs per
    // group per partition, merged; O(groups×k) shuffled rows where the
    // window idiom — the oracle — shuffles and sorts every row): top-3
    // customers per market segment by total shipped quantity. Quantity
    // sums are integral so the ranking is bit-exact; ties break on the
    // customer key, both engines.
    Qd("q250_topk_per_group",
      """WITH spend AS (
        |  SELECT c.c_mktsegment AS seg, CAST(c.c_custkey AS BIGINT) AS ck,
        |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM customer c
        |  JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |r AS (SELECT seg, ck, qty,
        |  CAST(row_number() OVER (PARTITION BY seg ORDER BY qty DESC, ck)
        |       AS INT) AS rk FROM spend)
        |SELECT seg, rk, ck, qty FROM r WHERE rk <= 3
        |ORDER BY seg, rk""") { (s, dir) =>
      import graft.operators.GroupSample
      val spend = t(s, dir, "customer").as("c")
        .join(t(s, dir, "orders").as("o"),
          col("o.o_custkey") === col("c.c_custkey"))
        .join(t(s, dir, "lineitem").as("l"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .groupBy(col("c.c_mktsegment").as("seg"),
          col("c.c_custkey").cast("bigint").as("ck"))
        .agg(sum(col("l.l_quantity").cast("bigint")).as("qty"))
      GroupSample.topKBy(spend, Seq("seg"), "qty", "ck", k = 3)
        .select(col("seg"), col("rk"), col("ck"), col("qty"))
        .orderBy("seg", "rk")
    },

    // Time-decayed engagement score — recency weighting with a weekly
    // half-life (the freshness-weighting staple of ranking and training-
    // data curation). Cross-engine BIT-exactness by construction: ages
    // are INTEGER weeks, so the decay weight pow(2, -n) and the weighted
    // term value·2⁻ⁿ are identical IEEE doubles on both engines; each
    // term is then quantized to integer micro-units BEFORE the sum (the
    // repo's fixed-point discipline), so the order-free integer SUM
    // cannot wobble at a rounding boundary the way a double sum does
    // (measured: 2 rows flipped at the 4th decimal before quantizing).
    // The max-timestamp anchor attaches as a 1-row broadcast; one
    // aggregation total.
    Qd("q256_time_decayed_score",
      """WITH m AS (SELECT CAST(max(ts) AS DATE) AS md FROM events),
        |a AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(ts AS DATE), m.md) AS BIGINT) // 7 AS wk,
        |    value FROM events, m)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * pow(2.0, -CAST(wk AS DOUBLE)) * 1000000.0)
        |      AS BIGINT)) AS BIGINT) AS score_micro
        |FROM a GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      val ev = t(s, dir, "events")
      val anchor = ev.agg(max(to_date(col("ts"))).as("md"))
      ev.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          expr("CAST(datediff(md, to_date(ts)) AS BIGINT) DIV 7").as("wk"),
          col("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value * pow(2.0, -CAST(wk AS DOUBLE)) " +
            "* 1000000.0) AS BIGINT)")).as("score_micro"))
        .orderBy("user_id")
    }
  )

  /** q22's deterministic sketch input: 20 000 rows in ONE ordered partition
    * (`range(..., numPartitions = 1)` — no shuffle, no partial-merge order
    * ambiguity). `x` is a Knuth-multiplicative scramble mod a prime so the
    * histogram sees a well-spread value stream; `k` has exactly 997
    * distinct values per group domain. */
  private[queries] def q22Input(s: SparkSession): org.apache.spark.sql.DataFrame =
    s.range(1, 20001, 1, 1).select(
      (col("id") % 3).cast("int").as("g"),
      pmod(col("id") * 2654435761L, lit(10007L)).cast("double").as("x"),
      (col("id") % 997).as("k"))

  /** Known-answer oracle for q22 — the expected sketch outputs as literals
    * (computed once from the deterministic input above; see the q22 comment
    * for why literals are the right oracle for engine-specific sketches). */
  private def Q22_ORACLE: String =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS INT), '[{"x":1095.7702331961575,"y":1458.0},{"x":3225.7072463768172,"y":1380.0},{"x":5242.814078041323,"y":1307.0},{"x":7175.811662726558,"y":1269.0},{"x":9067.808306709283,"y":1252.0}]', CAST(1026 AS BIGINT), CAST(4994.0 AS DOUBLE)),
      |  (CAST(1 AS INT), '[{"x":982.742748091602,"y":1310.0},{"x":2947.3932670237164,"y":1307.0},{"x":4916.356382978716,"y":1316.0},{"x":6917.815088757394,"y":1352.0},{"x":8969.520984081033,"y":1382.0}]', CAST(1026 AS BIGINT), CAST(5003.0 AS DOUBLE)),
      |  (CAST(2 AS INT), '[{"x":898.948247078464,"y":1198.0},{"x":2745.29556259905,"y":1262.0},{"x":4692.757689422355,"y":1333.0},{"x":6748.2674253200585,"y":1406.0},{"x":8904.06607629426,"y":1468.0}]', CAST(1026 AS BIGINT), CAST(5001.0 AS DOUBLE))
      |) AS v(g, hist, approx_nd, approx_p50) ORDER BY g""".stripMargin
}

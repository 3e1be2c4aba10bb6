package graft.queries

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator surface — SURVEY.md §2.1/2.3/2.6/2.7.
  *
  * Hive operator anchors (reference paths, not ported code):
  * FilterOperator `ql/.../exec/FilterOperator.java:37`, SelectOperator
  * `exec/SelectOperator.java:36`, JoinOperator `exec/JoinOperator.java:44`,
  * MapJoinOperator `exec/MapJoinOperator.java:78`, UnionOperator
  * `exec/UnionOperator.java:39`, LimitOperator + TopNHash
  * `exec/LimitOperator.java:32`/`exec/TopNHash.java:45`, ReduceSink
  * (DISTRIBUTE/SORT/CLUSTER BY) `exec/ReduceSinkOperator.java:65`,
  * sampling `optimizer/SamplePruner.java`, subquery rewrites
  * `parse/QBSubQuery.java:42-46`.
  *
  * Scale notes: dimension tables (supplier/nation/region) are broadcast
  * explicitly; fact-fact joins stay shuffle (sort-merge) so they survive
  * 1000-executor scale; every filter/projection is expressed declaratively
  * so Catalyst pushes it into the parquet scan.
  */
object Relational {

  /** Late additions registered at the end of the pack (q86+). */
  private def extras: Seq[Qd] = Seq(

    // UNIQUEJOIN ... PRESERVE (HiveParser KW_UNIQUEJOIN, JoinDesc.UNIQUE_JOIN,
    // qtest uniquejoin.q): n-way single-key join where a key group is emitted
    // iff a PRESERVE'd side has the key; re-expressed as a full-outer chain
    // with a running-coalesced key + the preserve filter
    // (operators/UniqueJoin.scala; golden-file semantics in UniqueJoinSpec).
    // Shape mirrors golden block 5: PRESERVE customer-sample / nation-tail,
    // inner supplier-sample.
    Qd("q155_uniquejoin_preserve",
      """WITH a AS (SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 97 = 0),
        |b AS (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_suppkey % 7 = 0),
        |c AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10),
        |j AS (SELECT a.c_custkey, a.c_nationkey, b.s_suppkey, b.s_nationkey,
        |             c.n_nationkey, c.n_name
        |      FROM a FULL JOIN b ON a.c_nationkey = b.s_nationkey
        |           FULL JOIN c ON coalesce(a.c_nationkey, b.s_nationkey) = c.n_nationkey)
        |SELECT * FROM j
        |WHERE c_nationkey IS NOT NULL OR n_nationkey IS NOT NULL
        |ORDER BY c_custkey NULLS FIRST, s_suppkey NULLS FIRST,
        |  n_nationkey NULLS FIRST""") { (s, dir) =>
      import graft.operators.UniqueJoin
      import graft.operators.UniqueJoin.Side
      val a = Engine.table(s, dir, "customer")
        .filter(col("c_custkey") % 97 === 0).select("c_custkey", "c_nationkey")
      val b = Engine.table(s, dir, "supplier")
        .filter(col("s_suppkey") % 7 === 0).select("s_suppkey", "s_nationkey")
      val c = Engine.table(s, dir, "nation")
        .filter(col("n_nationkey") >= 10).select("n_nationkey", "n_name")
      UniqueJoin.uniqueJoin(Seq(
          Side(a, Seq(col("c_nationkey")), preserve = true),
          Side(b, Seq(col("s_nationkey")), preserve = false),
          Side(c, Seq(col("n_nationkey")), preserve = true)))
        .select("c_custkey", "c_nationkey", "s_suppkey", "s_nationkey",
          "n_nationkey", "n_name")
        .orderBy(col("c_custkey").asc_nulls_first, col("s_suppkey").asc_nulls_first,
          col("n_nationkey").asc_nulls_first)
    },

    // Skewed-key aggregation via explicit two-stage salting
    // (hive.groupby.skewindata analog) — must equal the direct GROUP BY.
    Qd("q86_skew_salted_agg",
      """SELECT event_type, count(*) AS n, ROUND(sum(value), 4) AS sv,
        |  ROUND(min(value), 4) AS mn, ROUND(max(value), 4) AS mx,
        |  ROUND(sum(value) / count(*), 4) AS av
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import org.apache.spark.sql.functions.{col, round}
      graft.operators.SkewAgg.saltedAgg(
          graft.Engine.table(s, dir, "events"),
          Seq("event_type"), "value", col("event_id"), 16)
        .select(col("event_type"), col("n"), round(col("sv"), 4).as("sv"),
          round(col("mn"), 4).as("mn"), round(col("mx"), 4).as("mx"),
          round(col("av"), 4).as("av"))
        .orderBy("event_type")
    },

    // TABLESAMPLE(x PERCENT) — the engine's percent sample is a
    // DETERMINISTIC keyed-hash Bernoulli draw (the q172/q177 discipline:
    // membership is a pure function of (seed, key) — append-stable,
    // rerun-stable, engine-reproducible), so DuckDB replays the identical
    // draw and the compare is a full hash check instead of rows-only.
    // Spark's `.sample` RNG would differ per engine/partitioning — the
    // exact nondeterminism a 100 TB reproducible pipeline can't accept.
    Qd("q88_tablesample_percent",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE CAST(('0x'||substr(md5('ts42:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)),1,15)) AS BIGINT) % 1000 < 100
        |ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      import org.apache.spark.sql.functions.expr
      graft.Engine.table(s, dir, "lineitem")
        .filter(expr("CAST(conv(substring(md5(concat('ts42:', " +
          "CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))), " +
          "1, 15), 16, 10) AS BIGINT) % 1000 < 100"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // TABLESAMPLE(N ROWS) (`parse/FromClauseParser.g:167-178`, the third
    // sample form next to BUCKET/PERCENT): exactly-N semantics are the
    // engine contract (which N rows is scan-order-dependent in both Hive
    // and Spark), so the oracle pins the cardinality and the stable
    // aggregate of a wrapped deterministic projection.
    Qd("q115_tablesample_rows",
      """SELECT CAST(50 AS BIGINT) AS n""") { (s, dir) =>
      graft.Engine.registerAll(s, dir)
      s.sql("SELECT CAST(count(*) AS BIGINT) AS n " +
        "FROM (SELECT * FROM orders TABLESAMPLE (50 ROWS))")
    },

    // NOT IN with a NULL in the subquery list — three-valued logic trap
    // (QBSubQuery.java NOT_IN rewrite): one NULL makes NOT IN never-true.
    Qd("q91_not_in_nulls",
      """SELECT tag, n FROM (
        |  SELECT 'with_null' AS tag, count(*) AS n FROM orders
        |  WHERE o_custkey NOT IN
        |    (SELECT nullif(c_custkey, 7) FROM customer WHERE c_custkey < 100)
        |  UNION ALL
        |  SELECT 'clean', count(*) FROM orders
        |  WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer WHERE c_custkey < 100))
        |ORDER BY tag""") { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT tag, n FROM (
          |  SELECT 'with_null' AS tag, count(*) AS n FROM orders
          |  WHERE o_custkey NOT IN
          |    (SELECT nullif(c_custkey, 7) FROM customer WHERE c_custkey < 100)
          |  UNION ALL
          |  SELECT 'clean', count(*) FROM orders
          |  WHERE o_custkey NOT IN
          |    (SELECT c_custkey FROM customer WHERE c_custkey < 100))
          |ORDER BY tag""".stripMargin)
    },

    // Join-strategy hints (Hive MAPJOIN hint analog,
    // `optimizer/MapJoinProcessor.java`): BROADCAST + SHUFFLE_HASH hints must
    // not change results (strategies asserted in ExtensionSpec).
    Qd("q97_join_hints",
      """SELECT n_name, count(*) AS n FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n_name""") { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT /*+ BROADCAST(n) */ n_name, count(*) AS n FROM supplier s
          |JOIN nation n ON s.s_nationkey = n.n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    },

    // Inline VALUES relation joined against a table (constant LocalRelation
    // → broadcast join).
    Qd("q109_values_join",
      """SELECT v.grp, count(*) AS n FROM nation
        |JOIN (VALUES (0, 'amer'), (1, 'emea'), (2, 'apac'), (3, 'emea'),
        |             (4, 'amer')) AS v(rk, grp)
        |  ON n_regionkey = v.rk
        |GROUP BY v.grp ORDER BY v.grp""") { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT v.grp, count(*) AS n FROM nation
          |JOIN (VALUES (0, 'amer'), (1, 'emea'), (2, 'apac'), (3, 'emea'),
          |             (4, 'amer')) AS v(rk, grp)
          |  ON n_regionkey = v.rk
          |GROUP BY v.grp ORDER BY v.grp""".stripMargin)
    },

    // PIVOT (exceeds Hive 2.1 — no PIVOT clause there; oracle via
    // conditional aggregation).
    Qd("q110_pivot",
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f"),
          coalesce(col("O"), lit(0L)).as("o"),
          coalesce(col("P"), lit(0L)).as("p"))
        .orderBy("o_orderpriority")
    },

    // Outer-join predicate placement: a filter in ON preserves unmatched
    // left rows; the same filter in WHERE discards them (JoinPPD semantics,
    // `ppd/` + CommonJoinOperator residual filters) — counts must differ.
    Qd("q94_outer_join_on_vs_where",
      """SELECT tag, count(*) AS n, count(o_orderkey) AS matched FROM (
        |  SELECT 'pred_in_on' AS tag, c.c_custkey, o.o_orderkey
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
        |  UNION ALL
        |  SELECT 'pred_in_where', c.c_custkey, o.o_orderkey
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  WHERE o.o_totalprice > 200000) x
        |GROUP BY tag ORDER BY tag""") { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT tag, count(*) AS n, count(o_orderkey) AS matched FROM (
          |  SELECT 'pred_in_on' AS tag, c.c_custkey, o.o_orderkey
          |  FROM customer c LEFT JOIN orders o
          |    ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
          |  UNION ALL
          |  SELECT 'pred_in_where', c.c_custkey, o.o_orderkey
          |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          |  WHERE o.o_totalprice > 200000) x
          |GROUP BY tag ORDER BY tag""".stripMargin)
    },

    // Correlated EXISTS / NOT EXISTS + correlated scalar subquery
    // (QBSubQuery.java:42-46 EXISTS/NOT_EXISTS; rewritten to semi/anti).
    Qd("q93_correlated_subqueries",
      """SELECT c_custkey,
        |  EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |          AND o.o_totalprice > 150000) AS has_big,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c WHERE c_custkey < 200 ORDER BY c_custkey""") { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT c_custkey,
          |  EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          |          AND o.o_totalprice > 150000) AS has_big,
          |  (SELECT max(o_totalprice) FROM orders o
          |   WHERE o.o_custkey = c.c_custkey) AS max_price
          |FROM customer c WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin)
    }
  )

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    // FilterOperator + SelectOperator: compound pushed predicate + row-level
    // expression projection (TPC-H Q6 shape).
    // NOTE: disc_rev is intentionally unrounded — a per-row IEEE double
    // product is bit-identical across engines, while round() semantics on
    // boundary doubles differ (Spark rounds the shortest decimal repr,
    // DuckDB the binary value).
    Qd("q02_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * l_discount AS disc_rev
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_discount > 0.05 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
          && col("l_discount") > 0.05 && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * col("l_discount")).as("disc_rev"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // JoinOperator: fact-fact shuffle join, forced sort-merge (survives any
    // scale; no build-side memory dependence).
    Qd("q03_join_shuffle",
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      val li = t(s, dir, "lineitem").hint("merge")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },

    // MapJoinOperator: star join with explicit broadcast of the genuinely
    // small dims (TPC-H Q5 shape). customer/orders/lineitem stay shuffled —
    // they scale with SF.
    Qd("q04_join_broadcast_star",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
        |GROUP BY n_name ORDER BY revenue DESC, n_name""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA" && year(o("o_orderdate")) === 1996)
        .groupBy(n("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },

    // Left-semi join (EXISTS / IN-subquery rewrite, QBSubQuery.java IN).
    Qd("q05_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // Left-anti join (NOT EXISTS rewrite, QBSubQuery.java NOT_IN/NOT_EXISTS).
    Qd("q06_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
        |ORDER BY c_custkey""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1995)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // Left-outer join + null-tolerant aggregation.
    Qd("q07_left_outer_agg",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"),
          round(coalesce(sum(o("o_totalprice")), lit(0.0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    },

    // Full-outer join of two aggregates.
    Qd("q08_full_outer",
      """SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
        |  coalesce(n_suppliers, 0) AS n_suppliers,
        |  coalesce(n_customers, 0) AS n_customers
        |FROM (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
        |      FROM supplier GROUP BY s_nationkey) a
        |FULL JOIN (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
        |           FROM customer GROUP BY c_nationkey) b
        |  ON s_nationkey = c_nationkey
        |ORDER BY nationkey""") { (s, dir) =>
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cus = t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      sup.join(cus, sup("s_nationkey") === cus("c_nationkey"), "full_outer")
        .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
        .orderBy("nationkey")
    },

    // UNION DISTINCT (UnionOperator + distinct).
    Qd("q09_union_distinct",
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .distinct().orderBy("nk")
    },

    // UNION ALL feeding an aggregate.
    Qd("q10_union_all_agg",
      """SELECT nk, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("cnt")).orderBy("nk")
    },

    // Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (TopNHash analog).
    Qd("q11_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // DISTRIBUTE BY + SORT BY (CLUSTER BY) — ReduceSink with explicit
    // partitioning; final global order only for the deterministic compare.
    Qd("q12_cluster_by",
      """SELECT l_returnflag, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""") { (s, dir) =>
      t(s, dir, "lineitem")
        .repartition(col("l_returnflag"))
        .sortWithinPartitions("l_returnflag", "l_orderkey", "l_linenumber")
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    },

    // TABLESAMPLE(BUCKET 1 OUT OF 4 ON o_orderkey) — deterministic bucket
    // predicate (SamplePruner analog).
    Qd("q13_bucket_sample",
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey % 4 = 0 ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(4)) === 0)
        .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")
    },

    // IN-subquery (semi-join rewrite) feeding an aggregate.
    Qd("q14_subquery_in",
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val bld = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      o.join(bld, o("o_custkey") === bld("c_custkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderstatus")
    },

    // Scalar subquery — via the SQL surface (Engine.sql = Hive Driver.run analog).
    Qd("q15_scalar_subquery",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // CTE (WITH) + HAVING, via the SQL surface.
    Qd("q16_cte_having",
      """WITH big AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders
        |  GROUP BY o_custkey HAVING count(*) >= 12)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(n) AS BIGINT) AS n_orders
        |FROM big JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, dir) =>
      Engine.sql(s, dir,
        """WITH big AS (
          |  SELECT o_custkey, count(*) AS n FROM orders
          |  GROUP BY o_custkey HAVING count(*) >= 12)
          |SELECT c_mktsegment, count(*) AS n_customers, sum(n) AS n_orders
          |FROM big JOIN customer ON c_custkey = o_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    },

    // Cross join (CrossProductCheck analog — explicit, tiny inputs only).
    Qd("q17_cross_join",
      """SELECT a.r_name AS r1, b.r_name AS r2
        |FROM region a CROSS JOIN region b
        |WHERE a.r_name < b.r_name ORDER BY r1, r2""") { (s, dir) =>
      val a = t(s, dir, "region").select(col("r_name").as("r1"))
      val b = t(s, dir, "region").select(col("r_name").as("r2"))
      a.crossJoin(b).filter(col("r1") < col("r2")).orderBy("r1", "r2")
    },

    // LIMIT with OFFSET (Hive `LIMIT offset,rows`, FromClauseParser limit
    // clause) — deterministic only under a total order, hence the full
    // ORDER BY before the offset window.
    Qd("q129_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15 OFFSET 30""") { (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(30).limit(15)
    },

    // GROUP BY / ORDER BY ordinal positions (Hive
    // `hive.groupby.position.alias` / `hive.orderby.position.alias`,
    // qtests `groupby_position.q` — Spark resolves ordinals by default).
    Qd("q140_group_by_position",
      """SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n
          |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    },

    // Correlation optimizer analog (reference `optimizer/correlation/
    // CorrelationOptimizer.java`, qtests `correlationoptimizer*.q`): Hive
    // merges operator trees that share the same shuffle; Catalyst's
    // equivalent is exchange reuse — the self-joined aggregate's scan +
    // shuffle subtree is planned ONCE and the second side reads the same
    // exchange (ReusedExchange, plan-asserted in PlanShapeSpec).
    Qd("q134_shared_shuffle_selfjoin",
      """WITH a AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT x.n AS n, CAST(count(*) AS BIGINT) AS pairs
        |FROM a x JOIN a y ON x.n = y.n AND x.o_custkey < y.o_custkey
        |GROUP BY x.n ORDER BY n""") { (s, dir) =>
      Engine.sql(s, dir,
        """WITH a AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
          |SELECT x.n AS n, count(*) AS pairs
          |FROM a x JOIN a y ON x.n = y.n AND x.o_custkey < y.o_custkey
          |GROUP BY x.n ORDER BY n""".stripMargin)
    },

    // Scalar subquery inside HAVING (reference qtests
    // `clientpositive/subquery_in_having.q`) — the aggregate compares
    // against a second, independently-aggregated scalar.
    Qd("q131_having_scalar_subquery",
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) > 2 * (SELECT avg(cnt) FROM (
        |  SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) t)
        |ORDER BY o_custkey""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT o_custkey, count(*) AS n
          |FROM orders GROUP BY o_custkey
          |HAVING count(*) > 2 * (SELECT avg(cnt) FROM (
          |  SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) t)
          |ORDER BY o_custkey""".stripMargin)
    },

    // Null-safe equi-join — `ON a <=> b` (GenericUDFOPEqualNS; reference
    // qtest `clientpositive/join_nullsafe.q`): NULL keys match each other
    // instead of dropping out. Crucially this still plans as a HASH join
    // (Spark keys the exchange on the null-safe-wrapped key), not a
    // nested-loop — at 100 TB a theta-join fallback here would be the job.
    // PlanShapeSpec asserts the join stays hash/sort-merge. DuckDB oracle
    // spells it IS NOT DISTINCT FROM.
    Qd("q167_null_safe_join",
      """WITH a AS (SELECT CASE WHEN s_nationkey % 5 = 0 THEN NULL
        |    ELSE CAST(s_nationkey AS BIGINT) END AS k, s_suppkey FROM supplier),
        |  b AS (SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
        |    ELSE CAST(n_nationkey AS BIGINT) END AS k, n_name FROM nation)
        |SELECT coalesce(a.k, -1) AS k, count(*) AS n
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY 1 ORDER BY k""") { (s, dir) =>
      Engine.sql(s, dir,
        """WITH a AS (SELECT CASE WHEN s_nationkey % 5 = 0 THEN NULL
          |    ELSE CAST(s_nationkey AS BIGINT) END AS k, s_suppkey FROM supplier),
          |  b AS (SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
          |    ELSE CAST(n_nationkey AS BIGINT) END AS k, n_name FROM nation)
          |SELECT coalesce(a.k, -1) AS k, count(*) AS n
          |FROM a JOIN b ON a.k <=> b.k
          |GROUP BY 1 ORDER BY k""".stripMargin)
    },

    // The full set-operation family in one multiset-sensitive result:
    // INTERSECT/EXCEPT dedup, INTERSECT ALL keeps min multiplicities,
    // EXCEPT ALL subtracts them (Hive grew these in 2.3 — HIVE-12764 —
    // as rewrites onto group-by+join; Spark plans them natively). The
    // ORDER over (op, k) pins the exact multiset cross-engine.
    Qd("q236_set_operations",
      """WITH a AS (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |           WHERE c_custkey % 2 = 0),
        |b AS (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |      WHERE c_custkey % 3 = 0)
        |SELECT 'i' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT 'ia', k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        |UNION ALL
        |SELECT 'e', k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        |UNION ALL
        |SELECT 'ea', k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
        |ORDER BY op, k""") { (s, dir) =>
      Engine.sql(s, dir,
        """WITH a AS (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
          |           WHERE c_custkey % 2 = 0),
          |b AS (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
          |      WHERE c_custkey % 3 = 0)
          |SELECT 'i' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
          |UNION ALL
          |SELECT 'ia', k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
          |UNION ALL
          |SELECT 'e', k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
          |UNION ALL
          |SELECT 'ea', k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
          |ORDER BY op, k""".stripMargin)
    },

    // Rank-family completion: ntile/percent_rank/cume_dist over a NAMED
    // window (the WINDOW clause — `windowing.q`'s w1/w2 shapes), ties
    // broken by key so every value is cross-engine deterministic.
    Qd("q237_window_rank_family",
      """SELECT c_custkey AS ck, c_mktsegment AS seg,
        |  ntile(4) OVER w AS nt,
        |  ROUND(percent_rank() OVER w, 6) AS pr,
        |  ROUND(cume_dist() OVER w, 6) AS cd
        |FROM customer WHERE c_custkey <= 500
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY seg, ck""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT c_custkey AS ck, c_mktsegment AS seg,
          |  ntile(4) OVER w AS nt,
          |  ROUND(percent_rank() OVER w, 6) AS pr,
          |  ROUND(cume_dist() OVER w, 6) AS cd
          |FROM customer WHERE c_custkey <= 500
          |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
          |ORDER BY seg, ck""".stripMargin)
    }
  ) ++ extras
}

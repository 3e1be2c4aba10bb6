package graft.queries

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Headline multi-join analytics in the shape of the reference's TPC-DS/TPC-H
  * perf corpus (`ql/src/test/queries/clientpositive/perf/`) adapted to the
  * test schema — the workloads the optimizer pipeline (join reorder,
  * broadcast selection, partial aggregation, top-k) exists for.
  */
object Headline {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    // TPC-H Q3 shape: shipping priority — 3-way join, filter both sides,
    // aggregate, top-k by revenue.
    Qd("q99_tpch_q3_shape",
      """SELECT l_orderkey, ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS odate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-06-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-06-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""") { (s, dir) =>
      val cut = lit("1996-06-15").cast("timestamp")
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_shipdate") > cut),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          unix_timestamp(col("o_orderdate")).as("odate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // TPC-H Q5 shape: 5-way star join through supplier+customer co-location
    // on nation, revenue per nation.
    Qd("q100_tpch_q5_shape",
      """SELECT n_name, ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer, orders, lineitem, supplier, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Qd("q101_tpch_q10_shape",
      """SELECT c_custkey, c_name, ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // TPC-H Q18 shape: large-volume orders — IN-subquery over a grouped
    // HAVING filter, then re-join and re-aggregate. The subquery side is a
    // semi join on the already-aggregated keys (small → broadcastable);
    // the outer sum re-reads lineitem once more, exactly like the
    // reference's plan for perf/query18.
    Qd("q125_tpch_q18_shape",
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS VARCHAR) AS od, o_totalprice,
        |  ROUND(sum(l_quantity), 4) AS sumq
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
        .filter(col("q") > 250).select(col("l_orderkey").as("bk"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("bk"), "left_semi")
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(round(sum("l_quantity"), 4).as("sumq"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("string").as("od"), col("o_totalprice"),
          col("sumq"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    },

    // TPC-H Q21 shape: the sole returning supplier on multi-supplier
    // finished orders — EXISTS + NOT EXISTS correlated self-joins on
    // lineitem (receipt>commit lateness replaced by l_returnflag, which
    // this schema has). Exercises semi + anti join against the same scan,
    // the hardest plan in the reference's perf corpus.
    Qd("q126_tpch_q21_shape",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      l1.join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(l2, col("k2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
          "left_semi")
        .join(l3, col("k3") === col("l_orderkey") && col("s3") =!= col("l_suppkey"),
          "left_anti")
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    }
  )
}

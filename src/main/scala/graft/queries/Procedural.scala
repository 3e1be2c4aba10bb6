package graft.queries

import graft.procedural.HplSql

/** HPL/SQL procedural scripts (SURVEY.md §2.12; reference
  * `hplsql/src/main/java/org/apache/hive/hplsql/Exec.java:52`). Each script
  * runs through [[HplSql.run]] — driver-side control flow, engine-side SQL —
  * and its final SELECT is the result set the oracle checks. The oracles
  * re-express the procedural logic as set-based SQL, which is exactly the
  * property worth pinning: the interpreter must agree with the declarative
  * answer on every path.
  */
object Procedural {

  val all: Seq[Qd] = Seq(

    // DECLARE with scalar-subquery initializer + IF/ELSIF/ELSE + SET.
    Qd("q148_hplsql_branch",
      """SELECT CASE WHEN n >= 1000000 THEN 'huge'
        |            WHEN n >= 10000 THEN 'big' ELSE 'small' END AS sz,
        |  n AS n_orders
        |FROM (SELECT count(*) AS n FROM orders)""") { (s, dir) =>
      HplSql.run(s, dir,
        """DECLARE n BIGINT := (SELECT count(*) FROM orders);
          |DECLARE sz STRING;
          |IF n >= 1000000 THEN
          |  SET sz = 'huge';
          |ELSIF n >= 10000 THEN
          |  SET sz = 'big';
          |ELSE
          |  SET sz = 'small';
          |END IF;
          |SELECT sz AS sz, CAST(n AS BIGINT) AS n_orders;""".stripMargin)
    },

    // WHILE loop: smallest power of two covering the order count — the
    // iterative driver-side computation must land on the closed form.
    Qd("q149_hplsql_while",
      """SELECT CAST(ceil(log2(n)) AS INT) AS iters,
        |  CAST(power(2, ceil(log2(n))) AS BIGINT) AS pw, n AS n_orders
        |FROM (SELECT count(*) AS n FROM orders)""") { (s, dir) =>
      HplSql.run(s, dir,
        """DECLARE n BIGINT := (SELECT count(*) FROM orders);
          |DECLARE pw BIGINT := 1;
          |DECLARE iters INT := 0;
          |WHILE pw < n LOOP
          |  SET pw = pw * 2;
          |  SET iters = iters + 1;
          |END LOOP;
          |SELECT CAST(iters AS INT) AS iters, CAST(pw AS BIGINT) AS pw, CAST(n AS BIGINT) AS n_orders;""".stripMargin)
    },

    // FOR-cursor over an ordered dimension query, accumulating into a
    // variable — the row-by-row path must equal DuckDB's ordered string_agg.
    Qd("q150_hplsql_cursor",
      """SELECT string_agg(r_name, ';' ORDER BY r_regionkey) || ';' AS regions,
        |  CAST(count(*) AS INT) AS n
        |FROM region""") { (s, dir) =>
      HplSql.run(s, dir,
        """DECLARE regions STRING := '';
          |DECLARE n INT := 0;
          |FOR r IN (SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey) LOOP
          |  SET regions = regions || r.r_name || ';';
          |  SET n = n + 1;
          |END LOOP;
          |SELECT regions AS regions, CAST(n AS INT) AS n;""".stripMargin)
    },

    // EXIT WHEN inside an unconditioned loop (exit_stmt, Hplsql.g4) — must
    // land on the same closed form as q149's conditioned WHILE.
    Qd("q156_hplsql_exit_when",
      """SELECT CAST(ceil(log2(n)) AS INT) AS iters,
        |  CAST(power(2, ceil(log2(n))) AS BIGINT) AS pw, n AS n_orders
        |FROM (SELECT count(*) AS n FROM orders)""") { (s, dir) =>
      HplSql.run(s, dir,
        """DECLARE n BIGINT := (SELECT count(*) FROM orders);
          |DECLARE pw BIGINT := 1;
          |DECLARE iters INT := 0;
          |WHILE 1 = 1 LOOP
          |  EXIT WHEN pw >= n;
          |  SET pw = pw * 2;
          |  SET iters = iters + 1;
          |END LOOP;
          |SELECT CAST(iters AS INT) AS iters, CAST(pw AS BIGINT) AS pw, CAST(n AS BIGINT) AS n_orders;""".stripMargin)
    },

    // BEGIN ... EXCEPTION WHEN OTHERS THEN (exception_block, Hplsql.g4): the
    // failing statement (missing table) routes to the handler, which
    // computes the fallback the oracle expects; the error must not escape.
    Qd("q157_hplsql_exception",
      """SELECT 'fallback' AS src, CAST(count(*) AS BIGINT) AS n FROM region""") { (s, dir) =>
      HplSql.run(s, dir,
        """DECLARE src STRING := 'none';
          |DECLARE n BIGINT := -1;
          |BEGIN
          |  SET n = (SELECT count(*) FROM graft_no_such_table_q157);
          |  SET src = 'table';
          |EXCEPTION WHEN OTHERS THEN
          |  SET src = 'fallback';
          |  SET n = (SELECT count(*) FROM region);
          |END;
          |SELECT src AS src, CAST(n AS BIGINT) AS n;""".stripMargin)
    }
  )
}

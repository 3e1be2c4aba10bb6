package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.TableConstraints

/** PK/FK informational constraints (HIVE-13290 — shipped in the reference at
  * exactly 2.1.0, `create_with_constraints.q`) plus the RELY-gated optimizer
  * consumption ([[graft.plans.RelyConstraintRule]]): the DDL lifecycle ledger
  * and two result-parity queries whose plans drop a join / an aggregate.
  * Results are compared against DuckDB computing the REAL join / REAL
  * distinct from the base parquet — a wrong rewrite (lost null-FK rows,
  * duplicated child rows, under-grouped distinct) breaks the hash match.
  * Plan shapes (join gone, aggregate gone, NORELY keeps both) are pinned in
  * ConstraintSpec. */
object ConstraintsQ {

  private def sf(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

  private def deny(r: => DataFrame, what: String): Unit =
    require(scala.util.Try(r).isFailure, s"$what must be rejected")

  /** Drop a managed table AND its warehouse location. A fresh session's
    * in-memory catalog makes `DROP TABLE IF EXISTS` a no-op, but the
    * warehouse directory a PREVIOUS session's CTAS created survives on disk
    * — and CTAS refuses an existing location (LOCATION_ALREADY_EXISTS).
    * Caught by the r14 repeat-Verify run: the r13 official run had already
    * materialized these dirs in the workspace, so every later fresh-session
    * run would fail its CTAS. */
  private def dropManaged(s: org.apache.spark.sql.SparkSession,
      names: String*): Unit = names.foreach { t =>
    s.sql(s"DROP TABLE IF EXISTS $t")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
  }

  val all: Seq[Qd] = Seq(

    // The create_with_constraints.q lifecycle: inline named + unnamed
    // constraints, composite PK, RELY/NORELY, ALTER ADD/DROP/re-ADD, and
    // the reference's rejection set (ENABLE/VALIDATE unsupported, second
    // PK, FK arity mismatch, FK to a non-PK column set, duplicate name,
    // DROP of an unknown name). Result = the SHOW CONSTRAINTS ledger.
    Qd("q349_constraint_ddl",
      """SELECT * FROM (
        |  SELECT 't1' AS tbl, 'pk_t1' AS cname, 'PRIMARY KEY' AS kind,
        |    'a,b' AS cols, '' AS ref_tbl, '' AS ref_cols,
        |    false AS rely, CAST(0 AS INTEGER) AS ord
        |  UNION ALL SELECT 't2', 'pk2', 'PRIMARY KEY', 'a', '', '', true, 0
        |  UNION ALL SELECT 't3', 'pk_t3', 'PRIMARY KEY', 'x', '', '', false, 0
        |  UNION ALL SELECT 't3', 'fk1', 'FOREIGN KEY', 'y', 't2', 'a', false, 1
        |) ORDER BY tbl, ord""") { (s, dir) =>
      val k = sf(dir)
      // sf-suffixed physical names, ledger rendered with stable logical
      // names so the oracle is sf-independent
      val (t1, t2, t3) = (s"c349_t1_$k", s"c349_t2_$k", s"c349_t3_$k")
      TableConstraints.clear(t1, t2, t3)
      Seq(t1, t2, t3).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      def sql(q: String): DataFrame = Engine.sql(s, dir, q)
      sql(s"CREATE TABLE $t2 (a STRING, b STRING, CONSTRAINT pk2 PRIMARY KEY (a) " +
        "DISABLE NOVALIDATE RELY) USING parquet")
      sql(s"CREATE TABLE $t1 (a STRING, b STRING, PRIMARY KEY (a, b) " +
        "DISABLE NOVALIDATE NORELY) USING parquet")
      sql(s"CREATE TABLE $t3 (x STRING, y STRING, PRIMARY KEY (x) DISABLE NOVALIDATE, " +
        s"CONSTRAINT fk0 FOREIGN KEY (y) REFERENCES $t2(a) DISABLE NOVALIDATE RELY) " +
        "USING parquet")
      sql(s"ALTER TABLE $t3 DROP CONSTRAINT fk0")
      sql(s"ALTER TABLE $t3 ADD CONSTRAINT fk1 FOREIGN KEY (y) REFERENCES $t2(a) " +
        "DISABLE NOVALIDATE")
      // the reference's rejection set (ErrorMsg.INVALID_PK/FK_SYNTAX et al.)
      deny(sql(s"ALTER TABLE $t1 ADD CONSTRAINT e1 PRIMARY KEY (a) ENABLE NOVALIDATE"),
        "ENABLE (enforcement not supported yet)")
      deny(sql(s"ALTER TABLE $t1 ADD CONSTRAINT e2 PRIMARY KEY (a) DISABLE VALIDATE"),
        "VALIDATE (validation not supported yet)")
      deny(sql(s"ALTER TABLE $t2 ADD CONSTRAINT e3 PRIMARY KEY (b) DISABLE NOVALIDATE"),
        "a second primary key")
      deny(sql(s"ALTER TABLE $t3 ADD CONSTRAINT e4 FOREIGN KEY (x, y) REFERENCES " +
        s"$t2(a) DISABLE NOVALIDATE"), "FK arity mismatch")
      deny(sql(s"ALTER TABLE $t3 ADD CONSTRAINT e5 FOREIGN KEY (y) REFERENCES " +
        s"$t2(b) DISABLE NOVALIDATE"), "FK referencing a non-PK column")
      deny(sql(s"ALTER TABLE $t3 ADD CONSTRAINT fk1 FOREIGN KEY (y) REFERENCES " +
        s"$t2(a) DISABLE NOVALIDATE"), "a duplicate constraint name")
      deny(TableConstraints.execDdl(s, s"ALTER TABLE $t3 DROP CONSTRAINT nosuch"),
        "DROP of an unknown constraint")
      TableConstraints.show(s, None)
        .filter(col("tbl").isin(t1, t2, t3))
        .withColumn("tbl", regexp_replace(col("tbl"), s"^c349_(t\\d)_$k$$", "$1"))
        .withColumn("cname", regexp_replace(col("cname"), s"_c349_(t\\d)_$k$$", "_$1"))
        .withColumn("ref_tbl", regexp_replace(col("ref_tbl"), s"^c349_(t\\d)_$k$$", "$1"))
        .orderBy("tbl", "ord")
    },

    // FK join elimination under RELY: the star probe uses only child
    // columns, so the parent join is metadata-deletable; the child carries
    // injected NULL FKs so the inner join's null-dropping is load-bearing.
    // DuckDB computes the REAL join — a rewrite that loses or duplicates
    // rows cannot hash-match.
    Qd("q350_constraint_join_elim",
      """WITH child AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS fk
        |  FROM orders)
        |SELECT fk % 10 AS bucket, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sk, min(o_orderkey) AS mn
        |FROM child JOIN customer ON fk = c_custkey
        |GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      val k = sf(dir)
      val (parent, child) = (s"c350_parent_$k", s"c350_child_$k")
      TableConstraints.clear(parent, child)
      dropManaged(s, parent, child)
      Engine.registerAll(s, dir)
      s.sql(s"CREATE TABLE $parent USING parquet AS " +
        "SELECT c_custkey, c_name FROM customer")
      s.sql(s"CREATE TABLE $child USING parquet AS SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 97 = 0 THEN CAST(NULL AS BIGINT) " +
        "ELSE o_custkey END AS fk FROM orders")
      Engine.sql(s, dir, s"ALTER TABLE $parent ADD CONSTRAINT pk350 " +
        "PRIMARY KEY (c_custkey) DISABLE NOVALIDATE RELY")
      Engine.sql(s, dir, s"ALTER TABLE $child ADD CONSTRAINT fk350 " +
        s"FOREIGN KEY (fk) REFERENCES $parent(c_custkey) DISABLE NOVALIDATE RELY")
      s.sql(
        s"""SELECT fk % 10 AS bucket, count(*) AS n,
           |  CAST(sum(o_orderkey) AS BIGINT) AS sk, min(o_orderkey) AS mn
           |FROM $child c JOIN $parent p ON c.fk = p.c_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // PK distinct elimination under RELY: DISTINCT over a superset of the
    // PK is a rename, not an aggregate — the shuffle disappears. DuckDB
    // computes the REAL distinct.
    Qd("q351_constraint_distinct_elim",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_nationkey < 13
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""") { (s, dir) =>
      val k = sf(dir)
      val t = s"c351_t_$k"
      TableConstraints.clear(t)
      dropManaged(s, t)
      Engine.registerAll(s, dir)
      s.sql(s"CREATE TABLE $t USING parquet AS " +
        "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer")
      Engine.sql(s, dir, s"ALTER TABLE $t ADD CONSTRAINT pk351 " +
        "PRIMARY KEY (c_custkey) DISABLE NOVALIDATE RELY")
      s.sql(s"SELECT DISTINCT c_custkey, c_mktsegment FROM $t " +
        "WHERE c_nationkey < 13 ORDER BY c_custkey")
    })
}

package graft.queries

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** UDTF / generator surface — SURVEY.md §2.9 (`exec/FunctionRegistry.java:
  * 447-453`: explode, posexplode, inline, stack, json_tuple) plus LATERAL
  * VIEW (`exec/LateralViewJoinOperator.java:76`) and TRANSFORM script
  * execution (`exec/ScriptOperator.java:66`) via Spark SQL's native
  * TRANSFORM. Generators run inside WholeStageCodegen (GenerateExec) — a
  * 1-row→N-rows flatMap that scales row-parallel.
  */
object Generators {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    // Chained LATERAL VIEWs (reference `lateral_view.q` multi-view cases):
    // the second view's generator consumes the first view's output — the
    // per-row cross product of both expansions.
    Qd("q141_lateral_chain",
      """SELECT brand_word, size_digit, count(*) AS n
        |FROM part,
        |  UNNEST(string_split(p_brand, '#')) AS t1(brand_word),
        |  UNNEST(string_split(CAST(p_size AS VARCHAR), '')) AS t2(size_digit)
        |WHERE brand_word <> 'Brand'
        |GROUP BY brand_word, size_digit ORDER BY brand_word, size_digit""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT brand_word, size_digit, count(*) AS n
          |FROM part
          |LATERAL VIEW explode(split(p_brand, '#')) b AS brand_word
          |LATERAL VIEW explode(split(CAST(p_size AS STRING), '')) d AS size_digit
          |WHERE brand_word <> 'Brand'
          |GROUP BY brand_word, size_digit ORDER BY brand_word, size_digit""".stripMargin)
    },

    // explode over a MAP (GenericUDTFExplode's two-column form: key, value
    // per entry) — oracle reconstructs the same pairs via UNION ALL.
    Qd("q145_explode_map",
      """SELECT p_partkey, k, v FROM (
        |  SELECT p_partkey, 'retail_cents' AS k,
        |    CAST(round(p_retailprice * 100, 0) AS INT) AS v FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size' AS k, p_size AS v FROM part)
        |WHERE p_partkey < 900 ORDER BY p_partkey, k""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT p_partkey, k, v
          |FROM part
          |LATERAL VIEW explode(map(
          |  'size', p_size,
          |  'retail_cents', CAST(round(p_retailprice * 100, 0) AS INT))) t AS k, v
          |WHERE p_partkey < 900 ORDER BY p_partkey, k""".stripMargin)
    },

    // explode — word frequency over the corpus (UDTFOperator analog).
    Qd("q51_explode_wordcount",
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""") { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(20)
    },

    // posexplode — 1-based positions to match DuckDB generate_subscripts.
    Qd("q52_posexplode",
      """SELECT doc_id,
        |  CAST(generate_subscripts(string_split(text,' '), 1) AS BIGINT) AS pos,
        |  unnest(string_split(text,' ')) AS word
        |FROM documents WHERE doc_id < 5
        |ORDER BY doc_id, pos""") { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 5)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "word")))
        .select(col("doc_id"), (col("pos0") + 1).cast("bigint").as("pos"),
          col("word"))
        .orderBy("doc_id", "pos")
    },

    // stack — k rows per input row (UDTF stack built-in).
    Qd("q53_stack",
      """SELECT r_name, 'key' AS tag, r_regionkey AS v FROM region
        |UNION ALL
        |SELECT r_name, 'name_len' AS tag, CAST(length(r_name) AS BIGINT) AS v
        |FROM region
        |ORDER BY r_name, tag""") { (s, dir) =>
      t(s, dir, "region")
        .select(col("r_name"),
          expr("stack(2, 'key', CAST(r_regionkey AS BIGINT), 'name_len', CAST(length(r_name) AS BIGINT))")
            .as(Seq("tag", "v")))
        .orderBy("r_name", "tag")
    },

    // inline — explode an array<struct> into columns.
    Qd("q54_inline_struct",
      """SELECT n_name, which, k FROM (
        |  SELECT n_name, 'nation' AS which, n_nationkey AS k FROM nation
        |  UNION ALL
        |  SELECT n_name, 'region' AS which, n_regionkey AS k FROM nation)
        |ORDER BY n_name, which""") { (s, dir) =>
      t(s, dir, "nation")
        .select(col("n_name"), inline(array(
          struct(lit("nation").as("which"), col("n_nationkey").as("k")),
          struct(lit("region").as("which"), col("n_regionkey").as("k")))))
        .orderBy("n_name", "which")
    },

    // json_tuple — multi-field JSON extraction as a generator (UDTF analog;
    // single-field get_json_object is covered by q35).
    Qd("q55_json_tuple",
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sk,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          json_tuple(col("props"), "k").as(Seq("kval")))
        .groupBy("event_type")
        .agg(sum(col("kval").cast("bigint")).as("sk"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // TRANSFORM ... USING — external script row pipe (ScriptOperator.java:66;
    // grammar SelectClauseParser.g:61). Identity `cat` over a tab-delimited
    // row stream, read back as strings.
    Qd("q56_transform_script",
      """SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS name
        |FROM nation ORDER BY k""") { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT TRANSFORM(n_nationkey, n_name)
          |USING 'cat' AS (k STRING, name STRING)
          |FROM nation""".stripMargin).orderBy("k")
    },

    // LATERAL VIEW HiveQL syntax end-to-end through the SQL parser
    // (FromClauseParser.g:128) — doc frequency per word.
    Qd("q57_lateral_view_sql",
      """SELECT word, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word
        |      FROM documents)
        |GROUP BY word HAVING count(DISTINCT doc_id) >= 300
        |ORDER BY df DESC, word""") { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT word, count(DISTINCT doc_id) AS df
          |FROM documents
          |LATERAL VIEW explode(array_distinct(split(text, ' '))) w AS word
          |GROUP BY word HAVING count(DISTINCT doc_id) >= 300
          |ORDER BY df DESC, word""".stripMargin)
    },

    // LATERAL VIEW OUTER / explode_outer: rows with empty arrays survive
    // with NULL (LateralViewJoinOperator outer flag,
    // `parse/FromClauseParser.g:128` KW_OUTER).
    Qd("q96_lateral_view_outer",
      """SELECT r_regionkey, tok FROM (
        |  SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey,
        |    unnest(CASE WHEN r_regionkey < 2
        |      THEN string_split(r_name, 'e') ELSE [NULL] END) AS tok
        |  FROM region) x
        |ORDER BY r_regionkey, tok NULLS FIRST""") { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, tok
          |FROM region
          |LATERAL VIEW OUTER explode(
          |  CASE WHEN r_regionkey < 2 THEN split(r_name, 'e')
          |       ELSE array() END) t AS tok
          |ORDER BY r_regionkey, tok NULLS FIRST""".stripMargin)
    },

    // ORDER BY null placement: Hive defaults NULLs-first ascending,
    // DuckDB defaults NULLs-last — explicit NULLS FIRST/LAST on both sides.
    Qd("q98_null_ordering",
      """SELECT o_orderkey, v FROM (
        |  SELECT o_orderkey, nullif(o_orderstatus, 'O') AS v
        |  FROM orders WHERE o_orderkey < 500) x
        |ORDER BY v NULLS FIRST, o_orderkey DESC""") { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("v"))
        .orderBy(col("v").asc_nulls_first, col("o_orderkey").desc)
    }
  )
}

package graft.queries

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar-function conformance, pack 3 — the last FunctionRegistry
  * clusters with no dedicated query: trigonometry + log constants
  * (`ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:199-226`
  * — sin/cos/tan/asin/acos/atan, pi, e, log(base,x), log2, ceiling),
  * epoch/timezone conversions (`FunctionRegistry.java:274-294` —
  * from_unixtime, to_unix_timestamp, to_date, from_utc_timestamp,
  * to_utc_timestamp), the legacy aliases lcase/ucase/chr
  * (`FunctionRegistry.java:249-268`), map_values
  * (`FunctionRegistry.java:318`), the numeric xpath variants
  * (`FunctionRegistry.java:296-306`), and the environment functions
  * version/current_user/current_database (`FunctionRegistry.java:440-460`).
  *
  * Oracle strategy: floats are `round(_, 6)`-ed on both sides (libm vs
  * Java Math bit-drift); timezone conversions use DuckDB's
  * `timezone(tz, ts)` pair (probed: from_utc == `timezone(tz, ts::TIMESTAMPTZ)`
  * under a UTC session, to_utc == `timezone('UTC', timezone(tz, ts))`);
  * environment functions are asserted shape-only (`length(...) > 0`) since
  * their values are engine-specific by definition.
  */
object Functions3 {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    // Trig + log-constant family. asin/acos inputs confined to [0, 0.99].
    Qd("q121_trig_funcs",
      """SELECT p_partkey,
        |  round(sin(p_size), 6) AS sn, round(cos(p_size), 6) AS cs,
        |  round(tan(p_size % 7), 6) AS tn,
        |  round(asin((p_size % 100) / 100.0), 6) AS asn,
        |  round(acos((p_size % 100) / 100.0), 6) AS acs,
        |  round(atan(p_size - 25), 6) AS atn,
        |  round(pi(), 6) AS pi_, round(exp(1), 6) AS e_,
        |  round(log2(p_retailprice), 6) AS l2,
        |  round(ln(p_retailprice) / ln(3), 6) AS l3,
        |  CAST(ceiling(p_retailprice) AS BIGINT) AS cl
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").selectExpr("p_partkey",
        "round(sin(p_size), 6) AS sn", "round(cos(p_size), 6) AS cs",
        "round(tan(p_size % 7), 6) AS tn",
        "round(asin((p_size % 100) / 100.0), 6) AS asn",
        "round(acos((p_size % 100) / 100.0), 6) AS acs",
        "round(atan(p_size - 25), 6) AS atn",
        "round(pi(), 6) AS pi_", "round(e(), 6) AS e_",
        "round(log2(p_retailprice), 6) AS l2",
        // Hive's two-arg log(base, x)
        "round(log(3, p_retailprice), 6) AS l3",
        "CAST(ceiling(p_retailprice) AS BIGINT) AS cl")
        .orderBy("p_partkey")
    },

    // Epoch + timezone conversion family. The events/orders dates span
    // multiple US-DST transitions, so from/to_utc_timestamp is exercised on
    // both sides of an offset change.
    Qd("q122_time_convert",
      """SELECT o_orderkey,
        |  strftime(to_timestamp(o_orderkey * 977 + 12345), '%Y-%m-%d %H:%M:%S') AS fu,
        |  strftime(to_timestamp(o_orderkey * 977 + 12345), '%Y/%m/%d') AS fu2,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS ep,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR AS VARCHAR) AS ts12,
        |  CAST(CAST((CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR) AS VARCHAR) AS DATE) AS td,
        |  strftime(timezone('America/Los_Angeles',
        |    (CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR)::TIMESTAMPTZ),
        |    '%Y-%m-%d %H:%M:%S') AS la,
        |  strftime(timezone('UTC', timezone('Asia/Tokyo',
        |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR)),
        |    '%Y-%m-%d %H:%M:%S') AS utc
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 2000).selectExpr(
        "o_orderkey",
        "from_unixtime(o_orderkey * 977 + 12345) AS fu",
        "from_unixtime(o_orderkey * 977 + 12345, 'yyyy/MM/dd') AS fu2",
        "to_unix_timestamp(o_orderdate) AS ep",
        "CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR AS STRING) AS ts12",
        "CAST(to_date(CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR AS STRING)) AS STRING) AS td",
        "date_format(from_utc_timestamp(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR, " +
          "'America/Los_Angeles'), 'yyyy-MM-dd HH:mm:ss') AS la",
        "date_format(to_utc_timestamp(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR, " +
          "'Asia/Tokyo'), 'yyyy-MM-dd HH:mm:ss') AS utc")
        .orderBy("o_orderkey")
    },

    // Legacy aliases + map_values + environment functions. map_values order
    // is engine-defined → sorted before the join; environment values are
    // engine-specific → shape-only booleans.
    Qd("q123_alias_env_funcs",
      """SELECT p_partkey,
        |  lower(p_name) AS lc, upper(p_brand) AS uc,
        |  chr(65 + p_size % 26) AS ch, ascii(p_type) AS asc_,
        |  ltrim('  ' || p_brand) AS lt, rtrim(p_brand || '  ') AS rt,
        |  array_to_string(list_sort([CAST(p_size AS VARCHAR),
        |    CAST(p_partkey AS VARCHAR)]), ',') AS mv,
        |  true AS at, true AS v_ok, true AS u_ok, true AS db_ok
        |FROM part WHERE p_partkey < 800 ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 800).selectExpr(
        "p_partkey",
        "lcase(p_name) AS lc", "ucase(p_brand) AS uc",
        "chr(65 + p_size % 26) AS ch", "ascii(p_type) AS asc_",
        "ltrim(concat('  ', p_brand)) AS lt",
        "rtrim(concat(p_brand, '  ')) AS rt",
        "array_join(array_sort(map_values(str_to_map(" +
          "concat('a:', p_size, '|b:', p_partkey), '\\\\|', ':'))), ',') AS mv",
        "isnull(assert_true(p_size >= 0)) AS at",
        "length(version()) > 0 AS v_ok",
        "length(current_user()) > 0 AS u_ok",
        "length(current_database()) > 0 AS db_ok")
        .orderBy("p_partkey")
    },

    // Numeric xpath variants: embed → extract identities (DuckDB has no XML;
    // the oracle is the embedded value itself, same strategy as q75).
    Qd("q124_xpath_numeric",
      """SELECT p_partkey,
        |  round(p_retailprice, 2) AS xd,
        |  round(p_retailprice, 2) AS xn,
        |  CAST(p_partkey * 7 AS BIGINT) AS xl,
        |  CAST(p_size AS SMALLINT) AS xsh,
        |  round(CAST(CAST(p_size + 0.5 AS FLOAT) AS DOUBLE), 1) AS xf
        |FROM part WHERE p_partkey < 600 ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 600).selectExpr(
        "p_partkey",
        "round(xpath_double(concat('<a><v>', p_retailprice, '</v></a>'), 'a/v'), 2) AS xd",
        "round(xpath_number(concat('<a><v>', p_retailprice, '</v></a>'), 'a/v'), 2) AS xn",
        "xpath_long(concat('<a><v>', p_partkey * 7, '</v></a>'), 'a/v') AS xl",
        "xpath_short(concat('<a><v>', p_size, '</v></a>'), 'a/v') AS xsh",
        "round(CAST(xpath_float(concat('<a><v>', p_size + 0.5, '</v></a>'), 'a/v') AS DOUBLE), 1) AS xf")
        .orderBy("p_partkey")
    },

    // Remaining registry aliases: power (= pow), stddev (= stddev_samp in
    // both engines), the regexp function-call spelling of RLIKE, and the
    // current_date/current_timestamp environment values (asserted as
    // invariants — both engines evaluate them during the same run).
    // sha/sha1 have no DuckDB function → known-value FunctionPack3Spec.
    Qd("q136_alias_sweep",
      """SELECT p_partkey,
        |  round(power(p_size, 3), 1) AS pw,
        |  CASE WHEN regexp_matches(p_name, '^a') THEN 1 ELSE 0 END AS re,
        |  year(current_date) >= 2020 AS cd_ok,
        |  current_timestamp >= CAST(current_date AS TIMESTAMP) AS ct_ok
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 500).selectExpr(
        "p_partkey",
        "round(power(p_size, 3), 1) AS pw",
        "CASE WHEN regexp(p_name, '^a') THEN 1 ELSE 0 END AS re",
        "year(current_date()) >= 2020 AS cd_ok",
        "current_timestamp() >= CAST(current_date() AS TIMESTAMP) AS ct_ok")
        .orderBy("p_partkey")
    },

    Qd("q137_stddev_alias",
      """SELECT l_returnflag,
        |  round(stddev(l_quantity), 4) AS sd,
        |  round(stddev_pop(l_quantity), 4) AS sdp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("stddev(l_quantity)"), 4).as("sd"),
          round(expr("stddev_pop(l_quantity)"), 4).as("sdp"))
        .orderBy("l_returnflag")
    },

    // Null-on-error evaluation semantics (Hive `GenericUDFOPDivide` /
    // `UDFToInteger`: division by zero and malformed casts yield NULL, they
    // never raise) — the reason the engine session runs with ANSI off.
    Qd("q138_null_on_error",
      """SELECT p_partkey,
        |  CAST(p_size AS DOUBLE) / nullif(p_size % 5, 0) AS d5,
        |  1 / (p_size - p_size) AS dz,
        |  TRY_CAST(p_type AS INT) AS bad_int,
        |  TRY_CAST(substr(p_name, 1, 3) AS DOUBLE) AS bad_dbl
        |FROM part WHERE p_partkey < 700 ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 700).selectExpr(
        "p_partkey",
        // Hive: x/0 → NULL (the oracle spells it nullif; ours divides raw)
        "CAST(p_size AS DOUBLE) / (p_size % 5) AS d5",
        "1 / (p_size - p_size) AS dz",
        "CAST(p_type AS INT) AS bad_int",
        "CAST(substr(p_name, 1, 3) AS DOUBLE) AS bad_dbl")
        .orderBy("p_partkey")
    },

    // Backquoted regex column names (Hive `hive.support.quoted.identifiers
    // =none`, qtests `quotedid_*.q` / `regex_col.q`): `o_order.*` expands to
    // every matching column. Spark gates the identical behavior behind
    // spark.sql.parser.quotedRegexColumnNames — set for the statement, then
    // restored (the conf is read at parse time, so resetting after sql()
    // returns is safe).
    Qd("q139_regex_columns",
      """SELECT o_orderkey, o_orderstatus, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""") { (s, dir) =>
      val key = "spark.sql.parser.quotedRegexColumnNames"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try Engine.sql(s, dir,
        """SELECT `o_order.*` FROM orders
          |WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },

    // in_file(str, filename) — whole-line membership against a side file
    // (`GenericUDFInFile.java`, FunctionRegistry.java:255). The lookup file
    // is staged to the JVM tmpdir at build time; the oracle is the
    // equivalent IN-list over the same three values.
    Qd("q127_in_file",
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE p_brand IN ('Brand#11', 'Brand#23', 'Brand#35')
        |ORDER BY p_partkey""") { (s, dir) =>
      val f = java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_in_file_brands.txt"),
        "Brand#11\nBrand#23\nBrand#35\n".getBytes("UTF-8"))
      Engine.sql(s, dir,
        s"""SELECT p_partkey, p_brand FROM part
           |WHERE in_file(p_brand, '${f.toString}')
           |ORDER BY p_partkey""".stripMargin)
    },

    // The last §2.8 registry names, SQL-callable (FuncAudit closes the
    // reference FunctionRegistry diff to compute_stats/get_splits, both
    // documented descopes): parse_url_tuple as a REAL generator under
    // LATERAL VIEW (GenericUDTFParseUrlTuple semantics — java.net.URL
    // accessors, QUERY:<key> regex, one row per input), reflect2 instance
    // dispatch incl. primitive-arg overloads, and the uniontype pair
    // create_union/extract_union. Oracle recomputes every value closed-form
    // from the same URL/string construction.
    Qd("q344_fn_registry_gap",
      """SELECT CAST(c_custkey AS BIGINT) AS ck,
        |  'h' || CAST(c_custkey AS VARCHAR) || '.example.com' AS host,
        |  '/p/' || c_mktsegment AS path,
        |  CAST(c_custkey AS VARCHAR) AS qv,
        |  CAST(c_custkey % 3 AS INT) AS utag,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_name END AS u0,
        |  CAST(CASE WHEN c_custkey % 3 = 1 THEN c_custkey * 2 END AS BIGINT) AS u1,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_name END AS e0,
        |  CAST(length(c_name) AS BIGINT) AS nlen,
        |  substr(c_name, 10) AS nsuf,
        |  lower(c_mktsegment) AS segl
        |FROM customer WHERE c_custkey <= 300 ORDER BY ck""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT CAST(c_custkey AS BIGINT) AS ck,
          |  t.host, t.path, t.qv,
          |  u.tag AS utag, u.field0 AS u0, CAST(u.field1 AS BIGINT) AS u1,
          |  extract_union(u, 0) AS e0,
          |  CAST(reflect2(c_name, 'length') AS BIGINT) AS nlen,
          |  reflect2(c_name, 'substring', 9) AS nsuf,
          |  reflect2(c_mktsegment, 'toLowerCase') AS segl
          |FROM (SELECT c_custkey, c_name, c_mktsegment,
          |        concat('http://h', c_custkey, '.example.com/p/',
          |               c_mktsegment, '?q=', c_custkey, '&z=2') AS url,
          |        create_union(CAST(c_custkey % 3 AS INT), c_name,
          |                     c_custkey * 2) AS u
          |      FROM customer WHERE c_custkey <= 300)
          |LATERAL VIEW parse_url_tuple(url, 'HOST', 'PATH', 'QUERY:q')
          |  t AS host, path, qv
          |ORDER BY ck""".stripMargin)
    },

    // ngrams / context_ngrams UDAFs by their SQL names
    // (GenericUDAFnGrams / GenericUDAFContextNGrams): exact top-k over
    // constructed 3-word sentences, so the oracle enumerates both bigram
    // families and the context fillers closed-form. Frequencies are exact
    // (the reference's precision_factor is a lossy memory heuristic a
    // shuffle aggregate does not need — accuracy strictly >=).
    Qd("q345_fn_ngrams_sql",
      """WITH t AS (SELECT 's' || o_orderstatus AS w1,
        |    'm' || CAST(o_orderkey % 3 AS VARCHAR) AS w2,
        |    'p' || replace(o_orderpriority, ' ', '_') AS w3
        |  FROM orders WHERE o_orderkey <= 4000),
        |b AS (SELECT w1 || ' ' || w2 AS gram FROM t
        |      UNION ALL SELECT w2 || ' ' || w3 FROM t),
        |top AS (SELECT 'ngrams' AS fam, gram,
        |    CAST(count(*) AS DOUBLE) AS estfrequency
        |  FROM b GROUP BY gram ORDER BY estfrequency DESC, gram LIMIT 8),
        |ctx AS (SELECT 'ctx' AS fam, w2 AS gram,
        |    CAST(count(*) AS DOUBLE) AS estfrequency
        |  FROM t WHERE w1 = 'sO' GROUP BY w2
        |  ORDER BY estfrequency DESC, gram LIMIT 5)
        |SELECT * FROM top UNION ALL SELECT * FROM ctx
        |ORDER BY fam, estfrequency DESC, gram""") { (s, dir) =>
      Engine.sql(s, dir,
        """WITH t AS (SELECT concat('s', o_orderstatus, ' m',
          |    CAST(o_orderkey % 3 AS STRING), ' p',
          |    replace(o_orderpriority, ' ', '_')) AS text
          |  FROM orders WHERE o_orderkey <= 4000),
          |g AS (SELECT inline(ngrams(split(text, ' '), 2, 8)) FROM t),
          |c AS (SELECT inline(context_ngrams(split(text, ' '),
          |        array('sO', CAST(NULL AS STRING)), 5)) FROM t)
          |SELECT 'ngrams' AS fam, array_join(ngram, ' ') AS gram, estfrequency
          |FROM g
          |UNION ALL
          |SELECT 'ctx', array_join(ngram, ' '), estfrequency FROM c
          |ORDER BY fam, estfrequency DESC, gram""".stripMargin)
    },

    // compute_stats — the ANALYZE-backing UDAF (GenericUDAFComputeStats),
    // closing the registry audit to 220/221. Every type dispatch is
    // exercised (Long/Double/String/Boolean/timestamp-as-Long/Decimal/Date/
    // Binary, plus the nbv=0 disabled-estimator case) and the oracle
    // recomputes each extracted struct field closed-form. The string column
    // carries NULLs so countnulls and Hive's nulls-in-denominator avglength
    // (sumlength/(count+countnulls)) are both visible.
    Qd("q346_compute_stats",
      """WITH t AS (SELECT *, CASE WHEN l_linenumber > 2 THEN l_returnflag END AS sn
        |  FROM lineitem WHERE l_orderkey <= 2000)
        |SELECT 'Long' AS lt, min(l_orderkey) AS lmin, max(l_orderkey) AS lmax,
        |  CAST(0 AS BIGINT) AS lnulls,
        |  count(DISTINCT l_orderkey) AS lndv, '' AS lbv,
        |  min(l_quantity) AS dmin, max(l_quantity) AS dmax,
        |  count(DISTINCT l_quantity) AS dndv,
        |  'String' AS st, coalesce(max(length(sn)), 0) AS smaxlen,
        |  round(coalesce(CAST(sum(length(sn)) AS DOUBLE) / count(*), 0), 6) AS savglen,
        |  count(*) - count(sn) AS snulls, count(DISTINCT sn) AS sndv,
        |  count(CASE WHEN l_quantity > 25 THEN 1 END) AS btrue,
        |  count(CASE WHEN NOT (l_quantity > 25) THEN 1 END) AS bfalse,
        |  CAST(0 AS BIGINT) AS bnulls,
        |  CAST(epoch(min(l_shipdate)) AS BIGINT) AS tmin,
        |  CAST(epoch(max(l_shipdate)) AS BIGINT) AS tmax,
        |  CAST(0 AS BIGINT) AS zndv,
        |  CAST(1 AS BIGINT) AS bymaxlen, CAST(1 AS DOUBLE) AS byavglen,
        |  CAST(min(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS dcmin,
        |  CAST(max(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS dcmax,
        |  CAST(min(l_shipdate) AS DATE) AS damin,
        |  CAST(max(l_shipdate) AS DATE) AS damax
        |FROM t""") { (s, dir) =>
      Engine.sql(s, dir,
        """WITH agg AS (SELECT
          |    compute_stats(l_orderkey, 16) AS ls,
          |    compute_stats(l_quantity, 16) AS ds,
          |    compute_stats(CASE WHEN l_linenumber > 2 THEN l_returnflag END, 16) AS ss,
          |    compute_stats(l_quantity > 25, 16) AS bs,
          |    compute_stats(l_shipdate, 16) AS ts,
          |    compute_stats(l_orderkey, 0) AS zs,
          |    compute_stats(CAST(l_returnflag AS BINARY), 16) AS bys,
          |    compute_stats(CAST(l_quantity AS DECIMAL(12,2)), 16) AS dcs,
          |    compute_stats(CAST(l_shipdate AS DATE), 16) AS das
          |  FROM lineitem WHERE l_orderkey <= 2000)
          |SELECT ls.columntype AS lt, ls.min AS lmin, ls.max AS lmax,
          |  ls.countnulls AS lnulls, ls.numdistinctvalues AS lndv,
          |  ls.ndvbitvector AS lbv,
          |  ds.min AS dmin, ds.max AS dmax, ds.numdistinctvalues AS dndv,
          |  ss.columntype AS st, ss.maxlength AS smaxlen,
          |  round(ss.avglength, 6) AS savglen,
          |  ss.countnulls AS snulls, ss.numdistinctvalues AS sndv,
          |  bs.counttrues AS btrue, bs.countfalses AS bfalse,
          |  bs.countnulls AS bnulls,
          |  ts.min AS tmin, ts.max AS tmax,
          |  zs.numdistinctvalues AS zndv,
          |  bys.maxlength AS bymaxlen, bys.avglength AS byavglen,
          |  CAST(dcs.min AS DOUBLE) AS dcmin, CAST(dcs.max AS DOUBLE) AS dcmax,
          |  das.min AS damin, das.max AS damax
          |FROM agg""".stripMargin)
    }
  )
}

package graft.queries

import graft.Engine
import graft.functions.HiveFunctionPack
import graft.operators.TextNGrams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar-function conformance surface — SURVEY.md §2.8 (registry
  * `exec/FunctionRegistry.java:183-492`). Each query exercises a family of
  * built-ins against the DuckDB oracle; Hive-gap functions (field, masks,
  * hive_hash, union type) live in [[graft.functions.HiveFunctionPack]].
  *
  * Float-returning math is rounded on both sides (JVM Math vs C libm can
  * differ in the last ulp); integer/string functions compare exactly.
  */
object Functions {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    // String family (FunctionRegistry.java:183-269).
    Qd("q30_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  substr(p_name, 1, 5) AS sub5, reverse(p_type) AS rev,
        |  concat_ws('|', p_brand, p_type) AS bt,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS pad,
        |  replace(p_type, ' ', '_') AS repl,
        |  CAST(instr(p_name, 'a') AS BIGINT) AS posa,
        |  repeat('x', p_size % 3) AS rep,
        |  ascii(p_name) AS ac,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
        |  translate(p_type, 'AEO', 'aeo') AS tr,
        |  trim(concat(' ', p_brand, ' ')) AS trm
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("bigint").as("len"),
        substring(col("p_name"), 1, 5).as("sub5"), reverse(col("p_type")).as("rev"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        lpad(col("p_size").cast("string"), 4, "0").as("pad"),
        expr("replace(p_type, ' ', '_')").as("repl"),
        instr(col("p_name"), "a").cast("bigint").as("posa"),
        expr("repeat('x', p_size % 3)").as("rep"),
        ascii(col("p_name")).as("ac"),
        levenshtein(col("p_brand"), col("p_type")).cast("bigint").as("lev"),
        translate(col("p_type"), "AEO", "aeo").as("tr"),
        trim(concat(lit(" "), col("p_brand"), lit(" "))).as("trm"))
        .orderBy("p_partkey")
    },

    // Regex + LIKE family (like/rlike/regexp_replace/regexp_extract/split).
    Qd("q31_regex_funcs",
      """SELECT doc_id,
        |  regexp_replace(text, '[aeiou]', '', 'g') AS novowel,
        |  regexp_extract(text, '([a-z]+)', 1) AS firstword,
        |  text LIKE '%join%' AS has_join,
        |  regexp_matches(text, 'jo.n') AS rl,
        |  split_part(text, ' ', 2) AS w2
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "[aeiou]", "").as("novowel"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("firstword"),
        col("text").like("%join%").as("has_join"),
        col("text").rlike("jo.n").as("rl"),
        expr("split_part(text, ' ', 2)").as("w2"))
        .orderBy("doc_id")
    },

    // Math family (FunctionRegistry.java:197-232).
    Qd("q32_math_funcs",
      """SELECT p_partkey,
        |  round(sqrt(p_retailprice), 6) AS sq,
        |  round(cbrt(p_retailprice), 6) AS cb,
        |  round(exp(p_size % 5), 6) AS ex,
        |  round(ln(p_retailprice), 6) AS ln_,
        |  round(log10(p_retailprice), 6) AS l10,
        |  round(pow(p_size, 2), 1) AS p2,
        |  abs(p_size - 50) AS ab,
        |  sign(p_size - 50) AS sg,
        |  ((p_size - 50) % 7 + 7) % 7 AS pm,
        |  greatest(p_size, 25) AS gr, least(p_size, 25) AS ls,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  round(degrees(p_size % 4), 6) AS dg,
        |  round(radians(p_size), 6) AS rd
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        round(cbrt(col("p_retailprice")), 6).as("cb"),
        round(exp(col("p_size") % 5), 6).as("ex"),
        round(log(col("p_retailprice")), 6).as("ln_"),
        round(log10(col("p_retailprice")), 6).as("l10"),
        round(pow(col("p_size"), 2), 1).as("p2"),
        abs(col("p_size") - 50).as("ab"),
        signum(col("p_size") - 50).cast("int").as("sg"),
        pmod(col("p_size") - 50, lit(7)).as("pm"),
        greatest(col("p_size"), lit(25)).as("gr"),
        least(col("p_size"), lit(25)).as("ls"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        round(degrees(col("p_size") % 4), 6).as("dg"),
        round(radians(col("p_size")), 6).as("rd"))
        .orderBy("p_partkey")
    },

    // Date/time family (FunctionRegistry.java:274-294,440-445). Date-typed
    // results are emitted as strings to keep both engines' physical types
    // identical.
    Qd("q33_date_funcs",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        |  weekofyear(o_orderdate) AS wk,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS ld,
        |  CAST(CAST(o_orderdate AS DATE) + 7 AS VARCHAR) AS plus7,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS am,
        |  CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS ep,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS tr
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"), quarter(col("o_orderdate")).as("q"),
        weekofyear(col("o_orderdate")).as("wk"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        last_day(col("o_orderdate")).cast("string").as("ld"),
        date_add(col("o_orderdate"), 7).cast("string").as("plus7"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("dd"),
        add_months(col("o_orderdate"), 2).cast("string").as("am"),
        unix_timestamp(col("o_orderdate")).as("ep"),
        trunc(col("o_orderdate"), "MM").cast("string").as("tr"))
        .orderBy("o_orderkey")
    },

    // Conditional/null family (FunctionRegistry.java:331-347,420-424) via the
    // SQL surface — Hive's if/nvl/nullif/case/between/<=>.
    Qd("q34_conditional_funcs",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
        |  CASE WHEN c_acctbal BETWEEN 0 AND 1000 THEN 'S'
        |       WHEN c_acctbal BETWEEN 1000 AND 5000 THEN 'M'
        |       ELSE 'L' END AS bucket,
        |  greatest(c_acctbal, 0.0) AS g, least(c_acctbal, 100.0) AS l,
        |  (c_acctbal IS NULL) AS isn,
        |  (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS nsafe,
        |  c_nationkey IN (1, 2, 3) AS in3
        |FROM customer ORDER BY c_custkey""") { (s, dir) =>
      Engine.sql(s, dir,
        """SELECT c_custkey,
          |  if(c_acctbal > 5000, 'high', 'low') AS tier,
          |  nvl(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
          |  CASE WHEN c_acctbal BETWEEN 0 AND 1000 THEN 'S'
          |       WHEN c_acctbal BETWEEN 1000 AND 5000 THEN 'M'
          |       ELSE 'L' END AS bucket,
          |  greatest(c_acctbal, 0.0D) AS g, least(c_acctbal, 100.0D) AS l,
          |  isnull(c_acctbal) AS isn,
          |  (c_mktsegment <=> 'BUILDING') AS nsafe,
          |  c_nationkey IN (1, 2, 3) AS in3
          |FROM customer ORDER BY c_custkey""".stripMargin)
    },

    // JSON + timestamp-part family (get_json_object/from_json,
    // FunctionRegistry.java:296-306).
    Qd("q35_json_events",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
        |  hour(ts) AS h, minute(ts) AS mi,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS tstr
        |FROM events ORDER BY event_id""") { (s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_struct"),
        hour(col("ts")).as("h"), minute(col("ts")).as("mi"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("tstr"))
        .orderBy("event_id")
    },

    // Complex-type family (FunctionRegistry.java:195,413-434): arrays,
    // structs, str_to_map.
    Qd("q36_complex_types",
      """SELECT p_partkey,
        |  array_to_string(list_sort([p_size, p_size * 2, 1]), ',') AS arr,
        |  CAST(len([p_size, p_size * 2]) AS BIGINT) AS n,
        |  list_contains([1, 2, p_size], 24) AS hasit,
        |  [p_brand, p_type][1] AS first_el,
        |  concat_ws('|', CAST(p_size AS VARCHAR), p_brand) AS st,
        |  p_brand AS brand2
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      val struct = named_struct(lit("sz"), col("p_size"), lit("br"), col("p_brand"))
      t(s, dir, "part").select(col("p_partkey"),
        array_join(sort_array(array(col("p_size"), col("p_size") * 2, lit(1)))
          .cast("array<string>"), ",").as("arr"),
        size(array(col("p_size"), col("p_size") * 2)).cast("bigint").as("n"),
        array_contains(array(lit(1), lit(2), col("p_size")), 24).as("hasit"),
        element_at(array(col("p_brand"), col("p_type")), 1).as("first_el"),
        // struct build + field access, flattened to one sortable string
        concat_ws("|", struct.getField("sz"), struct.getField("br")).as("st"),
        element_at(expr("str_to_map(concat('size=', p_size, '&brand=', p_brand), '&', '=')"),
          "brand").as("brand2"))
        .orderBy("p_partkey")
    },

    // Crypto/encoding family (FunctionRegistry.java:227-244).
    Qd("q37_crypto_funcs",
      """SELECT p_partkey,
        |  md5(p_name) AS m5,
        |  sha256(p_name) AS s256,
        |  to_base64(encode(p_name)) AS b64,
        |  lower(hex(encode(p_name))) AS hx
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        md5(col("p_name")).as("m5"),
        sha2(col("p_name"), 256).as("s256"),
        base64(col("p_name").cast("binary")).as("b64"),
        lower(hex(col("p_name").cast("binary"))).as("hx"))
        .orderBy("p_partkey")
    },

    // Hive-gap functions: field (custom expression), elt, mask_first_n
    // (HiveFunctionPack). hive_hash / union type / parse_url_tuple are
    // covered in FunctionPackSpec (no SQL-expressible oracle).
    Qd("q38_hive_gap_funcs",
      """SELECT c_custkey,
        |  CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'AUTOMOBILE' THEN 2
        |       WHEN 'MACHINERY' THEN 3 ELSE 0 END AS fld,
        |  CASE (1 + c_nationkey % 3) WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
        |       ELSE 'gamma' END AS elt_val,
        |  concat(regexp_replace(regexp_replace(regexp_replace(
        |    substr(c_name, 1, 4), '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
        |    '[0-9]', 'n', 'g'), substr(c_name, 5)) AS masked,
        |  md5(c_name) AS mhash
        |FROM customer ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        HiveFunctionPack.field(col("c_mktsegment"),
          lit("BUILDING"), lit("AUTOMOBILE"), lit("MACHINERY")).as("fld"),
        expr("elt(1 + c_nationkey % 3, 'alpha', 'beta', 'gamma')").as("elt_val"),
        HiveFunctionPack.mask_first_n(col("c_name"), 4).as("masked"),
        HiveFunctionPack.mask_hash(col("c_name")).as("mhash"))
        .orderBy("c_custkey")
    },

    // ngrams UDAF analog (GenericUDAFnGrams) — exact distributed top-k.
    Qd("q39_ngrams",
      """WITH w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l
        |           FROM documents),
        |b AS (SELECT unnest(list_filter(list_transform(l,
        |        (x, i) -> CASE WHEN i < len(l) THEN concat(x, ' ', l[i+1]) END),
        |        v -> v IS NOT NULL)) AS ngram FROM w)
        |SELECT ngram, CAST(count(*) AS BIGINT) AS freq FROM b
        |GROUP BY ngram ORDER BY freq DESC, ngram LIMIT 20""") { (s, dir) =>
      TextNGrams.topK(t(s, dir, "documents"), col("text"), 2, 20)
    }
  )
}

package graft.queries

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar-function conformance, continued — the SURVEY.md §2.8 families not
  * covered by [[Functions]]: xpath (`FunctionRegistry.java:296-306`),
  * `sentences`, codec/crypto roundtrips (aes/base64/hex/encode,
  * `FunctionRegistry.java:227-244`), `reflect`/`java_method`
  * (`FunctionRegistry.java:323-338`), and the string/math stragglers
  * (initcap, substring_index, find_in_set, locate, conv, bin, factorial,
  * format_number, printf, space, soundex, crc32).
  *
  * Oracle strategy: DuckDB has no XML or AES, so xpath queries assert
  * *identities* (extract-what-you-embedded) and codec queries assert
  * *roundtrips* — the oracle side is then plain column SQL. soundex/crc32
  * have no DuckDB equivalent at all → rows-only + exact-value ScalaTest
  * spec ([[graft.FunctionPack2Spec]]).
  */
object Functions2 {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  val all: Seq[Qd] = Seq(

    Qd("q66_string_funcs2",
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(lower(p_name),' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS ic,
        |  array_to_string(string_split(p_name,' ')[1:1], ' ') AS si1,
        |  CAST(coalesce(list_position(string_split('Brand#5,Brand#13,Brand#19',','),
        |    p_brand), 0) AS BIGINT) AS fis,
        |  CAST(strpos(p_name, 'old') AS BIGINT) AS loc,
        |  upper(to_hex(p_size)) AS cnv,
        |  bin(p_size) AS bn,
        |  CAST(factorial(p_size % 10) AS BIGINT) AS fact,
        |  printf('%.2f', p_size + 0.337) AS fmtn,
        |  printf('%s|%02d', p_brand, p_size % 7) AS pf,
        |  repeat(' ', p_size % 3) || '.' AS sp
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        initcap(col("p_name")).as("ic"),
        substring_index(col("p_name"), " ", 1).as("si1"),
        expr("CAST(find_in_set(p_brand, 'Brand#5,Brand#13,Brand#19') AS BIGINT)").as("fis"),
        expr("CAST(locate('old', p_name) AS BIGINT)").as("loc"),
        conv(col("p_size"), 10, 16).as("cnv"),
        bin(col("p_size")).as("bn"),
        factorial(col("p_size") % 10).as("fact"),
        format_number(col("p_size") + 0.337, 2).as("fmtn"),
        format_string("%s|%02d", col("p_brand"), col("p_size") % 7).as("pf"),
        concat(expr("space(p_size % 3)"), lit(".")).as("sp"))
        .orderBy("p_partkey")
    },

    // sentences() returns array<array<string>>; joined to 'w w w|w w' text on
    // both sides — the driver's pandas compare can't hash array cells.
    // Native nested-array values are asserted in FunctionPack2Spec.
    Qd("q67_sentences",
      """SELECT p_partkey,
        |  array_to_string(list_transform(list_filter(
        |    regexp_split_to_array(p_name || '. ' || p_type || '!', '[.!?] *'),
        |    x -> len(x) > 0), x -> array_to_string(string_split(x, ' '), ' ')),
        |    '|') AS sents
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey"),
          array_join(transform(
            sentences(concat(col("p_name"), lit(". "), col("p_type"), lit("!"))),
            x => array_join(x, " ")), "|").as("sents"))
        .orderBy("p_partkey")
    },

    Qd("q68_codec_roundtrip",
      """SELECT s_suppkey,
        |  s_name AS aes_rt, s_name AS b64_rt, s_name AS enc_rt,
        |  to_base64(CAST(s_name AS BLOB)) AS b64,
        |  hex(CAST(s_name AS BLOB)) AS hx, s_name AS hex_rt
        |FROM supplier ORDER BY s_suppkey""") { (s, dir) =>
      t(s, dir, "supplier").select(col("s_suppkey"),
        expr("CAST(aes_decrypt(aes_encrypt(CAST(s_name AS BINARY), '0123456789abcdef')," +
          " '0123456789abcdef') AS STRING)").as("aes_rt"),
        expr("CAST(unbase64(base64(CAST(s_name AS BINARY))) AS STRING)").as("b64_rt"),
        expr("decode(encode(s_name, 'UTF-8'), 'UTF-8')").as("enc_rt"),
        base64(col("s_name").cast("binary")).as("b64"),
        hex(col("s_name").cast("binary")).as("hx"),
        expr("CAST(unhex(hex(s_name)) AS STRING)").as("hex_rt"))
        .orderBy("s_suppkey")
    },

    // reflect/java_method (flag-gated in a real deployment — arbitrary JVM
    // calls; here exercised on pure java.lang.Math/Integer).
    Qd("q69_reflect",
      """SELECT s_suppkey,
        |  CAST(greatest(s_nationkey, 7) AS VARCHAR) AS jm_max,
        |  bin(s_suppkey) AS jm_bin,
        |  CAST(abs(s_nationkey - 12) AS VARCHAR) AS rf_abs
        |FROM supplier ORDER BY s_suppkey""") { (s, dir) =>
      t(s, dir, "supplier").select(col("s_suppkey"),
        expr("java_method('java.lang.Math', 'max', CAST(s_nationkey AS INT), 7)").as("jm_max"),
        expr("java_method('java.lang.Long', 'toBinaryString', s_suppkey)").as("jm_bin"),
        expr("reflect('java.lang.Math', 'abs', CAST(s_nationkey - 12 AS INT))").as("rf_abs"))
        .orderBy("s_suppkey")
    },

    Qd("q75_xpath_identities",
      """SELECT p_partkey, p_brand AS xs, CAST(p_size AS BIGINT) AS xi,
        |  CASE WHEN p_size > 20 THEN true ELSE false END AS xb,
        |  array_to_string(string_split(p_name, ' '), '|') AS xl
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          expr("xpath_string(concat('<a><b>', p_brand, '</b></a>'), 'a/b')").as("xs"),
          expr("CAST(xpath_int(concat('<a><n>', p_size, '</n></a>'), 'a/n') AS BIGINT)").as("xi"),
          expr("xpath_boolean(concat('<a>', IF(p_size > 20, '<big/>', ''), '</a>'), 'a/big')").as("xb"),
          // xpath() node-list output joined to text for the driver compare;
          // the native array<string> value is asserted in FunctionPack2Spec
          expr("array_join(xpath(concat('<r>', concat_ws('', transform(split(p_name, ' '), " +
            "w -> concat('<w>', w, '</w>'))), '</r>'), 'r/w/text()'), '|')").as("xl"))
        .orderBy("p_partkey")
    },

    // soundex + crc32 + sha1 + bround (half-even) have no DuckDB
    // equivalent, so the oracle is a KNOWN-ANSWER VECTOR table: DuckDB
    // serves the published expected values as literals while Spark
    // COMPUTES the functions over the same inputs — a full hash-checkable
    // compare (the census soundex examples, standard CRC-32/SHA-1, and
    // half-even rounding at the exact .5 boundary). Exact values over the
    // part table remain asserted in FunctionPack2Spec.
    Qd("q76_soundex_crc32",
      """SELECT * FROM (VALUES
        |  ('Robert',     'R163', CAST(2125754577 AS BIGINT), CAST(6.0 AS DOUBLE), 'b7f73c5b66dca06b94aa7a7134c24e0159e1dd0a'),
        |  ('Rupert',     'R163', CAST(2935251174 AS BIGINT), CAST(6.0 AS DOUBLE), '2968f1f9f9049808f5098ddc33968d3a133a988d'),
        |  ('Tymczak',    'T522', CAST(3507137138 AS BIGINT), CAST(8.0 AS DOUBLE), '03aa30387e9b7eec242c70dedf3b398897a49aeb'),
        |  ('Ashcraft',   'A261', CAST(2337072898 AS BIGINT), CAST(8.0 AS DOUBLE), '291b89fe8657d98e8b17ff73d755d69f9f4569a3'),
        |  ('Pfister',    'P236', CAST(2026213310 AS BIGINT), CAST(8.0 AS DOUBLE), 'f55c9719db075dde825aa40c60b5159c3336f948'),
        |  ('Honeyman',   'H555', CAST(22810102   AS BIGINT), CAST(8.0 AS DOUBLE), 'd12ad60fb9ab3930905ea2aa4c45dbb953ff74a0'),
        |  ('Washington', 'W252', CAST(3712178158 AS BIGINT), CAST(10.0 AS DOUBLE), 'a27a6644654593ac9e5d122b1155ff23752c8073'),
        |  ('Lee',        'L000', CAST(2744362883 AS BIGINT), CAST(4.0 AS DOUBLE), '4beb46d36a8d0d77bfa696083bfeab4b6ee156d4')
        |) AS v(inp, sdx, crc, br, sh) ORDER BY inp""") { (s, dir) =>
      import s.implicits._
      Seq("Robert", "Rupert", "Tymczak", "Ashcraft", "Pfister", "Honeyman",
          "Washington", "Lee").toDF("inp")
        .select(col("inp"),
          soundex(col("inp")).as("sdx"),
          crc32(col("inp").cast("binary")).as("crc"),
          bround(length(col("inp")) + 0.5, 0).as("br"),
          sha1(col("inp").cast("binary")).as("sh"))
        .orderBy("inp")
    },

    // Bitwise shift family (`FunctionRegistry.java` shiftleft/shiftright/
    // shiftrightunsigned) — DuckDB `<<`/`>>` operators as oracle.
    Qd("q74b_bit_shifts",
      """SELECT p_partkey,
        |  CAST(p_size << 3 AS BIGINT) AS sl,
        |  CAST(p_size >> 1 AS BIGINT) AS sr,
        |  CAST(xor(p_size, 255) AS BIGINT) AS xo,
        |  CAST(p_size & 15 AS BIGINT) AS an,
        |  CAST(p_size | 64 AS BIGINT) AS orr,
        |  CAST(~p_size AS BIGINT) AS nt
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        expr("CAST(shiftleft(p_size, 3) AS BIGINT)").as("sl"),
        expr("CAST(shiftright(p_size, 1) AS BIGINT)").as("sr"),
        expr("CAST(p_size ^ 255 AS BIGINT)").as("xo"),
        expr("CAST(p_size & 15 AS BIGINT)").as("an"),
        expr("CAST(p_size | 64 AS BIGINT)").as("orr"),
        expr("CAST(~p_size AS BIGINT)").as("nt"))
        .orderBy("p_partkey")
    },

    // Array higher-order + set functions (complex-type surface beyond q36:
    // exists/forall/aggregate/zip_with + union/sort/position/remove).
    Qd("q106_array_hofs",
      """WITH a AS (SELECT p_partkey,
        |    [p_size, p_size % 7, 42, p_size % 7] AS arr FROM part)
        |SELECT p_partkey,
        |  list_bool_or(list_transform(arr, x -> x > 20)) AS ex,
        |  list_bool_and(list_transform(arr, x -> x >= 0)) AS fa,
        |  CAST(list_reduce(arr, (x, y) -> x + y) AS BIGINT) AS red,
        |  array_to_string(list_transform(list_zip(arr, list_reverse_sort(arr)),
        |    p -> p[1] + p[2]), ',') AS zipd,
        |  array_to_string(list_sort(list_distinct(arr || [1, 2])), ',') AS uni,
        |  array_to_string(list_reverse_sort(arr), ',') AS srt,
        |  CAST(list_position(arr, 42) AS BIGINT) AS pos,
        |  array_to_string(list_filter(arr, x -> x <> 42), ',') AS rem,
        |  list_contains(arr, 13) AS ctn
        |FROM a ORDER BY p_partkey""") { (s, dir) =>
      // array outputs joined to csv text for the driver's pandas compare;
      // native array values for these ops are asserted in FunctionPack2Spec
      def csv(c: org.apache.spark.sql.Column) =
        array_join(transform(c, _.cast("string")), ",")
      t(s, dir, "part")
        .withColumn("arr", array(col("p_size"), col("p_size") % 7, lit(42),
          col("p_size") % 7))
        .select(col("p_partkey"),
          exists(col("arr"), _ > 20).as("ex"),
          forall(col("arr"), _ >= 0).as("fa"),
          aggregate(col("arr"), lit(0), (a, x) => a + x).cast("bigint").as("red"),
          csv(zip_with(col("arr"), sort_array(col("arr"), asc = false),
            (x, y) => x + y)).as("zipd"),
          csv(array_sort(array_union(col("arr"), array(lit(1), lit(2))))).as("uni"),
          csv(sort_array(col("arr"), asc = false)).as("srt"),
          array_position(col("arr"), 42).as("pos"),
          csv(array_remove(col("arr"), 42)).as("rem"),
          array_contains(col("arr"), 13).as("ctn"))
        .orderBy("p_partkey")
    },

    // Map-type functions (str_to_map + transform_values/map_filter/
    // map_concat/map_keys) — identity-style oracle (DuckDB recomputes the
    // expected scalars; the Spark side exercises the real map ops).
    Qd("q107_map_funcs",
      """SELECT p_partkey,
        |  'brand,size' AS mk,
        |  p_brand AS mv_brand,
        |  upper(CAST(p_size AS VARCHAR)) AS mv_size_up,
        |  CAST(2 AS BIGINT) AS msize,
        |  CAST(1 AS BIGINT) AS n_brandkey,
        |  'x' AS extra
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part")
        .withColumn("m", expr(
          "str_to_map(concat('brand:', p_brand, ',size:', p_size), ',', ':')"))
        .select(col("p_partkey"),
          array_join(array_sort(map_keys(col("m"))), ",").as("mk"),
          element_at(col("m"), "brand").as("mv_brand"),
          element_at(expr("transform_values(m, (k, v) -> upper(v))"), "size")
            .as("mv_size_up"),
          size(col("m")).cast("bigint").as("msize"),
          size(expr("map_filter(m, (k, v) -> k = 'brand')")).cast("bigint")
            .as("n_brandkey"),
          element_at(expr("map_concat(m, map('extra', 'x'))"), "extra")
            .as("extra"))
        .orderBy("p_partkey")
    },

    // collect_list as a windowed aggregate over a moving ROWS frame
    // (any-UDAF-over-window, §2.5) — DuckDB `list() OVER` as oracle.
    Qd("q108_window_collect",
      """SELECT s_suppkey,
        |  array_to_string(list(s_nationkey) OVER (ORDER BY s_suppkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), ',') AS last3
        |FROM supplier ORDER BY s_suppkey""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // the windowed collect_list is the op under test; the csv join only
      // normalizes the wire type for the driver compare (native array value
      // asserted in FunctionPack2Spec)
      val w = Window.orderBy("s_suppkey").rowsBetween(-2, 0)
      t(s, dir, "supplier").select(col("s_suppkey"),
        array_join(transform(collect_list(col("s_nationkey")).over(w),
          _.cast("string")), ",").as("last3"))
        .orderBy("s_suppkey")
    },

    // Implicit type coercions (SemanticAnalyzer/FunctionRegistry implicit
    // conversions — SURVEY §7 "what's hard"): string↔number comparison
    // coerces numerically, string↔timestamp comparison parses, `/` on
    // integers is fractional (Hive semantics), `%` takes the dividend's
    // sign, concat stringifies numbers. (String *arithmetic* — '10'+5 —
    // deviates: Hive→double, DuckDB rejects, Spark ANSI casts; excluded and
    // documented here.)
    Qd("q105_coercions",
      """SELECT p_partkey,
        |  p_size > '10' AS gt_str,
        |  p_size = CAST(p_size AS VARCHAR) AS eq_roundtrip,
        |  p_size / 2 AS fdiv,
        |  CAST(p_size // 2 AS BIGINT) AS idiv,
        |  CAST((0 - p_size) % 7 AS BIGINT) AS neg_mod,
        |  'k' || p_size AS cc
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        (col("p_size") > lit("10")).as("gt_str"),
        (col("p_size") === col("p_size").cast("string")).as("eq_roundtrip"),
        (col("p_size") / 2).as("fdiv"),
        expr("CAST(p_size DIV 2 AS BIGINT)").as("idiv"),
        expr("CAST((0 - p_size) % 7 AS BIGINT)").as("neg_mod"),
        concat(lit("k"), col("p_size")).as("cc"))
        .orderBy("p_partkey")
    },

    // INTERVAL_YEAR_MONTH / INTERVAL_DAY_TIME arithmetic (§1 type mapping;
    // serde2/typeinfo interval types) + extract.
    Qd("q84_intervals",
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL '1 year 2 months' AS ym_add,
        |  o_orderdate + INTERVAL '3 days 4 hours 5 minutes 6 seconds' AS dt_add,
        |  o_orderdate - INTERVAL '90 days' AS d_sub,
        |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(extract(hour FROM o_orderdate + INTERVAL '7 hours') AS BIGINT) AS hr
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL '1-2' YEAR TO MONTH")).as("ym_add"),
          (col("o_orderdate") + expr("INTERVAL '3 04:05:06' DAY TO SECOND")).as("dt_add"),
          (col("o_orderdate") - expr("INTERVAL '90' DAY")).as("d_sub"),
          expr("CAST(extract(YEAR FROM o_orderdate) AS BIGINT)").as("yr"),
          expr("CAST(extract(HOUR FROM o_orderdate + INTERVAL '7' HOUR) AS BIGINT)").as("hr"))
        .orderBy("o_orderkey")
    },

    // Date/time stragglers with no prior conformance coverage (VERDICT r2
    // "what's missing" #1): months_between (31-day-basis fractional months,
    // `GenericUDFMonthsBetween`), next_day, dayofweek, dayofyear, date_sub,
    // make_date. DuckDB lacks months_between/next_day/Hive-dayofweek, so the
    // oracle re-derives each from its published definition.
    Qd("q114_date_funcs2",
      """SELECT o_orderkey,
        |  round((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 3)
        |    + CASE WHEN day(o_orderdate) = 15 THEN 0
        |           ELSE (day(o_orderdate) - 15) / 31.0 END, 6) AS mb,
        |  CAST(CAST(o_orderdate AS DATE) +
        |    CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
        |         ELSE (8 - isodow(o_orderdate)) % 7 END AS INTEGER) AS VARCHAR) AS nd,
        |  dayofweek(o_orderdate) + 1 AS dw,
        |  dayofyear(o_orderdate) AS dy,
        |  CAST(CAST(o_orderdate AS DATE) - 10 AS VARCHAR) AS ds,
        |  CAST(make_date(year(o_orderdate), month(o_orderdate), 1) AS VARCHAR) AS md
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          round(months_between(col("o_orderdate"),
            lit("1995-03-15").cast("date")), 6).as("mb"),
          next_day(col("o_orderdate"), "MON").cast("string").as("nd"),
          dayofweek(col("o_orderdate")).as("dw"),
          dayofyear(col("o_orderdate")).as("dy"),
          date_sub(col("o_orderdate"), 10).cast("string").as("ds"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")),
            lit(1)).cast("string").as("md"))
        .orderBy("o_orderkey")
    },

    // DECIMAL(p,s) exact arithmetic (HiveDecimal max 38/38,
    // `storage-api/.../HiveDecimal.java:31-32`): exact sums and HALF_UP
    // rounded products at fixed scale.
    Qd("q85_decimal",
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_p,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_q,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      // aggregation is decimal-exact; the trailing DOUBLE cast only
      // normalizes the wire type for the oracle compare
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_p"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_q"),
          round(sum(col("l_extendedprice").cast("decimal(12,2)") *
            col("l_discount").cast("decimal(12,4)")), 2).cast("double").as("sum_disc"))
        .orderBy("l_returnflag")
    }
  )
}

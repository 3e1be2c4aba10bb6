package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge cases for the pack-3 functions that the oracle queries can't reach:
  * null propagation through the legacy aliases, out-of-domain trig, xpath
  * numeric variants on missing nodes (Hive returns NaN/0 — mirrored by
  * Spark's xpath family), and two-arg log at invalid bases. */
class FunctionPack3Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test3")

  override def afterAll(): Unit = spark.stop()

  test("legacy aliases propagate null and handle empty strings") {
    val r = spark.sql(
      """SELECT lcase(NULL) AS a, ucase('') AS b, chr(0) AS c,
        |  ltrim('') AS d, ascii('') AS e""".stripMargin).head()
    assert(r.isNullAt(0)); assert(r.getString(1) == "")
    assert(r.getString(3) == ""); assert(r.getInt(4) == 0)
  }

  test("out-of-domain asin/acos yield NaN, log of non-positive yields null") {
    val r = spark.sql(
      "SELECT asin(2.0) AS a, acos(-2.0) AS b, log(3, -1.0) AS c, log2(0.0) AS d"
    ).head()
    assert(r.getDouble(0).isNaN); assert(r.getDouble(1).isNaN)
    assert(r.isNullAt(2)); assert(r.isNullAt(3))
  }

  test("xpath numeric variants on a missing node match Hive (NaN / 0)") {
    val r = spark.sql(
      """SELECT xpath_double('<a><b>1</b></a>', 'a/c') AS d,
        |  xpath_long('<a><b>1</b></a>', 'a/c') AS l,
        |  xpath_short('<a><b>1</b></a>', 'a/c') AS s""".stripMargin).head()
    assert(r.getDouble(0).isNaN)
    assert(r.getLong(1) == 0L); assert(r.getShort(2) == 0)
  }

  test("from_unixtime round-trips to_unix_timestamp across a DST boundary") {
    // 1996 US spring-forward: Apr 7, 02:00 PST → 03:00 PDT, i.e. 10:00 UTC.
    // 828867600 = 09:00 UTC (still PST, UTC-8 → 01); one hour later the
    // offset must jump by two wall-clock hours (10:00 UTC → 03 PDT).
    val r = spark.sql(
      """SELECT to_unix_timestamp(from_unixtime(828867600)) AS rt,
        |  date_format(from_utc_timestamp(from_unixtime(828867600),
        |    'America/Los_Angeles'), 'HH') AS before_h,
        |  date_format(from_utc_timestamp(from_unixtime(828871200),
        |    'America/Los_Angeles'), 'HH') AS after_h""".stripMargin).head()
    assert(r.getLong(0) == 828867600L)
    assert(r.getString(1) == "01",
      s"expected 09:00 UTC → 01 PST before spring-forward, got ${r.getString(1)}")
    assert(r.getString(2) == "03",
      s"expected 10:00 UTC → 03 PDT at spring-forward, got ${r.getString(2)}")
  }

  test("sha1 known values (no DuckDB oracle exists)") {
    val r = spark.sql(
      "SELECT sha1('abc') AS a, sha1('') AS b, sha('abc') AS c").head()
    assert(r.getString(0) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(1) == "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    assert(r.getString(2) == r.getString(0)) // sha is the sha1 alias
  }

  test("SimpleDateFormat pattern letters render like Hive's UDFDateFormat") {
    // epoch 0 = Thursday 1970-01-01 00:00:00 UTC
    val r = spark.sql(
      """SELECT from_unixtime(0, 'EEE') AS dow_name,
        |  from_unixtime(0, 'D') AS doy,
        |  from_unixtime(0, 'w') AS woy,
        |  from_unixtime(0, 'k') AS hour24_1based,
        |  from_unixtime(0, 'K') AS hour12_0based,
        |  from_unixtime(0, 'a') AS ampm""".stripMargin).head()
    assert(r.getString(0) == "Thu")
    assert(r.getString(1) == "1")     // day of year
    assert(r.getString(2) == "1")     // week of year
    assert(r.getString(3) == "24")    // 'k' is 1-24 (midnight = 24)
    assert(r.getString(4) == "0")     // 'K' is 0-11
    assert(r.getString(5) == "AM")
  }

  test("datetime patterns follow SimpleDateFormat (Hive), not java.time") {
    // 'u' = day-of-week number in SimpleDateFormat (1970-01-01 was a
    // Thursday → 4); java.time 'u' would be the year. 'YYYY' = week year.
    val r = spark.sql(
      """SELECT from_unixtime(0, 'u') AS dow,
        |  from_unixtime(0, 'YYYY') AS weekyear""".stripMargin).head()
    assert(r.getString(0) == "4", s"expected SimpleDateFormat 'u'=4, got ${r.getString(0)}")
    assert(r.getString(1) == "1970")
  }

  test("Hive evaluation semantics: overflow wraps, OOB subscripts are NULL") {
    // ANSI off (Engine.session): int overflow wraps like Java/Hive, array
    // index past the end and missing map keys yield NULL, never an error
    val r = spark.sql(
      """SELECT CAST(2147483647 AS INT) + 1 AS ovf,
        |  array(1, 2)[5] AS oob,
        |  map('a', 1)['z'] AS missing,
        |  element_at(array(1, 2), 5) AS oob2""".stripMargin).head()
    assert(r.getInt(0) == Int.MinValue)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("map_values preserves duplicate values and empty maps") {
    val r = spark.sql(
      """SELECT size(map_values(map())) AS z,
        |  array_sort(map_values(map('a', 1, 'b', 1))) AS d""".stripMargin).head()
    assert(r.getInt(0) == 0)
    assert(r.getSeq[Int](1) == Seq(1, 1))
  }
}

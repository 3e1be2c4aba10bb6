package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Exact-value checks for functions with no DuckDB oracle (soundex, crc32,
  * xpath on fixed docs) plus sanity for the q66/q68 families. */
class FunctionPack2Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test2")

  override def afterAll(): Unit = spark.stop()

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head().get(0)

  test("soundex known values") {
    assert(one("soundex('Robert')") == "R163")
    assert(one("soundex('Rupert')") == "R163")
    assert(one("soundex('Tymczak')") == "T522")
  }

  test("crc32 known values") {
    assert(one("crc32(CAST('abc' AS BINARY))") == 891568578L)
    assert(one("crc32(CAST('' AS BINARY))") == 0L)
  }

  test("xpath family on a fixed document") {
    val xml = "'<r><w>alpha</w><w>beta</w><n>7</n></r>'"
    assert(one(s"xpath_string($xml, 'r/w')") == "alpha")
    assert(one(s"xpath_int($xml, 'r/n')") == 7)
    assert(one(s"xpath_boolean($xml, 'r/n')") == true)
    assert(one(s"xpath($xml, 'r/w/text()')").asInstanceOf[scala.collection.Seq[_]].toSeq ==
      Seq("alpha", "beta"))
  }

  test("conv/bin/factorial/format_number known values") {
    assert(one("conv(255, 10, 16)") == "FF")
    assert(one("conv('FF', 16, 10)") == "255")
    assert(one("bin(42)") == "101010")
    assert(one("factorial(5)") == 120L)
    assert(one("format_number(1234.567, 2)") == "1,234.57")
    assert(one("format_number(17.337, 2)") == "17.34")
  }

  test("bround is round-half-even") {
    assert(one("bround(CAST(2.5 AS DOUBLE), 0)") == 2.0)
    assert(one("bround(CAST(3.5 AS DOUBLE), 0)") == 4.0)
    assert(one("bround(CAST(2.45 AS DOUBLE), 1)") == 2.4)
  }

  test("aes roundtrip with explicit mode") {
    assert(one("CAST(aes_decrypt(aes_encrypt(CAST('secret' AS BINARY), " +
      "'0123456789abcdef'), '0123456789abcdef') AS STRING)") == "secret")
  }

  test("sentences splits on boundaries") {
    val r = one("sentences('cold widget. PROMO!')").asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]].map(_.toSeq).toSeq
    assert(r == Seq(Seq("cold", "widget"), Seq("PROMO")))
  }
}

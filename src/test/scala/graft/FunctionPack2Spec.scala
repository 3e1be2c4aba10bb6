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

  // The driver's pandas compare can't hash array/struct cells, so the
  // conformance queries (q20/q36/q67/q75/q106/q107/q108) ship those columns
  // stringified. These assertions keep oracle-grade coverage of the NATIVE
  // complex-type return values and schemas (ADVICE r2).
  private def seq(a: Any): Seq[Any] = a.asInstanceOf[scala.collection.Seq[Any]].toSeq

  test("native array returns: HOFs, set ops, sort (q106 ops)") {
    import org.apache.spark.sql.types._
    val df = spark.sql(
      """SELECT zip_with(a, sort_array(a, false), (x, y) -> x + y) AS zipd,
        |       array_sort(array_union(a, array(1, 2))) AS uni,
        |       sort_array(a, false) AS srt,
        |       array_remove(a, 42) AS rem
        |FROM (SELECT array(30, 2, 42, 2) AS a)""".stripMargin)
    assert(df.schema.fields.forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }))
    val r = df.head()
    assert(seq(r.get(0)) == Seq(72, 32, 44, 4))   // 30+42, 2+30, 42+2, 2+2
    assert(seq(r.get(1)) == Seq(1, 2, 30, 42))
    assert(seq(r.get(2)) == Seq(42, 30, 2, 2))
    assert(seq(r.get(3)) == Seq(30, 2, 2))
  }

  test("native map returns: str_to_map keys + transform_values (q107 ops)") {
    val r = spark.sql(
      """SELECT array_sort(map_keys(m)) AS mk,
        |       transform_values(m, (k, v) -> upper(v))['size'] AS up
        |FROM (SELECT str_to_map('brand:B5,size:7', ',', ':') AS m)""".stripMargin).head()
    assert(seq(r.get(0)) == Seq("brand", "size"))
    assert(r.get(1) == "7")
  }

  test("native windowed collect_list over moving frame (q108 op)") {
    val r = spark.sql(
      """SELECT collect_list(v) OVER (ORDER BY v
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS last3
        |FROM VALUES (1), (2), (3), (4) t(v) ORDER BY v""".stripMargin)
      .collect().map(row => seq(row.get(0))).toSeq
    assert(r == Seq(Seq(1), Seq(1, 2), Seq(1, 2, 3), Seq(2, 3, 4)))
  }

  test("native collect_set/collect_list values (q20 ops)") {
    val r = spark.sql(
      "SELECT sort_array(collect_set(v)) AS cs, sort_array(collect_list(v)) AS cl " +
      "FROM VALUES (3), (1), (3), (2) t(v)").head()
    assert(seq(r.get(0)) == Seq(1, 2, 3))
    assert(seq(r.get(1)) == Seq(1, 2, 3, 3))
  }

  test("native named_struct build + field access (q36 op)") {
    import org.apache.spark.sql.Row
    val df = spark.sql("SELECT named_struct('sz', 7, 'br', 'B5') AS st")
    assert(df.schema("st").dataType.typeName == "struct")
    assert(df.head().getStruct(0) == Row(7, "B5"))
  }
}

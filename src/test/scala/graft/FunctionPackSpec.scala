package graft

import graft.functions.HiveFunctionPack
import graft.functions.HiveFunctionPack._
import graft.operators.TextNGrams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class FunctionPackSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("field: 1-based index, 0 on miss, 0 on null needle (GenericUDFField)") {
    val df = Seq("b", "z", null.asInstanceOf[String]).toDF("v")
      .select(field(col("v"), lit("a"), lit("b"), lit("c")).as("f"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 0, 0))
  }

  test("field: SQL registration") {
    HiveFunctionPack.register(spark)
    assert(spark.sql("SELECT field('y', 'x', 'y')").head().getInt(0) == 2)
  }

  test("hive_hash matches Java semantics (ObjectInspectorUtils.hashCode)") {
    // Hive hashes ints as the value itself and strings as Java String.hashCode.
    val r = Seq((42, "abc")).toDF("i", "s")
      .select(hive_hash(col("i")).as("hi"), hive_hash(col("s")).as("hs"))
      .head()
    assert(r.getInt(0) == 42)
    assert(r.getInt(1) == "abc".hashCode)
  }

  test("create_union/extract_union round-trip (struct-with-tag encoding)") {
    val df = Seq((0, "s", 7), (1, "s", 7)).toDF("tag", "s", "i")
      .select(create_union(col("tag"), col("s"), col("i")).as("u"))
      .select(col("u.tag"), extract_union(col("u"), 0).as("f0"),
        extract_union(col("u"), 1).as("f1"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 0 && rows(0).getString(1) == "s" && rows(0).isNullAt(2))
    assert(rows(1).getInt(0) == 1 && rows(1).isNullAt(1) && rows(1).getInt(2) == 7)
  }

  test("parse_url_tuple (GenericUDTFParseUrlTuple analog)") {
    val r = Seq("https://example.com:8080/a/b?x=1&y=2#frag").toDF("url")
      .select(parse_url_tuple(col("url"), "HOST", "PATH", "QUERY").as("t"))
      .select("t.host", "t.path", "t.query").head()
    assert(r.getString(0) == "example.com")
    assert(r.getString(1) == "/a/b")
    assert(r.getString(2) == "x=1&y=2")
  }

  test("parse_url_tuple QUERY:<key> form extracts a single parameter") {
    val r = Seq("https://example.com/a?x=1&y=2").toDF("url")
      .select(parse_url_tuple(col("url"), "QUERY:y", "QUERY:z").as("t"))
      .select("t.query_y", "t.query_z").head()
    assert(r.getString(0) == "2")
    assert(r.isNullAt(1))
  }

  test("field coerces mixed numeric widths like Hive (GenericUDFField)") {
    assert(spark.sql("SELECT field(1, 1L)").head().getInt(0) == 1)
    assert(spark.sql("SELECT field(CAST(2 AS BIGINT), 1, 2)").head().getInt(0) == 2)
    assert(spark.sql("SELECT field(1.0D, 3, 1)").head().getInt(0) == 2)
    // Catalyst Decimal is not a java.lang.Number — needs its own coercion case
    assert(spark.sql("SELECT field(1, CAST(1 AS DECIMAL(10,2)))").head().getInt(0) == 1)
    assert(spark.sql("SELECT field(CAST(2.5 AS DECIMAL(5,1)), 1.5D, 2.5D)").head().getInt(0) == 2)
  }

  test("in_file rejects a non-constant filename at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("a", "/tmp/x")).toDF("s", "f")
        .selectExpr("in_file(s, f)").queryExecution.analyzed
    }
    assert(e.getMessage.contains("constant"))
  }

  test("mask family (GenericUDFMask* defaults: X/x/n, others kept)") {
    val df = Seq("Abc123#z").toDF("s").select(
      mask_first_n(col("s"), 4).as("mf"),
      mask_last_n(col("s"), 3).as("ml"),
      mask_show_first_n(col("s"), 4).as("msf"),
      mask_show_last_n(col("s"), 3).as("msl"))
    val r = df.head()
    assert(r.getString(0) == "Xxxn23#z")
    assert(r.getString(1) == "Abc12n#x")
    assert(r.getString(2) == "Abc1nn#x")
    assert(r.getString(3) == "Xxxnn3#z")
  }

  test("ngrams: exact top-k bigrams") {
    val df = Seq("a b a b c", "a b x").toDF("text")
    val top = TextNGrams.topK(df, col("text"), 2, 2).collect()
    assert(top(0).getString(0) == "a b" && top(0).getLong(1) == 3L)
    assert(top(1).getString(0) == "b a" && top(1).getLong(1) == 1L)
  }

  test("context_ngrams: words following a context (GenericUDAFContextNGrams)") {
    val df = Seq("the cat sat", "the cat ran", "the dog sat").toDF("text")
    val top = TextNGrams.contextTopK(df, col("text"),
      Seq(Some("the"), None), 2).collect()
    assert(top(0).getString(0) == "cat" && top(0).getLong(1) == 2L)
    assert(top(1).getString(0) == "dog" && top(1).getLong(1) == 1L)
  }
}

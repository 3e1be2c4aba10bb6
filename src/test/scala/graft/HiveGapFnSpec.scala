package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-callable surface for the last reference-registry names
  * (`exec/FunctionRegistry.java`): parse_url_tuple as a real LATERAL VIEW
  * generator, reflect2 instance-method dispatch, create_union/extract_union
  * tagged-struct uniontype, and the ngrams/context_ngrams UDAFs. */
class HiveGapFnSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = Engine.session(cores = 4, appName = "graft-gapfn")
    functions.HiveFunctionPack.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("parse_url_tuple: LATERAL VIEW, QUERY:key, unknown part null, malformed all-null, one row each") {
    val s = spark
    import s.implicits._
    Seq("http://user1@example.com:8080/a/b.txt?k=v&x=1#frag", "not a url")
      .toDF("url").createOrReplaceTempView("urls")
    val r = spark.sql("""
      SELECT t.* FROM urls
      LATERAL VIEW parse_url_tuple(url, 'HOST', 'PATH', 'QUERY', 'QUERY:x',
        'PROTOCOL', 'FILE', 'AUTHORITY', 'USERINFO', 'REF', 'BOGUS') t
      """).collect()
    assert(r.length == 2) // one row per input, even for the malformed URL
    val ok = r.find(x => !x.isNullAt(0)).get
    assert(ok.getString(0) == "example.com" && ok.getString(1) == "/a/b.txt")
    assert(ok.getString(2) == "k=v&x=1" && ok.getString(3) == "1")
    assert(ok.getString(4) == "http" && ok.getString(5) == "/a/b.txt?k=v&x=1")
    assert(ok.getString(6) == "user1@example.com:8080" && ok.getString(7) == "user1")
    assert(ok.getString(8) == "frag" && ok.isNullAt(9))
    val bad = r.find(_.isNullAt(0)).get
    assert((0 until 10).forall(bad.isNullAt))
  }

  test("reflect2: instance methods with primitive-arg dispatch; null receiver nulls") {
    val s = spark
    import s.implicits._
    Seq(("Hello World", 42L), (null, 7L)).toDF("s", "n").createOrReplaceTempView("r2")
    val r = spark.sql("""
      SELECT reflect2(s, 'length') AS len,
             reflect2(s, 'substring', 0, 5) AS sub,
             reflect2(s, 'indexOf', 'World') AS idx,
             reflect2(s, 'isEmpty') AS emp,
             reflect2(n, 'toString') AS ns
      FROM r2 ORDER BY ns""").collect()
    assert(r(0).getInt(0) == 11 && r(0).getString(1) == "Hello" &&
      r(0).getInt(2) == 6 && !r(0).getBoolean(3) && r(0).getString(4) == "42")
    assert(r(1).isNullAt(0) && r(1).isNullAt(1) && r(1).getString(4) == "7")
    // unknown method is an analysis-time failure, like the reference
    assert(intercept[Exception](
      spark.sql("SELECT reflect2('x', 'noSuchMethod') FROM r2")).getMessage
      .toLowerCase.contains("reflect2"))
  }

  test("create_union/extract_union: tag selects the live alternative") {
    val r = spark.sql("""
      SELECT u.tag, u.field0, u.field1,
             extract_union(u).field0 AS e0,
             extract_union(u, 1) AS e1
      FROM (SELECT create_union(id % 2, CAST(id AS STRING), id * 10) AS u
            FROM range(4)) ORDER BY u.field1 NULLS FIRST, u.field0""").collect()
    // ids 0,2 -> tag 0 (string live); 1,3 -> tag 1 (long live)
    assert(r.map(x => (x.getInt(0), Option(x.getString(1)), if (x.isNullAt(2)) -1L else x.getLong(2))).toSet ==
      Set((0, Some("0"), -1L), (0, Some("2"), -1L), (1, None, 10L), (1, None, 30L)))
    assert(r.filter(_.getInt(0) == 1).forall(x => !x.isNullAt(4)))
  }

  test("ngrams and context_ngrams: exact top-k with deterministic tie-break") {
    val s = spark
    import s.implicits._
    Seq("the quick fox", "the quick dog", "the slow dog")
      .toDF("t").createOrReplaceTempView("ng")
    val g = spark.sql(
      "SELECT inline(ngrams(split(t, ' '), 2, 2)) FROM ng").collect()
    assert(g.map(r => (r.getSeq[String](0).mkString(" "), r.getDouble(1))).toSeq ==
      Seq(("the quick", 2.0), ("quick dog", 1.0))) // freq desc, gram asc
    val c = spark.sql(
      "SELECT inline(context_ngrams(split(t, ' '), array('the', CAST(NULL AS STRING)), 3)) FROM ng")
      .collect()
    assert(c.map(r => (r.getSeq[String](0).mkString(" "), r.getDouble(1))).toSeq ==
      Seq(("quick", 2.0), ("slow", 1.0)))
  }

  test("compute_stats: type-dispatched struct shapes (GenericUDAFComputeStats field lists)") {
    val s = spark
    import s.implicits._
    Seq((1L, 1.5, "ab", true), (2L, 2.5, "abcd", false), (3L, 2.5, null, true))
      .toDF("l", "d", "str", "b").createOrReplaceTempView("cs_t")
    val df = spark.sql(
      """SELECT compute_stats(l, 16) AS ls, compute_stats(d, 16) AS ds,
        |  compute_stats(str, 16) AS ss, compute_stats(b, 16) AS bs,
        |  compute_stats(CAST(str AS BINARY), 16) AS ys
        |FROM cs_t""".stripMargin)
    val f = df.schema.fields.map(x => x.name -> x.dataType).toMap
    import org.apache.spark.sql.types._
    def names(t: DataType) = t.asInstanceOf[StructType].fieldNames.toSeq
    assert(names(f("ls")) == Seq("columntype", "min", "max", "countnulls",
      "numdistinctvalues", "ndvbitvector"))
    assert(names(f("ss")) == Seq("columntype", "maxlength", "avglength",
      "countnulls", "numdistinctvalues", "ndvbitvector"))
    assert(names(f("bs")) == Seq("columntype", "counttrues", "countfalses", "countnulls"))
    assert(names(f("ys")) == Seq("columntype", "maxlength", "avglength", "countnulls"))
    val r = df.collect()(0)
    val ls = r.getStruct(0)
    assert(ls.getString(0) == "Long" && ls.getLong(1) == 1L && ls.getLong(2) == 3L &&
      ls.getLong(3) == 0L && ls.getLong(4) == 3L && ls.getString(5) == "")
    val ds = r.getStruct(1)
    assert(ds.getString(0) == "Double" && ds.getDouble(1) == 1.5 &&
      ds.getDouble(2) == 2.5 && ds.getLong(4) == 2L)
    val ss = r.getStruct(2)
    // avglength = sumlength/(count+countnulls) = (2+4)/3 — nulls in denominator
    assert(ss.getString(0) == "String" && ss.getLong(1) == 4L &&
      ss.getDouble(2) == 2.0 && ss.getLong(3) == 1L && ss.getLong(4) == 2L)
    val bs = r.getStruct(3)
    assert(bs.getString(0) == "Boolean" && bs.getLong(1) == 2L &&
      bs.getLong(2) == 1L && bs.getLong(3) == 0L)
  }

  test("compute_stats: nbv=0 disables the estimator (ndv=0, Hive parity); GROUP BY works") {
    val s = spark
    import s.implicits._
    Seq(("a", 1), ("a", 2), ("b", 2)).toDF("k", "v").createOrReplaceTempView("cs_g")
    val z = spark.sql("SELECT compute_stats(v, 0) AS st FROM cs_g").collect()(0).getStruct(0)
    assert(z.getLong(4) == 0L) // numdistinctvalues suppressed, as Hive does
    val g = spark.sql(
      """SELECT k, compute_stats(v, 16) AS st FROM cs_g GROUP BY k ORDER BY k""")
      .collect().map(r => (r.getString(0), r.getStruct(1).getLong(1),
        r.getStruct(1).getLong(2), r.getStruct(1).getLong(4)))
    assert(g.toSeq == Seq(("a", 1L, 2L, 2L), ("b", 2L, 2L, 1L)))
  }

  test("compute_stats: non-primitive input and bad arity are rejected") {
    val s = spark
    import s.implicits._
    Seq((Seq(1, 2), 1)).toDF("arr", "v").createOrReplaceTempView("cs_bad")
    intercept[Exception](spark.sql("SELECT compute_stats(arr, 16) FROM cs_bad").collect())
    intercept[Exception](spark.sql("SELECT compute_stats(v) FROM cs_bad").collect())
  }
}

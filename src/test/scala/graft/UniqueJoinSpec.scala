package graft

import graft.operators.UniqueJoin
import graft.operators.UniqueJoin.Side
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** UNIQUEJOIN semantics replicated row-for-row against the reference's
  * golden `ql/src/test/queries/clientpositive/uniquejoin.q.out` (same T1/T2/
  * T3 contents, same six query shapes, same expected rows). */
class UniqueJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-uj")

  override def afterAll(): Unit = spark.stop()

  // data/files/T{1,2,3}.txt from the reference (key, val)
  private def t(name: String, rows: Seq[(Int, Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF(s"${name}_key", s"${name}_val")
  }
  private lazy val t1 = t("a", Seq(1 -> 11, 2 -> 12, 3 -> 13, 7 -> 17, 8 -> 18, 8 -> 28))
  private lazy val t2 = t("b", Seq(2 -> 22, 3 -> 13, 4 -> 14, 5 -> 15, 8 -> 18, 8 -> 18))
  private lazy val t3 = t("c", Seq(2 -> 12, 4 -> 14, 6 -> 16, 7 -> 17))

  private def got(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.select(cols.map(col): _*).collect().toSeq.map(_.toSeq)
      .sortBy(_.map(v => if (v == null) "NULL" else f"${v.asInstanceOf[Int]}%04d").mkString(","))

  private def exp(rows: String*): Seq[Seq[Any]] =
    rows.map(_.split(",").toSeq.map(s => if (s == "N") null else s.trim.toInt))
      .sortBy(_.map(v => if (v == null) "NULL" else f"${v.asInstanceOf[Int]}%04d").mkString(","))

  test("all-PRESERVE three-way (golden block 1)") {
    val r = UniqueJoin.uniqueJoin(Seq(
      Side(t1, Seq(col("a_key")), preserve = true),
      Side(t2, Seq(col("b_key")), preserve = true),
      Side(t3, Seq(col("c_key")), preserve = true)))
    assert(got(r, "a_key", "b_key", "c_key") == exp(
      "1,N,N", "2,2,2", "3,3,N", "7,N,7",
      "8,8,N", "8,8,N", "8,8,N", "8,8,N",
      "N,4,4", "N,5,N", "N,N,6"))
  }

  test("no PRESERVE = n-way inner (golden block 2)") {
    val r = UniqueJoin.uniqueJoin(Seq(
      Side(t1, Seq(col("a_key")), preserve = false),
      Side(t2, Seq(col("b_key")), preserve = false),
      Side(t3, Seq(col("c_key")), preserve = false)))
    assert(got(r, "a_key", "b_key", "c_key") == exp("2,2,2"))
  }

  test("expression key b.key-1 (golden block 3)") {
    val r = UniqueJoin.uniqueJoin(Seq(
      Side(t1, Seq(col("a_key")), preserve = false),
      Side(t2, Seq(col("b_key") - 1), preserve = false),
      Side(t3, Seq(col("c_key")), preserve = false)))
    assert(got(r, "a_key", "b_key", "c_key") == exp("2,3,2", "7,8,7", "7,8,7"))
  }

  test("composite (key, val) join key (golden block 4)") {
    val r = UniqueJoin.uniqueJoin(Seq(
      Side(t1, Seq(col("a_key"), col("a_val")), preserve = true),
      Side(t2, Seq(col("b_key"), col("b_val")), preserve = true),
      Side(t3, Seq(col("c_key"), col("c_val")), preserve = true)))
    assert(got(r, "a_key", "a_val", "b_key", "b_val", "c_key", "c_val") == exp(
      "1,11,N,N,N,N", "2,12,N,N,2,12", "3,13,3,13,N,N", "7,17,N,N,7,17",
      "8,18,8,18,N,N", "8,18,8,18,N,N", "8,28,N,N,N,N",
      "N,N,2,22,N,N", "N,N,4,14,4,14", "N,N,5,15,N,N", "N,N,N,N,6,16"))
  }

  test("mixed PRESERVE T1/T3, inner T2 (golden block 5)") {
    val r = UniqueJoin.uniqueJoin(Seq(
      Side(t1, Seq(col("a_key")), preserve = true),
      Side(t2, Seq(col("b_key")), preserve = false),
      Side(t3, Seq(col("c_key")), preserve = true)))
    assert(got(r, "a_key", "b_key", "c_key") == exp(
      "1,N,N", "2,2,2", "3,3,N", "7,N,7",
      "8,8,N", "8,8,N", "8,8,N", "8,8,N",
      "N,4,4", "N,N,6"))
  }

  test("two-way PRESERVE T1 (golden block 6)") {
    val r = UniqueJoin.uniqueJoin(Seq(
      Side(t1, Seq(col("a_key")), preserve = true),
      Side(t2, Seq(col("b_key")), preserve = false)))
    assert(got(r, "a_key", "b_key") == exp(
      "1,N", "2,2", "3,3", "7,N", "8,8", "8,8", "8,8", "8,8"))
  }

  test("NULL keys never form a group (SQL join semantics), preserved sides still emit them") {
    val s = spark
    import s.implicits._
    val n1 = Seq((Some(1), 11), (None, 19)).toDF("a_key", "a_val")
    val n2 = Seq((Some(1), 21), (None, 29)).toDF("b_key", "b_val")
    // inner (no PRESERVE): null-key rows match nothing and drop — NOT one
    // cross-joined null group (struct equality would otherwise glue them)
    val inner = UniqueJoin.uniqueJoin(Seq(
      Side(n1, Seq(col("a_key")), preserve = false),
      Side(n2, Seq(col("b_key")), preserve = false)))
    assert(got(inner, "a_key", "b_key") == exp("1,1"))
    // PRESERVE T1: its null-key row survives NULL-extended, still unmatched
    val pres = UniqueJoin.uniqueJoin(Seq(
      Side(n1, Seq(col("a_key")), preserve = true),
      Side(n2, Seq(col("b_key")), preserve = false)))
    assert(got(pres, "a_key", "b_key") == exp("1,1", "N,N"))
  }
}

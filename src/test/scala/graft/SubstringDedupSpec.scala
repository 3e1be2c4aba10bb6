package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computed ExactSubstr cases ([[graft.operators.SubstringDedup]]):
  * cross-doc runs are cut from every carrier with overlapping shingle
  * marks merged into one island; within-doc repeats and short docs pass
  * through untouched (document frequency counts DISTINCT docs). */
class SubstringDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-subdedup")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("shared 6-token run: overlapping shingles merge, both carriers cut") {
    val docs = Seq(
      (1L, "a b c d e f x y"),       // run at tokens 1..6
      (2L, "z a b c d e f w"),       // same run at tokens 2..7
      (3L, "p q r s t"),             // 5 unique tokens: no duplicate
      (4L, "m n o p q m n o p q"),   // within-doc repeat only: df = 1
      (5L, "hi")                     // shorter than k
    ).toDF("doc_id", "text")
    val got = SubstringDedup.dedupSubstrings(docs, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) === ((8, 6, "x y")),
      "two overlapping duplicated shingles merge into one 6-token cut")
    assert(got(2L) === ((8, 6, "z w")))
    assert(got(3L) === ((5, 0, "p q r s t")), "unique content untouched")
    assert(got(4L) === ((10, 0, "m n o p q m n o p q")),
      "a WITHIN-doc repeat is not a cross-doc duplicate")
    assert(got(5L) === ((1, 0, "hi")), "short docs pass through")
  }

  test("disjoint duplicated runs stay separate islands; counts add up") {
    val docs = Seq(
      (1L, "u v w x y GAP1 GAP2 q r s t z"), // two runs, distinct gaps
      (2L, "u v w x y other words here q r s t z"),
      (3L, "filler filler2 filler3")
    ).toDF("doc_id", "text")
    val got = SubstringDedup.dedupSubstrings(docs, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    // doc1: "u v w x y" (1..5) and "q r s t z" (8..12) duplicated; the two
    // GAP tokens survive
    assert(got(1L) === ((12, 10, "GAP1 GAP2")))
    assert(got(2L)._2 === 10)
    assert(got(2L)._3 === "other words here")
  }
}

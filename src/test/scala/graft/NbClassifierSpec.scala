package graft

import graft.operators.NbClassifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multinomial NB corpus classifier ([[graft.operators.NbClassifier]]):
  * exact fixed-point math (integer micro-nat log-probs — hand-computed
  * expectations must match to the unit), smoothing/unseen-token/empty-doc
  * edge behavior, deterministic tie-breaks, learnability on separable
  * data, and the broadcast scale shape (the model never shuffles the
  * corpus).
  */
class NbClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-nb")

  override def afterAll(): Unit = spark.stop()

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "text", "lab")
  }

  private def q(x: Double): Long = math.round(math.log(x) * 1e6)

  test("token log-probs, priors, and defaults are exact micro-nat values") {
    // class A: tokens {a:2, b:1} N=3; class B: {x:1, y:1} N=2; V=4
    val m = NbClassifier.train(
      df(Seq((1L, "a a b", "A"), (2L, "x y", "B"))), "id", "text", "lab")
    val lp = m.tokenLp.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(lp(("A", "a")) == q(3.0 / 7))
    assert(lp(("A", "b")) == q(2.0 / 7))
    assert(lp(("B", "x")) == q(2.0 / 6))
    assert(lp.size == 4)
    val meta = m.classMeta.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(meta("A") == (q(0.5), q(1.0 / 7)))
    assert(meta("B") == (q(0.5), q(1.0 / 6)))
  }

  test("prediction score is prior + Σ m·lp with defaults for unseen tokens") {
    val m = NbClassifier.train(
      df(Seq((1L, "a a b", "A"), (2L, "x y", "B"))), "id", "text", "lab")
    // doc "a a z": z is out-of-vocabulary -> per-class default mass
    val got = NbClassifier.predict(m,
      df(Seq((10L, "a a z", "?"))), "id", "text").collect().head
    val sA = q(0.5) + 2 * q(3.0 / 7) + q(1.0 / 7)
    val sB = q(0.5) + 2 * q(1.0 / 6) + q(1.0 / 6)
    assert(got.getString(1) == "A" && sA > sB)
    assert(got.getLong(2) == sA - sB, "margin must be the exact integer gap")
  }

  test("separable vocabularies classify held-out docs perfectly") {
    val train = (0L until 20L).map(i =>
      if (i % 2 == 0) (i, "alpha beta alpha gamma", "A")
      else (i, "xray yankee zulu xray", "B"))
    val test = Seq((100L, "beta gamma gamma", "A"),
      (101L, "zulu xray yankee", "B"), (102L, "alpha alpha", "A"))
    val m = NbClassifier.train(df(train), "id", "text", "lab")
    val preds = NbClassifier.predict(m, df(test), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(100L -> "A", 101L -> "B", 102L -> "A"))
  }

  test("a token-free doc gets the argmax PRIOR; class-name tie-break") {
    // priors 2/3 vs 1/3 -> empty doc goes to A
    val m = NbClassifier.train(
      df(Seq((1L, "a", "A"), (2L, "a", "A"), (3L, "b", "B"))),
      "id", "text", "lab")
    val e = NbClassifier.predict(m,
      df(Seq((9L, "", "?"), (10L, "123 456", "?"))), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(e(9L) == "A" && e(10L) == "A",
      "no [a-z] tokens -> prior-only; 2/3 prior beats 1/3")
    // perfectly symmetric classes + an out-of-vocab doc -> exact score tie
    // on every class -> lexicographically first class wins
    val sym = NbClassifier.train(
      df(Seq((1L, "p p", "B"), (2L, "q q", "A"))), "id", "text", "lab")
    val t = NbClassifier.predict(sym,
      df(Seq((20L, "zz zz", "?"))), "id", "text").collect().head
    assert(t.getString(1) == "A" && t.getLong(2) == 0L)
  }

  test("scale shape: the model is broadcast, never shuffled with the corpus") {
    val train = df((0L until 50L).map(i =>
      (i, if (i % 2 == 0) "aa bb cc" else "xx yy zz",
        if (i % 2 == 0) "A" else "B")))
    val m = NbClassifier.train(train, "id", "text", "lab")
    val out = NbClassifier.predict(m,
      df((100L until 200L).map(i => (i, "aa bb xx", "?"))), "id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"token stats must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus must never sort-merge against the model")
  }
}

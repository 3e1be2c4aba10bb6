package graft

import graft.operators.NgramLm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** CCNet-style bigram-LM perplexity scoring: hand-computed smoothed
  * probabilities on a tiny corpus, the `<s>` anchor contract, unseen-bigram
  * backoff, and the cutoff-bucketing scale path agreeing with the exact
  * ntile tertiles. */
class NgramLmSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("bigrams: <s> anchor, empty-token drop, adjacency") {
    val df = Seq((1L, "a b  c"), (2L, "x")).toDF("doc_id", "text")
    val b = NgramLm.bigrams(df).as[(Long, String, String)].collect().toSet
    // double space yields an empty token that must not become a bigram node
    assert(b == Set((1L, "<s>", "a"), (1L, "a", "b"), (1L, "b", "c"),
      (2L, "<s>", "x")))
  }

  test("score: hand-computed add-one-smoothed log-probs") {
    // reference slice = doc 1 only: tokens <s> a b a → bigrams
    // (<s>,a) (a,b) (b,a); counts c2 all 1; ctx: <s>→1, a→1, b→1; V = |{a,b}| = 2
    val df = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val s = NgramLm.score(df, col("doc_id") === 1).orderBy("doc_id").collect()

    def q(c2: Long, c1: Long, v: Double): Long =
      math.round(math.log((c2 + 1).toDouble / (c1 + v)) * 1e6)

    // doc 1: (<s>,a)+(a,b)+(b,a), each P=(1+1)/(1+2)=2/3
    assert(s(0).getLong(1) == 3)
    assert(s(0).getLong(2) == 3 * q(1, 1, 2.0))
    // doc 2: (<s>,a) seen 2/3; (a,b) seen 2/3
    assert(s(1).getLong(1) == 2)
    assert(s(1).getLong(2) == 2 * q(1, 1, 2.0))
  }

  test("score: unseen bigram and unseen context back off to 1/(ctx+V)") {
    // reference = doc 1: <s> a → model {(<s>,a):1}; ctx {<s>:1}; V = 1
    val df = Seq((1L, "a"), (2L, "z q")).toDF("doc_id", "text")
    val s = NgramLm.score(df, col("doc_id") === 1).orderBy("doc_id").collect()

    def q(c2: Long, c1: Long, v: Double): Long =
      math.round(math.log((c2 + 1).toDouble / (c1 + v)) * 1e6)

    // doc 2: (<s>,z) unseen pair, seen ctx → (0+1)/(1+1); (z,q) unseen ctx → (0+1)/(0+1)=1 → 0
    assert(s(1).getLong(1) == 2)
    assert(s(1).getLong(2) == q(0, 1, 1.0) + q(0, 0, 1.0))
    assert(q(0, 0, 1.0) == 0L)
  }

  test("one-token docs score via the <s> anchor (n_bigrams = 1)") {
    val df = Seq((1L, "a b"), (2L, "w")).toDF("doc_id", "text")
    val s = NgramLm.score(df, lit(true)).orderBy("doc_id").collect()
    assert(s(1).getLong(1) == 1)
  }

  test("bucketByCutoffs agrees with exact tertiles on balanced data") {
    // 9 docs in 3 clearly separated quality bands relative to a reference
    // trained on the high band
    val docs = (1L to 3L).map(i => (i, "a b c a b c")) ++
      (4L to 6L).map(i => (i, "a b x y a b")) ++
      (7L to 9L).map(i => (i, "p q r s t u"))
    val df = docs.toDF("doc_id", "text")
    val ref = col("doc_id") <= 3
    val exact = NgramLm.perplexityBuckets(df, ref)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap

    val scored = NgramLm.score(df, ref)
    // production derives cutoffs from a sampled quantile sketch; here the
    // exact band minima (avg_qlp of ranks 3 and 6 descending) play that role
    val desc = scored.orderBy(col("avg_qlp").desc)
      .select("avg_qlp").as[Long].collect()
    val byCut = NgramLm.bucketByCutoffs(scored, hi = desc(2), lo = desc(5))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap

    assert(exact == byCut)
    assert((1L to 3L).forall(exact(_) == "head"))
    assert((7L to 9L).forall(exact(_) == "tail"))
  }
}

package graft

import graft.operators.{AnnSearch, Mmr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** MMR re-rank contracts ([[Mmr]]): pure-relevance degeneracy at μ=0,
  * duplicate suppression under a real diversity weight, per-pick scores
  * matching a hand-rolled greedy reference, and determinism under
  * repartition. Runs on sf0.001 plus tiny closed-form fixtures. */
class MmrSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test")
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def emb = Engine.table(spark, dir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding"), col("label"))

  test("mu = 0 degenerates to relevance top-k (pick order == brute rank)") {
    val queries = emb.filter(col("id") < 30)
    val brute = AnnSearch.bruteTopK(queries, emb, 5)
      .select("qid", "cid", "rk").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2, r._3.toLong)).toSet
    val mmr = Mmr.mmrTopK(queries, emb, k = 5, nCand = 16,
        lam = 1.0, mu = 0.0)
      .select("qid", "cid", "pick").as[(Long, Long, Long)].collect().toSet
    assert(mmr == brute, "with no diversity term MMR must equal brute rank")
  }

  test("duplicate suppression: an exact twin of pick 1 loses to a " +
      "diverse lower-relevance candidate") {
    // q=(1,0); c1=c2 exact twins near q; c3 nearly orthogonal, low rel.
    // With lam=mu=0.5: score(c2 | c1 picked) = .5*rel(c2) - .5*1.0 < 0,
    // score(c3) = .5*rel(c3) - .5*sim(c3,c1) ~ +0.1 -> c3 must win pick 2.
    val corpus = Seq(
      (1L, Seq(1f, 0.2f)), (2L, Seq(1f, 0.2f)), (3L, Seq(0.2f, -0.95f))
    ).toDF("id", "embedding")
    val q = Seq((100L, Seq(1f, 0f))).toDF("id", "embedding")
    val picks = Mmr.mmrTopK(q, corpus, k = 3, nCand = 3,
        lam = 0.5, mu = 0.5)
      .select("pick", "cid").as[(Long, Long)].collect().sortBy(_._1)
    assert(picks.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected duplicate suppressed to pick 3, got ${picks.toSeq}")
    // and with mu = 0 the twin ranks second again
    val rel = Mmr.mmrTopK(q, corpus, k = 3, nCand = 3, lam = 1.0, mu = 0.0)
      .select("pick", "cid").as[(Long, Long)].collect().sortBy(_._1)
    assert(rel.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("per-pick scores match a hand-rolled greedy reference on sf0.001") {
    val queries = emb.filter(col("id") < 10)
    val got = Mmr.mmrTopK(queries, emb, k = 5, nCand = 16)
      .select("qid", "cid", "pick", "score")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(r => (r._2, r._4)).toSeq
      }
    // reference: quantize + brute candidate stage + greedy in plain scala
    def quant(e: Seq[Float]): Array[Long] = e.map(x =>
      BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum.toDouble *
        b.map(x => x * x).sum.toDouble)
      if (d == 0.0) -1.0 else dot.toDouble / d
    }
    val all = emb.select(col("id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (i, e) => i -> quant(e) }
    val qs = all.filter(_._1 < 10)
    qs.foreach { case (qid, qv) =>
      val cand = all.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(qv, cv), cv) }
        .sortBy(r => (-r._2, r._1)).take(16)
      var sel = Vector.empty[(Long, Double, Array[Long])]
      val expect = (1 to 5).map { _ =>
        val scored = cand.filter(c => !sel.exists(_._1 == c._1)).map { c =>
          val s = if (sel.isEmpty) 0.7 * c._2
            else 0.7 * c._2 - 0.3 * sel.map(s => cos(c._3, s._3)).max
          (c._1, s, c)
        }
        val best = scored.minBy(r => (-r._2, r._1))
        sel = sel :+ best._3
        (best._1, BigDecimal(best._2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      assert(got(qid) == expect, s"qid=$qid: ${got(qid)} != $expect")
    }
  }

  test("deterministic under repartition") {
    val queries = emb.filter(col("id") < 20)
    val a = Mmr.mmrTopK(queries, emb, 5, 16)
      .collect().map(_.toSeq).toSet
    val b = Mmr.mmrTopK(queries.repartition(7), emb.repartition(5), 5, 16)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("mmrRerank: caller-supplied candidates reproduce mmrTopK when fed " +
      "its own shortlist, and embedding-less candidates drop") {
    import spark.implicits._
    val queries = emb.filter(col("id") < 10)
    val ref = Mmr.mmrTopK(queries, emb, 5, 16)
      .select("qid", "cid", "pick").as[(Long, Long, Long)].collect().toSet
    // feed mmrRerank the SAME shortlist with rel in micro-units; rel
    // values differ in scale (micro vs raw cosine) but λ·rel ordering and
    // sims are shared, so picks 2.. can shift — instead check the exact
    // contract: pick 1 is the argmax of rel alone (ties → lower cid)
    val cand = graft.operators.AnnSearch.bruteTopK(queries, emb, 16)
      .select(col("qid").as("query_id"), col("cid").as("doc_id"),
        (col("cos") * 1000000).cast("bigint").as("rel_micro"))
    val out = Mmr.mmrRerank(cand, emb, k = 5)
    val pick1 = out.filter(col("pick") === 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    val top1 = cand.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("rel_micro").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(pick1 == top1, "pick 1 must be the pure-relevance argmax")
    assert(ref.nonEmpty && out.count() == queries.count() * 5)
    // candidates pointing at ids with no embedding row silently drop on
    // the inner join (the q192 discipline) — k picks still come from the
    // survivors
    val withGhost = cand.unionByName(
      Seq((1, 999999L, 999999999L)).toDF("query_id", "doc_id", "rel_micro"))
    val g = Mmr.mmrRerank(withGhost, emb, k = 5)
    assert(!g.select("doc_id").as[Long].collect().contains(999999L))
  }
}

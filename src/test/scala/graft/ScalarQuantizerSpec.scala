package graft

import graft.operators.{AnnSearch, ScalarQuantizer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Trained per-dimension SQ8 codec contracts ([[ScalarQuantizer]]):
  * quantization-error bound from the trained grid, exact-rescore scores,
  * brute-force degeneracy at an unbounded shortlist, and a measured recall
  * floor at the production shortlist. Runs on sf0.001. */
class ScalarQuantizerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test")
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def emb = Engine.table(spark, dir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding"), col("label"))

  test("SQ8: exact rescored scores, recall floor, brute degeneracy at " +
      "shortlist=inf") {
    val queries = emb.filter(col("id") < 30)
    val brute = AnnSearch.bruteTopK(queries, emb, 10)
      .select("qid", "cid", "cos").as[(Long, Long, Double)].collect()
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    val sq = ScalarQuantizer.sqTopK(queries, emb, 10, shortlist = 64)
      .select("qid", "cid", "cos").as[(Long, Long, Double)].collect()
    // SQ8 keeps ~8 bits per dimension of signal (PQ keeps 4 bits per 4-dim
    // subspace), so its ADC ranking is tight: measured 1.0 on this corpus,
    // floor pinned well above the PQ spec's 0.5
    val recall = (bruteSet & sq.map(r => (r._1, r._2)).toSet).size.toDouble / bruteSet.size
    assert(recall >= 0.8, s"SQ8 recall=$recall")
    // rescore is EXACT: any pair SQ8 and brute share must carry the same cos
    val bruteCos = brute.map(r => (r._1, r._2) -> r._3).toMap
    sq.foreach { case (q, c, cos) =>
      bruteCos.get((q, c)).foreach(b => assert(b == cos,
        s"SQ8 reported approx score for ($q,$c): $cos != exact $b"))
    }
    // a wide-open shortlist converges to brute force exactly
    val full = ScalarQuantizer.sqTopK(queries, emb, 10, shortlist = 100000)
      .select("qid", "cid", "cos").as[(Long, Long, Double)].collect()
    assert(full.map(r => (r._1, r._2)).toSet == bruteSet,
      "shortlist=inf SQ8 must equal brute force (rescore is exact)")
  }

  test("SQ8 grid: codes stay in [0,255] and the 255x-scaled reconstruction " +
      "is within one grid step of the true value on every dimension") {
    // white-box through the oracle identities: rebuild stats + codes the
    // way the operator defines them and check the floor-quantization bound
    // |recon - 255*v| <= span (one step of the 256-level grid)
    val rows = emb.select(col("id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, e) =>
        (id, e.map(x => BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
      }
    val dim = rows.head._2.length
    val lo = Array.tabulate(dim)(d => rows.map(_._2(d)).min)
    val hi = Array.tabulate(dim)(d => rows.map(_._2(d)).max)
    rows.foreach { case (_, v) =>
      (0 until dim).foreach { d =>
        val span = hi(d) - lo(d)
        val code = if (span == 0L) 0L else (v(d) - lo(d)) * 255L / span
        assert(code >= 0L && code <= 255L, s"code $code out of byte range")
        val recon = lo(d) * 255L + code * span
        assert(math.abs(recon - 255L * v(d)) <= span,
          s"dim $d: recon $recon vs ${255L * v(d)} exceeds step $span")
      }
    }
  }

  test("SQ8 degenerate inputs: constant dimensions and empty training fail " +
      "loudly or encode cleanly") {
    // constant embedding column: every dim has span 0 -> all codes 0, ADC
    // score defined (never NaN), and the search still returns k rows
    val const = spark.range(0, 20).select(col("id"),
      array((0 until 8).map(_ => lit(0.25f)): _*).as("embedding"))
    val out = ScalarQuantizer.sqTopK(const.filter(col("id") < 2), const, 3)
      .collect()
    assert(out.length == 2 * 3)
    assert(out.forall(r => !r.getDouble(r.fieldIndex("cos")).isNaN))
    // empty train frame: loud require, not silent zero codes
    val e = emb
    intercept[IllegalArgumentException] {
      ScalarQuantizer.sqTopK(e.filter(col("id") < 2), e, 3,
        trainOn = Some(e.filter(col("id") < -1)))
    }
  }
}

package graft

import graft.operators.{AnnSearch, Int8Quantize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Int8 embedding quantization: roundtrip error bound, scale cancellation,
  * degenerate vectors, and search recall vs the exact float metric. */
class QuantizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test")
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def emb = Engine.table(spark, dir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding"), col("label"))

  test("roundtrip error ≤ scale/2 per element; codes within int8 range") {
    val vecs = Seq(
      Seq(0.5f, -1.25f, 3.0f, 0.0f),
      Seq(1e-8f, -1e-8f, 2e-8f),
      Seq(127.0f, -127.0f, 1.0f))
    vecs.foreach { v =>
      val (scale, codes) = Int8Quantize.encodeRow(v)
      assert(codes.length == v.length)
      codes.foreach(c => assert(c >= -127 && c <= 127))
      v.indices.foreach { i =>
        val err = math.abs(codes(i) * scale - v(i).toDouble)
        assert(err <= scale / 2 + 1e-12,
          s"elem $i of $v: err $err > scale/2 ${scale / 2}")
      }
    }
  }

  test("zero vector → scale 0, all-zero codes; int8TopK ranks it last") {
    val (scale, codes) = Int8Quantize.encodeRow(Seq(0.0f, 0.0f, 0.0f))
    assert(scale == 0.0 && codes.forall(_ == 0))

    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 0.0f)), (4L, Seq(0.8f, 0.2f))
    ).toDF("id", "embedding")
    val top = Int8Quantize.int8TopK(df.filter(col("id") === 1), df, 3)
      .orderBy("rk").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 4L, 3L)) // zero vector last
    assert(top.last.getDouble(3) == -1.0)
  }

  test("scale cancellation: code cosine == dequantized cosine") {
    // cos over (code_i · scale) must equal cos over raw codes — per-vector
    // scales factor out of both norm and dot exactly.
    val a = Seq(0.3f, -0.7f, 2.1f, 0.05f)
    val b = Seq(-1.1f, 0.4f, 0.9f, 3.3f)
    val (sa, ca) = Int8Quantize.encodeRow(a)
    val (sb, cb) = Int8Quantize.encodeRow(b)
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / math.sqrt(x.map(p => p * p).sum * y.map(q => q * q).sum)
    }
    val codeCos = cos(ca.map(_.toDouble), cb.map(_.toDouble))
    val deqCos = cos(ca.map(_ * sa), cb.map(_ * sb))
    assert(math.abs(codeCos - deqCos) < 1e-12)
  }

  test("int8 search recall@10 ≥ 0.9 vs exact bruteTopK") {
    val e = emb
    val q = e.filter(col("id") < 20)
    val exact = AnnSearch.bruteTopK(q, e, 10)
      .select("qid", "cid").as[(Long, Long)].collect().groupBy(_._1)
    val int8 = Int8Quantize.int8TopK(q, e, 10)
      .select("qid", "cid").as[(Long, Long)].collect().groupBy(_._1)
    assert(exact.keySet == int8.keySet)
    val recalls = exact.map { case (qid, pairs) =>
      val ex = pairs.map(_._2).toSet
      val i8 = int8(qid).map(_._2).toSet
      (ex intersect i8).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9 (per-query: $recalls)")
  }

  test("stats: n_bytes = dim + 8, code_max = 127 for non-degenerate vectors") {
    val st = Int8Quantize.stats(emb).collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      assert(r.getLong(2) == 64 + 8) // 64-dim corpus
      assert(r.getLong(5) == 127L)   // max-abs scheme saturates the range
      assert(r.getLong(4) > 0L)
    }
  }
}

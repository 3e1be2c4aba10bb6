package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Misra–Gries sketch-then-verify heavy hitters
  * ([[graft.operators.HeavyHitters]]): the completeness guarantee (every
  * value with count > N/(m+1) survives the sketch), bit-equality of the
  * two-pass exact result against a full GROUP BY under adversarial domains
  * (domain ≫ counters so decrements genuinely fire), merge semantics of
  * the distributed partials, and the guard on unsupported thresholds.
  */
class HeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-hh")

  override def afterAll(): Unit = spark.stop()

  private def vals(xs: Seq[String]): DataFrame = {
    import spark.implicits._
    xs.toDF("v").repartition(7) // force many partials → merge path
  }

  /** skewed synthetic: k hot values with given counts + `cold` singletons */
  private def skewed(hot: Map[String, Int], cold: Int): Seq[String] = {
    val hotRows = hot.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }
    val coldRows = (0 until cold).map(i => s"cold_$i")
    // deterministic interleave so hot rows are spread across partitions
    (hotRows ++ coldRows).sortBy(_.hashCode)
  }

  test("two-pass exact equals full GROUP BY HAVING on a skewed domain") {
    val data = skewed(Map("a" -> 500, "b" -> 200, "c" -> 90), cold = 5000)
    val df = vals(data)
    val n = data.size.toLong
    val m = 64
    val t = n / (m + 1) + 1 // smallest threshold the sketch supports
    val got = HeavyHitters.exact(df, col("v"), m, t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= t).toMap
    assert(got == want)
    assert(want.nonEmpty, "test must actually select some hitters")
  }

  test("candidates contain every value above N/(m+1) even at tiny m") {
    // m=2 against 3 hot values: only those above N/3 are guaranteed; the
    // truly-dominant one must always survive the decrement storm.
    val data = skewed(Map("big" -> 900, "mid" -> 60), cold = 800)
    val n = data.size // 1760; N/(m+1) = 586 → only "big" guaranteed
    val cand = HeavyHitters.candidates(vals(data), col("v"), m = 2)
    assert(cand.contains("big"))
    assert(cand.size <= 2)
  }

  test("threshold below the sketch guarantee is rejected loudly") {
    val df = vals(skewed(Map("a" -> 50), cold = 1000))
    val ex = intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, col("v"), m = 4, minCount = 2)
    }
    assert(ex.getMessage.contains("N/(m+1)"))
  }

  test("merge trims to m counters and preserves the deficit bound") {
    val mg = new HeavyHitters.MisraGries(2)
    val a = Map("x" -> 10L, "y" -> 3L)
    val b = Map("x" -> 5L, "z" -> 4L)
    val merged = mg.merge(a, b)
    // sum = x:15 y:3 z:4; 3rd-largest weight = 3 → subtract 3, drop ≤0
    assert(merged == Map("x" -> 12L, "z" -> 1L))
    assert(merged.size <= 2)
  }

  test("reduce decrement drops zero counters and never exceeds m") {
    val mg = new HeavyHitters.MisraGries(2)
    var st = mg.zero
    for (x <- Seq("a", "a", "b", "c")) st = mg.reduce(st, x)
    // c arrives full: decrement-all → a:1 survives, b dropped, c absorbed
    assert(st == Map("a" -> 1L))
    assert(st.size <= 2)
  }

  test("merged per-batch summaries keep every global heavy hitter;" +
      " recount from them equals the one-shot exact result") {
    val data = skewed(Map("a" -> 600, "b" -> 250, "c" -> 120), cold = 6000)
    val n = data.size.toLong
    val m = 64
    val t = n / (m + 1) + 1
    // 5-way batch split — batches see DIFFERENT slices of the skew
    var state = Map.empty[String, Long]
    for (b <- 0 until 5) {
      val batch = vals(data.zipWithIndex.collect {
        case (v, i) if i % 5 == b => v })
      state = HeavyHitters.mergeSummaries(state,
        HeavyHitters.summarize(batch, col("v"), m), m)
    }
    assert(state.size <= m, "merge must respect the counter bound")
    val got = HeavyHitters.exactFromCandidates(vals(data), col("v"),
      state.keys.toSeq, t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = HeavyHitters.exact(vals(data), col("v"), m, t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.keySet == Set("a", "b", "c"))
  }

  test("all-distinct stream yields no false positives after recount") {
    val data = (0 until 2000).map(i => s"u_$i")
    val df = vals(data)
    val t = data.size.toLong / 65 + 1
    val got = HeavyHitters.exact(df, col("v"), m = 64, minCount = t)
    assert(got.count() == 0)
  }
}

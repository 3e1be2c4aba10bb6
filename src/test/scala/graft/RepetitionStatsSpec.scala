package graft

import graft.operators.RepetitionStats
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Gopher repetition signals ([[graft.operators.RepetitionStats]]):
  * hand-computed goldens for every formula the q221 oracle also covers,
  * plus the line-based family and the filter, which the single-line
  * documents corpus cannot exercise. */
class RepetitionStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    Engine.session(cores = 4, appName = "graft-repstats")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def one(text: String): RepetitionStats.Row =
    RepetitionStats.compute(1L, text)

  test("top-n-gram char fraction: counts, separator exclusion, max-coverage tie-break") {
    val r = one("a b a b c")
    // "a b" occurs twice, 2 chars per occurrence (separator NOT counted),
    // twc = 5 single-char words
    assert(r.top2gram_frac === 4.0 / 5)
    assert(r.top3gram_frac === 3.0 / 5, "all 3-grams unique: max cov = one gram")
    // count tie (every gram once) broken by coverage: the longest words win
    val t = one("aa bb c d")
    assert(t.top2gram_frac === 4.0 / 6, "'aa bb' covers 4 of 6 chars")
  }

  test("dup-n-gram coverage is an interval UNION — chars counted once") {
    // "x y z w v" repeats verbatim: every position covered exactly once
    val r = one("x y z w v x y z w v")
    assert(r.dup5gram_frac === 1.0)
    // overlapping dup 5-grams must not double-count: 6× 'a' has dup grams
    // at positions 0 and 1 covering the union {0..5} = all chars
    val o = one("a a a a a a")
    assert(o.dup5gram_frac === 1.0)
    assert(one("p q r s t u v w x y").dup5gram_frac === 0.0,
      "all distinct: nothing covered")
  }

  test("line family: trimmed, empties dropped, repeats counted beyond first occurrence") {
    val r = one("foo\nbar\nfoo\n baz \n\nfoo")
    assert(r.n_lines === 5, "blank line dropped, ' baz ' trimmed in")
    assert(r.dup_line_frac === 2.0 / 5, "2nd and 3rd 'foo' are repeats")
    assert(r.dup_line_char_frac === 6.0 / 15)
  }

  test("empty and degenerate inputs yield zeros, never NaN") {
    val e = one("")
    assert(e.n_words === 0 && e.mean_word_len === 0.0 &&
      e.top2gram_frac === 0.0 && e.dup10gram_frac === 0.0 &&
      e.dup_line_frac === 0.0)
    val short = one("lone")
    assert(short.top2gram_frac === 0.0 && short.dup5gram_frac === 0.0)
  }

  test("filter: failing docs carry the FIRST violated rule; survivors pass all") {
    // the survivor must be LONG: on a short doc the single most-covering
    // n-gram alone exceeds the top-n thresholds (13 chars of a 52-char doc
    // is 25%) — the Gopher rules presume web-document lengths
    val unique60 = (1 to 60).map(i => f"w$i%02d").mkString(" ")
    val docs = Seq(
      (1L, unique60), // 60 distinct 3-char words: top3 = 9/180 = 0.05
      (2L, "spam spam spam spam spam spam"), // top2 = 1.0 > 0.20
      (3L, "u v w x y z u v w x y z u v w x y z") // dup5 = 1.0 (and top2…)
    ).toDF("doc_id", "text")
    val (kept, rejected) = RepetitionStats.filter(docs)
    assert(kept.select("doc_id").as[Long].collect().toSet === Set(1L))
    val reasons = rejected.select("doc_id", "failed_rule").as[(Long, String)]
      .collect().toMap
    assert(reasons(2L).startsWith("dup_line_frac") === false)
    assert(reasons(2L) === "top2gram_frac>0.2",
      "first threshold in declaration order names the violation")
    assert(reasons.contains(3L))
  }

  test("stats is one narrow map pass — no shuffle in the plan") {
    val docs = spark.range(0, 200)
      .selectExpr("id AS doc_id", "repeat('w ', 50) AS text")
    val st = RepetitionStats.stats(docs).toDF()
    st.collect()
    val plan = st.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetition stats must not shuffle:\n$plan")
  }
}

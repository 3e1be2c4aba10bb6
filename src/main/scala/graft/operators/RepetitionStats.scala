package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Gopher/MassiveWeb repetition-quality signals (Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from Training
  * Gopher", appendix A1.1): the document-level REPETITION family used to
  * filter low-quality web text before LM training — duplicate-line
  * fractions, most-frequent-n-gram character fractions (n = 2..4), and
  * duplicated-n-gram character coverage (n = 5..10). Complements the
  * length/punctuation/stopword quality score (q47) with the signals that
  * catch boilerplate loops, listicles and scraper echo, which
  * whole-document and near-dup passes miss (a document 40% self-repeating
  * is unique at the document grain).
  *
  * Relation to q180 (`TextAnalysis.repetitionSignals`): q180 computes the
  * quick COUNT-share approximations (dup-word fraction, top-2-gram count
  * share). This operator implements the paper's actual CHARACTER-fraction
  * definitions — char-weighted top-gram coverage with a deterministic
  * tie-break, interval-UNION duplicated-n-gram coverage for n = 5..10
  * (chars counted once however many dup grams overlap them), the
  * line-level family, and the threshold filter — the set the published
  * thresholds are calibrated against.
  *
  * Exact definitions (both engines implement these verbatim):
  *  - words: space-split, empties dropped; `twc` = Σ word lengths.
  *  - lines: newline-split, trimmed, empties dropped.
  *  - `dup_line_frac`  = (lines − distinct lines) / lines — the fraction
  *    of line instances that repeat an earlier one.
  *  - `dup_line_char_frac` = chars of those repeated instances / total
  *    line chars.
  *  - `topNgram_frac` (n=2,3,4) = max over n-grams of
  *    count × (Σ word lens of the gram) / twc — the character share of
  *    the dominant n-gram (deterministic under count ties: maximum
  *    coverage wins, the quantity the threshold is about).
  *  - `dupNgram_frac` (n=5..10) = Σ lens of words covered by ANY n-gram
  *    occurring ≥ 2× / twc — positions counted once (interval union), the
  *    paper's "taking care not to count characters more than once".
  *
  * Scale shape: ONE compiled `mapPartitions` pass — per-doc hash maps,
  * zero shuffles, no Catalyst HOF lambdas (see [[TextFeatures]] scaladoc
  * for why HOFs are banned in per-doc kernels); linear in corpus bytes,
  * embarrassingly parallel at any executor count.
  *
  * Reference scope: the era's nearest machinery is per-row UDFs
  * (`ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDF.java:66`)
  * — the rule SET is beyond-reference, part of the training-data pipeline
  * family.
  */
object RepetitionStats extends Serializable {

  final case class Row(
      doc_id: Long, n_words: Long, twc: Long, mean_word_len: Double,
      n_lines: Long, dup_line_frac: Double, dup_line_char_frac: Double,
      top2gram_frac: Double, top3gram_frac: Double, top4gram_frac: Double,
      dup5gram_frac: Double, dup6gram_frac: Double, dup7gram_frac: Double,
      dup8gram_frac: Double, dup9gram_frac: Double, dup10gram_frac: Double)

  /** The paper's MassiveWeb thresholds (table A1); a doc failing ANY rule
    * is dropped by [[filter]]. */
  val GopherThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_line_char_frac" -> 0.20,
    "top2gram_frac" -> 0.20, "top3gram_frac" -> 0.18,
    "top4gram_frac" -> 0.16,
    "dup5gram_frac" -> 0.15, "dup6gram_frac" -> 0.14,
    "dup7gram_frac" -> 0.13, "dup8gram_frac" -> 0.12,
    "dup9gram_frac" -> 0.11, "dup10gram_frac" -> 0.10)

  private def topNgramCov(ws: Array[String], lens: Array[Int], n: Int): Long = {
    if (ws.length < n) return 0L
    val counts = new java.util.HashMap[String, Array[Long]]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= ws.length - n) {
      sb.setLength(0)
      var k = 0L
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        k += lens(i + j)
        j += 1
      }
      val cell = counts.computeIfAbsent(sb.toString, _ => Array(0L, k))
      cell(0) += 1
      i += 1
    }
    var best = 0L
    counts.forEach { (_, cell) =>
      val cov = cell(0) * cell(1)
      if (cov > best) best = cov
    }
    best
  }

  private def dupNgramCov(ws: Array[String], lens: Array[Int], n: Int): Long = {
    if (ws.length < n) return 0L
    val counts = new java.util.HashMap[String, Integer]()
    val grams = new Array[String](ws.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= ws.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      grams(i) = sb.toString
      counts.merge(grams(i), 1, (a, b) => a + b)
      i += 1
    }
    val covered = new Array[Boolean](ws.length)
    i = 0
    while (i < grams.length) {
      if (counts.get(grams(i)) > 1) {
        var j = 0
        while (j < n) { covered(i + j) = true; j += 1 }
      }
      i += 1
    }
    var cc = 0L
    i = 0
    while (i < ws.length) { if (covered(i)) cc += lens(i); i += 1 }
    cc
  }

  /** All repetition signals for one document. */
  def compute(id: Long, text: String): Row = {
    val ws = text.split(" ").filter(_.nonEmpty)
    val lens = ws.map(_.length)
    val twc = lens.foldLeft(0L)(_ + _)
    val nw = ws.length.toLong
    def frac(cov: Long): Double = if (twc == 0) 0.0 else cov.toDouble / twc

    val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
    val lineChars = lines.foldLeft(0L)(_ + _.length)
    val seen = new java.util.HashSet[String]()
    var dupLines = 0L
    var dupLineChars = 0L
    lines.foreach { l =>
      if (!seen.add(l)) { dupLines += 1; dupLineChars += l.length }
    }
    Row(id, nw, twc,
      mean_word_len = if (nw == 0) 0.0 else twc.toDouble / nw,
      n_lines = lines.length.toLong,
      dup_line_frac =
        if (lines.isEmpty) 0.0 else dupLines.toDouble / lines.length,
      dup_line_char_frac =
        if (lineChars == 0) 0.0 else dupLineChars.toDouble / lineChars,
      top2gram_frac = frac(topNgramCov(ws, lens, 2)),
      top3gram_frac = frac(topNgramCov(ws, lens, 3)),
      top4gram_frac = frac(topNgramCov(ws, lens, 4)),
      dup5gram_frac = frac(dupNgramCov(ws, lens, 5)),
      dup6gram_frac = frac(dupNgramCov(ws, lens, 6)),
      dup7gram_frac = frac(dupNgramCov(ws, lens, 7)),
      dup8gram_frac = frac(dupNgramCov(ws, lens, 8)),
      dup9gram_frac = frac(dupNgramCov(ws, lens, 9)),
      dup10gram_frac = frac(dupNgramCov(ws, lens, 10)))
  }

  /** One row of repetition signals per document — one narrow map pass. */
  def stats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Dataset[Row] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => compute(id, text) })
  }

  /** Documents passing every Gopher repetition rule (or custom
    * thresholds); the rejected side carries `failed_rule` for audit. */
  def filter(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      thresholds: Seq[(String, Double)] = GopherThresholds)
      : (DataFrame, DataFrame) = {
    val st = stats(docs, idCol, textCol).toDF()
    val fail = thresholds.foldLeft(
      org.apache.spark.sql.functions.lit(null).cast("string")) {
      case (acc, (c, t)) =>
        org.apache.spark.sql.functions
          .when(acc.isNotNull, acc)
          .when(col(c) > t, org.apache.spark.sql.functions.lit(s"$c>$t"))
          .otherwise(org.apache.spark.sql.functions.lit(null).cast("string"))
    }
    val judged = st.withColumn("failed_rule", fail)
    val keepIds = judged.filter(col("failed_rule").isNull).select(col("doc_id"))
    (docs.join(keepIds, docs(idCol) === keepIds("doc_id"), "left_semi"),
      judged.filter(col("failed_rule").isNotNull))
  }
}

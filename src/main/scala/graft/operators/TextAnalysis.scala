package graft.operators

import org.apache.spark.sql.DataFrame
import TextFeatures._

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. Each is one
  * compiled `mapPartitions` pass per document (embarrassingly parallel, no
  * shuffle — see [[TextFeatures]] for why not Catalyst HOFs); every formula
  * is rational arithmetic on counts so the DuckDB oracle reproduces it
  * bit-for-bit (no transcendentals).
  */
object TextAnalysis {

  private val stopEn = Set("the", "a", "of", "and", "to")
  private val stopFr = Set("le", "la", "et", "de", "un")
  private val stopEs = Set("el", "los", "de", "y", "un")
  private val stopDe = Set("der", "die", "das", "und", "ein")

  /** Heuristic language ID: CJK/non-ASCII ratio first, then stopword-hit
    * argmax with deterministic preference order en > fr > es > de. */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text", "lang").as[(Long, String, String)]
      .mapPartitions(_.map { case (id, t, lang) =>
        val w = words(t)
        val pred =
          if (nCodePoints(t) == 0) "und" // empty text: no 0/0 NaN ratio
          else if (nonAsciiCount(t).toDouble / nCodePoints(t) > 0.3) "zh"
          else {
            val en = countIn(w, stopEn); val fr = countIn(w, stopFr)
            val es = countIn(w, stopEs); val de = countIn(w, stopDe)
            if (en >= fr && en >= es && en >= de) "en"
            else if (fr >= es && fr >= de) "fr"
            else if (es >= de) "es"
            else "de"
          }
        (id, pred, lang)
      })
      .toDF("doc_id", "pred_lang", "true_lang")
  }

  /** Quality features + composite score (all rational in counts). */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val w = words(t)
        // empty text: denominators clamp to 1 so outputs stay finite (no 0/0)
        val nWords = math.max(w.length, 1).toDouble
        val nChars = math.max(nCodePoints(t), 1).toDouble
        val avgWlen = (nChars - (nWords - 1)) / nWords // single-space separated
        val stopRatio = countIn(w, stopEn) / nWords
        val punctRatio = punctCount(t) / nChars
        val ttr = nDistinct(w) / nWords
        (id, w.length.toLong, round6(avgWlen), round6(stopRatio),
          round6(punctRatio), round6(ttr),
          round6(stopRatio * 0.3 + ttr * 0.5 - punctRatio * 0.2))
      })
      .toDF("doc_id", "n_words", "avg_wlen", "stop_ratio", "punct_ratio",
        "ttr", "quality")
  }

  /** Token counts: whitespace tokens and a BPE-ish regex tokenizer
    * (letter runs / single digits / single punctuation). */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val w = words(t)
        (id, w.length.toLong, bpeTokenCount(t).toLong, nDistinct(w).toLong)
      })
      .toDF("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_distinct_words")
  }

  /** Winnowing fingerprint summary per document (k=5 char-grams, window 4):
    * fingerprint-set size + min/max fingerprints — enough to equality-join
    * docs on overlapping fingerprints downstream. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val fp = winnow(charGramH60(t, 5), 4)
        val mn = if (fp.isEmpty) None else Some(fp.min)
        val mx = if (fp.isEmpty) None else Some(fp.max)
        (id, fp.length.toLong, mn, mx)
      })
      .toDF("doc_id", "n_fp", "fp_min", "fp_max")
  }
}

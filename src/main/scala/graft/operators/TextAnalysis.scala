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

  /** Gopher-style repetition signals (the "Repetitious text" filters of the
    * Gopher/MassiveText quality rules, re-expressed on word streams): the
    * fraction of word occurrences that are repeats, the share of 2-gram
    * slots held by the single most frequent 2-gram, and the fraction of
    * 3-gram slots that duplicate an earlier 3-gram. All counts are exact
    * integers and ratios divide them, so the DuckDB oracle matches
    * bit-for-bit. One compiled pass, shuffle-free. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val ws = words(t)
        val n = ws.length // split(" ", -1) never yields 0 tokens
        val nd = nDistinct(ws)
        val n2 = math.max(n - 1, 0)
        var top2 = 0
        if (n2 > 0) {
          val m = new java.util.HashMap[String, Integer]()
          var i = 0
          while (i < n - 1) {
            val c = m.merge(ws(i) + " " + ws(i + 1), Integer.valueOf(1),
              (a, b) => Integer.valueOf(a.intValue + b.intValue))
            if (c.intValue > top2) top2 = c.intValue
            i += 1
          }
        }
        val n3 = math.max(n - 2, 0)
        var d3 = 0
        if (n3 > 0) {
          val s = new java.util.HashSet[String]()
          var i = 0
          while (i < n - 2) { s.add(ws(i) + " " + ws(i + 1) + " " + ws(i + 2)); i += 1 }
          d3 = s.size
        }
        (id, n.toLong, nd.toLong,
          round6((n - nd).toDouble / n),
          if (n2 > 0) round6(top2.toDouble / n2) else 0.0,
          if (n3 > 0) round6((n3 - d3).toDouble / n3) else 0.0)
      })
      .toDF("doc_id", "n_words", "n_distinct", "dup_word_frac", "top2_frac",
        "dup3_frac")
  }

  /** C4/Dolma-style blocklist scrub: per-doc hit count against a term
    * blocklist, the hit fraction, the C4 drop verdict (`kept` = zero hits),
    * and the Dolma-style masked text with each blocked token replaced by
    * `***`. The verdict and the mask ride in one narrow pass so a pipeline
    * can route on `kept` and store `masked` without re-tokenizing. Exact
    * token equality (not regex) — identical semantics in the oracle's
    * `list_transform`/`list_filter`, no regex-engine skew. */
  def blocklistMask(docs: DataFrame, blocked: Set[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val ws = words(t)
        var hits = 0
        val sb = new java.lang.StringBuilder(t.length)
        var i = 0
        while (i < ws.length) {
          if (i > 0) sb.append(' ')
          if (blocked.contains(ws(i))) { hits += 1; sb.append("***") }
          else sb.append(ws(i))
          i += 1
        }
        (id, ws.length.toLong, hits.toLong,
          round6(hits.toDouble / ws.length), hits == 0, sb.toString)
      })
      .toDF("doc_id", "n_words", "n_hits", "hit_frac", "kept", "masked")
  }

  /** Fixed-size sliding-window chunking: split each document into windows of
    * `window` tokens advancing by `stride` (stride < window ⇒ overlapping
    * context, the standard pretraining/RAG chunk shape). A tail window that
    * adds no tokens beyond the previous one is suppressed (emitted starts
    * are 0 and every `stride` multiple below `n - window + stride`), so
    * chunks cover every token exactly and never emit a fully-contained
    * suffix. One narrow flatMap — the 100 TB shape is a map-only stage whose
    * output rows ≈ n_tokens/stride per doc. */
  def chunkWindows(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window (got window=$window stride=$stride)")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val ws = words(t)
        val n = ws.length
        val starts = 0 until n by stride
        starts.iterator
          .filter(st => st == 0 || st < n - window + stride)
          .map { st =>
            val end = math.min(st + window, n)
            (id, (st / stride).toLong, (end - st).toLong,
              ws.slice(st, end).mkString(" "))
          }
      })
      .toDF("doc_id", "chunk_id", "n_tok", "chunk")
  }
}

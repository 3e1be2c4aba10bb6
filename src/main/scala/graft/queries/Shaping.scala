package graft.queries

import graft.operators.{BpeTrain, CorpusOps, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus shaping pack (round 7): Gopher-style repetition quality signals,
  * C4/Dolma-style blocklist scrub, sliding-window chunking, and greedy
  * sequence packing — the last mile between a cleaned corpus and training
  * examples.
  *
  * Oracle strategy: everything is exact token arithmetic (counts, integer
  * ratios rounded on both sides) or the shared keyed-md5 determinism, so all
  * four queries hash-match DuckDB — including the sequential packing fold,
  * which the oracle replays as a recursive CTE walking each shard in rank
  * order.
  */
object Shaping {

  private def docs(s: SparkSession, dir: String) = Pipeline.docs(s, dir)

  private val blocked = Set("slow", "crash", "merge")
  private val blockedSql = "('slow','crash','merge')"

  // ---- shared oracle fragments: constants that must agree between the SQL
  // text and the Scala build (on pain of hash-red) live in ONE place ----

  /** The fixed BPE merge list q186/q191 run inference with. */
  private val bpeMerges = Seq(("e", "r"), ("s", "t"), ("a", "st"))

  /** Chained-replace tokenization CTEs over `documents` → t(doc_id, ntok),
    * one row per word: the ' c1  c2 ' encoding makes SQL replace() exactly
    * the left-to-right non-overlapping merge pass. Generated from
    * [[bpeMerges]] so the SQL and Scala merge lists can never drift. */
  private val bpeTokCtes: String = {
    val chain = bpeMerges.zipWithIndex.map { case ((a, b), i) =>
      s"s${i + 1} AS (SELECT doc_id, replace(s, ' $a  $b ', ' $a$b ') AS s FROM s$i)"
    }.mkString(",\n")
    s"""w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |s0 AS (SELECT doc_id,
       |  ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS s FROM w),
       |$chain,
       |t AS (SELECT doc_id, len(string_split(trim(s, ' '), '  ')) AS ntok FROM s${bpeMerges.length})""".stripMargin
  }

  /** Recursive greedy-pack replay over u(uid VARCHAR, ntok) → p(uid, shard,
    * ntok, rn, bin, fill): the SQL mirror of `CorpusOps.packUnits` (same
    * keyed-md5 shard key, same (skey, uid) walk order, same first-fit
    * fold). Shared by q183/q187/q191 so the fold semantics and each
    * query's (seed, nShards, capacity) exist exactly once. */
  private def packCtes(seed: String, nShards: Int, capacity: Long): String =
    s"""k AS (SELECT uid, ntok, md5('$seed:' || uid) AS skey FROM u),
       |o AS (SELECT uid, ntok, skey,
       |  CAST(CAST(('0x'||substr(skey,1,15)) AS BIGINT) % $nShards AS INTEGER) AS shard FROM k),
       |r AS (SELECT uid, shard, ntok,
       |  row_number() OVER (PARTITION BY shard ORDER BY skey, uid) AS rn FROM o),
       |p AS (
       |  SELECT uid, shard, ntok, rn,
       |    CAST(0 AS BIGINT) AS bin, CAST(ntok AS BIGINT) AS fill
       |  FROM r WHERE rn = 1
       |  UNION ALL
       |  SELECT r.uid, r.shard, r.ntok, r.rn,
       |    CASE WHEN p.fill + r.ntok <= $capacity THEN p.bin ELSE p.bin + 1 END,
       |    CASE WHEN p.fill + r.ntok <= $capacity THEN p.fill + r.ntok
       |         ELSE CAST(r.ntok AS BIGINT) END
       |  FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)""".stripMargin

  /** q185 oracle: replay the whole `nMerges`-iteration BPE training loop
    * as chained CTE GENERATIONS — the q183 recursive-replay discipline
    * married to q186's double-space merge encoding. Per generation i:
    * split the current segmentation strings back into tokens, count
    * adjacent pairs weighted by word frequency, take the argmax under the
    * engine's exact tie-break (cnt DESC, a, b), and apply the winning
    * merge with ONE replace() (the ' a  b ' → ' ab ' encoding IS the
    * left-to-right non-overlapping pass, proven by q186). MATERIALIZED is
    * load-bearing: g_i is referenced twice (pair scan + next generation),
    * so inlining would re-evaluate the whole prefix chain per step. */
  private def bpeTrainCtes(nMerges: Int): String = {
    val steps = (1 to nMerges).map { i =>
      s"""p$i AS (SELECT string_split(trim(s, ' '), '  ') AS ts, f FROM g${i - 1}),
         |e$i AS (SELECT ts[j] AS a, ts[j+1] AS b, f FROM p$i, unnest(range(1, len(ts))) AS t(j)),
         |m$i AS MATERIALIZED (SELECT a, b, CAST(sum(f) AS BIGINT) AS cnt
         |  FROM e$i GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
         |g$i AS MATERIALIZED (SELECT f,
         |  replace(s, ' ' || (SELECT a FROM m$i) || '  ' || (SELECT b FROM m$i) || ' ',
         |          ' ' || (SELECT a || b FROM m$i) || ' ') AS s FROM g${i - 1})"""
        .stripMargin
    }.mkString(",\n")
    val un = (1 to nMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rk, a, b, cnt FROM m$i")
      .mkString("\nUNION ALL ")
    s"""WITH wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |g0 AS MATERIALIZED (SELECT f,
       |  ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS s FROM wf),
       |$steps
       |SELECT rk, a AS "left", b AS "right", a || b AS merged, cnt AS score
       |FROM ($un) ORDER BY rk""".stripMargin
  }

  private val packSeed = "pack7"
  private val chunkPackSeed = "cp7"
  private val tokPackSeed = "tp7"
  private val packShards = 8
  private val wordCap = 128L   // q183/q187 whitespace-token bins
  private val bpeCap = 1024L   // q191 BPE-token bins (docs are unchunked)

  val all: Seq[Qd] = Seq(

    // Gopher/MassiveText repetition filters on word streams: duplicate-word
    // fraction, top-2-gram share, duplicate-3-gram fraction. Pure counts →
    // exact ratios on both engines.
    Qd("q180_repetition_signals",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, len(ws) AS n, len(list_distinct(ws)) AS nd FROM w),
        |g2 AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1])) AS g
        |  FROM w WHERE len(ws) >= 2),
        |c2 AS (SELECT doc_id, max(c) AS top2, CAST(sum(c) AS BIGINT) AS n2
        |  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |g3 AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS g
        |  FROM w WHERE len(ws) >= 3),
        |c3 AS (SELECT doc_id, count(DISTINCT g) AS d3, count(*) AS n3
        |  FROM g3 GROUP BY doc_id)
        |SELECT b.doc_id, CAST(n AS BIGINT) AS n_words, CAST(nd AS BIGINT) AS n_distinct,
        |  ROUND(CAST(n - nd AS DOUBLE)/n, 6) AS dup_word_frac,
        |  ROUND(COALESCE(CAST(c2.top2 AS DOUBLE)/c2.n2, 0.0), 6) AS top2_frac,
        |  ROUND(COALESCE(CAST(c3.n3 - c3.d3 AS DOUBLE)/c3.n3, 0.0), 6) AS dup3_frac
        |FROM b LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
        |ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.repetitionSignals(docs(s, dir)).orderBy("doc_id")
    },

    // C4-style blocklist verdict + Dolma-style masking in one pass. Exact
    // token equality on both engines — no regex-engine skew.
    Qd("q181_blocklist_scrub",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |h AS (SELECT doc_id, ws, len(ws) AS n,
        |  len(list_filter(ws, x -> x IN $blockedSql)) AS hits FROM w)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_words, CAST(hits AS BIGINT) AS n_hits,
        |  ROUND(CAST(hits AS DOUBLE)/n, 6) AS hit_frac,
        |  hits = 0 AS kept,
        |  array_to_string(list_transform(ws,
        |    x -> CASE WHEN x IN $blockedSql THEN '***' ELSE x END), ' ') AS masked
        |FROM h ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.blocklistMask(docs(s, dir), blocked).orderBy("doc_id")
    },

    // Sliding-window chunking, 32-token windows every 24 tokens; tail
    // windows that add no new tokens are suppressed on both engines.
    Qd("q182_chunk_windows",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, ws, len(ws) AS n,
        |  unnest(range(0, len(ws), 24)) AS st FROM w)
        |SELECT doc_id, CAST(st/24 AS BIGINT) AS chunk_id,
        |  CAST(least(st+32, n) - st AS BIGINT) AS n_tok,
        |  array_to_string(ws[st+1:least(st+32, n)], ' ') AS chunk
        |FROM c WHERE st = 0 OR st < n - 32 + 24
        |ORDER BY doc_id, chunk_id""") { (s, dir) =>
      TextAnalysis.chunkWindows(docs(s, dir), window = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")
    },

    // Greedy sequence packing into 128-token bins, walked in the
    // deterministic shard order. The oracle replays the sequential fold as a
    // recursive CTE advancing one rank per shard per iteration.
    Qd("q183_pack_sequences",
      s"""WITH RECURSIVE u AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS uid,
        |    len(string_split(text, ' ')) AS ntok
        |  FROM documents),
        |${packCtes(packSeed, packShards, wordCap)}
        |SELECT CAST(uid AS BIGINT) AS doc_id, shard, bin, CAST(ntok AS BIGINT) AS n_tok
        |FROM p ORDER BY doc_id""") { (s, dir) =>
      CorpusOps.packGreedy(docs(s, dir), seed = packSeed, nShards = packShards,
          capacity = wordCap)
        .orderBy("doc_id")
    },

    // BPE iteration zero: adjacent char-pair frequencies over the word dict,
    // weighted by corpus word frequency — top 20 merge candidates.
    Qd("q184_bpe_pair_counts",
      """WITH wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, f
        |  FROM wf, unnest(range(1, length(w))) AS t(i)),
        |c AS (SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM p GROUP BY pair),
        |r AS (SELECT pair, cnt,
        |  row_number() OVER (ORDER BY cnt DESC, pair) AS rk FROM c)
        |SELECT CAST(rk AS BIGINT) AS rk, pair, cnt FROM r WHERE rk <= 20
        |ORDER BY rk""") { (s, dir) =>
      BpeTrain.pairCounts(docs(s, dir), 20).orderBy("rk")
    },

    // Learned BPE merge sequence (12 merges). The training loop is
    // iterative (each merge re-segments the dict before the next count),
    // but each iteration IS SQL — so the oracle (r15, closing the suite's
    // last rows-only gap) replays all 12 generations as chained CTEs via
    // [[bpeTrainCtes]]. ShapingSpec additionally replays the loop
    // sequentially driver-side, and q184 oracles iteration zero.
    Qd("q185_bpe_train", bpeTrainCtes(12)) { (s, dir) =>
      BpeTrain.trainMerges(docs(s, dir), 12).orderBy("rk")
    },

    // BPE inference with a fixed merge list ((e,r),(s,t),(a,st) — the third
    // consumes the second's output, proving rank-ordered chaining). The
    // oracle encodes each word's segmentation as ' c1  c2 ... cn ' (every
    // token owns its surrounding spaces) so SQL replace() of ' a  b ' with
    // ' ab ' is exactly the left-to-right non-overlapping merge pass.
    Qd("q186_bpe_tokenize",
      s"""WITH $bpeTokCtes
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(ntok) AS BIGINT) AS n_bpe_tokens,
        |  ROUND(CAST(sum(ntok) AS DOUBLE) / count(*), 6) AS tokens_per_word
        |FROM t GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      BpeTrain.tokenize(docs(s, dir), bpeMerges).orderBy("doc_id")
    },

    // Chunk→pack capstone: the actual corpus→training-examples flow — split
    // every doc into ≤32-token windows (so no unit exceeds capacity), then
    // greedily pack the windows into 128-token bins per shard. Reported at
    // the bin grain: with all units ≤32 every non-final bin fills to >96
    // tokens (greedy bound: capacity − max_unit), the packing-efficiency
    // contract asserted in ShapingSpec.
    Qd("q187_chunk_pack",
      s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, ws, len(ws) AS n,
        |  unnest(range(0, len(ws), 24)) AS st FROM w),
        |u AS (SELECT
        |  CAST(doc_id AS VARCHAR)||':'||CAST(CAST(st/24 AS BIGINT) AS VARCHAR) AS uid,
        |  least(st+32, n) - st AS ntok
        |  FROM c WHERE st = 0 OR st < n - 32 + 24),
        |${packCtes(chunkPackSeed, packShards, wordCap)}
        |SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_units,
        |  CAST(sum(ntok) AS BIGINT) AS bin_tok
        |FROM p GROUP BY shard, bin ORDER BY shard, bin""") { (s, dir) =>
      val chunks = TextAnalysis.chunkWindows(docs(s, dir), window = 32,
        stride = 24)
      val units = chunks.select(
        concat(col("doc_id").cast("string"), lit(":"),
          col("chunk_id").cast("string")).as("unit_id"),
        col("n_tok").cast("long").as("ntok"))
      CorpusOps.packUnits(units, seed = chunkPackSeed, nShards = packShards,
          capacity = wordCap)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_units"), sum("n_tok").as("bin_tok"))
        .orderBy("shard", "bin")
    },

    // Tokenizer-aware packing capstone: per-doc token counts come from the
    // REAL BPE inference pass (q186's merge list), and packing bins on
    // those counts — the production shape, where context-window budgeting
    // uses tokenizer output, not whitespace word counts. Oracle = q186's
    // chained-replace tokenization feeding q187's recursive pack replay.
    Qd("q191_tokenize_pack",
      s"""WITH RECURSIVE $bpeTokCtes,
        |u AS (SELECT CAST(doc_id AS VARCHAR) AS uid,
        |  CAST(sum(ntok) AS BIGINT) AS ntok FROM t GROUP BY doc_id),
        |${packCtes(tokPackSeed, packShards, bpeCap)}
        |SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_units,
        |  CAST(sum(ntok) AS BIGINT) AS bin_tok
        |FROM p GROUP BY shard, bin ORDER BY shard, bin""") { (s, dir) =>
      val toks = BpeTrain.tokenize(docs(s, dir), bpeMerges)
      val units = toks.select(col("doc_id").cast("string").as("unit_id"),
        col("n_bpe_tokens").as("ntok"))
      CorpusOps.packUnits(units, seed = tokPackSeed, nShards = packShards,
          capacity = bpeCap)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_units"), sum("n_tok").as("bin_tok"))
        .orderBy("shard", "bin")
    },

    // PII redaction: the corpus is synthetic (no real PII), so the query
    // plants deterministic emails/IPs/card numbers on a doc_id schedule —
    // both engines build the identical augmented text — then counts and
    // scrubs them with the shared Java∩RE2 patterns. Docs off the schedule
    // prove the no-op path (0 counts, text unchanged).
    Qd("q189_pii_scrub",
      """WITH aug AS (SELECT doc_id,
        |  text
        |   || CASE WHEN doc_id % 5 = 0
        |        THEN ' mail bob' || CAST(doc_id AS VARCHAR) || '@test.org ok' ELSE '' END
        |   || CASE WHEN doc_id % 7 = 0
        |        THEN ' ip 10.20.' || CAST(doc_id % 250 AS VARCHAR) || '.9 seen' ELSE '' END
        |   || CASE WHEN doc_id % 11 = 0
        |        THEN ' card 4111111111111111 used' ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\b\d{13,16}\b')) AS BIGINT) AS n_cards,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{13,16}\b', '<CARD>', 'g') AS scrubbed
        |FROM aug ORDER BY doc_id""") { (s, dir) =>
      val aug = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" mail bob"), col("doc_id").cast("string"),
              lit("@test.org ok"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" ip 10.20."), (col("doc_id") % 250).cast("string"),
              lit(".9 seen"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" card 4111111111111111 used")).otherwise(lit("")))
          .as("text"))
      CorpusOps.piiScrub(aug)
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_cards"),
          col("scrubbed"))
        .orderBy("doc_id")
    }
  )
}

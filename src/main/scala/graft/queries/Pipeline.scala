package graft.queries

import graft.Engine
import graft.operators.{AnnSearch, Dedup, Int8Quantize, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-data pipeline pack (SURVEY.md §7 step 9): deduplication
  * (exact / MinHash+LSH / SimHash / n-gram Jaccard / embedding-cosine),
  * similarity search (brute-force + IVF), and text analysis (language ID,
  * quality, tokens, fingerprints) over the `documents` and `embeddings`
  * tables.
  *
  * Oracle strategy: every hash the oracle must reproduce uses the md5-prefix
  * `h60` (cross-engine bit-exact); float comparisons are either quantized to
  * int64 before arithmetic (cosine) or pure rational-in-counts (Jaccard,
  * ratios), so both engines produce identical doubles. MinHash signatures are
  * Spark-internal only — the oracle checks the *verified* near-dup pairs,
  * which equal the exhaustive-pairwise answer because the banding miss
  * probability at the threshold is ~5e-8.
  */
object Pipeline {

  private[queries] def docs(s: SparkSession, dir: String) = Engine.table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) =
    Engine.table(s, dir, "embeddings").select(col("vec_id").as("id"),
      col("embedding"), col("label"))

  // DuckDB word-3-gram shingle CTE shared by the Jaccard oracles.
  private[queries] val shCteBody =
    """sh AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(string_split(text,' ')) >= 3
      |      THEN list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
      |        i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))
      |      ELSE [] END AS g
      |  FROM documents)""".stripMargin

  private[queries] val shCte = s"WITH $shCteBody"

  // Near-dup components over word-3-gram Jaccard >= 0.8 (needs `sh` in
  // scope): pairs → symmetric edges → recursive closure → min-id component.
  // Shared by q104 and q193 so the edge rule and closure exist once.
  private val nearDupCompCtes =
    """pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8),
      |e AS (SELECT d1 AS src, d2 AS dst FROM pairs
      |      UNION SELECT d2, d1 FROM pairs),
      |reach AS (
      |  SELECT src, src AS dst FROM e
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
      |comp AS (SELECT src AS doc_id, min(dst) AS comp FROM reach GROUP BY src)""".stripMargin

  // The composite quality score (q47's formula), shared by q47 and q193.
  private val qualityExprSql =
    """ROUND(CAST(len(list_filter(string_split(text,' '),
      |          x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
      |          / len(string_split(text,' ')) * 0.3
      |      + CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
      |          / len(string_split(text,' ')) * 0.5
      |      - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      |          / greatest(length(text), 1) * 0.2, 6)""".stripMargin

  /** DuckDB CTEs replaying [[graft.operators.AnnSearch.trainCentroids]]
    * bit-exactly over the `cc` quantized-corpus CTE: `cents0` = stride
    * init relabeled 0..n-1 in id order, then `iters` Lloyd rounds of
    * argmax-int64-dot assignment (ties → lower cent_id) and
    * truncated-integer-mean update with empty-cluster carryover. The
    * final centroid set is CTE `cents<iters>`. */
  private def kmeansCtes(stride: Int, iters: Int, src: String = "cc"): String = {
    val sb = new StringBuilder(
      s"""cents0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, qe AS ce
         |  FROM $src WHERE vec_id % $stride = 0)""".stripMargin)
    for (r <- 1 to iters) {
      val prev = s"cents${r - 1}"
      sb.append(s""",
        |a$r AS (SELECT cid, cent_id FROM (
        |  SELECT $src.vec_id AS cid, $prev.cent_id,
        |    row_number() OVER (PARTITION BY $src.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, len($src.qe)+1), i -> $src.qe[i]*$prev.ce[i])) AS BIGINT) DESC,
        |      $prev.cent_id) AS rn
        |  FROM $src, $prev) WHERE rn = 1),
        |m$r AS (
        |  SELECT cent_id, list(v ORDER BY i) AS ce FROM (
        |    SELECT j.cent_id, t.i,
        |      CAST(trunc(CAST(SUM(j.q[t.i]) AS DOUBLE)/COUNT(*)) AS BIGINT) AS v
        |    FROM (SELECT a.cent_id, $src.qe AS q FROM a$r a JOIN $src ON $src.vec_id = a.cid) j,
        |         UNNEST(range(1, len(j.q)+1)) AS t(i)
        |    GROUP BY j.cent_id, t.i) GROUP BY cent_id),
        |cents$r AS (SELECT cent_id, ce FROM m$r
        |  UNION ALL
        |  SELECT p.cent_id, p.ce FROM $prev p
        |  WHERE p.cent_id NOT IN (SELECT cent_id FROM m$r))""".stripMargin)
    }
    sb.toString
  }

  /** Shared IVF search tail of the k-means oracles: assignment, probes,
    * within-list exact cosine top-10 against the `cents` CTE. */
  private def ivfTailSql(cents: String): String =
    s"""ca AS (SELECT cid, cent_id FROM (
       |  SELECT cc.vec_id AS cid, $cents.cent_id,
       |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
       |      CAST(list_sum(list_transform(range(1, len(cc.qe)+1), i -> cc.qe[i]*$cents.ce[i])) AS BIGINT) DESC,
       |      $cents.cent_id) AS rn
       |  FROM cc, $cents) WHERE rn = 1),
       |qa AS (SELECT qid, cent_id FROM (
       |  SELECT qq.vec_id AS qid, $cents.cent_id,
       |    row_number() OVER (PARTITION BY qq.vec_id ORDER BY
       |      CAST(list_sum(list_transform(range(1, len(qq.qe)+1), i -> qq.qe[i]*$cents.ce[i])) AS BIGINT) DESC,
       |      $cents.cent_id) AS rn
       |  FROM qq, $cents) WHERE rn <= 2),
       |qn AS (SELECT vec_id AS qid, qe,
       |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
       |cn AS (SELECT vec_id AS cid, qe AS ce,
       |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
       |sc AS (
       |  SELECT qa.qid, ca.cid,
       |    CAST(CAST(list_sum(list_transform(range(1, len(qn.qe)+1), i -> qn.qe[i]*cn.ce[i])) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(qn.n2 AS DOUBLE) * CAST(cn.n2 AS DOUBLE)) AS cos
       |  FROM qa JOIN ca ON qa.cent_id = ca.cent_id
       |  JOIN qn ON qn.qid = qa.qid JOIN cn ON cn.cid = ca.cid
       |  WHERE qa.qid <> ca.cid),
       |rk AS (SELECT qid, cid, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
       |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
       |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  // DuckDB int64-quantized embedding CTE shared by the cosine oracles.
  /** Shared q368/q370 oracle: sign split → Hamming shortlist → exact
    * rescore. The engine popcounts packed bytes; this replay counts sign
    * mismatches per dimension on the raw embeddings — agreement on every
    * pair is the packing proof, and the indexed probe (q370) must produce
    * the identical result because the index only changes where bytes are
    * read. */
  private def binaryHammingOracleOver(corpusSrc: String,
      withHamming: Boolean = true): String =
    s"""WITH src AS ($corpusSrc),
      |sb AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) > 0) AS s
      |  FROM src),
      |qs AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) > 0) AS s
      |  FROM embeddings WHERE vec_id < 50),
      |ham AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS cid,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> CASE WHEN q.s[i] <> c.s[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      |  FROM qs q, sb c WHERE q.vec_id <> c.vec_id),
      |short AS (SELECT qid, cid, hamming FROM (
      |    SELECT qid, cid, hamming,
      |      row_number() OVER (PARTITION BY qid ORDER BY hamming, cid) AS rn
      |    FROM ham) WHERE rn <= 32),
      |qq AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS qe
      |  FROM embeddings WHERE vec_id < 50),
      |cc AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS qe
      |  FROM src),
      |qn AS (SELECT vec_id,
      |    CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS qn2
      |  FROM qq),
      |cn AS (SELECT vec_id AS cid, qe AS ce,
      |    CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS cn2
      |  FROM cc),
      |sc AS (SELECT s.qid, s.cid, s.hamming,
      |    CASE WHEN CAST(qn.qn2 AS DOUBLE)*CAST(c.cn2 AS DOUBLE) = 0 THEN -1.0
      |      ELSE CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
      |        / sqrt(CAST(qn.qn2 AS DOUBLE)*CAST(c.cn2 AS DOUBLE)) END AS cos
      |  FROM short s JOIN qq q ON q.vec_id = s.qid
      |  JOIN cn c ON c.cid = s.cid JOIN qn ON qn.vec_id = s.qid),
      |rk AS (SELECT qid, cid, hamming, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      |  FROM sc)
      |SELECT qid, cid, rk, ${if (withHamming) "hamming, " else ""}ROUND(cos, 6) AS cos
      |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  private lazy val binaryHammingOracleSql: String =
    binaryHammingOracleOver("SELECT vec_id, embedding FROM embeddings")

  /** The q389 oracle corpus: the txn table's LIVE rows after the DML
    * churn — evens minus the ≡4 (mod 10) deletes, the ≡6 (mod 10) rows
    * sign-flipped by the UPDATE, plus the ≡1 (mod 10) odd inserts. The
    * probe chain over it is the shared binary replay unchanged: the CDC
    * feed maintains the INDEX, never the scoring. */
  private val cdcLiveCorpusSql: String =
    """SELECT vec_id,
      |    CASE WHEN vec_id % 10 = 6 THEN list_transform(embedding, x -> -x)
      |         ELSE embedding END AS embedding
      |  FROM embeddings
      |  WHERE (vec_id % 2 = 0 AND vec_id % 10 <> 4) OR vec_id % 10 = 1""".stripMargin

  private lazy val cdcBinaryOracleSql: String =
    binaryHammingOracleOver(cdcLiveCorpusSql)

  private[queries] def qCte(name: String, pred: String) =
    s"""$name AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS qe
       |  FROM embeddings $pred)""".stripMargin

  // DuckDB int8 symmetric max-abs quantization CTE (q178/q179): scale is one
  // exact IEEE division on exact float→double values; codes use round()
  // (HALF_UP on the exact quotient — same result as Spark's SQL ROUND on
  // every representable double), so both engines produce identical codes.
  private val i8Cte =
    """i8 AS (
      |  SELECT vec_id,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))/127.0 AS scale,
      |    embedding
      |  FROM embeddings),
      |cq AS (
      |  SELECT vec_id, scale,
      |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)/scale) AS BIGINT))
      |    END AS c
      |  FROM i8)""".stripMargin

  val all: Seq[Qd] = Seq(

    Qd("q40_dedup_exact",
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
        |  count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY content_hash""") { (s, dir) =>
      Dedup.exactGroups(docs(s, dir)).orderBy("content_hash")
    },

    Qd("q41_dedup_minhash_lsh",
      s"""$shCte,
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    len(list_intersect(a.g, b.g)) AS i, len(a.g) AS n1, len(b.g) AS n2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT d1, d2, ROUND(CAST(i AS DOUBLE)/(n1+n2-i), 6) AS jac
        |FROM pairs WHERE CAST(i AS DOUBLE)/(n1+n2-i) >= 0.8
        |ORDER BY d1, d2""") { (s, dir) =>
      Dedup.minhashNearDupPairs(docs(s, dir), 128, 32, 0.8).orderBy("d1", "d2")
    },

    Qd("q42_dedup_simhash",
      """WITH w AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text,' '),
        |      t -> CAST(('0x' || substr(md5(t),1,15)) AS BIGINT)) AS hs
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(list_sum(list_transform(range(0,60), b ->
        |    CASE WHEN 2*len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
        |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        |  FROM w)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS ham
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 4
        |ORDER BY d1, d2""") { (s, dir) =>
      // blocked (pigeonhole) path — the 100 TB plan; DedupSpec asserts it
      // equals simhashPairsAll, and the DuckDB oracle is itself all-pairs
      Dedup.simhashPairsBlocked(docs(s, dir), 4)
        .select(col("d1"), col("d2"), col("ham").cast("bigint").as("ham"))
        .orderBy("d1", "d2")
    },

    Qd("q43_ngram_jaccard",
      s"""$shCte,
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    len(list_intersect(a.g, b.g)) AS i, len(a.g) AS n1, len(b.g) AS n2
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT d1, d2, ROUND(CAST(i AS DOUBLE)/(n1+n2-i), 6) AS jac
        |FROM pairs WHERE CAST(i AS DOUBLE)/(n1+n2-i) >= 0.02
        |ORDER BY d1, d2""") { (s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "source", 0.02).orderBy("d1", "d2")
    },

    Qd("q44_ann_cosine_brute",
      s"""WITH ${qCte("q", "WHERE vec_id < 50")},
        |${qCte("c", "")},
        |qn AS (SELECT vec_id AS qid, qe,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM q),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM c),
        |sc AS (
        |  SELECT qid, cid,
        |    CAST(CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*ce[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(qn.n2 AS DOUBLE) * CAST(cn.n2 AS DOUBLE)) AS cos
        |  FROM qn, cn WHERE qid <> cid),
        |rk AS (SELECT qid, cid, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      AnnSearch.bruteTopK(e.filter(col("id") < 50), e, 10)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"), col("cos"))
        .orderBy("qid", "rk")
    },

    // IVF is the 100 TB path (partition-pruned probes); recall vs brute
    // force is asserted in PipelineSpec. Centroids (vec_id % 40 == 0) and
    // all arithmetic are int64-quantized, so the DuckDB oracle reproduces
    // the exact candidate set: assignment = argmax integer dot (ties →
    // lower cent_id), probes = top-2 centroids per query, then exact
    // within-list cosine top-10.
    Qd("q45_ann_ivf",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cents AS (SELECT vec_id AS cent_id, qe AS ce FROM cc WHERE vec_id % 40 = 0),
        |ca AS (SELECT cid, cent_id FROM (
        |  SELECT cc.vec_id AS cid, cents.cent_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, len(cc.qe)+1), i -> cc.qe[i]*cents.ce[i])) AS BIGINT) DESC,
        |      cents.cent_id) AS rn
        |  FROM cc, cents) WHERE rn = 1),
        |qa AS (SELECT qid, cent_id FROM (
        |  SELECT qq.vec_id AS qid, cents.cent_id,
        |    row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, len(qq.qe)+1), i -> qq.qe[i]*cents.ce[i])) AS BIGINT) DESC,
        |      cents.cent_id) AS rn
        |  FROM qq, cents) WHERE rn <= 2),
        |qn AS (SELECT vec_id AS qid, qe,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |sc AS (
        |  SELECT qa.qid, ca.cid,
        |    CAST(CAST(list_sum(list_transform(range(1, len(qn.qe)+1), i -> qn.qe[i]*cn.ce[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(qn.n2 AS DOUBLE) * CAST(cn.n2 AS DOUBLE)) AS cos
        |  FROM qa JOIN ca ON qa.cent_id = ca.cent_id
        |  JOIN qn ON qn.qid = qa.qid JOIN cn ON cn.cid = ca.cid
        |  WHERE qa.qid <> ca.cid),
        |rk AS (SELECT qid, cid, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      AnnSearch.ivfTopK(e.filter(col("id") < 50), e, 10, 40, 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"), col("cos"))
        .orderBy("qid", "rk")
    },

    // IVF with TRAINED centroids ([[AnnSearch.trainCentroids]] — 2
    // deterministic Lloyd iterations over the int64-quantized vectors,
    // replacing the stride stand-in): every training step is closed-form
    // integer arithmetic, so the oracle replays the ENTIRE k-means
    // (seeded init, argmax assignment, truncated-mean update,
    // empty-cluster carryover) and then the same two-stage search —
    // hash-green through training AND search. Recall ≥ the stride
    // baseline is asserted in PipelineSpec.
    Qd("q274_ann_ivf_kmeans",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |${kmeansCtes(40, 2)},
        |${ivfTailSql("cents2")}""") { (s, dir) =>
      val e = emb(s, dir)
      AnnSearch.ivfTopKTrained(e.filter(col("id") < 50), e, 10, 40, 2, 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // Incremental IVF with TRAINED centroids — the q260 contract completed
    // with real training ([[AnnSearch.ivfIndexInitTrained]]): k-means runs
    // over the FIRST batch only, freezes into the sidecar, and every later
    // ingest assigns against the frozen codebook — so the oracle replays
    // k-means on batch 0 (`b0`) then the one-shot search over the union.
    Qd("q275_incremental_ivf_kmeans",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |b0 AS (SELECT * FROM cc WHERE vec_id % 3 = 0),
        |${kmeansCtes(40, 2, "b0")},
        |${ivfTailSql("cents2")}""") { (s, dir) =>
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g275_ivf"
      AnnSearch.ivfIndexInitTrained(e.filter(col("id") % 3 === 0), 40, 2, idx)
      AnnSearch.ivfIndexIngest(e.filter(col("id") % 3 === 1), idx)
      AnnSearch.ivfIndexIngest(e.filter(col("id") % 3 === 2), idx)
      AnnSearch.ivfTopKIncremental(e.filter(col("id") < 50), idx, 10, 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // Product-quantization ANN with ADC search ([[PqAnn.pqTopK]]) — the
    // memory-bandwidth scale path: corpus stored as m=8 subspace codes
    // (16 centroids each, stride-7 codebook rows), scored by per-query
    // lookup tables, then the 32-candidate shortlist exact-rescored. All
    // arithmetic is int64-quantized, so the oracle replays codebook →
    // encode (argmin L2, ties → smaller j) → ADC → shortlist → exact
    // rescore bit-identically. Recall vs brute force asserted in
    // PipelineSpec.
    Qd("q347_ann_pq_adc",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |ms AS (SELECT unnest(range(0, 16)) AS mi),
        |cb AS (SELECT CAST(vec_id // 7 AS INT) AS j, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS cent
        |  FROM cc, ms WHERE vec_id % 7 = 0 AND vec_id < 112),
        |cbn AS (SELECT mi, j,
        |    list_sum(list_transform(range(1, 5), i -> cent[i]*cent[i])) AS cn2
        |  FROM cb),
        |csub AS (SELECT vec_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM cc, ms),
        |dist AS (SELECT s.vec_id, s.mi, b.j,
        |    list_sum(list_transform(range(1, 5),
        |      i -> (s.sub[i]-b.cent[i])*(s.sub[i]-b.cent[i]))) AS d2
        |  FROM csub s JOIN cb b ON b.mi = s.mi),
        |code AS (SELECT vec_id, mi, j FROM (
        |    SELECT vec_id, mi, j,
        |      row_number() OVER (PARTITION BY vec_id, mi ORDER BY d2, j) AS rn
        |    FROM dist) WHERE rn = 1),
        |rn2 AS (SELECT c.vec_id, SUM(n.cn2) AS rn2
        |  FROM code c JOIN cbn n ON n.mi = c.mi AND n.j = c.j
        |  GROUP BY c.vec_id),
        |qsub AS (SELECT vec_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM qq, ms),
        |qn AS (SELECT vec_id,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS qn2
        |  FROM qq),
        |lut AS (SELECT q.vec_id AS qid, q.mi, b.j,
        |    list_sum(list_transform(range(1, 5), i -> q.sub[i]*b.cent[i])) AS dt
        |  FROM qsub q JOIN cb b ON b.mi = q.mi),
        |adc AS (SELECT l.qid, c.vec_id AS cid, SUM(l.dt) AS adcdot
        |  FROM code c JOIN lut l ON l.mi = c.mi AND l.j = c.j
        |  WHERE l.qid <> c.vec_id GROUP BY l.qid, c.vec_id),
        |appr AS (SELECT a.qid, a.cid,
        |    CASE WHEN CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(a.adcdot AS DOUBLE)
        |        / sqrt(CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE)) END AS adc
        |  FROM adc a JOIN qn q ON q.vec_id = a.qid
        |  JOIN rn2 r ON r.vec_id = a.cid),
        |short AS (SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |    FROM appr) WHERE rn <= 64),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS cn2
        |  FROM cc),
        |sc AS (SELECT s.qid, s.cid,
        |    CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
        |      / sqrt(CAST(qn.qn2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS cos
        |  FROM short s JOIN qq q ON q.vec_id = s.qid
        |  JOIN cn c ON c.cid = s.cid JOIN qn ON qn.vec_id = s.qid),
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.PqAnn.pqTopK(e.filter(col("id") < 50), e, 10,
          m = 16, ncent = 16, stride = 7, shortlist = 64)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // IVF-PQ / IVFADC ([[IvfPq.ivfPqTopK]]) — the coarse quantizer of q45
    // composed with the residual PQ codes of q347: a probe touches
    // nprobe/nlist of the corpus AND each touched row costs m lookups over
    // codes ~dim·4/m smaller than the vectors; the savings multiply (the
    // FAISS IndexIVFPQ architecture). All arithmetic int64, so the oracle
    // replays coarse assign → residual codebook → encode (incl. the exact
    // reconstructed norm²) → probes → ADC → shortlist → exact rescore
    // bit-identically. Recall + brute-force degeneracy in PipelineSpec.
    Qd("q348_ann_ivfpq", ivfPqOracleSql) { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.IvfPq.ivfPqTopK(e.filter(col("id") < 50), e, 10,
          centroidStride = 40, nprobe = 4, m = 16, ncent = 16, pqStride = 7,
          shortlist = 64)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // Incremental IVF-PQ ingest ([[IvfPq.trainIndex]]/[[IvfPq.addBatch]]/
    // [[IvfPq.openIndex]]) — the FAISS train-once/add-forever lifecycle at
    // the production index shape, completing the incremental trilogy
    // (q260 stride-IVF, q275 k-means-IVF, now IVF-PQ): the codebooks are
    // trained ONCE and frozen into the `_book` sidecar, each batch encodes
    // against the frozen book and APPENDS inverted-list partition files,
    // and the probe is the same partition-pruned ADC + exact rescore. The
    // query replays the whole lifecycle (train on the corpus, ingest in 3
    // id%3 batches, probe from disk); because codes are a pure per-row
    // function of (vector, frozen book), the result is bit-equal to the
    // one-shot q348 — SAME oracle SQL. Order independence and one-shot
    // equality are additionally spec-pinned in PipelineSpec.
    Qd("q354_ann_ivfpq_ingest", ivfPqOracleSql) { (s, dir) =>
      import graft.operators.IvfPq
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g354_ivfpq"
      IvfPq.trainIndex(e, idx, centroidStride = 40, m = 16, ncent = 16,
        pqStride = 7)
      (0 to 2).foreach(i => IvfPq.addBatch(e.filter(col("id") % 3 === i), idx))
      IvfPq.probeIndex(e.filter(col("id") < 50), e, IvfPq.openIndex(s, idx),
          10, nprobe = 4, shortlist = 64)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // TRAINED PQ codebook ([[PqAnn.lloydSubspaces]]) — q347's flat PQ-ADC
    // with the stride codebook refined by 2 rounds of per-subspace Lloyd
    // k-means (the way FAISS actually trains its PQ books): assignment =
    // the encoder's own argmin-L2 (ties → smaller j), update = truncated
    // integer mean, empty cells carry over — every step closed-form int64,
    // so the oracle replays TRAINING + encode + ADC + shortlist + exact
    // rescore bit-identically. Recall ≥ the stride baseline asserted in
    // PipelineSpec.
    Qd("q355_ann_pq_trained",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |ms AS (SELECT unnest(range(0, 16)) AS mi),
        |csub AS (SELECT vec_id AS vid, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM cc, ms),
        |pq0 AS (SELECT ms.mi AS mi, CAST(vec_id // 7 AS INT) AS j,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS cent
        |  FROM cc, ms WHERE vec_id % 7 = 0 AND vec_id < 112),
        |${pqLloydCtes(2)},
        |cb AS (SELECT mi, j, cent FROM pq2),
        |cbn AS (SELECT mi, j,
        |    list_sum(list_transform(range(1, 5), i -> cent[i]*cent[i])) AS cn2
        |  FROM cb),
        |dist AS (SELECT s.vid, s.mi, b.j,
        |    list_sum(list_transform(range(1, 5),
        |      i -> (s.sub[i]-b.cent[i])*(s.sub[i]-b.cent[i]))) AS d2
        |  FROM csub s JOIN cb b ON b.mi = s.mi),
        |code AS (SELECT vid, mi, j FROM (
        |    SELECT vid, mi, j,
        |      row_number() OVER (PARTITION BY vid, mi ORDER BY d2, j) AS rn
        |    FROM dist) WHERE rn = 1),
        |rn2 AS (SELECT c.vid, SUM(n.cn2) AS rn2
        |  FROM code c JOIN cbn n ON n.mi = c.mi AND n.j = c.j
        |  GROUP BY c.vid),
        |qsub AS (SELECT vec_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM qq, ms),
        |qn AS (SELECT vec_id,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS qn2
        |  FROM qq),
        |lut AS (SELECT q.vec_id AS qid, q.mi, b.j,
        |    list_sum(list_transform(range(1, 5), i -> q.sub[i]*b.cent[i])) AS dt
        |  FROM qsub q JOIN cb b ON b.mi = q.mi),
        |adc AS (SELECT l.qid, c.vid AS cid, SUM(l.dt) AS adcdot
        |  FROM code c JOIN lut l ON l.mi = c.mi AND l.j = c.j
        |  WHERE l.qid <> c.vid GROUP BY l.qid, c.vid),
        |appr AS (SELECT a.qid, a.cid,
        |    CASE WHEN CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(a.adcdot AS DOUBLE)
        |        / sqrt(CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE)) END AS adc
        |  FROM adc a JOIN qn q ON q.vec_id = a.qid
        |  JOIN rn2 r ON r.vid = a.cid),
        |short AS (SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |    FROM appr) WHERE rn <= 64),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS cn2
        |  FROM cc),
        |sc AS (SELECT s.qid, s.cid,
        |    CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
        |      / sqrt(CAST(qn.qn2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS cos
        |  FROM short s JOIN qq q ON q.vec_id = s.qid
        |  JOIN cn c ON c.cid = s.cid JOIN qn ON qn.vec_id = s.qid),
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.PqAnn.pqTopK(e.filter(col("id") < 50), e, 10,
          m = 16, ncent = 16, stride = 7, shortlist = 64, iters = 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // IVF-PQ deletions ([[IvfPq.removeIds]]/[[IvfPq.compactIndex]] — the
    // FAISS IndexIVF.remove_ids step, completing index CRUD): tombstones
    // mask removed rows before the ADC scan (they never shortlist), and
    // compaction physically rewrites the inverted lists and clears the
    // tombstones with identical probe results (spec-pinned). The query
    // replays train → 3 ingests → remove (every 11th id, INCLUDING
    // codebook rows — the frozen book survives removals, as FAISS's does)
    // → probe; the oracle is the q348 replay with removed ids excluded
    // from the candidate set only.
    Qd("q359_ann_ivfpq_delete",
      ivfPqOracleSql(" AND c.cid % 11 <> 0")) { (s, dir) =>
      import graft.operators.IvfPq
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g359_ivfpq"
      IvfPq.trainIndex(e, idx, centroidStride = 40, m = 16, ncent = 16,
        pqStride = 7)
      (0 to 2).foreach(i => IvfPq.addBatch(e.filter(col("id") % 3 === i), idx))
      IvfPq.removeIds(e.filter(col("id") % 11 === 0).select("id"), idx)
      IvfPq.probeIndex(e.filter(col("id") < 50), e, IvfPq.openIndex(s, idx),
          10, nprobe = 4, shortlist = 64)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // OPQ-lite pre-rotation ([[PqAnn.signedPerm]]): q347's PQ-ADC behind a
    // deterministic SIGNED PERMUTATION of the coordinates — the exactly-
    // replayable subset of FAISS's OPQMatrix rotation (full OPQ trains R
    // by SVD, which no two engines reproduce bit-wise; a signed permutation
    // is orthogonal, preserves every int64 dot product and norm EXACTLY,
    // and still redistributes adjacent-dimension structure across the PQ
    // subspaces). Permutation and signs derive from the keyed md5 (q172
    // discipline), so the oracle replays rotation → codebook → encode →
    // ADC → shortlist → exact rescore bit-identically; the reported
    // cosines are the UNROTATED exact values by orthogonality.
    Qd("q358_ann_pq_opq",
      s"""WITH ${qCte("qq0", "WHERE vec_id < 50")},
        |${qCte("cc0", "")},
        |prm AS (SELECT t.i AS i,
        |    row_number() OVER (ORDER BY md5('r358:' || t.i || ':perm'), t.i) - 1 AS pos,
        |    CASE WHEN CAST(('0x' || substr(md5('r358:' || t.i || ':sgn'), 1, 15)) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM range(0, 64) t(i)),
        |cc AS (SELECT vec_id, list(qe[i + 1] * sgn ORDER BY pos) AS qe
        |  FROM cc0, prm GROUP BY vec_id),
        |qq AS (SELECT vec_id, list(qe[i + 1] * sgn ORDER BY pos) AS qe
        |  FROM qq0, prm GROUP BY vec_id),
        |ms AS (SELECT unnest(range(0, 16)) AS mi),
        |cb AS (SELECT CAST(vec_id // 7 AS INT) AS j, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS cent
        |  FROM cc, ms WHERE vec_id % 7 = 0 AND vec_id < 112),
        |cbn AS (SELECT mi, j,
        |    list_sum(list_transform(range(1, 5), i -> cent[i]*cent[i])) AS cn2
        |  FROM cb),
        |csub AS (SELECT vec_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM cc, ms),
        |dist AS (SELECT s.vec_id, s.mi, b.j,
        |    list_sum(list_transform(range(1, 5),
        |      i -> (s.sub[i]-b.cent[i])*(s.sub[i]-b.cent[i]))) AS d2
        |  FROM csub s JOIN cb b ON b.mi = s.mi),
        |code AS (SELECT vec_id, mi, j FROM (
        |    SELECT vec_id, mi, j,
        |      row_number() OVER (PARTITION BY vec_id, mi ORDER BY d2, j) AS rn
        |    FROM dist) WHERE rn = 1),
        |rn2 AS (SELECT c.vec_id, SUM(n.cn2) AS rn2
        |  FROM code c JOIN cbn n ON n.mi = c.mi AND n.j = c.j
        |  GROUP BY c.vec_id),
        |qsub AS (SELECT vec_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM qq, ms),
        |qn AS (SELECT vec_id,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS qn2
        |  FROM qq),
        |lut AS (SELECT q.vec_id AS qid, q.mi, b.j,
        |    list_sum(list_transform(range(1, 5), i -> q.sub[i]*b.cent[i])) AS dt
        |  FROM qsub q JOIN cb b ON b.mi = q.mi),
        |adc AS (SELECT l.qid, c.vec_id AS cid, SUM(l.dt) AS adcdot
        |  FROM code c JOIN lut l ON l.mi = c.mi AND l.j = c.j
        |  WHERE l.qid <> c.vec_id GROUP BY l.qid, c.vec_id),
        |appr AS (SELECT a.qid, a.cid,
        |    CASE WHEN CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(a.adcdot AS DOUBLE)
        |        / sqrt(CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE)) END AS adc
        |  FROM adc a JOIN qn q ON q.vec_id = a.qid
        |  JOIN rn2 r ON r.vec_id = a.cid),
        |short AS (SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |    FROM appr) WHERE rn <= 64),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS cn2
        |  FROM cc),
        |sc AS (SELECT s.qid, s.cid,
        |    CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
        |      / sqrt(CAST(qn.qn2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS cos
        |  FROM short s JOIN qq q ON q.vec_id = s.qid
        |  JOIN cn c ON c.cid = s.cid JOIN qn ON qn.vec_id = s.qid),
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.PqAnn.pqTopK(e.filter(col("id") < 50), e, 10,
          m = 16, ncent = 16, stride = 7, shortlist = 64,
          rotateSeed = Some("r358"))
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // Trained per-dimension scalar quantizer ([[ScalarQuantizer.sqTopK]] —
    // FAISS IndexScalarQuantizer QT_8bit): per-dim [lo, hi] trained over
    // the corpus, floor-encoded to one byte/dim (8× smaller at rest than
    // the int64 frame), searched by asymmetric distance against the
    // 255×-scaled integral reconstruction, then exactly rescored. Fills
    // the codec gap between q178's per-vector symmetric int8 and q347's
    // subspace PQ. All int64, so the oracle replays train → encode → ADC
    // → shortlist → exact rescore; brute degeneracy + recall floor in
    // ScalarQuantizerSpec.
    Qd("q360_ann_sq8",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |d AS (SELECT unnest(range(1, 65)) AS i),
        |st AS (SELECT d.i AS i, min(qe[d.i]) AS lo, max(qe[d.i]) AS hi
        |  FROM cc, d GROUP BY d.i),
        |recon AS (SELECT c.vec_id AS cid, s.i,
        |    s.lo*255 + (CASE WHEN s.hi = s.lo THEN 0
        |      ELSE ((c.qe[s.i] - s.lo) * 255) // (s.hi - s.lo) END)
        |      * (s.hi - s.lo) AS rn
        |  FROM cc c, st s),
        |rn2 AS (SELECT cid, CAST(sum(rn*rn) AS BIGINT) AS rn2
        |  FROM recon GROUP BY cid),
        |qn AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS qn2
        |  FROM qq),
        |adc AS (SELECT q.vec_id AS qid, r.cid,
        |    CAST(sum(q.qe[r.i] * r.rn) AS BIGINT) AS dotnum
        |  FROM recon r, qq q WHERE q.vec_id <> r.cid
        |  GROUP BY q.vec_id, r.cid),
        |appr AS (SELECT a.qid, a.cid,
        |    CASE WHEN CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(a.dotnum AS DOUBLE)
        |        / sqrt(CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE)) END AS adc
        |  FROM adc a JOIN qn q ON q.vec_id = a.qid
        |  JOIN rn2 r ON r.cid = a.cid),
        |short AS (SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |    FROM appr) WHERE rn <= 64),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS cn2
        |  FROM cc),
        |sc AS (SELECT s.qid, s.cid,
        |    CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
        |      / sqrt(CAST(qn.qn2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS cos
        |  FROM short s JOIN qq q ON q.vec_id = s.qid
        |  JOIN cn c ON c.cid = s.cid JOIN qn ON qn.vec_id = s.qid),
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.ScalarQuantizer.sqTopK(e.filter(col("id") < 50), e, 10,
          shortlist = 64)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // 1-bit binary codec + Hamming-shortlist search ([[BinaryAnn]] — faiss
    // IndexBinaryFlat + refine): sign-binarize to 1 bit/dim (32× smaller
    // at rest than float32), shortlist by popcount(xor) through the
    // codegen'd HammingBits kernel, exactly rescore the shortlist. The
    // oracle derives the Hamming distance from the RAW embeddings (count
    // of sign mismatches per dimension) while the engine popcounts packed
    // bytes — distance equality on every pair is the packing proof. The
    // `hamming` column rides along in the output so the cheap stage is
    // value-checked end-to-end, not only through its survivors.
    Qd("q368_ann_binary_hamming", binaryHammingOracleSql) { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.BinaryAnn.hammingTopK(e.filter(col("id") < 50), e, 10,
          shortlist = 32)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("hamming"), col("cos"))
        .orderBy("qid", "rk")
    },

    // The codec AT REST ([[BinaryAnn.buildIndex]]/[[probeIndex]] — the
    // production split of q368): one encode pass persists (id, code, qe,
    // n2) parquet; the probe's Hamming stage then reads ONLY the (id,
    // code) columns (dim/8 bytes per candidate — parquet column pruning
    // is what makes the 1-bit claim a plan property, not a format claim)
    // and full vectors are fetched for shortlist ids alone. Same oracle
    // as q368: the index changes WHERE bytes are read, never a score.
    // Train-free incremental ingest ([[BinaryAnn.addBatch]] — the binary
    // index's whole `add` step is a parquet append: the codec has no
    // trained state, so batches commute and a batch-built index probes
    // identically to a one-shot build. The q354/q367 ingest discipline
    // with the train step GONE — that is the 1-bit codec's operational
    // claim, and why this query shares the q368 oracle verbatim.
    Qd("q371_ann_binary_ingest", binaryHammingOracleSql) { (s, dir) =>
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g371_binary_inc"
      graft.operators.BinaryAnn.buildIndex(e.filter(col("id") % 3 === 0), idx)
      (1 to 2).foreach(b =>
        graft.operators.BinaryAnn.addBatch(e.filter(col("id") % 3 === b), idx))
      graft.operators.BinaryAnn.probeIndex(e.filter(col("id") < 50), idx,
          10, shortlist = 32)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("hamming"), col("cos"))
        .orderBy("qid", "rk")
    },

    Qd("q370_ann_binary_index", binaryHammingOracleSql) { (s, dir) =>
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g370_binary"
      graft.operators.BinaryAnn.buildIndex(e, idx)
      graft.operators.BinaryAnn.probeIndex(e.filter(col("id") < 50), idx,
          10, shortlist = 32)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("hamming"), col("cos"))
        .orderBy("qid", "rk")
    },

    // MMR diversity re-rank ([[Mmr.mmrTopK]] — Carbonell & Goldstein 1998):
    // greedy λ·rel − μ·max-sim-to-selected over the exact-cosine top-16
    // shortlist, k=5 picks. Every rel/sim double is the shared int64-exact
    // cosine, so the oracle replays candidates → pairwise sims → all five
    // greedy rounds as chained argmax CTEs (ties → lower cid at every
    // argmax). λ/μ are both written as explicit literals on BOTH sides
    // (1−0.7 ≠ 0.3 in doubles — the operator takes μ separately for
    // exactly this reason) and the oracle CASTs them to DOUBLE so DuckDB
    // cannot route the arithmetic through DECIMAL.
    Qd("q369_mmr_rerank", {
      val qq = qCte("qq", "WHERE vec_id < 50")
      val cc = qCte("cc", "")
      def round(i: Int): String = {
        val prev = if (i == 2) "sel1" else s"sel${i - 1}"
        s"""r$i AS (SELECT c.qid, c.cid, c.rel,
          |    CAST(0.7 AS DOUBLE)*c.rel - CAST(0.3 AS DOUBLE)*max(p.pcos) AS score
          |  FROM cand c
          |  LEFT JOIN $prev e ON e.qid = c.qid AND e.cid = c.cid
          |  JOIN pc p ON p.qid = c.qid AND p.dc = c.cid
          |  JOIN $prev s ON s.qid = p.qid AND s.cid = p.sc
          |  WHERE e.cid IS NULL
          |  GROUP BY c.qid, c.cid, c.rel),
          |s$i AS (SELECT qid, cid, rel, score FROM (
          |    SELECT r.*, row_number() OVER (
          |      PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM r$i r)
          |  WHERE rn = 1),
          |sel$i AS (SELECT qid, cid FROM $prev
          |  UNION ALL SELECT qid, cid FROM s$i)""".stripMargin
      }
      s"""WITH $qq,
        |$cc,
        |qn AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS qn2
        |  FROM qq),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |    CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS cn2
        |  FROM cc),
        |rel AS (SELECT q.vec_id AS qid, c.cid,
        |    CASE WHEN CAST(qn.qn2 AS DOUBLE)*CAST(c.cn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
        |        / sqrt(CAST(qn.qn2 AS DOUBLE)*CAST(c.cn2 AS DOUBLE)) END AS rel
        |  FROM qq q
        |  JOIN qn ON qn.vec_id = q.vec_id
        |  CROSS JOIN cn c
        |  WHERE c.cid <> q.vec_id),
        |cand AS (SELECT qid, cid, rel FROM (
        |    SELECT qid, cid, rel,
        |      row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
        |    FROM rel) WHERE rn <= 16),
        |pc AS (SELECT a.qid, a.cid AS dc, b.cid AS sc,
        |    CASE WHEN CAST(x.cn2 AS DOUBLE)*CAST(y.cn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(list_sum(list_transform(range(1, 65), i -> x.ce[i]*y.ce[i])) AS DOUBLE)
        |        / sqrt(CAST(x.cn2 AS DOUBLE)*CAST(y.cn2 AS DOUBLE)) END AS pcos
        |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
        |  JOIN cn x ON x.cid = a.cid JOIN cn y ON y.cid = b.cid),
        |s1 AS (SELECT qid, cid, rel, score FROM (
        |    SELECT qid, cid, rel, CAST(0.7 AS DOUBLE)*rel AS score,
        |      row_number() OVER (
        |        PARTITION BY qid ORDER BY CAST(0.7 AS DOUBLE)*rel DESC, cid) AS rn
        |    FROM cand) WHERE rn = 1),
        |sel1 AS (SELECT qid, cid FROM s1),
        |${round(2)},
        |${round(3)},
        |${round(4)},
        |${round(5)}
        |SELECT qid, cid, pick, ROUND(rel, 6) AS rel, ROUND(score, 6) AS score
        |FROM (
        |  SELECT qid, cid, CAST(1 AS BIGINT) AS pick, rel, score FROM s1
        |  UNION ALL SELECT qid, cid, 2, rel, score FROM s2
        |  UNION ALL SELECT qid, cid, 3, rel, score FROM s3
        |  UNION ALL SELECT qid, cid, 4, rel, score FROM s4
        |  UNION ALL SELECT qid, cid, 5, rel, score FROM s5)
        |ORDER BY qid, pick""".stripMargin
    }) { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.Mmr.mmrTopK(e.filter(col("id") < 50), e, k = 5,
          nCand = 16, lam = 0.7, mu = 0.3)
        .orderBy("qid", "pick")
    },

    // Hard-triplet mining ([[AnnSearch.tripletMine]] — the contrastive-
    // pair step of every embedding fine-tune): per anchor, the hard
    // POSITIVE (same label, LOWEST cosine — the pair the model most needs
    // pulled together) and top-5 hard NEGATIVES (different label, HIGHEST
    // cosine), with the 6-dp margin a curriculum thresholds on. The
    // oracle replays the broadcast pair scan, the lexicographic
    // (cos asc, cid) argmin, and the (cos desc, cid) top-k — every cosine
    // the shared int64-exact kernel.
    Qd("q375_triplet_mining", {
      val qq = qCte("qq", "WHERE vec_id < 50")
      val cc = qCte("cc", "")
      s"""WITH $qq,
        |$cc,
        |qn AS (SELECT vec_id, label, qe,
        |    CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2
        |  FROM qq),
        |cn AS (SELECT vec_id AS cid, label AS cl, qe AS ce,
        |    CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS cn2
        |  FROM cc),
        |p AS (SELECT q.vec_id AS qid, c.cid, q.label AS ql, c.cl,
        |    CASE WHEN CAST(q.n2 AS DOUBLE)*CAST(c.cn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS BIGINT) AS DOUBLE)
        |        / sqrt(CAST(q.n2 AS DOUBLE)*CAST(c.cn2 AS DOUBLE)) END AS cos
        |  FROM qn q JOIN cn c ON c.cid <> q.vec_id),
        |pos AS (SELECT qid, cid AS pos_id, ROUND(cos, 6) AS pos_cos FROM (
        |    SELECT qid, cid, cos,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos ASC, cid) AS rn
        |    FROM p WHERE ql = cl) WHERE rn = 1),
        |neg AS (SELECT qid, cid AS neg_id, ROUND(cos, 6) AS neg_cos, rk FROM (
        |    SELECT qid, cid, cos,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |    FROM p WHERE ql <> cl) WHERE rk <= 5)
        |SELECT n.qid, CAST(n.rk AS BIGINT) AS rk, s.pos_id, s.pos_cos,
        |  n.neg_id, n.neg_cos, ROUND(s.pos_cos - n.neg_cos, 6) AS margin
        |FROM neg n JOIN pos s ON s.qid = n.qid
        |ORDER BY n.qid, rk""".stripMargin
    }) { (s, dir) =>
      val e = emb(s, dir)
      AnnSearch.tripletMine(e.filter(col("id") < 50), e, k = 5)
        .orderBy("qid", "rk")
    },

    // Graph-probed ANN ([[GraphAnn.graphTopK]] — the deterministic core of
    // the HNSW/NSW/DiskANN family): a k-NN neighbor graph (top-m by exact
    // quantized cosine, ties → lower id) walked by fixed-schedule beam
    // search from the ef lowest-id entry nodes. True HNSW's random layer
    // draw isn't replayable; the navigable-graph walk that does the query-
    // time work is — so the oracle rebuilds the graph and replays all
    // `hops` beam rounds as chained CTEs (the q185 generation discipline).
    // Probe cost is schedule-bounded (hops × ef × m adjacency rows),
    // INDEPENDENT of corpus size — the graph-ANN scale claim, measured in
    // GraphAnnSpec along with recall and brute degeneracy.
    Qd("q361_ann_graph_beam", graphBeamOracleSql(m = 8, ef = 16, hops = 4)) {
      (s, dir) =>
      val e = emb(s, dir)
      // walk subject timed; the exact fixture build comes from the
      // fingerprint-keyed cache (identical rows to an in-query build)
      graft.operators.GraphAnn.beamTopK(e.filter(col("id") < 50), e,
          cachedGraph(s, dir, "full_m8")(
            graft.operators.GraphAnn.knnGraph(e, 8)),
          10, ef = 16, hops = 4)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // The SCALABLE graph build ([[GraphAnn.blockedKnnGraph]] — DiskANN/
    // NN-descent-style): the q361 walk over a graph built by cluster-
    // blocked approximate k-NN instead of exact all-pairs — assign each
    // row to its top-2 stride centroids (overlap keeps the graph navigable
    // across block borders), self-join within shared clusters only, top-m
    // per node. Pair work drops N² → ~N²·keep²/nlist, which is what makes
    // a graph index BUILDABLE at 100 TB. Deterministic end-to-end, so the
    // oracle replays assignment → blocked pairs → edge rank → the same
    // beam-walk CTEs as q361.
    Qd("q362_ann_graph_blocked",
      graphBeamOracleSql(ef = 16, hops = 4,
        s"""ct AS (SELECT vec_id AS cent_id, qe AS ce FROM cc WHERE vec_id % 40 = 0),
          |asg AS (SELECT id, cent_id FROM (
          |    SELECT c.vec_id AS id, t.cent_id,
          |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
          |        CAST(list_sum(list_transform(range(1, 65), i -> c.qe[i]*t.ce[i])) AS BIGINT) DESC,
          |        t.cent_id) AS rn
          |    FROM cn c, ct t) WHERE rn <= 2),
          |pr AS (SELECT DISTINCT x.id AS src, y.id AS dst
          |  FROM asg x JOIN asg y USING (cent_id) WHERE x.id <> y.id),
          |gp AS (SELECT p.src, p.dst,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
          |  FROM pr p JOIN cn a ON a.vec_id = p.src JOIN cn b ON b.vec_id = p.dst),
          |g AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp)
          |  WHERE rn <= 8)""".stripMargin)) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      GraphAnn.beamTopK(e.filter(col("id") < 50), e,
          GraphAnn.blockedKnnGraph(e, m = 8, centroidStride = 40, keep = 2),
          10, ef = 16, hops = 4)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // HNSW-style incremental insertion ([[GraphAnn.insertBatch]] — the
    // graph index's `add` step, completing its lifecycle like q354 does
    // for IVF-PQ): every 10th node is held out of the build, then inserted
    // by beam-searching ITSELF over the existing graph (the actual HNSW
    // insert algorithm — the search structure is its own build tool);
    // back-edges old→new keep the graph navigable toward the inserts, and
    // the uniform top-m re-trim is HNSW's neighbor pruning. Batch nodes
    // insert against the pre-batch graph, so inserts commute. The oracle
    // chains TWO beam walks (insert walk `i*`, probe walk `p*`) plus the
    // edge-selection/back-edge/re-trim algebra between them.
    Qd("q363_ann_graph_insert", {
      val gIns =
        s"""old AS (SELECT * FROM cn WHERE vec_id % 10 <> 9),
          |bn AS (SELECT * FROM cn WHERE vec_id % 10 = 9),
          |gp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
          |  FROM old a, old b WHERE a.vec_id <> b.vec_id),
          |g0 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0)
          |  WHERE rn <= 8),
          |psi AS (SELECT b.vec_id AS qid, c.vec_id AS cid,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> b.qe[i]*c.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(b.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) AS cos
          |  FROM bn b, cn c WHERE b.vec_id <> c.vec_id),
          |ent0 AS (SELECT DISTINCT src AS vec_id FROM g0
          |  ORDER BY vec_id LIMIT 16),
          |${beamWalkCtes("i", "g0", "psi", "ent0", 16, 4)},
          |newe AS (SELECT qid AS src, cid AS dst FROM (
          |    SELECT qid, cid,
          |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          |    FROM ib4) WHERE rn <= 8),
          |alle AS (SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM g0
          |    UNION ALL SELECT src, dst FROM newe
          |    UNION ALL SELECT dst AS src, src AS dst FROM newe)),
          |ge AS (SELECT e.src, e.dst,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
          |  FROM alle e JOIN cn a ON a.vec_id = e.src JOIN cn b ON b.vec_id = e.dst),
          |g AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM ge)
          |  WHERE rn <= 8)""".stripMargin
      graphBeamOracleSql(ef = 16, hops = 4, gIns)
    }) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      val old = e.filter(col("id") % 10 =!= 9)
      val batch = e.filter(col("id") % 10 === 9)
      val g1 = GraphAnn.insertBatch(
        cachedGraph(s, dir, "old9_m8")(GraphAnn.knnGraph(old, 8)), e, batch,
        m = 8, ef = 16, hops = 4)
      GraphAnn.beamTopK(e.filter(col("id") < 50), e, g1, 10, ef = 16,
          hops = 4)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // Graph-index DELETE with HNSW/FreshDiskANN repair
    // ([[GraphAnn.removeNodes]] — the lifecycle's last step, mirroring
    // q359 for IVF-PQ): every 10th node (residue 3) is removed from a
    // built graph; surviving sources that edged into a removed node
    // BRIDGE THROUGH it (src → r → x becomes a candidate src → x, the
    // HNSW delete-repair rule — a plain edge drop would dead-end their
    // walks), then the uniform top-m re-trim over SURVIVOR cosines. The
    // oracle replays build → kept ∪ bridge → re-trim → a survivor-scored
    // beam walk bit-exactly.
    Qd("q364_ann_graph_delete", {
      val gDel =
        s"""gp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
          |  FROM cn a, cn b WHERE a.vec_id <> b.vec_id),
          |g0 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0)
          |  WHERE rn <= 8),
          |kept AS (SELECT src, dst FROM g0 WHERE src % 10 <> 3 AND dst % 10 <> 3),
          |bridge AS (SELECT a.src, b.dst FROM g0 a JOIN g0 b ON b.src = a.dst
          |  WHERE a.dst % 10 = 3 AND a.src % 10 <> 3 AND b.dst % 10 <> 3
          |    AND a.src <> b.dst),
          |alle AS (SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM kept UNION ALL SELECT src, dst FROM bridge)),
          |sv AS (SELECT * FROM cn WHERE vec_id % 10 <> 3),
          |ge AS (SELECT e.src, e.dst,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
          |  FROM alle e JOIN sv a ON a.vec_id = e.src JOIN sv b ON b.vec_id = e.dst),
          |g AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM ge)
          |  WHERE rn <= 8)""".stripMargin
      s"""WITH ${qCte("qq", "WHERE vec_id < 50 AND vec_id % 10 <> 3")},
        |${qCte("cc", "")},
        |cn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |$gDel,
        |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.qe[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(q.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) AS cos
        |  FROM qn q, sv c WHERE q.vec_id <> c.vec_id),
        |ent AS (SELECT vec_id FROM sv ORDER BY vec_id LIMIT 16),
        |${beamWalkCtes("", "g", "ps", "ent", 16, 4)},
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM b4)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      val removed = e.filter(col("id") % 10 === 3).select("id")
      val sv = e.filter(col("id") % 10 =!= 3)
      val g1 = GraphAnn.removeNodes(
        cachedGraph(s, dir, "full_m8")(GraphAnn.knnGraph(e, 8)), sv, removed,
        m = 8)
      GraphAnn.beamTopK(sv.filter(col("id") < 50), sv, g1, 10, ef = 16,
          hops = 4)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // The DISTRIBUTED beam walk ([[GraphAnn.beamTopKBatch]] — the 100 TB
    // probe path): q361's walk re-expressed with the beam as a DataFrame
    // end-to-end (per hop: beam ⋈ graph expand, two id equi-joins to
    // score, windowed top-ef), for query batches too large to pace from
    // the driver. Same entry set, candidate algebra, and (cos desc, cid)
    // total order — so the SAME oracle replay as q361 checks it, and the
    // spec pins it row-for-row against the driver-paced walk.
    Qd("q365_ann_graph_beam_batch",
      graphBeamOracleSql(m = 8, ef = 16, hops = 4)) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      GraphAnn.beamTopKBatch(e.filter(col("id") < 50), e,
          cachedGraph(s, dir, "full_m8")(GraphAnn.knnGraph(e, 8)),
          10, ef = 16, hops = 4)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // TWO-LAYER HNSW ([[GraphAnn.hnswTopK]] — the actual hierarchy): a
    // sparse upper layer (keyed md5 draw ≡ 0 mod 8, HNSW's geometric
    // level draw made engine-replayable) is walked first with a narrow
    // beam (ef=8, 2 hops) from a global entry, then each query's upper-
    // layer winners seed its bottom-layer walk (ef=16, 2 hops — HALF the
    // flat q361 schedule; the hierarchy is what caps walk length at
    // ~log N when a flat walk's length grows with graph radius). The
    // oracle chains the level split → both graph builds → upper walk →
    // per-query-seeded bottom walk.
    Qd("q366_ann_graph_hnsw", {
      val gHier =
        s"""lv AS (SELECT vec_id FROM cc
          |  WHERE CAST(('0x' || substr(md5('lvl1:' || vec_id), 1, 15)) AS BIGINT) % 8 = 0),
          |ln AS (SELECT cn.* FROM cn JOIN lv USING (vec_id)),
          |gp1 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
          |  FROM ln a, ln b WHERE a.vec_id <> b.vec_id),
          |g1 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp1)
          |  WHERE rn <= 4),
          |gp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
          |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
          |  FROM cn a, cn b WHERE a.vec_id <> b.vec_id),
          |g0 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0)
          |  WHERE rn <= 8)""".stripMargin
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |$gHier,
        |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.qe[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(q.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) AS cos
        |  FROM qn q, cn c WHERE q.vec_id <> c.vec_id),
        |ent1 AS (SELECT vec_id FROM lv ORDER BY vec_id LIMIT 8),
        |${beamWalkCtes("u", "g1", "ps", "ent1", 8, 2)},
        |${beamWalkCtesSeeded("", "g0", "ps", "ub2", 16, 2)},
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM b2)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      GraphAnn.hnswTopK(e.filter(col("id") < 50), e, 10,
          m = 8, m1 = 4, ef1 = 8, hops1 = 2, ef = 16, hops = 2,
          g1Opt = Some(cachedGraph(s, dir, "lvl1_m4")(
            GraphAnn.knnGraph(GraphAnn.levelNodes(e, 1), 4))),
          g0Opt = Some(cachedGraph(s, dir, "full_m8")(
            GraphAnn.knnGraph(e, 8))))
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // MULTI-BATCH GRAPH INGEST (train-once/add-forever for the graph
    // index — the q249/q354 incremental-ingest discipline): the graph is
    // built ONCE on the first quarter of the corpus, then three
    // successive [[GraphAnn.insertBatch]] calls add a quarter each (every
    // batch walks itself in against the graph-so-far over the
    // corpus-so-far), and the final probe walks the fully-grown graph.
    // The oracle chains THREE full insert replays (walk → edge selection
    // → back-edges → re-trim, each against the previous generation's
    // graph CTE) after the batch-0 build — generations MATERIALIZED to
    // pin linear evaluation, the q185 discipline.
    Qd("q367_ann_graph_ingest", {
      def cosOf(a: String, b: String) =
        s"CAST(CAST(list_sum(list_transform(range(1, 65), i -> $a.qe[i]*$b.qe[i])) AS BIGINT) AS DOUBLE)" +
          s" / sqrt(CAST($a.n2 AS DOUBLE) * CAST($b.n2 AS DOUBLE))"
      val build0 =
        s"""c0 AS (SELECT * FROM cn WHERE vec_id % 4 = 0),
          |gp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosOf("a", "b")} AS cos
          |  FROM c0 a, c0 b WHERE a.vec_id <> b.vec_id),
          |g0 AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0)
          |  WHERE rn <= 8)""".stripMargin
      val insBlocks = (1 to 3).map { b =>
        s"""cs$b AS (SELECT * FROM cn WHERE vec_id % 4 <= $b),
          |bn$b AS (SELECT * FROM cn WHERE vec_id % 4 = $b),
          |psi$b AS MATERIALIZED (SELECT q.vec_id AS qid, c.vec_id AS cid,
          |    ${cosOf("q", "c")} AS cos
          |  FROM bn$b q, cs$b c WHERE q.vec_id <> c.vec_id),
          |ent$b AS (SELECT DISTINCT src AS vec_id FROM g${b - 1}
          |  ORDER BY vec_id LIMIT 16),
          |${beamWalkCtes(s"w$b", s"g${b - 1}", s"psi$b", s"ent$b", 16, 4)},
          |ne$b AS (SELECT qid AS src, cid AS dst FROM (
          |    SELECT qid, cid,
          |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          |    FROM w${b}b4) WHERE rn <= 8),
          |ae$b AS (SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM g${b - 1}
          |    UNION ALL SELECT src, dst FROM ne$b
          |    UNION ALL SELECT dst AS src, src AS dst FROM ne$b)),
          |ge$b AS (SELECT e.src, e.dst, ${cosOf("a", "b")} AS cos
          |  FROM ae$b e JOIN cs$b a ON a.vec_id = e.src JOIN cs$b b ON b.vec_id = e.dst),
          |g$b AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM ge$b)
          |  WHERE rn <= 8)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |$build0,
        |$insBlocks,
        |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid, ${cosOf("q", "c")} AS cos
        |  FROM qn q, cn c WHERE q.vec_id <> c.vec_id),
        |ent AS (SELECT vec_id FROM cc ORDER BY vec_id LIMIT 16),
        |${beamWalkCtes("", "g3", "ps", "ent", 16, 4)},
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM b4)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      var cs = e.filter(col("id") % 4 === 0)
      var g = cachedGraph(s, dir, "q4_m8")(GraphAnn.knnGraph(cs, 8))
      for (b <- 1 to 3) {
        val batch = e.filter(col("id") % 4 === b)
        cs = cs.unionByName(batch)
        // checkpoint each generation: the next insert references the graph
        // through both the walk and the trim, and three chained inserts
        // would otherwise nest the whole prefix exponentially (the q365
        // lineage lesson); the edge set is O(N·m) rows — bounded
        g = GraphAnn.insertBatch(g, cs, batch, m = 8, ef = 16, hops = 4)
          .localCheckpoint(true)
      }
      GraphAnn.beamTopK(e.filter(col("id") < 50), e, g, 10, ef = 16,
          hops = 4)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // TRAINED residual codebook for IVF-PQ — q348 with the stride residual
    // book refined by 2 Lloyd rounds over the ACTUAL residual distribution
    // (coarse book fixed; q274 already proved coarse k-means — this trains
    // the other half, completing the FAISS IndexIVFPQ training story). The
    // oracle replays coarse assign → residual derivation → residual-space
    // k-means → encode → probes → ADC → shortlist → exact rescore, all
    // int64. Recall ≥ the stride-residual baseline asserted in PipelineSpec.
    Qd("q356_ann_ivfpq_trained",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cents AS (SELECT vec_id AS cent_id, qe AS ce FROM cc WHERE vec_id % 40 = 0),
        |ca AS (SELECT cid, cent_id FROM (
        |  SELECT cc.vec_id AS cid, cents.cent_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, 65), i -> cc.qe[i]*cents.ce[i])) AS BIGINT) DESC,
        |      cents.cent_id) AS rn
        |  FROM cc, cents) WHERE rn = 1),
        |cav AS (SELECT ca.cid, ca.cent_id, cents.ce FROM ca JOIN cents USING (cent_id)),
        |ms AS (SELECT unnest(range(0, 16)) AS mi),
        |pq0 AS (SELECT CAST(c.vec_id // 7 AS INT) AS j, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> c.qe[ms.mi*4 + i] - v.ce[ms.mi*4 + i]) AS cent
        |  FROM cc c JOIN cav v ON v.cid = c.vec_id, ms
        |  WHERE c.vec_id % 7 = 0 AND c.vec_id < 112),
        |csub AS (SELECT c.vec_id AS vid, v.cent_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> c.qe[ms.mi*4 + i] - v.ce[ms.mi*4 + i]) AS sub,
        |    list_transform(range(1, 5), i -> v.ce[ms.mi*4 + i]) AS csl
        |  FROM cc c JOIN cav v ON v.cid = c.vec_id, ms),
        |${pqLloydCtes(2)},
        |cb AS (SELECT mi, j, cent FROM pq2),
        |dist AS (SELECT s.vid, s.mi, b.j,
        |    list_sum(list_transform(range(1, 5),
        |      i -> (s.sub[i]-b.cent[i])*(s.sub[i]-b.cent[i]))) AS d2
        |  FROM csub s JOIN cb b ON b.mi = s.mi),
        |code AS (SELECT vid, mi, j FROM (
        |    SELECT vid, mi, j,
        |      row_number() OVER (PARTITION BY vid, mi ORDER BY d2, j) AS rn
        |    FROM dist) WHERE rn = 1),
        |rn2 AS (SELECT c.vid, SUM(list_sum(list_transform(range(1, 5),
        |      i -> (s.csl[i]+b.cent[i])*(s.csl[i]+b.cent[i])))) AS rn2
        |  FROM code c JOIN csub s ON s.vid = c.vid AND s.mi = c.mi
        |  JOIN cb b ON b.mi = c.mi AND b.j = c.j
        |  GROUP BY c.vid),
        |qn AS (SELECT vec_id,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS qn2
        |  FROM qq),
        |qa AS (SELECT qid, cent_id, dt FROM (
        |    SELECT qid, cent_id, dt,
        |      row_number() OVER (PARTITION BY qid ORDER BY dt DESC, cent_id) AS rn
        |    FROM (SELECT qq.vec_id AS qid, cents.cent_id,
        |        CAST(list_sum(list_transform(range(1, 65), i -> qq.qe[i]*cents.ce[i])) AS BIGINT) AS dt
        |      FROM qq, cents)) WHERE rn <= 4),
        |qsub AS (SELECT vec_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM qq, ms),
        |lut AS (SELECT q.vec_id AS qid, q.mi, b.j,
        |    list_sum(list_transform(range(1, 5), i -> q.sub[i]*b.cent[i])) AS dt
        |  FROM qsub q JOIN cb b ON b.mi = q.mi),
        |prs AS (SELECT a.qid, c.cid, a.dt AS qdotc
        |  FROM qa a JOIN ca c ON c.cent_id = a.cent_id WHERE a.qid <> c.cid),
        |adc AS (SELECT p.qid, p.cid, p.qdotc + SUM(l.dt) AS adcdot
        |  FROM prs p JOIN code c ON c.vid = p.cid
        |  JOIN lut l ON l.qid = p.qid AND l.mi = c.mi AND l.j = c.j
        |  GROUP BY p.qid, p.cid, p.qdotc),
        |appr AS (SELECT a.qid, a.cid,
        |    CASE WHEN CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(a.adcdot AS DOUBLE)
        |        / sqrt(CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE)) END AS adc
        |  FROM adc a JOIN qn q ON q.vec_id = a.qid JOIN rn2 r ON r.vid = a.cid),
        |short AS (SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |    FROM appr) WHERE rn <= 64),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS cn2
        |  FROM cc),
        |sc AS (SELECT s.qid, s.cid,
        |    CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
        |      / sqrt(CAST(qn.qn2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS cos
        |  FROM short s JOIN qq q ON q.vec_id = s.qid
        |  JOIN cn c ON c.cid = s.cid JOIN qn ON qn.vec_id = s.qid),
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.IvfPq.ivfPqTopK(e.filter(col("id") < 50), e, 10,
          centroidStride = 40, nprobe = 4, m = 16, ncent = 16, pqStride = 7,
          shortlist = 64, pqIters = 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // LSH-bucketed ANN (the bucketed companion scale path to IVF): corpus
    // explodes into (table, signature) keys and equi-joins the query side —
    // no corpus broadcast, no cartesian. Signature planes derive from the
    // md5 keyed hash (the q172 discipline), so the oracle replays the FULL
    // pipeline — planes, per-table sign bits, bucket join, dedup, exact
    // rescore, rank — and hash-checks it; recall vs brute force is
    // additionally asserted in PipelineSpec.
    Qd("q128_ann_lsh",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |planes AS (
        |  SELECT t.range AS t, b.range AS b, i.range AS i,
        |    CASE WHEN CAST(('0x' || substr(md5('42:' || t.range || ':' ||
        |        b.range || ':' || i.range || ':pln'), 1, 15)) AS BIGINT) % 2 = 1
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM range(0, 10) t, range(0, 6) b, range(0, 64) i),
        |cterm AS (
        |  SELECT v.vec_id, p.t, p.b, SUM(v.qe[p.i + 1] * p.sgn) AS acc
        |  FROM cc v, planes p GROUP BY v.vec_id, p.t, p.b),
        |csig AS (SELECT vec_id AS cid, t,
        |  SUM(CASE WHEN acc >= 0 THEN 1 << b ELSE 0 END) AS sig
        |  FROM cterm GROUP BY vec_id, t),
        |qterm AS (
        |  SELECT v.vec_id, p.t, p.b, SUM(v.qe[p.i + 1] * p.sgn) AS acc
        |  FROM qq v, planes p GROUP BY v.vec_id, p.t, p.b),
        |qsig AS (SELECT vec_id AS qid, t,
        |  SUM(CASE WHEN acc >= 0 THEN 1 << b ELSE 0 END) AS sig
        |  FROM qterm GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT qsig.qid, csig.cid
        |  FROM csig JOIN qsig ON csig.t = qsig.t AND csig.sig = qsig.sig
        |  WHERE qsig.qid <> csig.cid),
        |qn AS (SELECT vec_id AS qid, qe,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |sc AS (SELECT cand.qid, cand.cid,
        |  CAST(CAST(list_sum(list_transform(range(1, len(qn.qe)+1), i -> qn.qe[i]*cn.ce[i])) AS BIGINT) AS DOUBLE)
        |    / sqrt(CAST(qn.n2 AS DOUBLE) * CAST(cn.n2 AS DOUBLE)) AS cos
        |  FROM cand JOIN qn ON qn.qid = cand.qid JOIN cn ON cn.cid = cand.cid),
        |rkt AS (SELECT qid, cid, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rkt WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      AnnSearch.lshTopK(e.filter(col("id") < 50), e, 10)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"), col("cos"))
        .orderBy("qid", "rk")
    },

    // Canonicalization: connected components over the near-dup graph (each
    // cluster keeps min doc_id). Oracle = recursive transitive closure over
    // the same exhaustive-pairwise edges.
    Qd("q104_dedup_components",
      s"""WITH RECURSIVE $shCteBody,
        |$nearDupCompCtes
        |SELECT doc_id, comp FROM comp ORDER BY doc_id""") { (s, dir) =>
      Dedup.connectedComponents(
          Dedup.minhashNearDupPairs(docs(s, dir), 128, 32, 0.8))
        .orderBy("doc_id")
    },

    // Quality-aware canonical selection — the production near-dedup keep
    // policy: within each near-dup component keep the HIGHEST-quality doc
    // (tie → lower doc_id), not an arbitrary min id. Composes the q104
    // component closure with the q47 quality score (both single-sourced);
    // singletons are their own canonical. One extra shuffle over q104: the
    // per-component argmax window, partitioned on the component key.
    Qd("q193_quality_canonicals",
      s"""WITH RECURSIVE $shCteBody,
        |$nearDupCompCtes,
        |q AS (SELECT doc_id, $qualityExprSql AS quality FROM documents),
        |a AS (SELECT d.doc_id, COALESCE(comp.comp, d.doc_id) AS comp, q.quality
        |      FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
        |      JOIN q ON q.doc_id = d.doc_id),
        |r AS (SELECT doc_id, comp, quality,
        |  row_number() OVER (PARTITION BY comp ORDER BY quality DESC, doc_id) AS rn FROM a)
        |SELECT doc_id, comp, quality, rn = 1 AS keep
        |FROM r ORDER BY doc_id""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val comp = Dedup.connectedComponents(
        Dedup.minhashNearDupPairs(d, 128, 32, 0.8))
      val q = TextAnalysis.qualityFeatures(d).select(col("doc_id"), col("quality"))
      d.select("doc_id")
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
        .join(q, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy("comp").orderBy(col("quality").desc, col("doc_id"))))
        .select(col("doc_id"), col("comp"), col("quality"),
          (col("rn") === 1).as("keep"))
        .orderBy("doc_id")
    },

    Qd("q46_langid",
      """SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN 'und'
        |       WHEN CAST(length(regexp_replace(text, '[ -~]', '', 'g')) AS DOUBLE)
        |            / length(text) > 0.3 THEN 'zh'
        |       WHEN en >= fr AND en >= es AND en >= de THEN 'en'
        |       WHEN fr >= es AND fr >= de THEN 'fr'
        |       WHEN es >= de THEN 'es' ELSE 'de' END AS pred_lang,
        |  lang AS true_lang
        |FROM (SELECT doc_id, text, lang,
        |    len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to'], x))) AS en,
        |    len(list_filter(string_split(text,' '), x -> list_contains(['le','la','et','de','un'], x))) AS fr,
        |    len(list_filter(string_split(text,' '), x -> list_contains(['el','los','de','y','un'], x))) AS es,
        |    len(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','ein'], x))) AS de
        |  FROM documents)
        |ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.langId(docs(s, dir)).orderBy("doc_id")
    },

    Qd("q47_quality_score",
      s"""SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  ROUND((CAST(greatest(length(text), 1) AS DOUBLE) - (len(string_split(text,' ')) - 1))
        |        / len(string_split(text,' ')), 6) AS avg_wlen,
        |  ROUND(CAST(len(list_filter(string_split(text,' '),
        |      x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
        |        / len(string_split(text,' ')), 6) AS stop_ratio,
        |  ROUND(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1), 6) AS punct_ratio,
        |  ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
        |        / len(string_split(text,' ')), 6) AS ttr,
        |  $qualityExprSql AS quality
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.qualityFeatures(docs(s, dir)).orderBy("doc_id")
    },

    Qd("q48_token_count",
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct_words
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.tokenCounts(docs(s, dir)).orderBy("doc_id")
    },

    Qd("q49_fingerprint_winnow",
      """WITH g AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) >= 5
        |      THEN list_transform(range(1, length(text)-3),
        |        i -> CAST(('0x' || substr(md5(substr(text,i,5)),1,15)) AS BIGINT))
        |      ELSE [] END AS grams
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN len(grams) >= 4
        |      THEN list_distinct(list_transform(range(1, len(grams)-2),
        |        j -> list_min(grams[j:j+3])))
        |      ELSE list_distinct(grams) END AS fp
        |  FROM g)
        |SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
        |  list_min(fp) AS fp_min, list_max(fp) AS fp_max
        |FROM f ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.fingerprints(docs(s, dir))
        .select(col("doc_id"), col("n_fp").cast("bigint").as("n_fp"),
          col("fp_min"), col("fp_max"))
        .orderBy("doc_id")
    },

    // SemDeDup-style semantic dedup, end to end: cluster the embedding
    // space (broadcast-argmax assignment, the IVF partitioner), find
    // within-cluster cosine near-dup pairs (tiled exact join — clusters
    // bound the pair space the way SemDeDup's k-means blocks do), close
    // them into components, keep one canonical (min id) per component.
    // Oracle = the same argmax assignment + all-pairs threshold join +
    // recursive transitive closure, all on the shared int64 quantization.
    // Scale: the cluster count grows with the corpus (stride-derived), so
    // per-cluster pair work stays bounded; CC is one shuffle/iteration.
    Qd("q190_semantic_dedup",
      s"""WITH RECURSIVE ${qCte("v", "")},
        |n AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM v),
        |cents AS (SELECT vec_id AS cent_id, qe AS ce FROM v WHERE vec_id % 40 = 0),
        |ca AS (SELECT cid, cent_id FROM (
        |  SELECT v.vec_id AS cid, cents.cent_id,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, len(v.qe)+1), i -> v.qe[i]*cents.ce[i])) AS BIGINT) DESC,
        |      cents.cent_id) AS rn
        |  FROM v, cents) WHERE rn = 1),
        |p AS (
        |  SELECT a.vec_id AS d1, b.vec_id AS d2
        |  FROM n a JOIN ca x ON x.cid = a.vec_id
        |       JOIN n b ON a.vec_id < b.vec_id
        |       JOIN ca y ON y.cid = b.vec_id AND y.cent_id = x.cent_id
        |  WHERE CAST(CAST(list_sum(list_transform(range(1, len(a.qe)+1), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) >= 0.4),
        |e AS (SELECT d1 AS src, d2 AS dst FROM p UNION SELECT d2, d1 FROM p),
        |reach AS (
        |  SELECT src, src AS dst FROM e
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
        |comp AS (SELECT src AS vec_id, min(dst) AS comp FROM reach GROUP BY src)
        |SELECT ca.cid AS vec_id, ca.cent_id,
        |  COALESCE(comp.comp, ca.cid) AS canonical,
        |  COALESCE(comp.comp, ca.cid) = ca.cid AS kept
        |FROM ca LEFT JOIN comp ON comp.vec_id = ca.cid
        |ORDER BY vec_id""") { (s, dir) =>
      val e = emb(s, dir)
      val clust = AnnSearch.assignClusters(e, centroidStride = 40)
      val blocked = e.join(clust, "id")
      val comp = Dedup.connectedComponents(
        AnnSearch.cosineNearDupPairs(blocked, "cent_id", 0.4))
      clust.join(comp, col("id") === col("doc_id"), "left")
        .select(col("id").as("vec_id"),
          col("cent_id").cast("bigint").as("cent_id"),
          coalesce(col("comp"), col("id")).as("canonical"),
          (coalesce(col("comp"), col("id")) === col("id")).as("kept"))
        .orderBy("vec_id")
    },

    Qd("q50_embedding_neardup",
      s"""WITH ${qCte("v", "")},
        |n AS (SELECT vec_id, label, qe,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM v),
        |p AS (
        |  SELECT a.vec_id AS d1, b.vec_id AS d2,
        |    CAST(CAST(list_sum(list_transform(range(1, len(a.qe)+1), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT d1, d2, ROUND(cos, 6) AS cos
        |FROM p WHERE cos >= 0.4 ORDER BY d1, d2""") { (s, dir) =>
      AnnSearch.cosineNearDupPairs(emb(s, dir), "label", 0.4).orderBy("d1", "d2")
    },

    // Near-dup at a SELECTIVE threshold — the LSH-bucketed scale path
    // (candidates from the hyperplane bucket equi-join, exact int64 rescore).
    // The base table has no tight near-dups (max within-label cos ≈ 0.48),
    // so the query plants them: a deterministically perturbed copy of every
    // vector (elementwise ×(1 + ((i·31+7) mod 13 − 6)/100), integer-rational
    // so both engines compute identical float32s). The DuckDB oracle is the
    // EXACT all-pairs join at the same threshold: hash-green ⇔ the LSH path
    // achieved full recall on this data (per-pair miss ≈ 1e-26 at the
    // planted cos ≈ 0.999 — see AnnSearch.cosineNearDupPairsLsh).
    Qd("q147_neardup_lsh",
      """WITH pert AS (
        |  SELECT vec_id + 1000000 AS vec_id, label,
        |    list_transform(range(1, len(embedding)+1),
        |      i -> CAST(CAST(embedding[i] AS DOUBLE)
        |        * (1.0 + (CAST(((i-1)*31+7) % 13 AS DOUBLE) - 6.0)/100.0) AS FLOAT)) AS embedding
        |  FROM embeddings),
        |u AS (SELECT vec_id, label, embedding FROM embeddings
        |      UNION ALL SELECT vec_id, label, embedding FROM pert),
        |v AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS qe
        |  FROM u),
        |n AS (SELECT vec_id, label, qe,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM v),
        |p AS (
        |  SELECT a.vec_id AS d1, b.vec_id AS d2,
        |    CAST(CAST(list_sum(list_transform(range(1, len(a.qe)+1), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT d1, d2, ROUND(cos, 6) AS cos
        |FROM p WHERE cos >= 0.95 ORDER BY d1, d2""") { (s, dir) =>
      val e = emb(s, dir)
      val pert = e.select((col("id") + 1000000L).as("id"),
        expr("""transform(embedding,
          |  (x, i) -> CAST(CAST(x AS DOUBLE)
          |    * (1.0D + (CAST((i*31+7) % 13 AS DOUBLE) - 6.0D)/100.0D) AS FLOAT))""".stripMargin)
          .as("embedding"),
        col("label"))
      AnnSearch.cosineNearDupPairsLsh(e.unionByName(pert), "label", 0.95)
        .orderBy("d1", "d2")
    },

    // TF-IDF top terms per document — the inverted-index text-analysis op
    // (term posting lists are the df aggregate's shuffle groups). Pure
    // codegen relational ops: split/explode tokenize, two hash aggregates,
    // a broadcast scalar for N, one window for the per-doc top-k. Score
    // math is double-exact cross-engine (same tf·ln((N+1)/(df+1)) op
    // sequence), ties broken by term, rounding display-only.
    Qd("q154_tfidf_top_terms",
      """WITH tok AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |    FROM documents)
        |  WHERE w <> '' AND len(w) >= 2),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT t.doc_id, t.w AS term, t.tf, d.df,
        |         t.tf * ln((n.n + 1.0) / (d.df + 1.0)) AS score
        |       FROM tf t JOIN df d ON t.w = d.w CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, term) AS rk FROM sc)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  ROUND(score, 6) AS tfidf
        |FROM r WHERE rk <= 3 ORDER BY doc_id, term""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val tok = d.select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(col("w") =!= "" && length(col("w")) >= 2)
      val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n"))
      val sc = tf.join(df, "w").crossJoin(broadcast(n))
        .withColumn("score",
          col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0))))
      sc.withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("w").as("term"),
          col("tf").cast("bigint").as("tf"), col("df").cast("bigint").as("df"),
          round(col("score"), 6).as("tfidf"))
        .orderBy("doc_id", "term")
    },

    // Int8 embedding quantization (storage compression — Int8Quantize
    // scaladoc). The oracle recomputes scale + codes independently and
    // checks integer checksums of the code vector, so a single off-by-one
    // code anywhere in the corpus flips the hash.
    Qd("q178_embedding_int8",
      s"""WITH $i8Cte
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  CAST(len(c) + 8 AS BIGINT) AS n_bytes,
        |  CAST(list_sum(c) AS BIGINT) AS code_sum,
        |  CAST(list_sum(list_transform(c, x -> x*x)) AS BIGINT) AS code_norm2,
        |  CAST(list_max(list_transform(c, x -> abs(x))) AS BIGINT) AS code_max
        |FROM cq ORDER BY vec_id""") { (s, dir) =>
      Int8Quantize.stats(emb(s, dir)).orderBy("vec_id")
    },

    // Top-k search under the int8 metric — scales cancel in cosine, so the
    // whole search is integer dots over 1-byte codes (DotI8). Exact within
    // the quantized metric ⇒ fully oracle-checkable; recall vs the float
    // metric is asserted in QuantizeSpec.
    Qd("q179_ann_int8",
      s"""WITH $i8Cte,
        |n AS (SELECT vec_id, c,
        |  CAST(list_sum(list_transform(c, x -> x*x)) AS BIGINT) AS n2 FROM cq),
        |q AS (SELECT * FROM n WHERE vec_id < 50),
        |sc AS (SELECT q.vec_id AS qid, n.vec_id AS cid,
        |  CAST(CAST(list_sum(list_transform(range(1, len(q.c)+1), i -> q.c[i]*n.c[i])) AS BIGINT) AS DOUBLE)
        |    / sqrt(CAST(q.n2 AS DOUBLE) * CAST(n.n2 AS DOUBLE)) AS cos
        |  FROM q, n WHERE q.vec_id <> n.vec_id),
        |rk AS (SELECT qid, cid, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      val e = emb(s, dir)
      Int8Quantize.int8TopK(e.filter(col("id") < 50), e, 10)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"), col("cos"))
        .orderBy("qid", "rk")
    },

    // Gopher repetition-quality signals ([[graft.operators
    // .RepetitionStats]] — Rae et al. 2021 appendix A1.1, the MassiveWeb
    // repetition family): most-frequent-n-gram character share (n=2,3,4 —
    // count × gram chars / total word chars, max-coverage under ties) and
    // duplicated-5-gram character coverage (interval UNION over positions
    // of grams occurring ≥2×, chars counted once). The oracle rebuilds all
    // four from first principles in SQL (position explode → gram counts →
    // coverage join); the Spark side is ONE compiled mapPartitions pass.
    // A wrong tie-break, separator-char inclusion, or double-counted
    // overlap breaks the hash.
    Qd("q221_gopher_repetition",
      """WITH d AS (SELECT doc_id,
        |       list_filter(string_split(text, ' '), x -> x <> '') AS w
        |     FROM documents),
        |b AS (SELECT doc_id, w, len(w) AS nw,
        |       CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS twc
        |      FROM d),
        |p2 AS (SELECT doc_id, unnest(range(1, nw)) AS i FROM b),
        |g2 AS (SELECT p.doc_id, b.w[p.i] || ' ' || b.w[p.i+1] AS g,
        |        length(b.w[p.i]) + length(b.w[p.i+1]) AS k
        |       FROM p2 p JOIN b USING (doc_id)),
        |t2 AS (SELECT doc_id, max(c * k) AS cov FROM
        |        (SELECT doc_id, g, k, count(*) AS c FROM g2 GROUP BY doc_id, g, k)
        |       GROUP BY doc_id),
        |p3 AS (SELECT doc_id, unnest(range(1, nw - 1)) AS i FROM b),
        |g3 AS (SELECT p.doc_id,
        |        b.w[p.i] || ' ' || b.w[p.i+1] || ' ' || b.w[p.i+2] AS g,
        |        length(b.w[p.i]) + length(b.w[p.i+1]) + length(b.w[p.i+2]) AS k
        |       FROM p3 p JOIN b USING (doc_id)),
        |t3 AS (SELECT doc_id, max(c * k) AS cov FROM
        |        (SELECT doc_id, g, k, count(*) AS c FROM g3 GROUP BY doc_id, g, k)
        |       GROUP BY doc_id),
        |p4 AS (SELECT doc_id, unnest(range(1, nw - 2)) AS i FROM b),
        |g4 AS (SELECT p.doc_id,
        |        b.w[p.i] || ' ' || b.w[p.i+1] || ' ' || b.w[p.i+2] || ' ' || b.w[p.i+3] AS g,
        |        length(b.w[p.i]) + length(b.w[p.i+1]) + length(b.w[p.i+2]) + length(b.w[p.i+3]) AS k
        |       FROM p4 p JOIN b USING (doc_id)),
        |t4 AS (SELECT doc_id, max(c * k) AS cov FROM
        |        (SELECT doc_id, g, k, count(*) AS c FROM g4 GROUP BY doc_id, g, k)
        |       GROUP BY doc_id),
        |p5 AS (SELECT doc_id, unnest(range(1, nw - 3)) AS i FROM b),
        |g5 AS (SELECT p.doc_id, p.i,
        |        b.w[p.i] || ' ' || b.w[p.i+1] || ' ' || b.w[p.i+2] || ' ' ||
        |        b.w[p.i+3] || ' ' || b.w[p.i+4] AS g
        |       FROM p5 p JOIN b USING (doc_id)),
        |c5 AS (SELECT doc_id, g FROM g5 GROUP BY doc_id, g HAVING count(*) > 1),
        |dpos AS (SELECT DISTINCT g5.doc_id, g5.i + o.k AS j
        |         FROM g5 JOIN c5 ON g5.doc_id = c5.doc_id AND g5.g = c5.g
        |         CROSS JOIN (SELECT unnest(range(0, 5)) AS k) o),
        |cov5 AS (SELECT p.doc_id, SUM(length(b.w[p.j])) AS cc
        |         FROM dpos p JOIN b USING (doc_id) GROUP BY p.doc_id)
        |SELECT b.doc_id, CAST(nw AS BIGINT) AS n_words,
        |  ROUND(CAST(twc AS DOUBLE) / nw, 6) AS mean_word_len,
        |  ROUND(CAST(COALESCE(t2.cov, 0) AS DOUBLE) / twc, 6) AS top2gram_frac,
        |  ROUND(CAST(COALESCE(t3.cov, 0) AS DOUBLE) / twc, 6) AS top3gram_frac,
        |  ROUND(CAST(COALESCE(t4.cov, 0) AS DOUBLE) / twc, 6) AS top4gram_frac,
        |  ROUND(CAST(COALESCE(cov5.cc, 0) AS DOUBLE) / twc, 6) AS dup5gram_frac
        |FROM b LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |       LEFT JOIN t4 USING (doc_id) LEFT JOIN cov5 USING (doc_id)
        |ORDER BY b.doc_id""") { (s, dir) =>
      graft.operators.RepetitionStats.stats(docs(s, dir)).toDF()
        .select(col("doc_id"), col("n_words"),
          round(col("mean_word_len"), 6).as("mean_word_len"),
          round(col("top2gram_frac"), 6).as("top2gram_frac"),
          round(col("top3gram_frac"), 6).as("top3gram_frac"),
          round(col("top4gram_frac"), 6).as("top4gram_frac"),
          round(col("dup5gram_frac"), 6).as("dup5gram_frac"))
        .orderBy("doc_id")
    },

    // Incremental IVF vector index ([[AnnSearch.ivfIndexInit]] /
    // [[AnnSearch.ivfIndexIngest]] — the FAISS contract: train once, add
    // forever): centroids FREEZE at init into a sidecar (re-deriving them
    // per batch would silently strand earlier rows under assignments no
    // probe reaches), each of 3 ingest batches assigns against the frozen
    // set and appends its inverted-list partitions, and the probe prunes
    // to nprobe lists. Ingest is order-independent, so the oracle is the
    // ONE-SHOT IVF over the union with the same (first-batch) centroids —
    // identical candidates, identical quantized scores.
    Qd("q260_incremental_ivf",
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cents AS (SELECT vec_id AS cent_id, qe AS ce FROM cc WHERE vec_id % 120 = 0),
        |ca AS (SELECT cid, cent_id FROM (
        |  SELECT cc.vec_id AS cid, cents.cent_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, len(cc.qe)+1), i -> cc.qe[i]*cents.ce[i])) AS BIGINT) DESC,
        |      cents.cent_id) AS rn
        |  FROM cc, cents) WHERE rn = 1),
        |qa AS (SELECT qid, cent_id FROM (
        |  SELECT qq.vec_id AS qid, cents.cent_id,
        |    row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, len(qq.qe)+1), i -> qq.qe[i]*cents.ce[i])) AS BIGINT) DESC,
        |      cents.cent_id) AS rn
        |  FROM qq, cents) WHERE rn <= 2),
        |qn AS (SELECT vec_id AS qid, qe,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |  CAST(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |sc AS (
        |  SELECT qa.qid, ca.cid,
        |    CAST(CAST(list_sum(list_transform(range(1, len(qn.qe)+1), i -> qn.qe[i]*cn.ce[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(qn.n2 AS DOUBLE) * CAST(cn.n2 AS DOUBLE)) AS cos
        |  FROM qa JOIN ca ON qa.cent_id = ca.cent_id
        |  JOIN qn ON qn.qid = qa.qid JOIN cn ON cn.cid = ca.cid
        |  WHERE qa.qid <> ca.cid),
        |rk AS (SELECT qid, cid, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""") { (s, dir) =>
      import graft.operators.AnnSearch
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g260_ivf"
      // first batch carries ids ≡ 0 (mod 3); stride 40 on it → frozen
      // centroids are exactly the oracle's vec_id % 120 = 0 set
      AnnSearch.ivfIndexInit(e.filter(col("id") % 3 === 0), 40, idx)
      AnnSearch.ivfIndexIngest(e.filter(col("id") % 3 === 1), idx)
      AnnSearch.ivfIndexIngest(e.filter(col("id") % 3 === 2), idx)
      AnnSearch.ivfTopKIncremental(e.filter(col("id") < 50), idx, 10, 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // Incrementally-maintained LSH near-dup index
    // ([[graft.operators.IncrementalLsh]] — the production form of q41:
    // the corpus arrives in 4 ingest batches, each batch probes the
    // PERSISTED bucket index instead of rescanning the corpus, and the
    // union of per-batch outputs must equal the one-shot full-corpus LSH
    // run — which is why the oracle is the very same all-pairs Jaccard
    // join as q41. Work per batch is O(batch × bucket hits), independent
    // of corpus size; each pair surfaces exactly once, at its later
    // member's batch (spec-pinned).
    Qd("q249_incremental_lsh",
      s"""$shCte,
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    len(list_intersect(a.g, b.g)) AS i, len(a.g) AS n1, len(b.g) AS n2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT d1, d2, ROUND(CAST(i AS DOUBLE)/(n1+n2-i), 6) AS jac
        |FROM pairs WHERE CAST(i AS DOUBLE)/(n1+n2-i) >= 0.8
        |ORDER BY d1, d2""") { (s, dir) =>
      import graft.operators.IncrementalLsh
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g249_lsh_index"
      IncrementalLsh.init(s, idx)
      val d = docs(s, dir)
      (0 until 4).map { b =>
        IncrementalLsh.ingest(s, idx, d.filter(col("doc_id") % 4 === b))
      }.reduce(_ unionByName _).orderBy("d1", "d2")
    },

    // THE GRAPH INDEX AT REST ([[GraphAnn.writeIndex]]/[[GraphAnn
    // .probeIndex]] — the persisted form the q361–q367 family was
    // missing): both HNSW layer graphs land as src-bucketed parquet, the
    // vector store as id-bucketed parquet, entries/tombstones as sidecars
    // — and the probe walks the descent with every fetch bucket-
    // partition-pruned (PartitionFilters, GraphIndexSpec). The result is
    // the SAME two-layer descent as q366 by construction (spec-pinned row
    // parity), so the oracle is the q366 replay: level split → both
    // builds → upper walk from the lowest-ef1 layer-1 entries → per-query
    // seeded bottom walk.
    Qd("q379_ann_graph_index", {
      val gHier =
        s"""lv AS (SELECT vec_id FROM cc WHERE ${lvlDrawSql("vec_id")}),
          |ln AS (SELECT cn.* FROM cn JOIN lv USING (vec_id)),
          |gp1 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM ln a, ln b WHERE a.vec_id <> b.vec_id),
          |g1 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp1)
          |  WHERE rn <= 4),
          |gp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM cn a, cn b WHERE a.vec_id <> b.vec_id),
          |g0 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0)
          |  WHERE rn <= 8)""".stripMargin
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |$gHier,
        |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid, ${cosSql("q", "c")} AS cos
        |  FROM qn q, cn c WHERE q.vec_id <> c.vec_id),
        |ent AS (SELECT vec_id FROM lv ORDER BY vec_id LIMIT 8),
        |${hnswProbeTailSql("g1", "g0", "ent", "ps")}""".stripMargin
    }) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g379_graph_idx"
      GraphAnn.writeIndex(e, idx, m = 8, m1 = 4, nBuckets = 16,
        g0Opt = Some(cachedGraph(s, dir, "full_m8")(GraphAnn.knnGraph(e, 8))),
        g1Opt = Some(cachedGraph(s, dir, "lvl1_m4")(
          GraphAnn.knnGraph(GraphAnn.levelNodes(e, 1), 4))),
        maxLayers = 1)
      GraphAnn.probeIndex(e.filter(col("id") < 50), idx, 10,
          ef1 = 8, hops1 = 2, ef = 16, hops = 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // LEVEL-AWARE MULTI-BATCH INGEST into the persisted graph index
    // ([[GraphAnn.addBatch]] — q367's train-once/add-forever discipline,
    // now with the hierarchy maintained): the index is built on half the
    // corpus, two batches add a quarter each — every batch node DESCENDS
    // the pre-batch hierarchy (one upper walk from the entry sidecar
    // doubles as the layer-1 edge selection for layer-1 draw nodes, and
    // seeds each node's layer-0 walk), then both layers run the uniform
    // back-edge + re-trim algebra and APPEND their touched sources at
    // gen+1. The oracle chains both insert replays (upper walk → seeded
    // lower walk → per-layer edge algebra, generations MATERIALIZED) and
    // probes the final hierarchy; the engine probes the PERSISTED index,
    // resolving generations and reading only pruned buckets.
    Qd("q380_ann_graph_index_ingest", {
      val build0 =
        s"""c0 AS (SELECT * FROM cn WHERE vec_id % 4 <= 1),
          |lv0 AS (SELECT vec_id FROM c0 WHERE ${lvlDrawSql("vec_id")}),
          |ln0 AS (SELECT c0.* FROM c0 JOIN lv0 USING (vec_id)),
          |gp1_0 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM ln0 a, ln0 b WHERE a.vec_id <> b.vec_id),
          |g1_0 AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp1_0)
          |  WHERE rn <= 4),
          |gp0_0 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM c0 a, c0 b WHERE a.vec_id <> b.vec_id),
          |g0_0 AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0_0)
          |  WHERE rn <= 8)""".stripMargin
      val insBlocks = (2 to 3).map { b =>
        val g = b - 2 // generation being extended
        s"""bn$b AS (SELECT * FROM cn WHERE vec_id % 4 = $b),
          |cs$b AS (SELECT * FROM cn WHERE vec_id % 4 <= $b),
          |psi$b AS MATERIALIZED (SELECT q.vec_id AS qid, c.vec_id AS cid,
          |    ${cosSql("q", "c")} AS cos
          |  FROM bn$b q, cn c WHERE q.vec_id <> c.vec_id),
          |ent$b AS (SELECT vec_id FROM cn
          |  WHERE vec_id % 4 <= ${b - 1} AND ${lvlDrawSql("vec_id")}
          |  ORDER BY vec_id LIMIT 8),
          |${beamWalkCtes(s"u$b", s"g1_$g", s"psi$b", s"ent$b", 8, 2)},
          |${beamWalkCtesSeeded(s"l$b", s"g0_$g", s"psi$b", s"u${b}b2", 16, 2)},
          |ne0_$b AS (SELECT qid AS src, cid AS dst FROM (
          |    SELECT qid, cid,
          |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          |    FROM l${b}b2) WHERE rn <= 8),
          |ne1_$b AS (SELECT qid AS src, cid AS dst FROM (
          |    SELECT qid, cid,
          |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          |    FROM u${b}b2) WHERE rn <= 4 AND ${lvlDrawSql("qid")}),
          |ae0_$b AS (SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM g0_$g
          |    UNION ALL SELECT src, dst FROM ne0_$b
          |    UNION ALL SELECT dst AS src, src AS dst FROM ne0_$b)),
          |ge0_$b AS (SELECT e.src, e.dst, ${cosSql("a", "b")} AS cos
          |  FROM ae0_$b e JOIN cs$b a ON a.vec_id = e.src JOIN cs$b b ON b.vec_id = e.dst),
          |g0_${g + 1} AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM ge0_$b)
          |  WHERE rn <= 8),
          |ae1_$b AS (SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM g1_$g
          |    UNION ALL SELECT src, dst FROM ne1_$b
          |    UNION ALL SELECT dst AS src, src AS dst FROM ne1_$b)),
          |ge1_$b AS (SELECT e.src, e.dst, ${cosSql("a", "b")} AS cos
          |  FROM ae1_$b e JOIN cs$b a ON a.vec_id = e.src JOIN cs$b b ON b.vec_id = e.dst),
          |g1_${g + 1} AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM ge1_$b)
          |  WHERE rn <= 4)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |$build0,
        |$insBlocks,
        |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid, ${cosSql("q", "c")} AS cos
        |  FROM qn q, cn c WHERE q.vec_id <> c.vec_id),
        |ent AS (SELECT vec_id FROM cn WHERE ${lvlDrawSql("vec_id")}
        |  ORDER BY vec_id LIMIT 8),
        |${hnswProbeTailSql("g1_2", "g0_2", "ent", "ps")}""".stripMargin
    }) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g380_graph_idx"
      val half = e.filter(col("id") % 4 <= 1)
      GraphAnn.writeIndex(half, idx, m = 8, m1 = 4, nBuckets = 16,
        g0Opt = Some(cachedGraph(s, dir, "half_m8")(
          GraphAnn.knnGraph(half, 8))),
        g1Opt = Some(cachedGraph(s, dir, "halflvl1_m4")(
          GraphAnn.knnGraph(GraphAnn.levelNodes(half, 1), 4))),
        maxLayers = 1)
      GraphAnn.addBatch(idx, e.filter(col("id") % 4 === 2),
        ef1 = 8, hops1 = 2, ef = 16, hops = 2)
      GraphAnn.addBatch(idx, e.filter(col("id") % 4 === 3),
        ef1 = 8, hops1 = 2, ef = 16, hops = 2)
      GraphAnn.probeIndex(e.filter(col("id") < 50), idx, 10,
          ef1 = 8, hops1 = 2, ef = 16, hops = 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // PERSISTED-INDEX DELETE ([[GraphAnn.removeBatch]] — q364's bridge
    // repair against the at-rest form, on BOTH layers): every 10th node
    // (residue 3) is tombstoned; surviving sources that edged into a
    // removed node bridge through it and re-trim at gen+1, per layer; the
    // entry sidecar rebuilds to the lowest LIVE layer-1 ids because the
    // deletion touched it. The probe walks the repaired hierarchy with
    // tombstoned destinations masked at fetch — the oracle replays both
    // layers' kept ∪ bridge → re-trim and the survivor-scored descent.
    Qd("q381_ann_graph_index_delete", {
      val repair =
        s"""lv AS (SELECT vec_id FROM cc WHERE ${lvlDrawSql("vec_id")}),
          |ln AS (SELECT cn.* FROM cn JOIN lv USING (vec_id)),
          |gp1 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM ln a, ln b WHERE a.vec_id <> b.vec_id),
          |g1 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp1)
          |  WHERE rn <= 4),
          |gp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM cn a, cn b WHERE a.vec_id <> b.vec_id),
          |g0 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0)
          |  WHERE rn <= 8),
          |sv AS (SELECT * FROM cn WHERE vec_id % 10 <> 3),
          |kept0 AS (SELECT src, dst FROM g0 WHERE src % 10 <> 3 AND dst % 10 <> 3),
          |bridge0 AS (SELECT a.src, b.dst FROM g0 a JOIN g0 b ON b.src = a.dst
          |  WHERE a.dst % 10 = 3 AND a.src % 10 <> 3 AND b.dst % 10 <> 3
          |    AND a.src <> b.dst),
          |ae0 AS (SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM kept0 UNION ALL SELECT src, dst FROM bridge0)),
          |ge0 AS (SELECT e.src, e.dst, ${cosSql("a", "b")} AS cos
          |  FROM ae0 e JOIN sv a ON a.vec_id = e.src JOIN sv b ON b.vec_id = e.dst),
          |g0f AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM ge0)
          |  WHERE rn <= 8),
          |kept1 AS (SELECT src, dst FROM g1 WHERE src % 10 <> 3 AND dst % 10 <> 3),
          |bridge1 AS (SELECT a.src, b.dst FROM g1 a JOIN g1 b ON b.src = a.dst
          |  WHERE a.dst % 10 = 3 AND a.src % 10 <> 3 AND b.dst % 10 <> 3
          |    AND a.src <> b.dst),
          |ae1 AS (SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM kept1 UNION ALL SELECT src, dst FROM bridge1)),
          |ge1 AS (SELECT e.src, e.dst, ${cosSql("a", "b")} AS cos
          |  FROM ae1 e JOIN sv a ON a.vec_id = e.src JOIN sv b ON b.vec_id = e.dst),
          |g1f AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM ge1)
          |  WHERE rn <= 4)""".stripMargin
      s"""WITH ${qCte("qq", "WHERE vec_id < 50 AND vec_id % 10 <> 3")},
        |${qCte("cc", "")},
        |cn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |$repair,
        |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid, ${cosSql("q", "c")} AS cos
        |  FROM qn q, sv c WHERE q.vec_id <> c.vec_id),
        |ent AS (SELECT vec_id FROM lv WHERE vec_id % 10 <> 3
        |  ORDER BY vec_id LIMIT 8),
        |${hnswProbeTailSql("g1f", "g0f", "ent", "ps")}""".stripMargin
    }) { (s, dir) =>
      import graft.operators.GraphAnn
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val idx = s"/root/repo/target/ddl/$sf/g381_graph_idx"
      GraphAnn.writeIndex(e, idx, m = 8, m1 = 4, nBuckets = 16,
        g0Opt = Some(cachedGraph(s, dir, "full_m8")(GraphAnn.knnGraph(e, 8))),
        g1Opt = Some(cachedGraph(s, dir, "lvl1_m4")(
          GraphAnn.knnGraph(GraphAnn.levelNodes(e, 1), 4))),
        maxLayers = 1)
      GraphAnn.removeBatch(idx, e.filter(col("id") % 10 === 3).select("id"))
      GraphAnn.probeIndex(
          e.filter(col("id") < 50 && col("id") % 10 =!= 3), idx, 10,
          ef1 = 8, hops1 = 2, ef = 16, hops = 2)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("cos"))
        .orderBy("qid", "rk")
    },

    // THE INDEX ZOO AS PURE SQL ([[graft.operators.IndexZooSql]] — the
    // engine's SQL story reaching the vector index family the way q273's
    // CREATE INDEX DDL reaches skipping/bloom/bitmap): CREATE VECTOR
    // INDEX builds the persisted graph hierarchy, VECTOR TOPK routes to
    // its descent probe because the index COVERS (table, column), DROP
    // retires it, and the SAME probe statement then degrades to the
    // exact brute full scan — slower, never wrong. The oracle replays
    // the descent for the indexed phase and the exact rank for the scan
    // phase; a fixed 200-row corpus keeps the in-DDL exact build flat
    // across SFs.
    Qd("q382_vector_index_sql", {
      val gHier =
        s"""lv AS (SELECT vec_id FROM cc WHERE ${lvlDrawSql("vec_id")}),
          |ln AS (SELECT cn.* FROM cn JOIN lv USING (vec_id)),
          |gp1 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM ln a, ln b WHERE a.vec_id <> b.vec_id),
          |g1 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp1)
          |  WHERE rn <= 4),
          |gp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst, ${cosSql("a", "b")} AS cos
          |  FROM cn a, cn b WHERE a.vec_id <> b.vec_id),
          |g0 AS (SELECT src, dst FROM (SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp0)
          |  WHERE rn <= 8)""".stripMargin
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "WHERE vec_id < 200")},
        |cn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
        |qn AS (SELECT vec_id, qe,
        |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
        |$gHier,
        |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid, ${cosSql("q", "c")} AS cos
        |  FROM qn q, cn c WHERE q.vec_id <> c.vec_id),
        |ent AS (SELECT vec_id FROM lv ORDER BY vec_id LIMIT 8),
        |${beamWalkCtes("u", "g1", "ps", "ent", 8, 2)},
        |${beamWalkCtesSeeded("", "g0", "ps", "ub2", 16, 2)},
        |rk1 AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM b2),
        |rk2 AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM ps)
        |SELECT phase, qid, cid, CAST(rk AS BIGINT) AS rk, cos FROM (
        |  SELECT 'indexed' AS phase, qid, cid, rk, ROUND(cos, 6) AS cos
        |  FROM rk1 WHERE rk <= 10
        |  UNION ALL
        |  SELECT 'scan', qid, cid, rk, ROUND(cos, 6) FROM rk2 WHERE rk <= 10)
        |ORDER BY phase, qid, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.IndexZooSql
      IndexZooSql.reset(s)
      val e = emb(s, dir)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      e.filter(col("id") < 200).createOrReplaceTempView("g382_corpus")
      e.filter(col("id") < 50).createOrReplaceTempView("g382_queries")
      IndexZooSql.sql(s, "CREATE VECTOR INDEX g382_vi ON g382_corpus " +
        "(embedding) AS 'GRAPH' OPTIONS (m=8, m1=4, buckets=16, " +
        s"path='/root/repo/target/ddl/$sf/g382_vi')")
      val probe = "VECTOR TOPK ON g382_corpus (embedding) QUERIES " +
        "g382_queries LIMIT 10 OPTIONS (ef1=8, hops1=2, ef=16, hops=2)"
      val indexed = IndexZooSql.sql(s, probe)
      IndexZooSql.sql(s, "DROP VECTOR INDEX g382_vi")
      val scanned = IndexZooSql.sql(s, probe)
      indexed.withColumn("phase", lit("indexed"))
        .unionByName(scanned.withColumn("phase", lit("scan")))
        .select("phase", "qid", "cid", "rk", "cos")
        .orderBy("phase", "qid", "rk")
    },

    // THE PERSISTED INDEX REGISTRY END-TO-END (VERDICT r16 tasks 4 + 7):
    // CREATE VECTOR INDEX … AS 'IVF_PQ' dispatches through Engine.sql (the
    // txn-DML transparent-routing posture), the registry entry lands as a
    // `_registry` sidecar file, the BASE VIEW IS THEN DROPPED, and the
    // TOPK probe runs from a FRESH SESSION that never saw the CREATE —
    // registry resolution, probe routing, and the IVF-PQ rescore all serve
    // from index files alone (the rescore reads the index's id-bucketed
    // vector store, never the base table). Results are bit-equal to the
    // q348 one-shot pipeline, so the oracle replays the same IVF-PQ SQL.
    Qd("q387_index_registry_persist", ivfPqOracleSql) { (s, dir) =>
      import graft.operators.IndexZooSql
      IndexZooSql.reset(s)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      emb(s, dir).createOrReplaceTempView("g387_corpus")
      graft.Engine.sql(s, dir, "CREATE VECTOR INDEX g387_vi ON g387_corpus " +
        "(embedding) AS 'IVF_PQ' OPTIONS (stride=40, m=16, ncent=16, " +
        s"pqstride=7, path='/root/repo/target/ddl/$sf/g387_vi')")
      s.catalog.dropTempView("g387_corpus") // probe must not need it
      val s2 = s.newSession()
      emb(s2, dir).filter(col("id") < 50)
        .createOrReplaceTempView("g387_queries")
      graft.Engine.sql(s2, dir, "VECTOR TOPK ON g387_corpus (embedding) " +
          "QUERIES g387_queries LIMIT 10 OPTIONS (nprobe=4, shortlist=64)")
        .orderBy("qid", "rk")
    },

    // CDC-MAINTAINED VECTOR INDEX (r17 — the ACID log feeding the index
    // zoo, FreshDiskANN's insert/delete stream sourced from a TABLE): the
    // embedding corpus lives in a [[TxnMergeOnRead]] table; INSERT /
    // DELETE / UPDATE DML churn it under snapshot isolation; ONE
    // [[TxnMergeOnRead.changesBetween]] read of the log (the q198/q222
    // CDC discipline — rid-netted, so an UPDATE surfaces as delete+insert
    // of the same id) then maintains the persisted binary index:
    // change='delete' → [[graft.operators.BinaryAnn.removeBatch]] (one
    // tombstone generation, no store read), change='insert' →
    // [[BinaryAnn.addBatch]] (one encode pass, appended at a HIGHER
    // generation, so the re-added row of an updated id outlives the
    // tombstone that killed its old row). The probe then equals a fresh
    // index of the post-DML live set — which is exactly what the oracle
    // replays (live-set CTE → shared sign/Hamming/rescore chain). At
    // 100 TB this is the production freshness loop: the index consumer
    // reads the LOG, not the table (O(changes) per sync, never a corpus
    // scan), and deletes never rewrite the store. */
    Qd("q389_cdc_index_maintenance", cdcBinaryOracleSql) { (s, dir) =>
      import graft.operators.{BinaryAnn, TxnMergeOnRead}
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val root = s"/root/repo/target/ddl/$sf/g389_txn"
      val idx = s"/root/repo/target/ddl/$sf/g389_bidx"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val e = emb(s, dir).select(col("id"), col("embedding"))
      TxnMergeOnRead.create(s, root, e.filter(col("id") % 2 === 0))
      val v0 = TxnMergeOnRead.currentVersion(s, root)
      BinaryAnn.buildIndex(TxnMergeOnRead.read(s, root), idx)
      TxnMergeOnRead.insert(s, root, e.filter(col("id") % 10 === 1))
      TxnMergeOnRead.delete(s, root, "id % 10 = 4")
      TxnMergeOnRead.update(s, root,
        Seq("embedding" -> "transform(embedding, x -> -x)"), "id % 10 = 6")
      val v1 = TxnMergeOnRead.currentVersion(s, root)
      // one CDC read feeds both halves; bounded (the churn's own rows)
      val ch = TxnMergeOnRead.changesBetween(s, root, v0, v1)
        .select("change", "id", "embedding").localCheckpoint(true)
      BinaryAnn.removeBatch(
        ch.filter(col("change") === "delete").select("id"), idx)
      BinaryAnn.addBatch(
        ch.filter(col("change") === "insert").select("id", "embedding"), idx)
      BinaryAnn.probeIndex(emb(s, dir).filter(col("id") < 50), idx,
          10, shortlist = 32)
        .select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
          col("hamming"), col("cos"))
        .orderBy("qid", "rk")
    },

    // INDEX-MAINTENANCE DML AS TEXT (r17 — q389's churn, re-run as five
    // SQL statements through [[graft.Engine.sql]]'s transparent routing):
    // CREATE a BINARY vector index over the bootstrap view, ALTER … ADD
    // the insert batch, ALTER … REMOVE the delete ids (one tombstone
    // generation), ALTER … ADD the updated rows (re-add outliving the
    // tombstone), ALTER … COMPACT (fold to one generation — results
    // unchanged by contract), then VECTOR TOPK. Same live set as q389, so
    // the oracle is the same live-set replay (minus the hamming column —
    // the TOPK surface returns (qid, cid, rk, cos)).
    Qd("q391_index_dml_sql",
        binaryHammingOracleOver(cdcLiveCorpusSql, withHamming = false)) {
        (s, dir) =>
      import graft.operators.IndexZooSql
      IndexZooSql.reset(s)
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val e = emb(s, dir).select(col("id"), col("embedding"))
      e.filter(col("id") % 2 === 0).createOrReplaceTempView("g391_base")
      e.filter(col("id") % 10 === 1).createOrReplaceTempView("g391_add")
      e.filter(col("id") % 10 === 4 || col("id") % 10 === 6)
        .select("id").createOrReplaceTempView("g391_rm")
      e.filter(col("id") % 10 === 6)
        .withColumn("embedding", expr("transform(embedding, x -> -x)"))
        .createOrReplaceTempView("g391_upd")
      e.filter(col("id") < 50).createOrReplaceTempView("g391_q")
      graft.Engine.sql(s, dir, "CREATE VECTOR INDEX g391_vi ON g391_base " +
        "(embedding) AS 'BINARY' OPTIONS " +
        s"(path='/root/repo/target/ddl/$sf/g391_vi')")
      graft.Engine.sql(s, dir, "ALTER VECTOR INDEX g391_vi ADD FROM g391_add")
      graft.Engine.sql(s, dir,
        "ALTER VECTOR INDEX g391_vi REMOVE FROM g391_rm")
      graft.Engine.sql(s, dir, "ALTER VECTOR INDEX g391_vi ADD FROM g391_upd")
      graft.Engine.sql(s, dir, "ALTER VECTOR INDEX g391_vi COMPACT")
      graft.Engine.sql(s, dir, "VECTOR TOPK ON g391_base (embedding) " +
          "QUERIES g391_q LIMIT 10 OPTIONS (shortlist=32)")
        .orderBy("qid", "rk")
    }
  )

  /** Shared DuckDB replay of the IVF-PQ pipeline (q348 one-shot, q354
    * incremental ingest — identical results by the frozen-book contract):
    * coarse assign → residual codebook → encode (incl. exact reconstructed
    * norm²) → probes → ADC → shortlist → exact rescore, all int64. */
  /** q361 oracle: rebuild the k-NN graph, then replay every beam round as
    * one chained CTE pair (candidates → top-ef re-select) — the q185
    * generation discipline applied to a graph walk. `ps` precomputes all
    * query×corpus exact cosines once (|q|·|corpus| rows), so each hop is a
    * pure join against it; scoring excludes qid = cid exactly as the
    * engine's selectBeam guard does. */
  private def graphBeamOracleSql(m: Int, ef: Int, hops: Int): String =
    graphBeamOracleSql(ef, hops,
      s"""gp AS (SELECT a.vec_id AS src, b.vec_id AS dst,
         |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i]*b.qe[i])) AS BIGINT) AS DOUBLE)
         |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
         |  FROM cn a, cn b WHERE a.vec_id <> b.vec_id),
         |g AS (SELECT src, dst FROM (SELECT src, dst,
         |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM gp)
         |  WHERE rn <= $m)""".stripMargin)

  /** Disk cache for DETERMINISTIC fixture graphs (VERDICT r15 task 4: the
    * q361–q367/q379–q381 bench bodies each rebuilt the same exact k-NN
    * graph in-query — ~48 s/round of redundant O(N²) builds). The cache
    * key embeds a fingerprint of the source parquet (size + mtime of
    * `embeddings.parquet`): the driver REGENERATES /root/testdata each
    * round, and a stale cached graph would silently diverge from the
    * oracle replay — a fingerprint miss rebuilds, so correctness never
    * depends on the cache. knnGraph is deterministic (spec-pinned), so a
    * hit is bit-identical to a rebuild; publish is tmp + atomic rename. */
  private[queries] def cachedGraph(s: SparkSession, dir: String, tag: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    // content-sensitive for BOTH layouts: a single parquet file keys on
    // its own (length, mtime); a parquet DIRECTORY keys on every part
    // file's (name, length, mtime) — a bare directory length() is a
    // constant (4096) and its mtime alone could survive a regeneration
    val sig =
      if (src.isDirectory)
        src.listFiles().sortBy(_.getName)
          .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
          .mkString("|")
      else s"${src.length}:${src.lastModified}"
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val sf = new java.io.File(dir).getName.replace(".", "_")
    val path = s"/root/repo/target/graphfix/${sf}_${tag}_$fp"
    this.synchronized {
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val tmp = s"$path.tmp_${java.util.UUID.randomUUID.toString.take(8)}"
        build.write.mode("overwrite").parquet(tmp)
        if (!new java.io.File(tmp).renameTo(new java.io.File(path))) {
          // lost a cross-JVM race: the published copy is bit-identical
          // (deterministic build) — drop ours
          val f = new org.apache.hadoop.fs.Path(tmp)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          f.delete(new org.apache.hadoop.fs.Path(tmp), true)
        }
      }
    }
    s.read.parquet(path)
  }

  /** The HNSW layer draw as SQL — `GroupSample.drawHash("lvl1", id) % 8 =
    * 0`, the q366 keyed-md5 level rule, parameterized by the id column. */
  private[queries] def lvlDrawSql(idCol: String): String =
    s"CAST(('0x' || substr(md5('lvl1:' || $idCol), 1, 15)) AS BIGINT) % 8 = 0"

  /** The pack's exact int64-quantized cosine between two `(qe, n2)` rows —
    * the fragment every graph oracle interpolates (q367's cosOf, shared). */
  private[queries] def cosSql(a: String, b: String): String =
    s"CAST(CAST(list_sum(list_transform(range(1, 65), i -> $a.qe[i]*$b.qe[i])) AS BIGINT) AS DOUBLE)" +
      s" / sqrt(CAST($a.n2 AS DOUBLE) * CAST($b.n2 AS DOUBLE))"

  /** The two-layer descent probe tail shared by the persisted-index
    * oracles (q379/q380/q381): upper walk (ef1=8, 2 hops) over `g1n` from
    * `entCte`, per-query seeded lower walk (ef=16, 2 hops) over `g0n`,
    * final top-10 — structurally q366's probe. `ps` must score qq × live
    * candidates excluding qid = cid. */
  private def hnswProbeTailSql(g1n: String, g0n: String, entCte: String,
      ps: String): String =
    s"""${beamWalkCtes("u", g1n, ps, entCte, 8, 2)},
       |${beamWalkCtesSeeded("", g0n, ps, "ub2", 16, 2)},
       |rk AS (SELECT qid, cid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
       |  FROM b2)
       |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
       |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** One beam walk as chained CTEs `{p}b0..{p}b$hops`: entry beam from
    * `ent(vec_id)`, per-round expansion over `g(src, dst)`, scores joined
    * from `ps(qid, cid, cos)` (which must exclude qid = cid, mirroring the
    * engine's selectBeam guard). Prefix `p` lets one statement chain two
    * independent walks (q363: insert walk + probe walk). */
  private[queries] def beamWalkCtes(p: String, g: String, ps: String, ent: String,
      ef: Int, hops: Int): String =
    beamWalkFrom(p, g, ps,
      s"FROM $ps x JOIN $ent e ON e.vec_id = x.cid", ef, hops)

  /** [[beamWalkCtes]] with a PER-QUERY seed table `(qid, cid)` instead of
    * a global entry set — the q366 hierarchy's layer descent (each
    * layer's final beam seeds the next layer's walk, mirroring
    * `GraphAnn.beamTopKSeeded`). */
  private[queries] def beamWalkCtesSeeded(p: String, g: String, ps: String,
      seed: String, ef: Int, hops: Int): String =
    beamWalkFrom(p, g, ps,
      s"FROM $seed s JOIN $ps x ON x.qid = s.qid AND x.cid = s.cid",
      ef, hops)

  private def beamWalkFrom(p: String, g: String, ps: String,
      b0From: String, ef: Int, hops: Int): String = {
    val b0 =
      s"""${p}b0 AS (SELECT qid, cid, cos FROM (
         |    SELECT x.qid, x.cid, x.cos,
         |      row_number() OVER (PARTITION BY x.qid ORDER BY x.cos DESC, x.cid) AS rn
         |    $b0From) WHERE rn <= $ef)""".stripMargin
    val hopCtes = (1 to hops).map { i =>
      s"""${p}c$i AS (SELECT DISTINCT qid, cid FROM (
         |    SELECT qid, cid FROM ${p}b${i - 1}
         |    UNION ALL SELECT b.qid, $g.dst FROM ${p}b${i - 1} b JOIN $g ON $g.src = b.cid)),
         |${p}b$i AS (SELECT qid, cid, cos FROM (
         |    SELECT x.qid, x.cid, x.cos,
         |      row_number() OVER (PARTITION BY x.qid ORDER BY x.cos DESC, x.cid) AS rn
         |    FROM ${p}c$i JOIN $ps x USING (qid, cid)) WHERE rn <= $ef)""".stripMargin
    }
    (b0 +: hopCtes).mkString(",\n")
  }

  /** Core of the q361/q362 oracles, parameterized by the graph-build CTE
    * fragment (must define `g(src, dst)`; may use `cn`). */
  private def graphBeamOracleSql(ef: Int, hops: Int,
      graphCtes: String): String =
    s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
       |${qCte("cc", "")},
       |cn AS (SELECT vec_id, qe,
       |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM cc),
       |qn AS (SELECT vec_id, qe,
       |  CAST(list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS BIGINT) AS n2 FROM qq),
       |$graphCtes,
       |ps AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.qe[i])) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(q.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) AS cos
       |  FROM qn q, cn c WHERE q.vec_id <> c.vec_id),
       |ent AS (SELECT vec_id FROM cc ORDER BY vec_id LIMIT $ef),
       |${beamWalkCtes("", "g", "ps", "ent", ef, hops)},
       |rk AS (SELECT qid, cid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
       |  FROM b$hops)
       |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
       |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  private def ivfPqOracleSql: String = ivfPqOracleSql("")

  /** `candFilter` — extra SQL appended to the candidate predicate (q359's
    * tombstone mask); empty for the q348/q354 one-shot/ingest replays. */
  private def ivfPqOracleSql(candFilter: String): String =
      s"""WITH ${qCte("qq", "WHERE vec_id < 50")},
        |${qCte("cc", "")},
        |cents AS (SELECT vec_id AS cent_id, qe AS ce FROM cc WHERE vec_id % 40 = 0),
        |ca AS (SELECT cid, cent_id FROM (
        |  SELECT cc.vec_id AS cid, cents.cent_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      CAST(list_sum(list_transform(range(1, 65), i -> cc.qe[i]*cents.ce[i])) AS BIGINT) DESC,
        |      cents.cent_id) AS rn
        |  FROM cc, cents) WHERE rn = 1),
        |cav AS (SELECT ca.cid, ca.cent_id, cents.ce FROM ca JOIN cents USING (cent_id)),
        |ms AS (SELECT unnest(range(0, 16)) AS mi),
        |pql AS (SELECT CAST(c.vec_id // 7 AS INT) AS j, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> c.qe[ms.mi*4 + i] - v.ce[ms.mi*4 + i]) AS cent
        |  FROM cc c JOIN cav v ON v.cid = c.vec_id, ms
        |  WHERE c.vec_id % 7 = 0 AND c.vec_id < 112),
        |csub AS (SELECT c.vec_id AS cid, v.cent_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> c.qe[ms.mi*4 + i] - v.ce[ms.mi*4 + i]) AS sub,
        |    list_transform(range(1, 5), i -> v.ce[ms.mi*4 + i]) AS csl
        |  FROM cc c JOIN cav v ON v.cid = c.vec_id, ms),
        |dist AS (SELECT s.cid, s.mi, b.j,
        |    list_sum(list_transform(range(1, 5),
        |      i -> (s.sub[i]-b.cent[i])*(s.sub[i]-b.cent[i]))) AS d2
        |  FROM csub s JOIN pql b ON b.mi = s.mi),
        |code AS (SELECT cid, mi, j FROM (
        |    SELECT cid, mi, j,
        |      row_number() OVER (PARTITION BY cid, mi ORDER BY d2, j) AS rn
        |    FROM dist) WHERE rn = 1),
        |rn2 AS (SELECT c.cid, SUM(list_sum(list_transform(range(1, 5),
        |      i -> (s.csl[i]+b.cent[i])*(s.csl[i]+b.cent[i])))) AS rn2
        |  FROM code c JOIN csub s ON s.cid = c.cid AND s.mi = c.mi
        |  JOIN pql b ON b.mi = c.mi AND b.j = c.j
        |  GROUP BY c.cid),
        |qn AS (SELECT vec_id,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS qn2
        |  FROM qq),
        |qa AS (SELECT qid, cent_id, dt FROM (
        |    SELECT qid, cent_id, dt,
        |      row_number() OVER (PARTITION BY qid ORDER BY dt DESC, cent_id) AS rn
        |    FROM (SELECT qq.vec_id AS qid, cents.cent_id,
        |        CAST(list_sum(list_transform(range(1, 65), i -> qq.qe[i]*cents.ce[i])) AS BIGINT) AS dt
        |      FROM qq, cents)) WHERE rn <= 4),
        |qsub AS (SELECT vec_id, ms.mi AS mi,
        |    list_transform(range(1, 5), i -> qe[ms.mi*4 + i]) AS sub
        |  FROM qq, ms),
        |lut AS (SELECT q.vec_id AS qid, q.mi, b.j,
        |    list_sum(list_transform(range(1, 5), i -> q.sub[i]*b.cent[i])) AS dt
        |  FROM qsub q JOIN pql b ON b.mi = q.mi),
        |prs AS (SELECT a.qid, c.cid, a.dt AS qdotc
        |  FROM qa a JOIN ca c ON c.cent_id = a.cent_id
        |  WHERE a.qid <> c.cid$candFilter),
        |adc AS (SELECT p.qid, p.cid, p.qdotc + SUM(l.dt) AS adcdot
        |  FROM prs p JOIN code c ON c.cid = p.cid
        |  JOIN lut l ON l.qid = p.qid AND l.mi = c.mi AND l.j = c.j
        |  GROUP BY p.qid, p.cid, p.qdotc),
        |appr AS (SELECT a.qid, a.cid,
        |    CASE WHEN CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE) = 0 THEN -1.0
        |      ELSE CAST(a.adcdot AS DOUBLE)
        |        / sqrt(CAST(q.qn2 AS DOUBLE)*CAST(r.rn2 AS DOUBLE)) END AS adc
        |  FROM adc a JOIN qn q ON q.vec_id = a.qid JOIN rn2 r ON r.cid = a.cid),
        |short AS (SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |    FROM appr) WHERE rn <= 64),
        |cn AS (SELECT vec_id AS cid, qe AS ce,
        |    list_sum(list_transform(range(1, 65), i -> qe[i]*qe[i])) AS cn2
        |  FROM cc),
        |sc AS (SELECT s.qid, s.cid,
        |    CAST(list_sum(list_transform(range(1, 65), i -> q.qe[i]*c.ce[i])) AS DOUBLE)
        |      / sqrt(CAST(qn.qn2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS cos
        |  FROM short s JOIN qq q ON q.vec_id = s.qid
        |  JOIN cn c ON c.cid = s.cid JOIN qn ON qn.vec_id = s.qid),
        |rk AS (SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM sc)
        |SELECT qid, cid, rk, ROUND(cos, 6) AS cos
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** DuckDB CTEs replaying [[graft.operators.PqAnn.lloydSubspaces]]
    * bit-exactly: per-subspace Lloyd rounds over a (vid, mi, sub) frame —
    * assignment = argmin-L2 (ties -> smaller j), update = per-coordinate
    * truncated integer mean, empty cells keep the previous centroid. The
    * final codebook is CTE `pq<iters>`; `init` must expose (mi, j, cent). */
  private def pqLloydCtes(iters: Int, init: String = "pq0",
      sub: String = "csub", ds: Int = 4): String = {
    val sb = new StringBuilder
    for (r <- 1 to iters) {
      val prev = if (r == 1) init else s"pq${r - 1}"
      if (r > 1) sb.append(",\n")
      sb.append(s"""pa$r AS (SELECT vid, mi, j FROM (
        |  SELECT s.vid, s.mi, b.j,
        |    row_number() OVER (PARTITION BY s.vid, s.mi ORDER BY
        |      list_sum(list_transform(range(1, ${ds + 1}),
        |        i -> (s.sub[i]-b.cent[i])*(s.sub[i]-b.cent[i]))), b.j) AS rn
        |  FROM $sub s JOIN $prev b ON b.mi = s.mi) WHERE rn = 1),
        |pm$r AS (SELECT mi, j, list(v ORDER BY i) AS cent FROM (
        |    SELECT a.mi, a.j, t.i,
        |      CAST(trunc(CAST(SUM(s.sub[t.i]) AS DOUBLE)/COUNT(*)) AS BIGINT) AS v
        |    FROM pa$r a JOIN $sub s ON s.vid = a.vid AND s.mi = a.mi,
        |         UNNEST(range(1, ${ds + 1})) AS t(i)
        |    GROUP BY a.mi, a.j, t.i) GROUP BY mi, j),
        |pq$r AS (SELECT mi, j, cent FROM pm$r
        |  UNION ALL SELECT p.mi, p.j, p.cent FROM $prev p
        |  WHERE NOT EXISTS (SELECT 1 FROM pm$r x
        |    WHERE x.mi = p.mi AND x.j = p.j))""".stripMargin)
    }
    sb.toString
  }
}

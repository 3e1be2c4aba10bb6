package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — greedy diversity-aware selection over an ANN shortlist, the
  * standard "don't return ten copies of the same document" stage of a
  * retrieval pipeline and the per-query analog of diverse training-data
  * sampling (pick examples that are relevant AND mutually dissimilar):
  *
  *   pick_1 = argmax_d  λ·rel(q, d)
  *   pick_i = argmax_{d ∉ S}  λ·rel(q, d) − μ·max_{s ∈ S} sim(d, s)
  *
  * Everything runs on the shared [[AnnSearch]] int64-quantized cosine, so
  * every rel/sim double is bit-identical across engines (exact integer
  * dot, one IEEE multiply/sqrt/divide chain) and the DuckDB oracle replays
  * candidate stage → pairwise sims → all k greedy rounds as chained
  * argmax CTEs (q369, the q185/q361 generation discipline). λ and μ are
  * SEPARATE parameters rather than λ and 1−λ: 1−0.7 in binary floating
  * point is 0.30000000000000004, and an oracle writing the literal 0.3
  * would diverge in the last ulp — both engines must multiply by the same
  * double, so both weights are spelled out.
  *
  * Ties (duplicate embeddings make exactly-equal scores common) break on
  * lower candidate id at every argmax — the family's total order.
  *
  * Scale shape: stage 1 is [[AnnSearch.bruteTopK]]'s broadcast-queries /
  * stream-corpus / bounded-heap plan (swap in any index probe — IVF,
  * graph — for the candidate source at production scale); stage 2 touches
  * only |queries| × nCand rows, grouped per query, each group's greedy
  * loop O(nCand·k) over vectors already in the group — no pairwise
  * materialization, no driver collect, parallel across queries. */
object Mmr {

  private def cosI64(a: Array[Long], an2: Long, b: Array[Long],
      bn2: Long): Double = {
    // the DotI64 contract: silent min-length truncation would turn a
    // malformed embedding into a plausible-but-wrong diversity penalty
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"mmr: dimension mismatch (${a.length} vs ${b.length})")
    var acc = 0L
    var i = 0
    val n = a.length
    while (i < n) { acc += a(i) * b(i); i += 1 }
    val denom = math.sqrt(an2.toDouble * bn2.toDouble)
    if (denom == 0.0d) -1.0d else acc.toDouble / denom
  }

  /** Greedy MMR top-`k` from the exact-cosine top-`nCand` shortlist.
    * Output: (qid, cid, pick ∈ 1..k, rel, score), score = the MMR
    * objective value at selection time (pick 1's score is λ·rel — no
    * diversity term exists yet). */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCand: Int,
      lam: Double = 0.7, mu: Double = 0.3): DataFrame = {
    require(nCand >= k, s"nCand=$nCand must cover k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = AnnSearch.quantized(queries).select(col("id").as("qid"),
      col("qe"), col("n2").as("qn"))
    val c = AnnSearch.quantized(corpus).select(col("id").as("cid"),
      col("qe").as("ce"), col("n2").as("cn"))
    // stage 1: exact-cosine candidates, the bruteTopK plan (broadcast
    // queries, one corpus scan, bounded heaps, (rel desc, cid) rank)
    val rel = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", coalesce(
        AnnSearch.dotI64(col("qe"), col("ce")).cast("double") /
          sqrt(col("qn").cast("double") * col("cn").cast("double")),
        lit(-1.0)))
      .select("qid", "cid", "cos")
    val cand = AnnSearch.partitionTopK(rel, nCand)
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rn") <= nCand)
      .select(col("qid"), col("cid"), col("cos").as("rel"))
    // stage 2: fetch candidate vectors (|queries| × nCand rows), greedy
    // select per query group — bounded O(nCand·k) work per group
    greedySelect(cand.join(c, "cid"), k, lam, mu)
  }

  /** MMR over CALLER-SUPPLIED candidates — the hybrid-retrieval tail
    * (VERDICT r15 task 8's RAG composition): `cands` is a bounded ranked
    * list (query_id, doc_id, rel_micro) whose relevance came from an
    * upstream fusion (e.g. [[Retrieval.rrfFuse]]'s rrf_micro) in the
    * pack's integer micro-units; it scales into the λ·rel − μ·sim
    * objective by ONE exact-input IEEE division (rel_micro / 1e6 — the
    * bm25 score convention), and similarities are the exact int64 cosine
    * over `emb` (id, embedding). Candidates without an embedding row drop
    * out on the inner join (the q192 hybrid-retrieval discipline — both
    * engines replay the same drop). Output (query_id, doc_id, pick, rel,
    * score), the [[mmrTopK]] shape re-keyed to the retrieval family's
    * column names. */
  def mmrRerank(cands: DataFrame, emb: DataFrame, k: Int,
      lam: Double = 0.7, mu: Double = 0.3): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val c = AnnSearch.quantized(emb).select(col("id").as("cid"),
      col("qe").as("ce"), col("n2").as("cn"))
    val cd = cands.select(col("query_id").cast("long").as("qid"),
      col("doc_id").cast("long").as("cid"),
      (col("rel_micro").cast("double") / lit(1000000.0)).as("rel"))
    // the candidate list is bounded (top-N per query) — broadcast it so
    // the embedding fetch streams without shuffling
    greedySelect(c.join(broadcast(cd), "cid"), k, lam, mu)
      .select(col("qid").as("query_id"), col("cid").as("doc_id"),
        col("pick"), col("rel"), col("score"))
  }

  /** The greedy argmax rounds, shared by [[mmrTopK]] and [[mmrRerank]]:
    * `withVecs` = (qid, cid, rel, ce, cn) candidate rows with their
    * quantized vectors; per query group the selection is O(n·k) with the
    * family tie-break (equal scores → lower cid). */
  private def greedySelect(withVecs: DataFrame, k: Int, lam: Double,
      mu: Double): DataFrame = {
    val spark = withVecs.sparkSession
    import spark.implicits._
    withVecs
      .select(col("qid"), col("cid"), col("rel"), col("ce"), col("cn"))
      .as[(Long, Long, Double, Seq[Long], Long)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val rows = it.map { case (_, cid, r, ce, cn) =>
          (cid, r, ce.toArray, cn)
        }.toArray
        val n = rows.length
        val taken = new Array[Boolean](n)
        val sel = new Array[Int](math.min(k, n))
        val out = Array.newBuilder[(Long, Long, Int, Double, Double)]
        var pick = 0
        while (pick < math.min(k, n)) {
          var best = -1
          var bestScore = 0.0d
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val score =
                if (pick == 0) lam * rows(i)._2
                else {
                  var dv = Double.NegativeInfinity
                  var j = 0
                  while (j < pick) {
                    val s = rows(sel(j))
                    val pcos = cosI64(rows(i)._3, rows(i)._4, s._3, s._4)
                    if (pcos > dv) dv = pcos
                    j += 1
                  }
                  lam * rows(i)._2 - mu * dv
                }
              // argmax with the family tie-break: lower cid wins equals
              if (best < 0 || score > bestScore ||
                  (score == bestScore && rows(i)._1 < rows(best)._1))  {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          taken(best) = true
          sel(pick) = best
          out += ((qid, rows(best)._1, pick + 1, rows(best)._2, bestScore))
          pick += 1
        }
        out.result().iterator
      }
      .toDF("qid", "cid", "pick", "rel", "score")
      .select(col("qid"), col("cid"), col("pick").cast("bigint").as("pick"),
        round(col("rel"), 6).as("rel"), round(col("score"), 6).as("score"))
  }
}

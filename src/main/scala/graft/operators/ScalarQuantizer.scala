package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained per-dimension scalar quantization (SQ8) with asymmetric-distance
  * search — the FAISS `IndexScalarQuantizer(QT_8bit)` analog, filling the
  * codec gap between [[Int8Quantize]] (per-VECTOR symmetric max-abs, no
  * training) and [[PqAnn]] (per-SUBSPACE codebooks): SQ8 TRAINS a per-
  * dimension affine range `[lo_d, hi_d]` over a sample, freezes it, and
  * encodes every vector as one byte per dimension on that trained grid.
  * Versus Int8Quantize it adapts to each dimension's actual distribution
  * (a dimension spanning [0.01, 0.02] gets all 256 levels inside that
  * band instead of sharing one vector-wide scale); versus PQ it keeps
  * per-dimension addressability (no subspace structure to tune).
  *
  * All arithmetic is int64 over the exact 1e6-quantized embeddings (the
  * q45/q347 discipline), so the DuckDB oracle replays train → encode →
  * ADC → shortlist → exact rescore bit-identically:
  *
  *   - train:  lo_d = min(v_d), hi_d = max(v_d) over the train frame
  *             (O(dim) values — per-partition fold + driver merge, the
  *             KMeansModel.clusterCenters bounded-collect contract)
  *   - encode: code_d = ⌊(v_d − lo_d)·255 / (hi_d − lo_d)⌋ ∈ [0, 255]
  *             (span 0 → code 0); stored as one BYTE (offset −128), so a
  *             64-dim int64 frame becomes 64 bytes/vector — 8× smaller at
  *             rest, the page-cache lever at 100 TB
  *   - ADC:    reconstruction is kept 255×-scaled to stay integral:
  *             recon_d = lo_d·255 + code_d·(hi_d − lo_d) = 255·x̂_d, so
  *             approx = Σ_d q_d·recon_d = 255·dot(q, x̂) and
  *             cos(q, x̂) = approx / sqrt(qn²·Σ recon_d²) — the 255s
  *             cancel and every term is exact int64 (|recon| ≤ 255·|v|max,
  *             Σ recon² ≤ 64·(255·5.3e5)² ≈ 1.2e18 < 2⁶³ on the 1e6-grid).
  *             Each task builds per-query lookup tables
  *             lut(d)(code) = q_d·recon_d(code) once (dim×256 longs), then
  *             scoring a row is `dim` table adds — the [[PqAnn]] ADC trick
  *             applied per dimension. Shuffle-free; bounded heaps
  *             ([[AnnSearch.partitionTopK]]) keep the score matrix from
  *             materializing.
  *   - exact rescore: the shortlist joins back to the true vectors; the
  *             approximation decides WHO is rescored, never the reported
  *             score ((cos desc, cid) total order, 6-dp rounding).
  *
  * With `shortlist >= |corpus|` this degenerates to
  * [[AnnSearch.bruteTopK]] exactly (spec-asserted) — the quantizer only
  * prunes candidates.
  *
  * The reference engine has no ANN/codec surface — this extends the
  * training-data pipeline pack (SURVEY.md §7 step 9).
  */
object ScalarQuantizer {

  /** Per-dimension trained range; `span(d) = hi(d) − lo(d)`. O(dim). */
  private[operators] final case class SqStats(lo: Array[Long], hi: Array[Long]) {
    def dim: Int = lo.length
    def span(d: Int): Long = hi(d) - lo(d)
    /** 255×-scaled reconstruction of one code in dimension `d`. */
    def recon(d: Int, code: Int): Long = lo(d) * 255L + code.toLong * span(d)
  }

  /** Train the per-dimension ranges over `train` (usually the corpus or a
    * sample of it): one compiled fold per partition emitting a single
    * (lo[], hi[]) pair, merged on the driver — O(partitions × dim)
    * collected, never row data. */
  private[operators] def trainStats(train: DataFrame): SqStats = {
    val spark = train.sparkSession
    import spark.implicits._
    val parts = AnnSearch.quantized(train)
      .select(col("qe")).as[Seq[Long]]
      .mapPartitions { it =>
        var lo: Array[Long] = null
        var hi: Array[Long] = null
        it.foreach { e =>
          if (lo == null) { lo = e.toArray.clone(); hi = e.toArray.clone() }
          else {
            var d = 0
            while (d < lo.length) {
              val v = e(d)
              if (v < lo(d)) lo(d) = v
              if (v > hi(d)) hi(d) = v
              d += 1
            }
          }
        }
        if (lo == null) Iterator.empty
        else Iterator.single((lo.toSeq, hi.toSeq))
      }.collect()
    require(parts.nonEmpty, "SQ8 training frame is empty — an untrained " +
      "codec would encode every vector to code 0")
    val lo = parts.head._1.toArray.clone()
    val hi = parts.head._2.toArray.clone()
    parts.iterator.drop(1).foreach { case (l, h) =>
      var d = 0
      while (d < lo.length) {
        if (l(d) < lo(d)) lo(d) = l(d)
        if (h(d) > hi(d)) hi(d) = h(d)
        d += 1
      }
    }
    SqStats(lo, hi)
  }

  /** Encode against frozen stats: (cid, codes BINARY offset −128, rn2num =
    * Σ recon²). One narrow compiled pass, no shuffle; codes are 1 byte/dim.
    * Floor quantization on a non-negative numerator, so Scala `/` (truncate
    * toward zero) and the oracle's `//` (floor) agree exactly. */
  private def encodeAll(cc: DataFrame,
      stats: Broadcast[SqStats]): DataFrame = {
    val spark = cc.sparkSession
    import spark.implicits._
    cc.as[(Long, Seq[Long], Long)].mapPartitions { it =>
      val st = stats.value
      it.map { case (id, e, _) =>
        val codes = new Array[Byte](st.dim)
        var rn2 = 0L
        var d = 0
        while (d < st.dim) {
          val span = st.span(d)
          val code =
            if (span == 0L) 0
            else (((e(d) - st.lo(d)) * 255L) / span).toInt
          codes(d) = (code - 128).toByte
          val r = st.recon(d, code)
          rn2 += r * r
          d += 1
        }
        (id, codes, rn2)
      }
    }.toDF("cid", "codes", "rn2num")
  }

  /** SQ8 top-k with exact rescore. `queries`/`corpus`: (id, embedding);
    * ranges train on `trainOn` (default: the corpus itself — FAISS's
    * `index.train(xb)` one-shot shape; pass a sample for the train-once
    * path). */
  def sqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int = 64, trainOn: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cc = AnnSearch.quantized(corpus)
    val stats = spark.sparkContext.broadcast(
      trainStats(trainOn.getOrElse(corpus)))
    // probe batch: broadcast-bounded, the bruteTopK broadcast(q) contract
    val qArr = AnnSearch.quantized(queries)
      .select(col("id"), col("qe"), col("n2")).as[(Long, Seq[Long], Long)]
      .collect().map { case (id, e, n2) => (id, e.toArray, n2) }
    val bq = spark.sparkContext.broadcast(qArr)

    val approxScored = encodeAll(cc, stats).as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        val st = stats.value
        val qs = bq.value
        // per-query ADC tables, built once per task: lut(d)(code) =
        // q_d · recon_d(code) — dim×256 longs per query
        val luts = qs.map { case (_, qv, _) =>
          Array.tabulate(st.dim, 256)((d, code) => qv(d) * st.recon(d, code))
        }
        it.flatMap { case (cid, codes, rn2) =>
          qs.iterator.zipWithIndex.collect {
            case ((qid, _, qn2), qi) if qid != cid =>
              val lut = luts(qi)
              var adc = 0L
              var d = 0
              while (d < st.dim) {
                adc += lut(d)(codes(d).toInt + 128); d += 1
              }
              val denom = math.sqrt(qn2.toDouble * rn2.toDouble)
              val score = if (denom == 0.0d) -1.0d else adc.toDouble / denom
              (qid, cid, score)
          }
        }
      }
      .toDF("qid", "cid", "cos")
    val short = AnnSearch.partitionTopK(approxScored, shortlist)
      .groupBy("qid", "cid").agg(max("cos").as("adc")) // merge partition heaps
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("adc").desc, col("cid"))))
      .filter(col("rn") <= shortlist)
      .select("qid", "cid")

    // exact rescore of the shortlist only
    val qq = AnnSearch.quantized(queries)
    val scored = short
      .join(cc.select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn")), "cid")
      .join(broadcast(qq.select(col("id").as("qid"), col("qe"), col("n2").as("qn"))), "qid")
      .withColumn("cos", coalesce(
        AnnSearch.dotI64(col("qe"), col("ce")).cast("double") /
          sqrt(col("qn").cast("double") * col("cn").cast("double")), lit(-1.0)))
    AnnSearch.rankTopK(scored, k)
  }
}

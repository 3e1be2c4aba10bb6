package graft.operators

import graft.functions.DotI8
import org.apache.spark.sql.graftshim.{ColumnBridge => CB}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage-compression path for a 100 TB
  * vector corpus. A float32 embedding column is 4 bytes/dim; symmetric
  * per-vector max-abs quantization stores 1 byte/dim codes plus one float64
  * scale, a 4× cut that compounds with parquet byte-array encodings. The
  * reference ships no vector types at all — this extends the training-data
  * pipeline pack (SURVEY.md §7 step 9) alongside [[AnnSearch]].
  *
  * Scheme (the classic symmetric scheme used by faiss `SQ8`/GGML-style
  * quantizers, re-expressed for a columnar engine):
  *
  *   scale   = max_i |x_i| / 127          (float64, one per vector)
  *   code_i  = round(x_i / scale) ∈ [-127, 127]   (int8; 0 if scale = 0)
  *   x̂_i    = code_i · scale              (dequantize; |x̂_i − x_i| ≤ scale/2)
  *
  * Search never dequantizes: per-vector scales CANCEL in cosine —
  * cos(x̂, ŷ) = (s_x s_y Σ c_i d_i)/(s_x‖c‖ · s_y‖d‖) = Σ c_i d_i /(‖c‖‖d‖)
  * — so scoring is a pure integer dot over the 1-byte codes (the codegen'd
  * [[graft.functions.DotI8]] kernel: 8× less memory traffic than the int64
  * path, the difference between a scan that fits the page cache and one that
  * doesn't at corpus scale).
  *
  * Determinism: scale is exact IEEE (max of exact float→double values, one
  * division); codes use SQL ROUND semantics (HALF_UP on the exact double
  * quotient) — both reproducible in DuckDB, so the quantization itself is
  * oracle-checkable (q178) and so is the int8 search (q179).
  *
  * All per-vector work happens in compiled typed-map passes (hard optimizer
  * boundary — see [[TextFeatures]] for why staged arrays must not feed
  * Catalyst HOF lambdas).
  */
object Int8Quantize {

  def dotI8(a: Column, b: Column): Column =
    CB.column(DotI8(CB.expression(a), CB.expression(b)))

  /** (scale, codes) for one vector; zero vector → (0.0, all-zero codes).
    * |x_i/scale| ≤ 127·(1+ε) so the rounded code always fits int8. */
  private[graft] def encodeRow(e: Seq[Float]): (Double, Array[Byte]) = {
    var maxAbs = 0.0
    var i = 0
    while (i < e.length) {
      val a = math.abs(e(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val codes = new Array[Byte](e.length)
    if (scale != 0.0) {
      i = 0
      while (i < e.length) {
        codes(i) = BigDecimal(e(i).toDouble / scale)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toByte
        i += 1
      }
    }
    (scale, codes)
  }

  /** Encode (id, embedding) → (id, scale, codes, n2) where `codes` is the
    * int8 vector as `binary` and n2 = Σ code², the norm reused by every
    * scoring call (computed once at write time, not per candidate pair). */
  def encode(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, e) =>
        val (scale, codes) = encodeRow(e)
        var n2 = 0L
        var i = 0
        while (i < codes.length) { n2 += codes(i).toLong * codes(i).toLong; i += 1 }
        (id, scale, codes, n2)
      })
      .toDF("id", "scale", "codes", "n2")
  }

  /** Per-vector quantization report (the oracle-checkable surface): scale,
    * stored bytes (codes + one float64 scale), and integer code checksums.
    * Everything except `scale` is exact integer arithmetic; `scale` is one
    * exact IEEE division, rounded only for display. */
  def stats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, e) =>
        val (scale, codes) = encodeRow(e)
        var sum = 0L; var n2 = 0L; var mx = 0L
        var i = 0
        while (i < codes.length) {
          val c = codes(i).toLong
          sum += c; n2 += c * c
          val a = math.abs(c)
          if (a > mx) mx = a
          i += 1
        }
        (id, scale, codes.length.toLong + 8L, sum, n2, mx)
      })
      .toDF("vec_id", "raw_scale", "n_bytes", "code_sum", "code_norm2", "code_max")
      .select(col("vec_id"), round(col("raw_scale"), 6).as("scale"),
        col("n_bytes"), col("code_sum"), col("code_norm2"), col("code_max"))
  }

  /** Int8 cosine: integer code dot over ‖codes‖ — the per-vector scales have
    * already cancelled (object scaladoc). Zero-norm side scores −1.0 (ranks
    * last) rather than NULL-crashing the heap decode, matching
    * [[AnnSearch.bruteTopK]]'s degenerate-vector contract. */
  private def cosExpr: Column =
    coalesce(dotI8(col("qc"), col("cc")).cast("double") /
      sqrt(col("qn").cast("double") * col("cn").cast("double")), lit(-1.0))

  /** Exact top-k under the int8 metric, deterministic tie-break on candidate
    * id. Same scale shape as [[AnnSearch.bruteTopK]]: the query codes
    * broadcast (k × dim BYTES — 8× smaller than the int64 path), the corpus
    * codes stream through one scan, and candidates reduce through the
    * partition-local bounded heaps before the global rank. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = encode(queries).select(col("id").as("qid"),
      col("codes").as("qc"), col("n2").as("qn"))
    val c = encode(corpus).select(col("id").as("cid"),
      col("codes").as("cc"), col("n2").as("cn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", cosExpr)
    AnnSearch.rankTopK(scored, k)
  }
}

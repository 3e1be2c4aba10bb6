package graft.operators

import graft.functions.{DotF32, DotI64}
import org.apache.spark.sql.graftshim.{ColumnBridge => CB}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `array<float>` embedding column — the
  * training-pipeline extension ops (SURVEY.md §7 step 9). Two paths:
  *
  *  - `bruteTopK`: exact cosine top-k of every query vector against the whole
  *    corpus. Uses *quantized integer* arithmetic (round(x*1e6) per element,
  *    int64 dot products via the codegen'd [[graft.functions.DotI64]]) so the
  *    result is bit-identical across engines — the oracle-checkable baseline.
  *    The query set is broadcast; the corpus streams — at 100 TB the corpus
  *    side never shuffles and the work is one scan + a per-query top-k.
  *
  *  - `ivfTopK`: IVF-style two-stage search. A deterministic centroid subset
  *    partitions the corpus into `nlist` inverted lists (cluster assignment =
  *    argmax dot against broadcast centroids); a query probes its `nprobe`
  *    closest centroids and scans only those lists. This is the 100 TB path:
  *    the corpus is written partitioned by cluster id, so a probe is a
  *    partition-pruned scan of nprobe/nlist of the data. Scoring uses the
  *    codegen'd native [[graft.functions.DotF32]] expression.
  *
  * Quantization happens in a compiled typed-map stage (hard optimizer
  * boundary — see [[TextFeatures]] for why staged arrays must not feed
  * Catalyst HOF lambdas).
  */
object AnnSearch {

  def dotF32(a: Column, b: Column): Column =
    CB.column(DotF32(CB.expression(a), CB.expression(b)))

  def dotI64(a: Column, b: Column): Column =
    CB.column(DotI64(CB.expression(a), CB.expression(b)))

  /** round(x*1e6) with SQL ROUND semantics (BigDecimal HALF_UP on the
    * double product) — matches Spark `round` and DuckDB `round` exactly;
    * products fit int64 (|x| < 100). */
  private def quantizeRow(e: Seq[Float]): Array[Long] = {
    val out = new Array[Long](e.length)
    var i = 0
    while (i < e.length) {
      out(i) = BigDecimal(e(i).toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      i += 1
    }
    out
  }

  /** (id, qe, n2): quantized embedding + its squared norm, one compiled map
    * pass over (id, embedding). */
  private def quantized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, e) =>
        val q = quantizeRow(e)
        var n2 = 0L
        var i = 0
        while (i < q.length) { n2 += q(i) * q(i); i += 1 }
        (id, q, n2)
      })
      .toDF("id", "qe", "n2")
  }

  /** Exact cosine top-k, deterministic tie-break on candidate id.
    * `queries`/`corpus` need (id, embedding) columns. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = quantized(queries).select(col("id").as("qid"),
      col("qe"), col("n2").as("qn"))
    val c = quantized(corpus).select(col("id").as("cid"),
      col("qe").as("ce"), col("n2").as("cn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", dotI64(col("qe"), col("ce")).cast("double") /
        sqrt(col("qn").cast("double") * col("cn").cast("double")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  /** IVF two-stage ANN. Centroids = corpus rows where id % stride == 0
    * (deterministic stand-in for a k-means pass — centroid *choice* is
    * orthogonal to the search plan). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidStride: Int, nprobe: Int): DataFrame = {
    val cents = broadcast(
      corpus.filter(col("id") % centroidStride === 0)
        .select(col("id").as("cent_id"), col("embedding").as("cent_e")))

    def assign(df: DataFrame, idCol: String, eCol: String, keep: Int) =
      df.crossJoin(cents)
        .withColumn("crk", row_number().over(
          Window.partitionBy(idCol)
            .orderBy(dotF32(col(eCol), col("cent_e")).desc, col("cent_id"))))
        .filter(col("crk") <= keep)

    val corpusAssigned = assign(
      corpus.select(col("id").as("cid"), col("embedding").as("ce")),
      "cid", "ce", 1).select(col("cid"), col("ce"), col("cent_id"))
    val queryProbes = assign(
      queries.select(col("id").as("qid"), col("embedding").as("qe")),
      "qid", "qe", nprobe).select(col("qid"), col("qe"), col("cent_id"))

    val norm = (c: Column) => sqrt(dotF32(c, c))
    queryProbes.join(corpusAssigned, Seq("cent_id"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", dotF32(col("qe"), col("ce")) / (norm(col("qe")) * norm(col("ce"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  /** Embedding-level near-duplicate pairs within a blocking key: cosine >=
    * `threshold` (quantized math — oracle-exact). */
  def cosineNearDupPairs(emb: DataFrame, blockCol: String,
      threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("id"), col(blockCol).cast("string").as("blk"),
        col("embedding"))
      .as[(Long, String, Seq[Float])]
      .mapPartitions(_.map { case (id, blk, e) =>
        val q = quantizeRow(e)
        var n2 = 0L
        var i = 0
        while (i < q.length) { n2 += q(i) * q(i); i += 1 }
        (id, blk, q, n2)
      })
      .toDF("id", "blk", "qe", "n2")
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cos", dotI64(col("a.qe"), col("b.qe")).cast("double") /
        sqrt(col("a.n2").cast("double") * col("b.n2").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        round(col("cos"), 6).as("cos"))
  }
}

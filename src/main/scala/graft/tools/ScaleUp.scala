package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** Scale-up data generator for the SURVEY §6 scaling experiments.
  *
  * Replicates the driver's sf parquet tables ×N with per-replica key offsets
  * so join selectivity is preserved: replica i of lineitem joins replica i of
  * orders and nobody else, exactly as TPC-H dbgen would produce at a larger
  * scale factor. Offsets are consistent across tables (the l_orderkey stride
  * equals the o_orderkey stride, etc.), so every foreign key resolves and
  * every query's output grows ~linearly with N while per-key group sizes stay
  * constant — the shape a genuinely larger SF has, as opposed to naive
  * concatenation which multiplies group sizes and join fan-out instead.
  *
  * Small dimensions (nation, region) are copied unchanged: a bigger
  * warehouse still has 25 nations. The events table is replicated with
  * OFFSET user and event keys and UNTOUCHED timestamps — each replica is a
  * fresh population of users whose per-user series are byte-identical to
  * the originals, so ×N means N× more keys at constant per-key depth
  * (exactly how a larger deployment grows) and the time-series operators
  * (as-of join, range join, gap fill) scale in key count, not in window
  * or fan-out size.
  *
  * The documents/embeddings tables ARE replicated as exact copies under new
  * ids — deliberately: that models a crawl with duplication factor N, the
  * adversarial case for the near-dup operators (pair output grows ~C(N,2) per
  * original cluster; SURVEY §6 discusses why runtime should track output
  * size, not input size).
  *
  * Usage: SPARK_GRAFT_SRC_DIR=/root/testdata/sf0.1 \
  *        SPARK_GRAFT_OUT_DIR=/tmp/graft_scale64 \
  *        SPARK_GRAFT_FACTOR=64 sbt "runMain graft.tools.ScaleUp"
  */
object ScaleUp {

  /** One replicated table: explode a 0..n-1 replica index per row, shift each
    * key column by replica*stride. The explode keeps this a single scan; the
    * repartition spreads the ×N write across the cluster (and yields enough
    * files for parallel read-back). */
  private def replicate(spark: SparkSession, src: String, out: String,
      name: String, factor: Int, keyStrides: Map[String, Long],
      outParts: Int): Unit = {
    val df = spark.read.parquet(s"$src/$name.parquet")
    val exploded = df
      .withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
    val shifted = keyStrides.foldLeft(exploded) { case (d, (key, stride)) =>
      // keep the column's original type (int64 keys throughout the testdata)
      d.withColumn(key, (col(key) + col("__rep") * lit(stride)).cast("long"))
    }
    shifted.drop("__rep")
      .repartition(outParts)
      .write.mode("overwrite").parquet(s"$out/$name.parquet")
    System.err.println(s"[scaleup] $name ×$factor -> $out/$name.parquet")
  }

  private def copyAsIs(spark: SparkSession, src: String, out: String,
      name: String): Unit = {
    spark.read.parquet(s"$src/$name.parquet")
      .write.mode("overwrite").parquet(s"$out/$name.parquet")
    System.err.println(s"[scaleup] $name copied unchanged")
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "/tmp/graft_scale64")
    val factor = sys.env.getOrElse("SPARK_GRAFT_FACTOR", "64").toInt
    val spark = Engine.session(appName = "graft-scaleup")
    try {
      // one stride per key family, shared by every table that carries the
      // key — max+1 guarantees replicas never collide
      def stride(table: String, col0: String): Long =
        spark.read.parquet(s"$src/$table.parquet")
          .agg(max(col(col0))).head.getLong(0) + 1L
      val orderS = stride("orders", "o_orderkey")
      val custS = stride("customer", "c_custkey")
      val partS = stride("part", "p_partkey")
      val suppS = stride("supplier", "s_suppkey")
      val docS = stride("documents", "doc_id")
      val vecS = stride("embeddings", "vec_id")
      val userS = stride("events", "user_id")
      val eventS = stride("events", "event_id")

      // output partitions sized so each holds a few tens of MB at ×64
      val big = math.max(32, factor / 2)
      replicate(spark, src, out, "lineitem", factor,
        Map("l_orderkey" -> orderS, "l_partkey" -> partS, "l_suppkey" -> suppS), big)
      replicate(spark, src, out, "orders", factor,
        Map("o_orderkey" -> orderS, "o_custkey" -> custS), big)
      replicate(spark, src, out, "customer", factor, Map("c_custkey" -> custS), 32)
      replicate(spark, src, out, "part", factor, Map("p_partkey" -> partS), 32)
      replicate(spark, src, out, "supplier", factor, Map("s_suppkey" -> suppS), 8)
      replicate(spark, src, out, "documents", factor, Map("doc_id" -> docS), 32)
      replicate(spark, src, out, "embeddings", factor, Map("vec_id" -> vecS), 32)
      replicate(spark, src, out, "events", factor,
        Map("event_id" -> eventS, "user_id" -> userS), 32)
      copyAsIs(spark, src, out, "nation")
      copyAsIs(spark, src, out, "region")
    } finally spark.stop()
  }
}

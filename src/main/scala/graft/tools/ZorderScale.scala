package graft.tools

import graft.Engine
import graft.operators.{TxnMergeOnRead, ZOrder}
import org.apache.spark.sql.functions._

/** SURVEY §6 scale evidence for z-order clustering (round 10): a 2-D
  * selective slice against the SAME table in three layouts — as-ingested,
  * sorted by the leading filter column only, and z-ordered on both filter
  * columns. The claim: the z layout answers slices on EITHER dimension by
  * skipping most files on parquet footer stats (row-group pruning), where
  * the single-sort layout only helps its leading column and the raw
  * layout helps neither. Reported: per-layout slice wall (best-of-3) for
  * an x-slice and a y-slice, plus the stats-hit fraction (files whose
  * [min,max] intersects the slice — what a pruning reader must touch).
  *
  * The experiment table is sf0.1 lineitem replicated ×64 shifting ONLY
  * the order key: the filter dimensions (partkey, suppkey) keep their
  * original domains and their TPC-H independence — the ScaleUp tables
  * shift every key family per replica, which CORRELATES pk and sk across
  * replicas and would gift the single-sort layout artificial skipping on
  * the non-leading column.
  *
  * Usage: SPARK_GRAFT_BASE_DIR=<sfdir> sbt "runMain graft.tools.ZorderScale"
  */
object ZorderScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_FACTOR", "64").toInt
    val s = Engine.session(cores = 32, appName = "graft-zorderscale")
    val tag = new java.io.File(dir).getName
    val out = s"/tmp/graft_zorder_$tag"
    val f = new java.io.File(out)
    org.apache.commons.io.FileUtils.deleteQuietly(f)

    val base = Engine.table(s, dir, "lineitem").select(
      col("l_orderkey").cast("bigint").as("ok"),
      col("l_partkey").cast("bigint").as("pk"),
      col("l_suppkey").cast("bigint").as("sk"),
      col("l_quantity").cast("double").as("qty"),
      col("l_extendedprice").cast("double").as("price"))
    val okStride = base.agg(max("ok")).head.getLong(0) + 1L
    val li = base
      .withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
      .withColumn("ok", col("ok") + col("__rep") * okStride)
      .drop("__rep")
    val files = 64
    li.repartition(files).write.parquet(s"$out/raw")
    li.repartitionByRange(files, col("pk")).sortWithinPartitions("pk")
      .write.parquet(s"$out/pksort")
    ZOrder.cluster(li, Seq("pk", "sk"), files).write.parquet(s"$out/zorder")

    val pkMax = li.agg(max("pk")).head.getLong(0)
    val skMax = li.agg(max("sk")).head.getLong(0)
    // ~2% slice on each dimension
    def pkSlice = (pkMax / 2, pkMax / 2 + math.max(1L, pkMax / 50))
    def skSlice = (skMax / 2, skMax / 2 + math.max(1L, skMax / 50))

    def best3(work: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }.min

    def hitFrac(path: String, c: String, lo: Long, hi: Long): Double = {
      val r = s.read.parquet(path).groupBy(input_file_name())
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).collect()
      r.count(x => x.getLong(1) <= hi && lo <= x.getLong(2)).toDouble / r.length
    }

    Seq("raw", "pksort", "zorder").foreach { layout =>
      val p = s"$out/$layout"
      val (plo, phi) = pkSlice
      val (slo, shi) = skSlice
      val wx = best3(s.read.parquet(p)
        .filter(col("pk").between(plo, phi))
        .agg(count(lit(1)), sum("qty")).collect())
      val wy = best3(s.read.parquet(p)
        .filter(col("sk").between(slo, shi))
        .agg(count(lit(1)), sum("qty")).collect())
      val hx = hitFrac(p, "pk", plo, phi)
      val hy = hitFrac(p, "sk", slo, shi)
      println(f"[zorderscale] $layout%-7s pk-slice wall=$wx%.2fs statsHit=$hx%.2f" +
        f" | sk-slice wall=$wy%.2fs statsHit=$hy%.2f")
    }
    println(s"[zorderscale] dir=$dir rows=${li.count()} files=$files " +
      s"(statsHit = fraction of files a footer-pruning reader must touch)")
    s.stop()
  }
}

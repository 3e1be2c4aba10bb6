package graft.tools

import graft.Engine
import graft.queries.TpcdsLite
import org.apache.spark.sql.functions.col

/** SURVEY §6 scale evidence for the TPC-DS sample (q265, the DPP shape):
  * the star join at ×16 fact rows (1.92M, same closed-form columns so
  * selectivities and the date-partition layout hold), dynamic partition
  * pruning ON vs OFF, best-of-2 each. The claim under test: with the fact
  * partitioned on the date key, the d_moy=12 filter prunes the scan to
  * the matching ~1/12 of partition directories at ANY scale — the query's
  * cost grows with the SELECTED slice, not the table, which is the whole
  * 100 TB star-schema story.
  *
  * Usage: `sbt "runMain graft.tools.TpcdsScale"` (writes ×16 scratch to
  * /tmp/graft_tpcds_x16 on first run).
  */
object TpcdsScale {

  private val q3 =
    """SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sum_agg
      |FROM date_dim dt, store_sales, item
      |WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      |  AND store_sales.ss_item_sk = item.i_item_sk
      |  AND item.i_manufact_id = 7
      |  AND dt.d_moy = 12
      |GROUP BY dt.d_year, item.i_brand, item.i_brand_id
      |ORDER BY d_year, sum_agg DESC, brand_id
      |LIMIT 100""".stripMargin

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_TPCDS_FACTOR", "16").toInt
    val s = Engine.session(cores = 32, appName = "graft-tpcds-scale")
    TpcdsLite.register(s) // base tables (dims + the ×1 fact)

    val xDir = s"/tmp/graft_tpcds_x$factor/store_sales"
    if (!new java.io.File(s"$xDir/_SUCCESS").exists()) {
      System.err.println(s"[tpcds-scale] materializing x$factor fact to $xDir")
      s.sql(TpcdsLite.sparkGenSql("store_sales", factor))
        .repartition(col("ss_sold_date_sk"))
        .write.mode("overwrite").partitionBy("ss_sold_date_sk").parquet(xDir)
    }

    def best2(tag: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        s.sql(q3).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      System.err.println(f"[tpcds-scale] $tag $t%.2fs")
      t
    }

    val base = best2("x1 fact, DPP on")
    s.read.parquet(xDir).createOrReplaceTempView("store_sales")
    val xOn = best2(s"x$factor fact, DPP on")
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val xOff = best2(s"x$factor fact, DPP OFF")
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    println(f"""{"metric":"tpcds_q3_scale","factor":$factor,"x1_dpp_on":$base%.3f,"x${factor}_dpp_on":$xOn%.3f,"x${factor}_dpp_off":$xOff%.3f,"scaleup_ratio":${xOn / base}%.2f,"dpp_win":${xOff / xOn}%.2f}""")
    s.stop()
  }
}

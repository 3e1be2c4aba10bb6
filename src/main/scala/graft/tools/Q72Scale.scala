package graft.tools

import graft.Engine
import graft.queries.TpcdsLite
import org.apache.spark.sql.functions.col

/** SURVEY §6 scale evidence for query72 (q293) — the reference perf
  * suite's LARGEST join tree: catalog_sales ⋈ inventory (item-only key,
  * every warehouse) ⋈ warehouse ⋈ item ⋈ two demographic dims ⋈ THREE
  * date_dim roles (sold / snapshot / ship) ⋈ LEFT OUTER promotion and
  * returns. The claim under test for 100 TB: the SALES fact is the only
  * thing that grows — every dimension including the 231k-row inventory
  * snapshot broadcasts (or at worst shuffles once at its own fixed
  * size), so wall tracks the demographic-filtered fact slice, not the
  * join count.
  *
  * Usage: `sbt "runMain graft.tools.Q72Scale"` (writes the ×N
  * catalog_sales scratch to /tmp/graft_q72_xN on first run;
  * SPARK_GRAFT_TPCDS_FACTOR overrides ×16).
  */
object Q72Scale {

  // q293's body (constants identical; see queries/Tpcds.scala)
  private val q72 =
    """SELECT i_item_desc, w_warehouse_name, d1.d_week_seq AS week_seq,
      |  CAST(COUNT(CASE WHEN p_promo_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_promo,
      |  CAST(COUNT(CASE WHEN p_promo_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS promo,
      |  CAST(COUNT(*) AS BIGINT) AS total_cnt
      |FROM catalog_sales
      |JOIN inventory ON (catalog_sales.cs_item_sk = inventory.inv_item_sk)
      |JOIN warehouse ON (warehouse.w_warehouse_sk = inventory.inv_warehouse_sk)
      |JOIN item ON (item.i_item_sk = catalog_sales.cs_item_sk)
      |JOIN customer_demographics
      |  ON (catalog_sales.cs_bill_cdemo_sk = customer_demographics.cd_demo_sk)
      |JOIN household_demographics
      |  ON (catalog_sales.cs_bill_hdemo_sk = household_demographics.hd_demo_sk)
      |JOIN date_dim d1 ON (catalog_sales.cs_sold_date_sk = d1.d_date_sk)
      |JOIN date_dim d2 ON (inventory.inv_date_sk = d2.d_date_sk)
      |JOIN date_dim d3 ON (catalog_sales.cs_ship_date_sk = d3.d_date_sk)
      |LEFT OUTER JOIN promotion ON (catalog_sales.cs_promo_sk = promotion.p_promo_sk)
      |LEFT OUTER JOIN catalog_returns
      |  ON (catalog_returns.cr_item_sk = catalog_sales.cs_item_sk
      |    AND catalog_returns.cr_order_number = catalog_sales.cs_order_number)
      |WHERE d1.d_week_seq = d2.d_week_seq
      |  AND inv_quantity_on_hand < cs_quantity
      |  AND d3.d_date > d1.d_date + 5
      |  AND hd_buy_potential = 'BP1'
      |  AND d1.d_year = 1998
      |  AND cd_marital_status = 'MS2'
      |GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
      |ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, week_seq
      |LIMIT 100""".stripMargin

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_TPCDS_FACTOR", "16").toInt
    val s = Engine.session(cores = 32, appName = "graft-q72-scale")
    TpcdsLite.register(s)

    val xDir = s"/tmp/graft_q72_x$factor/catalog_sales"
    if (!new java.io.File(s"$xDir/_SUCCESS").exists()) {
      System.err.println(s"[q72-scale] materializing x$factor catalog_sales")
      s.sql(TpcdsLite.sparkGenSql("catalog_sales", factor))
        .repartition(32).write.mode("overwrite").parquet(xDir)
    }

    def best2(tag: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        s.sql(q72).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      System.err.println(f"[q72-scale] $tag $t%.2fs")
      t
    }

    val base = best2("x1 fact")
    // plan shape at x1: every dimension (incl. the 231k-row inventory)
    // should hash-join off a broadcast; no cartesian anywhere
    val df = s.sql(q72)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
    require(!plan.contains("CartesianProduct"), "q72 planned a cartesian")

    s.read.parquet(xDir).createOrReplaceTempView("catalog_sales")
    val xOn = best2(s"x$factor fact")

    println(f"""{"metric":"q72_scale","factor":$factor,"x1":$base%.3f,"x$factor":$xOn%.3f,"scaleup_ratio":${xOn / base}%.2f,"broadcast_joins":$nBhj}""")
    s.stop()
  }
}

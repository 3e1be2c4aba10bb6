package graft.queries

import org.apache.spark.sql.SparkSession

/** The reference's ENTIRE TPC-DS perf suite — all 60 plan-golden files
  * under `ql/src/test/queries/clientpositive/perf/query*.q` — re-expressed
  * over [[TpcdsLite]] as RESULT-checked queries: the same SQL text runs on
  * Spark and the DuckDB oracle (constants adapted to the lite instance's
  * value domains; every ORDER BY made total so LIMIT and the row-hash
  * compare are deterministic; DECIMAL-division/INT-cast spots where the
  * engines' result types legitimately diverge are pinned to DOUBLE /
  * FLOOR in the shared text, noted per query).
  *
  * Shape highlights: star join + date filter (query3 — the DPP shape),
  * 8-way scalar-subquery cross join with shared dimension scans (query88 —
  * the ReusedExchange shape), windowed revenue ratio over an aggregate
  * (query12), multi-dimension star avg (query27), ticket-grain HAVING
  * (query34), cumulative-window FULL OUTER (query51), triple-channel
  * sales→returns→catalog chain with stddev (query17), the multi-CTE
  * 17-join self-join (query64), quantity-band scalar subqueries
  * (query28), ROLLUP with within-parent RANK over GROUPING_ID (query70),
  * the excess-discount scalar-average screen (query32), the
  * bought-vs-current city mismatch with customer_address in two roles
  * (query46), split-warehouse never-returned orders — semi + anti on the
  * same fact (query94), and the week-pegged three-channel revenue
  * balance (query58), the distinct-projection anti chain counting
  * store-only shoppers (query87), the store/catalog buyer-item overlap
  * FULL OUTER with conditional membership counts (query97), monthly
  * sales vs the rolling partition average (query89), the per-store
  * day-of-week conditional-aggregate pivot (query43), the warehouse
  * inventory-balance ratio band (query21), the item-hierarchy
  * quantity-on-hand ROLLUP (query22), the inventory cov iceberg with
  * adjacent-month self-join (query39), the suite's largest join tree —
  * catalog sales × same-week inventory with three date_dim roles
  * (query72), the 8-level ROLLUP with per-category top-100 RANK
  * (query67), the split-warehouse-with-return double-EXISTS chain
  * (query95), the county quarter-over-quarter channel-growth
  * comparison (query31), the inventory-band × sold-in-store item screen
  * (query82), the refund-netted before/after warehouse pivot (query40),
  * the return-lag day-band pivot over the (ticket, item, customer)
  * triple (query50), and the warehouse 36-column monthly pivot with
  * per-square-foot ratios over two UNION ALL'd channels (query66).
  *
  * Scale: these are the canonical 100 TB star plans — the fact table is
  * partitioned on the date key (DPP prunes the scan through the date_dim
  * filter), all dimensions broadcast, aggregates are partial+final. Plan
  * assertions live in `TpcdsPlanSpec`.
  */
object Tpcds {

  private def q(name: String, body: String): Qd =
    Qd(name, TpcdsLite.forDuck(body.stripMargin)) { (s, _) =>
      TpcdsLite.register(s)
      s.sql(TpcdsLite.forSpark(body.stripMargin))
    }

  // reference: perf/query3.q — brand revenue star join, date-filtered.
  private val q3 =
    """WITH #TABLES#
      |SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sum_agg
      |FROM date_dim dt, store_sales, item
      |WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      |  AND store_sales.ss_item_sk = item.i_item_sk
      |  AND item.i_manufact_id = 7
      |  AND dt.d_moy = 12
      |GROUP BY dt.d_year, item.i_brand, item.i_brand_id
      |ORDER BY d_year, sum_agg DESC, brand_id
      |LIMIT 100"""

  // reference: perf/query88.q — 8 half-hour traffic counts as scalar
  // subqueries cross-joined into one row; store/hd dimension scans are
  // identical across all 8 (the exchange-reuse shape).
  private def q88Sub(alias: String, timePred: String): String =
    s"""(SELECT COUNT(*) AS $alias
       | FROM store_sales, household_demographics, time_dim, store
       | WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk
       |   AND ss_store_sk = s_store_sk AND $timePred
       |   AND ((hd_dep_count = 3 AND hd_vehicle_count <= 5)
       |     OR (hd_dep_count = 0 AND hd_vehicle_count <= 2)
       |     OR (hd_dep_count = 1 AND hd_vehicle_count <= 3))
       |   AND s_store_name = 'STORE3')"""

  private val q88 =
    s"""WITH #TABLES#
       |SELECT s1.h8_30_to_9, s2.h9_to_9_30, s3.h9_30_to_10, s4.h10_to_10_30,
       |  s5.h10_30_to_11, s6.h11_to_11_30, s7.h11_30_to_12, s8.h12_to_12_30
       |FROM
       | ${q88Sub("h8_30_to_9", "t_hour = 8 AND t_minute >= 30")} s1,
       | ${q88Sub("h9_to_9_30", "t_hour = 9 AND t_minute < 30")} s2,
       | ${q88Sub("h9_30_to_10", "t_hour = 9 AND t_minute >= 30")} s3,
       | ${q88Sub("h10_to_10_30", "t_hour = 10 AND t_minute < 30")} s4,
       | ${q88Sub("h10_30_to_11", "t_hour = 10 AND t_minute >= 30")} s5,
       | ${q88Sub("h11_to_11_30", "t_hour = 11 AND t_minute < 30")} s6,
       | ${q88Sub("h11_30_to_12", "t_hour = 11 AND t_minute >= 30")} s7,
       | ${q88Sub("h12_to_12_30", "t_hour = 12 AND t_minute < 30")} s8"""

  // reference: perf/query12.q — per-item revenue with a class-partitioned
  // windowed ratio over the aggregate.
  private val q12 =
    """WITH #TABLES#
      |SELECT i_item_id, i_item_desc, i_category, i_class,
      |  CAST(i_current_price AS DOUBLE) AS i_current_price,
      |  CAST(SUM(ws_ext_sales_price) AS DOUBLE) AS itemrevenue,
      |  ROUND(CAST(SUM(ws_ext_sales_price) AS DOUBLE) * 100 /
      |    CAST(SUM(SUM(ws_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE),
      |    4) AS revenueratio
      |FROM web_sales, item, date_dim
      |WHERE ws_item_sk = i_item_sk
      |  AND i_category IN ('CAT1', 'CAT2', 'CAT3')
      |  AND ws_sold_date_sk = d_date_sk
      |  AND d_date BETWEEN DATE '1998-02-01' AND DATE '1998-03-02'
      |GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
      |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
      |LIMIT 100"""

  // reference: perf/query27.q — four demographic-sliced store averages.
  private val q27 =
    """WITH #TABLES#
      |SELECT i_item_id, s_state,
      |  ROUND(AVG(ss_quantity), 4) AS agg1,
      |  ROUND(CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price), 4) AS agg2,
      |  ROUND(CAST(SUM(ss_coupon_amt) AS DOUBLE) / COUNT(ss_coupon_amt), 4) AS agg3,
      |  ROUND(CAST(SUM(ss_sales_price) AS DOUBLE) / COUNT(ss_sales_price), 4) AS agg4
      |FROM store_sales, customer_demographics, date_dim, store, item
      |WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |  AND ss_store_sk = s_store_sk AND ss_cdemo_sk = cd_demo_sk
      |  AND cd_gender = 'F' AND cd_marital_status = 'MS2'
      |  AND cd_education_status = 'ES3' AND d_year = 1998
      |  AND s_state IN ('S0', 'S1', 'S2')
      |GROUP BY i_item_id, s_state
      |ORDER BY i_item_id, s_state
      |LIMIT 100"""

  // reference: perf/query34.q — per-ticket line counts with a band filter,
  // joined back to customer.
  private val q34 =
    """WITH #TABLES#
      |SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
      |  ss_ticket_number, cnt
      |FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      |      FROM store_sales, date_dim, store, household_demographics
      |      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
      |        AND ss_hdemo_sk = hd_demo_sk
      |        AND (d_dom BETWEEN 1 AND 3 OR d_dom BETWEEN 25 AND 28)
      |        AND (hd_buy_potential = 'BP1' OR hd_buy_potential = 'BP2')
      |        AND hd_vehicle_count > 0
      |        AND (CASE WHEN hd_vehicle_count > 0
      |              THEN CAST(hd_dep_count AS DOUBLE) / hd_vehicle_count
      |              ELSE NULL END) > 1.2
      |        AND d_year IN (1998, 1999, 2000)
      |        AND s_county IN ('COUNTY0', 'COUNTY1', 'COUNTY2')
      |      GROUP BY ss_ticket_number, ss_customer_sk) dn, tpcds_customer
      |WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 2 AND 20
      |ORDER BY c_last_name, c_first_name, c_salutation,
      |  c_preferred_cust_flag DESC, ss_ticket_number, cnt"""

  // reference: perf/query51.q — web vs store cumulative revenue per item
  // per day, FULL OUTER joined, kept where the web running total leads.
  private val q51 =
    """WITH #TABLES#,
      |web_v1 AS (
      |  SELECT ws_item_sk AS item_sk, d_date,
      |    SUM(SUM(ws_sales_price)) OVER (PARTITION BY ws_item_sk ORDER BY d_date
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_sales
      |  FROM web_sales, date_dim
      |  WHERE ws_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 1176 AND 1187
      |    AND ws_item_sk IS NOT NULL AND ws_item_sk <= 30
      |  GROUP BY ws_item_sk, d_date),
      |store_v1 AS (
      |  SELECT ss_item_sk AS item_sk, d_date,
      |    SUM(SUM(ss_sales_price)) OVER (PARTITION BY ss_item_sk ORDER BY d_date
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_sales
      |  FROM store_sales, date_dim
      |  WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 1176 AND 1187
      |    AND ss_item_sk IS NOT NULL AND ss_item_sk <= 30
      |  GROUP BY ss_item_sk, d_date)
      |SELECT item_sk, d_date,
      |  CAST(web_sales AS DOUBLE) AS web_sales,
      |  CAST(store_sales AS DOUBLE) AS store_sales,
      |  CAST(web_cumulative AS DOUBLE) AS web_cumulative,
      |  CAST(store_cumulative AS DOUBLE) AS store_cumulative
      |FROM (SELECT item_sk, d_date, web_sales, store_sales,
      |    MAX(web_sales) OVER (PARTITION BY item_sk ORDER BY d_date
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cumulative,
      |    MAX(store_sales) OVER (PARTITION BY item_sk ORDER BY d_date
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cumulative
      |  FROM (SELECT
      |      CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END AS item_sk,
      |      CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END AS d_date,
      |      web.cume_sales AS web_sales, store.cume_sales AS store_sales
      |    FROM web_v1 web FULL OUTER JOIN store_v1 store
      |      ON web.item_sk = store.item_sk AND web.d_date = store.d_date) x) y
      |WHERE web_cumulative > store_cumulative
      |ORDER BY item_sk, d_date
      |LIMIT 100"""

  // reference: perf/query17.q — sales in a quarter, returned in the next
  // quarters, re-bought by catalog: three quantity distributions.
  private val q17 =
    """WITH #TABLES#
      |SELECT i_item_id, i_item_desc, s_state,
      |  COUNT(ss_quantity) AS store_sales_quantitycount,
      |  ROUND(AVG(ss_quantity), 4) AS store_sales_quantityave,
      |  ROUND(STDDEV_SAMP(ss_quantity), 4) AS store_sales_quantitystdev,
      |  ROUND(STDDEV_SAMP(ss_quantity) / AVG(ss_quantity), 4) AS store_sales_quantitycov,
      |  COUNT(sr_return_quantity) AS store_returns_quantitycount,
      |  ROUND(AVG(sr_return_quantity), 4) AS store_returns_quantityave,
      |  ROUND(STDDEV_SAMP(sr_return_quantity), 4) AS store_returns_quantitystdev,
      |  ROUND(STDDEV_SAMP(sr_return_quantity) / AVG(sr_return_quantity), 4) AS store_returns_quantitycov,
      |  COUNT(cs_quantity) AS catalog_sales_quantitycount,
      |  ROUND(AVG(cs_quantity), 4) AS catalog_sales_quantityave,
      |  ROUND(STDDEV_SAMP(cs_quantity), 4) AS catalog_sales_quantitystdev,
      |  ROUND(STDDEV_SAMP(cs_quantity) / AVG(cs_quantity), 4) AS catalog_sales_quantitycov
      |FROM store_sales, store_returns, catalog_sales,
      |  date_dim d1, date_dim d2, date_dim d3, store, item
      |WHERE d1.d_quarter_name = '1998Q1' AND d1.d_date_sk = ss_sold_date_sk
      |  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
      |  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
      |  AND ss_ticket_number = sr_ticket_number
      |  AND sr_returned_date_sk = d2.d_date_sk
      |  AND d2.d_quarter_name IN ('1998Q1', '1998Q2', '1998Q3')
      |  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
      |  AND cs_sold_date_sk = d3.d_date_sk
      |  AND d3.d_quarter_name IN ('1998Q1', '1998Q2', '1998Q3')
      |GROUP BY i_item_id, i_item_desc, s_state
      |ORDER BY i_item_id, i_item_desc, s_state
      |LIMIT 100"""

  // reference: perf/query64.q — the multi-CTE 17-join: store sales that
  // were returned AND whose item cleared the catalog profitability screen,
  // aggregated per (item, store, buyer/current address), self-joined
  // across consecutive years. Trimmed to the columns the lite schema
  // carries; the join graph is the reference's.
  private val q64 =
    """WITH #TABLES#,
      |cs_ui AS (
      |  SELECT cs_item_sk,
      |    SUM(cs_ext_list_price) AS sale,
      |    SUM(cr_refunded_cash + cr_reversed_charge + cr_store_credit) AS refund
      |  FROM catalog_sales, catalog_returns
      |  WHERE cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number
      |  GROUP BY cs_item_sk
      |  HAVING SUM(cs_ext_list_price) >
      |    2 * SUM(cr_refunded_cash + cr_reversed_charge + cr_store_credit)),
      |cross_sales AS (
      |  SELECT i_product_name AS product_name, i_item_sk AS item_sk,
      |    s_store_name AS store_name, s_zip AS store_zip,
      |    ad1.ca_city AS b_city, ad1.ca_zip AS b_zip,
      |    ad2.ca_city AS c_city, ad2.ca_zip AS c_zip,
      |    d1.d_year AS syear, COUNT(*) AS cnt,
      |    CAST(SUM(ss_wholesale_cost) AS DOUBLE) AS s1,
      |    CAST(SUM(ss_list_price) AS DOUBLE) AS s2,
      |    CAST(SUM(ss_coupon_amt) AS DOUBLE) AS s3
      |  FROM store_sales
      |  JOIN store_returns ON ss_item_sk = sr_item_sk
      |    AND ss_ticket_number = sr_ticket_number
      |  JOIN tpcds_customer ON ss_customer_sk = c_customer_sk
      |  JOIN date_dim d1 ON ss_sold_date_sk = d1.d_date_sk
      |  JOIN date_dim d2 ON c_first_sales_date_sk = d2.d_date_sk
      |  JOIN date_dim d3 ON c_first_shipto_date_sk = d3.d_date_sk
      |  JOIN store ON ss_store_sk = s_store_sk
      |  JOIN customer_demographics cd1 ON ss_cdemo_sk = cd1.cd_demo_sk
      |  JOIN customer_demographics cd2 ON c_current_cdemo_sk = cd2.cd_demo_sk
      |  JOIN promotion ON ss_promo_sk = p_promo_sk
      |  JOIN household_demographics hd1 ON ss_hdemo_sk = hd1.hd_demo_sk
      |  JOIN household_demographics hd2 ON c_current_hdemo_sk = hd2.hd_demo_sk
      |  JOIN customer_address ad1 ON ss_addr_sk = ad1.ca_address_sk
      |  JOIN customer_address ad2 ON c_current_addr_sk = ad2.ca_address_sk
      |  JOIN income_band ib1 ON hd1.hd_income_band_sk = ib1.ib_income_band_sk
      |  JOIN income_band ib2 ON hd2.hd_income_band_sk = ib2.ib_income_band_sk
      |  JOIN item ON ss_item_sk = i_item_sk
      |  JOIN cs_ui ON ss_item_sk = cs_ui.cs_item_sk
      |  WHERE cd1.cd_marital_status <> cd2.cd_marital_status
      |    AND i_current_price BETWEEN 10 AND 60
      |  GROUP BY i_product_name, i_item_sk, s_store_name, s_zip,
      |    ad1.ca_city, ad1.ca_zip, ad2.ca_city, ad2.ca_zip, d1.d_year)
      |SELECT cs1.product_name, cs1.store_name, cs1.store_zip,
      |  cs1.b_city, cs1.b_zip, cs1.c_city, cs1.c_zip,
      |  cs1.syear AS syear1, cs1.cnt AS cnt1,
      |  cs1.s1 AS s1_1, cs1.s2 AS s2_1, cs1.s3 AS s3_1,
      |  cs2.s1 AS s1_2, cs2.s2 AS s2_2, cs2.s3 AS s3_2,
      |  cs2.syear AS syear2, cs2.cnt AS cnt2
      |FROM cross_sales cs1, cross_sales cs2
      |WHERE cs1.item_sk = cs2.item_sk
      |  AND cs1.syear = 1998 AND cs2.syear = 1999
      |  AND cs2.cnt <= cs1.cnt
      |  AND cs1.store_name = cs2.store_name AND cs1.store_zip = cs2.store_zip
      |ORDER BY cs1.product_name, cs1.store_name, cs1.store_zip,
      |  cs1.b_city, cs1.b_zip, cs1.c_city, cs1.c_zip,
      |  syear1, cnt1, s1_1, s2_1, s3_1, s1_2, s2_2, s3_2, syear2, cnt2"""

  // reference: perf/query28.q — six quantity-band statistics (avg, count,
  // count distinct over a decimal) as independent scalar subqueries
  // cross-joined into one row; range constants adapted to the lite value
  // domains (list_price 2–122, coupon 0–20, wholesale 1–91).
  private def q28Band(n: Int, qLo: Int, qHi: Int, lp: Int, ca: Int,
      wc: Int): String =
    s"""(SELECT ROUND(CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price), 4) AS b${n}_lp,
       |  COUNT(ss_list_price) AS b${n}_cnt,
       |  COUNT(DISTINCT ss_list_price) AS b${n}_cntd
       | FROM store_sales
       | WHERE ss_quantity BETWEEN $qLo AND $qHi
       |   AND (ss_list_price BETWEEN $lp AND $lp + 10
       |     OR ss_coupon_amt BETWEEN $ca AND $ca + 5
       |     OR ss_wholesale_cost BETWEEN $wc AND $wc + 20))"""

  private val q28 =
    s"""WITH #TABLES#
       |SELECT b1.b1_lp, b1.b1_cnt, b1.b1_cntd, b2.b2_lp, b2.b2_cnt, b2.b2_cntd,
       |  b3.b3_lp, b3.b3_cnt, b3.b3_cntd, b4.b4_lp, b4.b4_cnt, b4.b4_cntd,
       |  b5.b5_lp, b5.b5_cnt, b5.b5_cntd, b6.b6_lp, b6.b6_cnt, b6.b6_cntd
       |FROM
       | ${q28Band(1, 1, 5, 11, 4, 14)} b1,
       | ${q28Band(2, 6, 10, 91, 14, 32)} b2,
       | ${q28Band(3, 11, 15, 66, 9, 4)} b3,
       | ${q28Band(4, 16, 20, 110, 3, 70)} b4,
       | ${q28Band(5, 21, 25, 35, 14, 38)} b5,
       | ${q28Band(6, 26, 30, 28, 2, 42)} b6"""

  // reference: perf/query70.q — state/county profit ROLLUP with
  // within-parent RANK partitioned by the grouping level, states
  // pre-filtered by a windowed-rank subquery.
  private val q70 =
    """WITH #TABLES#,
      |top_states AS (
      |  SELECT s_state FROM (
      |    SELECT s_state,
      |      RANK() OVER (PARTITION BY s_state
      |        ORDER BY SUM(ss_net_profit) DESC) AS ranking
      |    FROM store_sales, store, date_dim
      |    WHERE d_month_seq BETWEEN 1176 AND 1187
      |      AND d_date_sk = ss_sold_date_sk AND s_store_sk = ss_store_sk
      |    GROUP BY s_state) tmp1
      |  WHERE ranking <= 5),
      |agg AS (
      |  SELECT CAST(SUM(ss_net_profit) AS DOUBLE) AS total_sum,
      |    s_state, s_county,
      |    CAST(GROUPING_ID(s_state, s_county) AS INT) AS lochierarchy,
      |    RANK() OVER (PARTITION BY GROUPING_ID(s_state, s_county),
      |        CASE WHEN GROUPING_ID(s_state, s_county) = 1 THEN s_state END
      |      ORDER BY SUM(ss_net_profit)) AS rank_within_parent
      |  FROM store_sales ss
      |  JOIN date_dim d1 ON d1.d_date_sk = ss.ss_sold_date_sk
      |  JOIN store s ON s.s_store_sk = ss.ss_store_sk
      |  WHERE d1.d_month_seq BETWEEN 1176 AND 1187
      |    AND s.s_state IN (SELECT s_state FROM top_states)
      |  GROUP BY ROLLUP(s_state, s_county))
      |SELECT total_sum, s_state, s_county, lochierarchy, rank_within_parent
      |FROM agg
      |ORDER BY lochierarchy DESC,
      |  CASE WHEN lochierarchy = 0 THEN s_state END NULLS FIRST,
      |  rank_within_parent,
      |  s_state NULLS FIRST, s_county NULLS FIRST, total_sum
      |LIMIT 100"""

  // reference: perf/query32.q — excess-discount screen: line discounts
  // above 1.3× the same item's window average (scalar-aggregate screen
  // joined back, the decorrelated shape the reference plans).
  private val q32 =
    """WITH #TABLES#
      |SELECT CAST(SUM(cs1.cs_ext_discount_amt) AS DOUBLE) AS excess_discount_amount
      |FROM (SELECT cs.cs_item_sk AS cs_item_sk,
      |        cs.cs_ext_discount_amt AS cs_ext_discount_amt
      |      FROM catalog_sales cs
      |      JOIN date_dim d ON d.d_date_sk = cs.cs_sold_date_sk
      |      WHERE d.d_date BETWEEN DATE '1998-01-27' AND DATE '1998-04-27') cs1
      |JOIN item i ON i.i_item_sk = cs1.cs_item_sk
      |JOIN (SELECT cs2.cs_item_sk AS cs_item_sk,
      |        1.3 * AVG(cs_ext_discount_amt) AS avg_cs_ext_discount_amt
      |      FROM (SELECT cs.cs_item_sk AS cs_item_sk,
      |              cs.cs_ext_discount_amt AS cs_ext_discount_amt
      |            FROM catalog_sales cs
      |            JOIN date_dim d ON d.d_date_sk = cs.cs_sold_date_sk
      |            WHERE d.d_date BETWEEN DATE '1998-01-27' AND DATE '1998-04-27') cs2
      |      GROUP BY cs2.cs_item_sk) tmp1
      |ON i.i_item_sk = tmp1.cs_item_sk
      |WHERE i.i_manufact_id = 7
      |  AND cs1.cs_ext_discount_amt > tmp1.avg_cs_ext_discount_amt"""

  // reference: perf/query46.q — weekend-shopper ticket totals where the
  // purchase city differs from the customer's CURRENT city (two roles of
  // customer_address in one query).
  private val q46 =
    """WITH #TABLES#
      |SELECT c_last_name, c_first_name, ca_city, bought_city,
      |  ss_ticket_number, CAST(amt AS DOUBLE) AS amt,
      |  CAST(profit AS DOUBLE) AS profit
      |FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
      |        SUM(ss_coupon_amt) AS amt, SUM(ss_net_profit) AS profit
      |      FROM store_sales, date_dim, store, household_demographics,
      |        customer_address
      |      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
      |        AND ss_hdemo_sk = hd_demo_sk AND ss_addr_sk = ca_address_sk
      |        AND (hd_dep_count = 4 OR hd_vehicle_count = 2)
      |        AND d_dow IN (6, 0)
      |        AND d_year IN (1998, 1999, 2000)
      |        AND s_city IN ('CITY0', 'CITY1', 'CITY2', 'CITY3', 'CITY4')
      |      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
      |  tpcds_customer, customer_address current_addr
      |WHERE ss_customer_sk = c_customer_sk
      |  AND c_current_addr_sk = current_addr.ca_address_sk
      |  AND current_addr.ca_city <> bought_city
      |ORDER BY c_last_name, c_first_name, ca_city, bought_city,
      |  ss_ticket_number, amt, profit
      |LIMIT 100"""

  // reference: perf/query94.q — ship-window order stats for orders that
  // SHIPPED FROM MORE THAN ONE WAREHOUSE (self-join semi) and were NEVER
  // RETURNED (left-outer anti): semi + anti on the same fact, distinct
  // order counting.
  private val q94 =
    """WITH #TABLES#
      |SELECT COUNT(DISTINCT ws_order_number) AS order_count,
      |  CAST(SUM(ws_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
      |  CAST(SUM(ws_net_profit) AS DOUBLE) AS total_net_profit
      |FROM web_sales ws1
      |JOIN customer_address ca ON ws1.ws_ship_addr_sk = ca.ca_address_sk
      |JOIN web_site s ON ws1.ws_web_site_sk = s.web_site_sk
      |JOIN date_dim d ON ws1.ws_ship_date_sk = d.d_date_sk
      |LEFT OUTER JOIN web_returns wr1
      |  ON ws1.ws_order_number = wr1.wr_order_number
      |WHERE d.d_date BETWEEN DATE '1998-05-01' AND DATE '1998-07-01'
      |  AND ca.ca_state = 'S1'
      |  AND s.web_company_name = 'WC1'
      |  AND wr1.wr_order_number IS NULL
      |  AND ws1.ws_order_number IN (
      |    SELECT ws2.ws_order_number
      |    FROM web_sales ws2, web_sales ws3
      |    WHERE ws2.ws_order_number = ws3.ws_order_number
      |      AND ws2.ws_warehouse_sk <> ws3.ws_warehouse_sk)"""

  // reference: perf/query58.q — items whose revenue in ONE WEEK (pegged
  // through the d_week_seq self-join) is balanced across all three
  // channels (band widened to 0.5-2.0x: the lite instance has ~1-4 lines
  // per item-channel-week, where the reference's ±10% at scale-200 would
  // keep nothing).
  private def q58Chan(alias: String, fact: String, dateCol: String,
      itemCol: String, rev: String): String =
    s"""(SELECT i_item_id AS item_id, SUM($rev) AS ${alias}_item_rev
       | FROM $fact
       |     JOIN item ON $fact.$itemCol = item.i_item_sk
       |     JOIN date_dim ON $fact.$dateCol = date_dim.d_date_sk
       |     JOIN (SELECT d1.d_date
       |           FROM date_dim d1 JOIN date_dim d2 ON d1.d_week_seq = d2.d_week_seq
       |           WHERE d2.d_date = DATE '1998-08-04') sub
       |       ON date_dim.d_date = sub.d_date
       | GROUP BY i_item_id) ${alias}_items"""

  private val q58 =
    s"""WITH #TABLES#
       |SELECT ss_items.item_id AS item_id,
       |  CAST(ss_item_rev AS DOUBLE) AS ss_item_rev,
       |  ROUND(CAST(ss_item_rev AS DOUBLE) / CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3 * 100, 4) AS ss_dev,
       |  CAST(cs_item_rev AS DOUBLE) AS cs_item_rev,
       |  ROUND(CAST(cs_item_rev AS DOUBLE) / CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3 * 100, 4) AS cs_dev,
       |  CAST(ws_item_rev AS DOUBLE) AS ws_item_rev,
       |  ROUND(CAST(ws_item_rev AS DOUBLE) / CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3 * 100, 4) AS ws_dev,
       |  ROUND(CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3, 4) AS average
       |FROM
       | ${q58Chan("ss", "store_sales", "ss_sold_date_sk", "ss_item_sk", "ss_ext_sales_price")}
       |JOIN
       | ${q58Chan("cs", "catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_ext_sales_price")}
       |ON ss_items.item_id = cs_items.item_id
       |JOIN
       | ${q58Chan("ws", "web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_ext_sales_price")}
       |ON ss_items.item_id = ws_items.item_id
       |WHERE ss_item_rev BETWEEN 0.5 * cs_item_rev AND 2.0 * cs_item_rev
       |  AND ss_item_rev BETWEEN 0.5 * ws_item_rev AND 2.0 * ws_item_rev
       |  AND cs_item_rev BETWEEN 0.5 * ss_item_rev AND 2.0 * ss_item_rev
       |  AND cs_item_rev BETWEEN 0.5 * ws_item_rev AND 2.0 * ws_item_rev
       |  AND ws_item_rev BETWEEN 0.5 * ss_item_rev AND 2.0 * ss_item_rev
       |  AND ws_item_rev BETWEEN 0.5 * cs_item_rev AND 2.0 * cs_item_rev
       |ORDER BY ss_items.item_id, ss_item_rev
       |LIMIT 100"""

  // reference: perf/query87.q — customers-by-day who bought in store but
  // in NEITHER other channel: distinct-projection anti chain (two LEFT
  // OUTER + IS NULL over (name, date) triples), counted.
  private def q87Chan(n: Int, fact: String, dateCol: String,
      custCol: String): String =
    s"""(SELECT DISTINCT c_last_name AS l$n, c_first_name AS f$n, d_date AS d$n
       | FROM $fact
       | JOIN date_dim ON $fact.$dateCol = date_dim.d_date_sk
       | JOIN tpcds_customer ON $fact.$custCol = tpcds_customer.c_customer_sk
       | WHERE d_month_seq BETWEEN 1176 AND 1187)"""

  private val q87 =
    s"""WITH #TABLES#
       |SELECT COUNT(*) AS store_only_shoppers
       |FROM ${q87Chan(1, "store_sales", "ss_sold_date_sk", "ss_customer_sk")} t1
       |LEFT OUTER JOIN ${q87Chan(2, "catalog_sales", "cs_sold_date_sk", "cs_bill_customer_sk")} t2
       |  ON t1.l1 = t2.l2 AND t1.f1 = t2.f2 AND t1.d1 = t2.d2
       |LEFT OUTER JOIN ${q87Chan(3, "web_sales", "ws_sold_date_sk", "ws_bill_customer_sk")} t3
       |  ON t1.l1 = t3.l3 AND t1.f1 = t3.f3 AND t1.d1 = t3.d3
       |WHERE l2 IS NULL AND l3 IS NULL"""

  // reference: perf/query97.q — store/catalog buyer-item overlap: FULL
  // OUTER over the two channels' distinct (customer, item) sets with
  // three conditional membership counts.
  private val q97 =
    """WITH #TABLES#
      |SELECT
      |  CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
      |  CAST(SUM(CASE WHEN ssci.customer_sk IS NULL AND csci.customer_sk IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
      |  CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
      |FROM (SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
      |      FROM store_sales
      |      JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |      WHERE d_month_seq BETWEEN 1176 AND 1187
      |      GROUP BY ss_customer_sk, ss_item_sk) ssci
      |FULL OUTER JOIN
      |     (SELECT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
      |      FROM catalog_sales
      |      JOIN date_dim ON catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      |      WHERE d_month_seq BETWEEN 1176 AND 1187
      |      GROUP BY cs_bill_customer_sk, cs_item_sk) csci
      |ON ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk"""

  // reference: perf/query89.q — monthly brand-store sales vs the rolling
  // yearly average over the same (brand, store) partition; keep rows
  // deviating more than 10%.
  private val q89 =
    """WITH #TABLES#
      |SELECT i_category, i_class, i_brand, s_store_name, s_company_name,
      |  d_moy, CAST(sum_sales AS DOUBLE) AS sum_sales,
      |  ROUND(avg_monthly_sales, 4) AS avg_monthly_sales
      |FROM (
      |  SELECT i_category, i_class, i_brand, s_store_name, s_company_name,
      |    d_moy, SUM(ss_sales_price) AS sum_sales,
      |    AVG(CAST(SUM(ss_sales_price) AS DOUBLE)) OVER
      |      (PARTITION BY i_category, i_brand, s_store_name, s_company_name)
      |      AS avg_monthly_sales
      |  FROM item, store_sales, date_dim, store
      |  WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |    AND ss_store_sk = s_store_sk
      |    AND d_year IN (1998)
      |    AND ((i_category IN ('CAT1', 'CAT2', 'CAT3')
      |          AND i_class IN ('CLASS2', 'CLASS3', 'CLASS4'))
      |      OR (i_category IN ('CAT5', 'CAT6', 'CAT7')
      |          AND i_class IN ('CLASS5', 'CLASS6', 'CLASS7')))
      |  GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name,
      |    d_moy) tmp1
      |WHERE CASE WHEN avg_monthly_sales <> 0
      |  THEN ABS(CAST(sum_sales AS DOUBLE) - avg_monthly_sales) / avg_monthly_sales
      |  ELSE NULL END > 0.1
      |ORDER BY i_category, i_class, i_brand, s_store_name, s_company_name,
      |  d_moy, sum_sales
      |LIMIT 100"""

  // reference: perf/query43.q — per-store day-of-week sales pivot for one
  // year (conditional-aggregate pivot over d_dow).
  private val q43 =
    """WITH #TABLES#
      |SELECT s_store_name, s_store_sk,
      |  CAST(SUM(CASE WHEN d_dow = 0 THEN ss_sales_price END) AS DOUBLE) AS sun_sales,
      |  CAST(SUM(CASE WHEN d_dow = 1 THEN ss_sales_price END) AS DOUBLE) AS mon_sales,
      |  CAST(SUM(CASE WHEN d_dow = 2 THEN ss_sales_price END) AS DOUBLE) AS tue_sales,
      |  CAST(SUM(CASE WHEN d_dow = 3 THEN ss_sales_price END) AS DOUBLE) AS wed_sales,
      |  CAST(SUM(CASE WHEN d_dow = 4 THEN ss_sales_price END) AS DOUBLE) AS thu_sales,
      |  CAST(SUM(CASE WHEN d_dow = 5 THEN ss_sales_price END) AS DOUBLE) AS fri_sales,
      |  CAST(SUM(CASE WHEN d_dow = 6 THEN ss_sales_price END) AS DOUBLE) AS sat_sales
      |FROM date_dim, store_sales, store
      |WHERE d_date_sk = ss_sold_date_sk AND s_store_sk = ss_store_sk
      |  AND s_state = 'S1' AND d_year = 1998
      |GROUP BY s_store_name, s_store_sk
      |ORDER BY s_store_name, s_store_sk
      |LIMIT 100"""

  // reference: perf/query21.q — warehouse inventory balance around a
  // pivot date: before/after quantity sums per (warehouse, item), kept
  // when the after/before ratio stays within [2/3, 3/2].
  private val q21 =
    """WITH #TABLES#
      |SELECT * FROM (
      |  SELECT w_warehouse_name, i_item_id,
      |    CAST(SUM(CASE WHEN d_date < DATE '1998-03-01'
      |         THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_before,
      |    CAST(SUM(CASE WHEN d_date >= DATE '1998-03-01'
      |         THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_after
      |  FROM inventory, warehouse, item, date_dim
      |  WHERE i_current_price BETWEEN 10.00 AND 35.00
      |    AND item.i_item_sk = inventory.inv_item_sk
      |    AND inventory.inv_warehouse_sk = warehouse.w_warehouse_sk
      |    AND inventory.inv_date_sk = date_dim.d_date_sk
      |    AND d_date BETWEEN DATE '1998-01-30' AND DATE '1998-03-31'
      |  GROUP BY w_warehouse_name, i_item_id) x
      |WHERE (CASE WHEN inv_before > 0
      |       THEN CAST(inv_after AS DOUBLE) / inv_before ELSE NULL END)
      |  BETWEEN 2.0/3.0 AND 3.0/2.0
      |ORDER BY w_warehouse_name, i_item_id
      |LIMIT 100"""

  // reference: perf/query22.q — average quantity-on-hand ROLLUP over the
  // full item hierarchy for a 12-month window.
  private val q22 =
    """WITH #TABLES#
      |SELECT i_product_name, i_brand, i_class, i_category,
      |  ROUND(AVG(inv_quantity_on_hand), 4) AS qoh
      |FROM inventory, date_dim, item, warehouse
      |WHERE inv_date_sk = d_date_sk AND inv_item_sk = i_item_sk
      |  AND inv_warehouse_sk = w_warehouse_sk
      |  AND d_month_seq BETWEEN 1176 AND 1187
      |GROUP BY ROLLUP(i_product_name, i_brand, i_class, i_category)
      |ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST,
      |  i_class NULLS FIRST, i_category NULLS FIRST
      |LIMIT 100"""

  // reference: perf/query39.q — the inventory iceberg: per (warehouse,
  // item, month) quantity cov = stddev/mean, groups above 1 self-joined
  // across adjacent months (the spiky lite quantity distribution exists
  // for exactly this filter).
  private val q39 =
    """WITH #TABLES#,
      |inv AS (
      |  SELECT w_warehouse_sk, i_item_sk, d_moy,
      |    ROUND(AVG(CAST(inv_quantity_on_hand AS DOUBLE)), 4) AS mean,
      |    ROUND(CASE WHEN AVG(inv_quantity_on_hand) = 0 THEN NULL
      |      ELSE STDDEV_SAMP(inv_quantity_on_hand) / AVG(inv_quantity_on_hand)
      |      END, 4) AS cov
      |  FROM inventory, item, warehouse, date_dim
      |  WHERE inv_item_sk = i_item_sk AND inv_warehouse_sk = w_warehouse_sk
      |    AND inv_date_sk = d_date_sk AND d_year = 1998
      |  GROUP BY w_warehouse_sk, i_item_sk, d_moy
      |  HAVING CASE WHEN AVG(inv_quantity_on_hand) = 0 THEN 0
      |         ELSE STDDEV_SAMP(inv_quantity_on_hand) / AVG(inv_quantity_on_hand)
      |         END > 1)
      |SELECT inv1.w_warehouse_sk AS w1, inv1.i_item_sk AS i1,
      |  inv1.d_moy AS moy1, inv1.mean AS mean1, inv1.cov AS cov1,
      |  inv2.d_moy AS moy2, inv2.mean AS mean2, inv2.cov AS cov2
      |FROM inv inv1, inv inv2
      |WHERE inv1.i_item_sk = inv2.i_item_sk
      |  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
      |  AND inv1.d_moy = 3 AND inv2.d_moy = 4
      |ORDER BY w1, i1
      |LIMIT 100"""

  // reference: perf/query72.q — the suite's largest join tree: catalog
  // sales against same-week inventory across every warehouse, double
  // demographic screens, three date_dim roles (sold/snapshot/ship) with
  // the ship-lag predicate, LEFT OUTER promotion and returns.
  private val q72 =
    """WITH #TABLES#
      |SELECT i_item_desc, w_warehouse_name, d1.d_week_seq AS week_seq,
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
      |LIMIT 100"""

  // reference: perf/query67.q — 8-level ROLLUP over the full item/time/
  // store hierarchy, top-100 RANK within each category partition.
  private val q67 =
    """WITH #TABLES#,
      |dw1 AS (
      |  SELECT i_category, i_class, i_brand, i_product_name,
      |    d_year, d_qoy, d_moy, s_store_id,
      |    CAST(SUM(COALESCE(ss_sales_price * ss_quantity, 0)) AS DOUBLE) AS sumsales
      |  FROM store_sales, date_dim, store, item
      |  WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |    AND ss_store_sk = s_store_sk
      |    AND d_month_seq BETWEEN 1176 AND 1187
      |  GROUP BY ROLLUP(i_category, i_class, i_brand, i_product_name,
      |    d_year, d_qoy, d_moy, s_store_id)),
      |dw2 AS (
      |  SELECT dw1.*, RANK() OVER (PARTITION BY i_category
      |    ORDER BY sumsales DESC) AS rk FROM dw1)
      |SELECT i_category, i_class, i_brand, i_product_name,
      |  d_year, d_qoy, d_moy, s_store_id, sumsales, rk
      |FROM dw2
      |WHERE rk <= 100
      |ORDER BY i_category NULLS FIRST, i_class NULLS FIRST,
      |  i_brand NULLS FIRST, i_product_name NULLS FIRST,
      |  d_year NULLS FIRST, d_qoy NULLS FIRST, d_moy NULLS FIRST,
      |  s_store_id NULLS FIRST, sumsales, rk
      |LIMIT 100"""

  // reference: perf/query95.q — orders shipped from MORE THAN ONE
  // warehouse (self-join on order number, warehouse inequality) that
  // also have a return: the double-EXISTS chain over one fact, with the
  // multi-warehouse set reused by both membership tests.
  private val q95 =
    """WITH #TABLES#,
      |ws_wh AS (SELECT ws1.ws_order_number AS ws_order_number
      |  FROM web_sales ws1, web_sales ws2
      |  WHERE ws1.ws_order_number = ws2.ws_order_number
      |    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
      |SELECT CAST(COUNT(DISTINCT ws1.ws_order_number) AS BIGINT) AS order_count,
      |  CAST(SUM(ws1.ws_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
      |  CAST(SUM(ws1.ws_net_profit) AS DOUBLE) AS total_net_profit
      |FROM web_sales ws1
      |JOIN customer_address ca ON (ws1.ws_ship_addr_sk = ca.ca_address_sk)
      |JOIN web_site s ON (ws1.ws_web_site_sk = s.web_site_sk)
      |JOIN date_dim d ON (ws1.ws_ship_date_sk = d.d_date_sk)
      |WHERE d.d_date BETWEEN DATE '1998-02-01' AND DATE '1998-03-31'
      |  AND ca.ca_state = 'S2'
      |  AND s.web_company_name = 'WC1'
      |  AND ws1.ws_order_number IN (SELECT ws_order_number FROM ws_wh)
      |  AND ws1.ws_order_number IN (SELECT wr_order_number FROM web_returns wr
      |    JOIN ws_wh ON wr.wr_order_number = ws_wh.ws_order_number)"""

  // reference: perf/query31.q — county quarter-over-quarter growth: web
  // growth must beat store growth across BOTH q1→q2 and q2→q3 (six
  // instances of two shared channel aggregates joined on county).
  private val q31 =
    """WITH #TABLES#,
      |ss AS (SELECT ca_county, d_qoy, d_year,
      |    CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS store_sales
      |  FROM store_sales, date_dim, customer_address
      |  WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
      |  GROUP BY ca_county, d_qoy, d_year),
      |ws AS (SELECT ca_county, d_qoy, d_year,
      |    CAST(SUM(ws_ext_sales_price) AS DOUBLE) AS web_sales
      |  FROM web_sales, date_dim, customer_address
      |  WHERE ws_sold_date_sk = d_date_sk AND ws_bill_addr_sk = ca_address_sk
      |  GROUP BY ca_county, d_qoy, d_year)
      |SELECT ss1.ca_county, ss1.d_year,
      |  ROUND(ws2.web_sales / ws1.web_sales, 4) AS web_q1_q2_increase,
      |  ROUND(ss2.store_sales / ss1.store_sales, 4) AS store_q1_q2_increase,
      |  ROUND(ws3.web_sales / ws2.web_sales, 4) AS web_q2_q3_increase,
      |  ROUND(ss3.store_sales / ss2.store_sales, 4) AS store_q2_q3_increase
      |FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
      |WHERE ss1.d_qoy = 1 AND ss1.d_year = 1998
      |  AND ss1.ca_county = ss2.ca_county
      |  AND ss2.d_qoy = 2 AND ss2.d_year = 1998
      |  AND ss2.ca_county = ss3.ca_county
      |  AND ss3.d_qoy = 3 AND ss3.d_year = 1998
      |  AND ss1.ca_county = ws1.ca_county
      |  AND ws1.d_qoy = 1 AND ws1.d_year = 1998
      |  AND ws1.ca_county = ws2.ca_county
      |  AND ws2.d_qoy = 2 AND ws2.d_year = 1998
      |  AND ws1.ca_county = ws3.ca_county
      |  AND ws3.d_qoy = 3 AND ws3.d_year = 1998
      |  AND CASE WHEN ws1.web_sales > 0
      |      THEN ws2.web_sales / ws1.web_sales ELSE NULL END >
      |      CASE WHEN ss1.store_sales > 0
      |      THEN ss2.store_sales / ss1.store_sales ELSE NULL END
      |  AND CASE WHEN ws2.web_sales > 0
      |      THEN ws3.web_sales / ws2.web_sales ELSE NULL END >
      |      CASE WHEN ss2.store_sales > 0
      |      THEN ss3.store_sales / ss2.store_sales ELSE NULL END
      |ORDER BY ss1.ca_county
      |LIMIT 100"""

  // reference: perf/query82.q — items in a price/manufacturer slice whose
  // on-hand inventory sat in the 100..500 band during a 60-day window AND
  // that actually sold in store (the inventory×sales semi screen).
  private val q82 =
    """WITH #TABLES#
      |SELECT i_item_id, i_item_desc,
      |  CAST(i_current_price AS DOUBLE) AS i_current_price
      |FROM item, inventory, date_dim, store_sales
      |WHERE i_current_price BETWEEN 30 AND 60
      |  AND inv_item_sk = i_item_sk
      |  AND d_date_sk = inv_date_sk
      |  AND d_date BETWEEN DATE '1998-05-30' AND DATE '1998-07-30'
      |  AND i_manufact_id IN (7, 12, 27, 33)
      |  AND inv_quantity_on_hand BETWEEN 100 AND 500
      |  AND ss_item_sk = i_item_sk
      |GROUP BY i_item_id, i_item_desc, i_current_price
      |ORDER BY i_item_id
      |LIMIT 100"""

  // reference: perf/query40.q — catalog sales net of refunds around a
  // pivot date, per (warehouse state, item): LEFT OUTER returns, the
  // before/after conditional pivot.
  private val q40 =
    """WITH #TABLES#
      |SELECT w_state, i_item_id,
      |  CAST(SUM(CASE WHEN d_date < DATE '1998-04-08'
      |    THEN cs_sales_price - COALESCE(cr_refunded_cash, 0)
      |    ELSE 0 END) AS DOUBLE) AS sales_before,
      |  CAST(SUM(CASE WHEN d_date >= DATE '1998-04-08'
      |    THEN cs_sales_price - COALESCE(cr_refunded_cash, 0)
      |    ELSE 0 END) AS DOUBLE) AS sales_after
      |FROM catalog_sales
      |LEFT OUTER JOIN catalog_returns
      |  ON (catalog_sales.cs_order_number = catalog_returns.cr_order_number
      |    AND catalog_sales.cs_item_sk = catalog_returns.cr_item_sk),
      |  warehouse, item, date_dim
      |WHERE i_current_price BETWEEN 20.00 AND 30.00
      |  AND item.i_item_sk = catalog_sales.cs_item_sk
      |  AND catalog_sales.cs_warehouse_sk = warehouse.w_warehouse_sk
      |  AND catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      |  AND d_date BETWEEN DATE '1998-03-09' AND DATE '1998-05-08'
      |GROUP BY w_state, i_item_id
      |ORDER BY w_state, i_item_id
      |LIMIT 100"""

  // reference: perf/query50.q — return-lag buckets per store: sales
  // joined to their returns on the (ticket, item, customer) triple, the
  // lag counted into 30-day bands, one row per full store address.
  private val q50 =
    """WITH #TABLES#
      |SELECT s_store_name, s_company_id, s_street_number, s_street_name,
      |  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip,
      |  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      |  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30)
      |    AND (sr_returned_date_sk - ss_sold_date_sk <= 60)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
      |  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60)
      |    AND (sr_returned_date_sk - ss_sold_date_sk <= 90)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
      |  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90)
      |    AND (sr_returned_date_sk - ss_sold_date_sk <= 120)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
      |  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS d_over_120
      |FROM store_sales, store_returns, store, date_dim d1, date_dim d2
      |WHERE d2.d_year = 1998 AND d2.d_moy = 9
      |  AND ss_ticket_number = sr_ticket_number
      |  AND ss_item_sk = sr_item_sk
      |  AND ss_sold_date_sk = d1.d_date_sk
      |  AND sr_returned_date_sk = d2.d_date_sk
      |  AND ss_customer_sk = sr_customer_sk
      |  AND ss_store_sk = store.s_store_sk
      |GROUP BY s_store_name, s_company_id, s_street_number, s_street_name,
      |  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
      |ORDER BY s_store_name, s_company_id, s_street_number, s_street_name,
      |  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
      |LIMIT 100"""

  // reference: perf/query66.q — the warehouse 36-column monthly pivot:
  // per-channel 12-month CASE sums (sales + net) UNION ALL'd, then
  // re-aggregated per warehouse with the per-square-foot ratios.
  private def q66Pivot(expr: String, alias: String): String =
    (1 to 12).map(m =>
      s"SUM(CASE WHEN d_moy = $m THEN $expr ELSE 0 END) AS ${alias}$m")
      .mkString(",\n      |    ")

  private def q66Outer(f: Int => String): String =
    (1 to 12).map(f).mkString(",\n      |  ")

  private val q66 =
    s"""WITH #TABLES#,
       |chan AS (
       |  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
       |    w_state, w_country, 'WEB,CATALOG' AS ship_carriers,
       |    d_year AS yr,
       |    ${q66Pivot("ws_ext_sales_price", "s")},
       |    ${q66Pivot("ws_net_profit", "n")}
       |  FROM web_sales, warehouse, date_dim
       |  WHERE ws_warehouse_sk = w_warehouse_sk
       |    AND ws_sold_date_sk = d_date_sk AND d_year = 1998
       |  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
       |    w_state, w_country, d_year
       |  UNION ALL
       |  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
       |    w_state, w_country, 'WEB,CATALOG' AS ship_carriers,
       |    d_year AS yr,
       |    ${q66Pivot("cs_ext_sales_price", "s")},
       |    ${q66Pivot("cs_ext_discount_amt", "n")}
       |  FROM catalog_sales, warehouse, date_dim
       |  WHERE cs_warehouse_sk = w_warehouse_sk
       |    AND cs_sold_date_sk = d_date_sk AND d_year = 1998
       |  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
       |    w_state, w_country, d_year)
       |SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
       |  w_state, w_country, ship_carriers, yr,
       |  ${q66Outer(m => s"CAST(SUM(s$m) AS DOUBLE) AS sales$m")},
       |  ${q66Outer(m =>
              s"ROUND(SUM(CAST(s$m AS DOUBLE) / w_warehouse_sq_ft), 4)" +
                s" AS sqft$m")},
       |  ${q66Outer(m => s"CAST(SUM(n$m) AS DOUBLE) AS net$m")}
       |FROM chan
       |GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
       |  w_state, w_country, ship_carriers, yr
       |ORDER BY w_warehouse_name
       |LIMIT 100"""

  // reference: perf/query7.q — demographic/promotion-sliced store item
  // averages (the OR'd promotion-channel screen).
  private val q7 =
    """WITH #TABLES#
      |SELECT i_item_id,
      |  ROUND(AVG(ss_quantity), 4) AS agg1,
      |  ROUND(AVG(CAST(ss_list_price AS DOUBLE)), 4) AS agg2,
      |  ROUND(AVG(CAST(ss_coupon_amt AS DOUBLE)), 4) AS agg3,
      |  ROUND(AVG(CAST(ss_sales_price AS DOUBLE)), 4) AS agg4
      |FROM store_sales, customer_demographics, date_dim, item, promotion
      |WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |  AND ss_cdemo_sk = cd_demo_sk AND ss_promo_sk = p_promo_sk
      |  AND cd_gender = 'F' AND cd_marital_status = 'MS4'
      |  AND cd_education_status = 'ES2'
      |  AND (p_channel_email = 'N' OR p_channel_event = 'N')
      |  AND d_year = 1998
      |GROUP BY i_item_id
      |ORDER BY i_item_id
      |LIMIT 100"""

  // reference: perf/query15.q — catalog zip revenue with the three-way
  // OR membership screen (zip prefix list, state list, price floor).
  private val q15 =
    """WITH #TABLES#
      |SELECT ca_zip, CAST(SUM(cs_sales_price) AS DOUBLE) AS total_price
      |FROM catalog_sales, tpcds_customer, customer_address, date_dim
      |WHERE cs_bill_customer_sk = c_customer_sk
      |  AND c_current_addr_sk = ca_address_sk
      |  AND (substr(ca_zip, 1, 4) IN ('1008', '1017', '1022', '1031', '1044')
      |    OR ca_state IN ('S3', 'S4')
      |    OR cs_sales_price > 120)
      |  AND cs_sold_date_sk = d_date_sk
      |  AND d_qoy = 2 AND d_year = 1998
      |GROUP BY ca_zip
      |ORDER BY ca_zip
      |LIMIT 100"""

  // reference: perf/query26.q — query7's catalog twin over the new
  // bill-demographic and promo FKs.
  private val q26 =
    """WITH #TABLES#
      |SELECT i_item_id,
      |  ROUND(AVG(cs_quantity), 4) AS agg1,
      |  ROUND(AVG(CAST(cs_list_price AS DOUBLE)), 4) AS agg2,
      |  ROUND(AVG(CAST(cs_coupon_amt AS DOUBLE)), 4) AS agg3,
      |  ROUND(AVG(CAST(cs_sales_price AS DOUBLE)), 4) AS agg4
      |FROM catalog_sales, customer_demographics, date_dim, item, promotion
      |WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
      |  AND cs_bill_cdemo_sk = cd_demo_sk AND cs_promo_sk = p_promo_sk
      |  AND cd_gender = 'F' AND cd_marital_status = 'MS4'
      |  AND cd_education_status = 'ES2'
      |  AND (p_channel_email = 'N' OR p_channel_event = 'N')
      |  AND d_year = 1998
      |GROUP BY i_item_id
      |ORDER BY i_item_id
      |LIMIT 100"""

  // reference: perf/query42.q — category revenue star for one month
  // (the manager screen adapted to the lite manufact id).
  private val q42 =
    """WITH #TABLES#
      |SELECT dt.d_year, item.i_category,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS s
      |FROM date_dim dt, store_sales, item
      |WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      |  AND store_sales.ss_item_sk = item.i_item_sk
      |  AND item.i_manufact_id = 1
      |  AND dt.d_moy = 12 AND dt.d_year = 1998
      |GROUP BY dt.d_year, item.i_category
      |ORDER BY s DESC, dt.d_year, item.i_category
      |LIMIT 100"""

  // reference: perf/query45.q — web zip/county revenue for customers
  // buying the items of an IN-subquery id list.
  private val q45 =
    """WITH #TABLES#
      |SELECT ca_zip, ca_county, CAST(SUM(ws_sales_price) AS DOUBLE) AS total_price
      |FROM web_sales
      |JOIN tpcds_customer ON ws_bill_customer_sk = c_customer_sk
      |JOIN customer_address ON c_current_addr_sk = ca_address_sk
      |JOIN date_dim ON ws_sold_date_sk = d_date_sk
      |JOIN item ON ws_item_sk = i_item_sk
      |WHERE item.i_item_id IN (SELECT i_item_id FROM item i2
      |  WHERE i2.i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29))
      |  AND d_qoy = 2 AND d_year = 1998
      |GROUP BY ca_zip, ca_county
      |ORDER BY ca_zip, ca_county
      |LIMIT 100"""

  // reference: perf/query48.q — the double-OR'd band screen: three
  // demographic×price bands OR'd against three geography×profit bands,
  // both anchored on the same join keys (the CNF/DNF pushdown stress).
  private val q48 =
    """WITH #TABLES#
      |SELECT CAST(SUM(ss_quantity) AS BIGINT) AS total_quantity
      |FROM store_sales, store, customer_demographics, customer_address,
      |  date_dim
      |WHERE s_store_sk = ss_store_sk
      |  AND ss_sold_date_sk = d_date_sk AND d_year = 1998
      |  AND ((cd_demo_sk = ss_cdemo_sk
      |      AND cd_marital_status = 'MS1' AND cd_education_status = 'ES4'
      |      AND ss_sales_price BETWEEN 60.00 AND 80.00)
      |    OR (cd_demo_sk = ss_cdemo_sk
      |      AND cd_marital_status = 'MS1' AND cd_education_status = 'ES4'
      |      AND ss_sales_price BETWEEN 20.00 AND 40.00)
      |    OR (cd_demo_sk = ss_cdemo_sk
      |      AND cd_marital_status = 'MS1' AND cd_education_status = 'ES4'
      |      AND ss_sales_price BETWEEN 80.00 AND 100.00))
      |  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'COUNTRY0'
      |      AND ca_state IN ('S0', 'S1') AND ss_net_profit BETWEEN 0 AND 20)
      |    OR (ss_addr_sk = ca_address_sk AND ca_country = 'COUNTRY0'
      |      AND ca_state IN ('S2') AND ss_net_profit BETWEEN 10 AND 30)
      |    OR (ss_addr_sk = ca_address_sk AND ca_country = 'COUNTRY0'
      |      AND ca_state IN ('S3', 'S4') AND ss_net_profit BETWEEN 5 AND 50))"""

  // reference: perf/query73.q — ticket-grain item-count band (1..5) per
  // buying-potential household, joined back to the customer (query34's
  // low-band sibling with the dep/vehicle ratio screen).
  private val q73 =
    """WITH #TABLES#,
      |dj AS (
      |  SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      |  FROM store_sales, date_dim, store, household_demographics
      |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
      |    AND ss_hdemo_sk = hd_demo_sk
      |    AND d_dom BETWEEN 1 AND 2
      |    AND (hd_buy_potential = 'BP1' OR hd_buy_potential = 'BP2')
      |    AND hd_vehicle_count > 0
      |    AND CASE WHEN hd_vehicle_count > 0
      |        THEN CAST(hd_dep_count AS DOUBLE) / hd_vehicle_count
      |        ELSE NULL END > 1
      |    AND d_year IN (1998, 1999, 2000)
      |    AND s_county IN ('COUNTY0', 'COUNTY1', 'COUNTY2')
      |  GROUP BY ss_ticket_number, ss_customer_sk)
      |SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
      |  ss_ticket_number, CAST(cnt AS BIGINT) AS cnt
      |FROM dj, tpcds_customer
      |WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
      |ORDER BY cnt DESC, c_last_name, c_first_name, ss_ticket_number
      |LIMIT 100"""

  // reference: perf/query96.q — the half-hour traffic count (query88's
  // single-cell form) as its own scalar query.
  private val q96 =
    """WITH #TABLES#
      |SELECT CAST(COUNT(*) AS BIGINT) AS c
      |FROM store_sales, household_demographics, time_dim, store
      |WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk
      |  AND ss_store_sk = s_store_sk
      |  AND t_hour = 8 AND t_minute >= 30
      |  AND hd_dep_count = 5
      |  AND s_store_name = 'STORE3'
      |ORDER BY c
      |LIMIT 100"""

  // reference: perf/query25.q — the store-sale → store-return →
  // catalog-repurchase profit chain: three date_dim roles window the
  // three facts, profit/loss/profit summed per (item, store).
  private val q25 =
    """WITH #TABLES#
      |SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
      |  CAST(SUM(ss_net_profit) AS DOUBLE) AS store_sales_profit,
      |  CAST(SUM(sr_net_loss) AS DOUBLE) AS store_returns_loss,
      |  CAST(SUM(cs_net_profit) AS DOUBLE) AS catalog_sales_profit
      |FROM store_sales, store_returns, catalog_sales,
      |  date_dim d1, date_dim d2, date_dim d3, store, item
      |WHERE d1.d_moy = 4 AND d1.d_year = 1998
      |  AND d1.d_date_sk = ss_sold_date_sk
      |  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
      |  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
      |  AND ss_ticket_number = sr_ticket_number
      |  AND sr_returned_date_sk = d2.d_date_sk
      |  AND d2.d_moy BETWEEN 4 AND 10 AND d2.d_year = 1998
      |  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
      |  AND cs_sold_date_sk = d3.d_date_sk
      |  AND d3.d_moy BETWEEN 4 AND 10 AND d3.d_year = 1998
      |GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
      |ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
      |LIMIT 100"""

  // reference: perf/query29.q — query25's quantity twin with the 3-year
  // catalog window.
  private val q29 =
    """WITH #TABLES#
      |SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
      |  CAST(SUM(ss_quantity) AS BIGINT) AS store_sales_quantity,
      |  CAST(SUM(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
      |  CAST(SUM(cs_quantity) AS BIGINT) AS catalog_sales_quantity
      |FROM store_sales, store_returns, catalog_sales,
      |  date_dim d1, date_dim d2, date_dim d3, store, item
      |WHERE d1.d_moy = 2 AND d1.d_year = 1998
      |  AND d1.d_date_sk = ss_sold_date_sk
      |  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
      |  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
      |  AND ss_ticket_number = sr_ticket_number
      |  AND sr_returned_date_sk = d2.d_date_sk
      |  AND d2.d_moy BETWEEN 2 AND 5 AND d2.d_year = 1998
      |  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
      |  AND cs_sold_date_sk = d3.d_date_sk
      |  AND d3.d_year IN (1998, 1999, 2000)
      |GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
      |ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
      |LIMIT 100"""

  // reference: perf/query52.q — brand revenue star for one month, ordered
  // by revenue within the year.
  private val q52 =
    """WITH #TABLES#
      |SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS ext_price
      |FROM date_dim dt, store_sales, item
      |WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      |  AND store_sales.ss_item_sk = item.i_item_sk
      |  AND item.i_manufact_id = 1
      |  AND dt.d_moy = 12 AND dt.d_year = 1998
      |GROUP BY dt.d_year, item.i_brand, item.i_brand_id
      |ORDER BY dt.d_year, ext_price DESC, brand_id
      |LIMIT 100"""

  // reference: perf/query55.q — the brand star ordered by revenue alone
  // (query52 without the year key).
  private val q55 =
    """WITH #TABLES#
      |SELECT i_brand_id AS brand_id, i_brand AS brand,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS ext_price
      |FROM date_dim, store_sales, item
      |WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
      |  AND i_manufact_id = 36 AND d_moy = 12 AND d_year = 1998
      |GROUP BY i_brand, i_brand_id
      |ORDER BY ext_price DESC, brand_id
      |LIMIT 100"""

  // reference: perf/query68.q — bought-city ticket aggregate where the
  // customer's CURRENT city differs (customer_address in two roles, the
  // query46 family with the extended-price/tax/list triple).
  private val q68 =
    """WITH #TABLES#,
      |dn AS (
      |  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
      |    SUM(ss_ext_sales_price) AS extended_price,
      |    SUM(ss_ext_list_price) AS list_price,
      |    SUM(ss_ext_tax) AS extended_tax
      |  FROM store_sales, date_dim, store, household_demographics,
      |    customer_address
      |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
      |    AND ss_hdemo_sk = hd_demo_sk AND ss_addr_sk = ca_address_sk
      |    AND d_dom BETWEEN 1 AND 2
      |    AND (hd_dep_count = 4 OR hd_vehicle_count = 2)
      |    AND d_year IN (1998, 1999, 2000)
      |    AND s_city IN ('CITY1', 'CITY2')
      |  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city)
      |SELECT c_last_name, c_first_name, current_addr.ca_city AS ca_city,
      |  bought_city, ss_ticket_number,
      |  CAST(extended_price AS DOUBLE) AS extended_price,
      |  CAST(extended_tax AS DOUBLE) AS extended_tax,
      |  CAST(list_price AS DOUBLE) AS list_price
      |FROM dn, tpcds_customer, customer_address current_addr
      |WHERE ss_customer_sk = c_customer_sk
      |  AND c_current_addr_sk = current_addr.ca_address_sk
      |  AND current_addr.ca_city <> bought_city
      |ORDER BY c_last_name, ss_ticket_number, c_first_name, ca_city,
      |  bought_city, extended_price, extended_tax, list_price
      |LIMIT 100"""

  // reference: perf/query79.q — per-ticket coupon/profit for large
  // stores on Mondays, joined back to the customer.
  private val q79 =
    """WITH #TABLES#,
      |ms AS (
      |  SELECT ss_ticket_number, ss_customer_sk, store.s_city,
      |    SUM(ss_coupon_amt) AS amt, SUM(ss_net_profit) AS profit
      |  FROM store_sales, date_dim, store, household_demographics
      |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
      |    AND ss_hdemo_sk = hd_demo_sk
      |    AND (hd_dep_count = 8 OR hd_vehicle_count > 0)
      |    AND d_dow = 1
      |    AND d_year IN (1998, 1999, 2000)
      |    AND s_number_employees BETWEEN 200 AND 295
      |  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city)
      |SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS sub,
      |  ss_ticket_number, CAST(amt AS DOUBLE) AS amt,
      |  CAST(profit AS DOUBLE) AS profit
      |FROM ms, tpcds_customer
      |WHERE ss_customer_sk = c_customer_sk
      |ORDER BY c_last_name, c_first_name, sub, profit, ss_ticket_number, amt
      |LIMIT 100"""

  // reference: perf/query84.q — the customer-by-income-band lookup: five
  // dimension hops (address → demographics → household → income band)
  // semi-screened by having a store return under the same demographic.
  private val q84 =
    """WITH #TABLES#
      |SELECT c_customer_id AS customer_id,
      |  c_last_name || ', ' || c_first_name AS customername
      |FROM tpcds_customer, customer_address, customer_demographics,
      |  household_demographics, income_band, store_returns
      |WHERE ca_city = 'CITY7'
      |  AND c_current_addr_sk = ca_address_sk
      |  AND ib_lower_bound >= 32287
      |  AND ib_upper_bound <= 32287 + 50000
      |  AND ib_income_band_sk = hd_income_band_sk
      |  AND cd_demo_sk = c_current_cdemo_sk
      |  AND hd_demo_sk = c_current_hdemo_sk
      |  AND sr_cdemo_sk = cd_demo_sk
      |ORDER BY customer_id
      |LIMIT 100"""

  // reference: perf/query98.q — query12's store twin: class-partitioned
  // revenue ratio, no LIMIT in the reference (the full slice returns).
  private val q98 =
    """WITH #TABLES#
      |SELECT i_item_desc, i_category, i_class,
      |  CAST(i_current_price AS DOUBLE) AS i_current_price, i_item_id,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS itemrevenue,
      |  ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE) * 100 /
      |    CAST(SUM(SUM(ss_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE),
      |    4) AS revenueratio
      |FROM store_sales, item, date_dim
      |WHERE ss_item_sk = i_item_sk
      |  AND i_category IN ('CAT4', 'CAT5', 'CAT6')
      |  AND ss_sold_date_sk = d_date_sk
      |  AND d_date BETWEEN DATE '1998-01-12' AND DATE '1998-02-11'
      |GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
      |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio"""

  // reference: perf/query92.q — the same store/catalog buyer-item overlap
  // shape as query97.q (the reference ships it twice with different month
  // windows); this one runs the 1182..1193 window.
  private val q92 =
    """WITH #TABLES#
      |SELECT
      |  CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
      |  CAST(SUM(CASE WHEN ssci.customer_sk IS NULL AND csci.customer_sk IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
      |  CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
      |FROM (SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
      |      FROM store_sales
      |      JOIN date_dim ON store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |      WHERE d_month_seq BETWEEN 1182 AND 1193
      |      GROUP BY ss_customer_sk, ss_item_sk) ssci
      |FULL OUTER JOIN
      |     (SELECT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
      |      FROM catalog_sales
      |      JOIN date_dim ON catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      |      WHERE d_month_seq BETWEEN 1182 AND 1193
      |      GROUP BY cs_bill_customer_sk, cs_item_sk) csci
      |ON ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk"""

  // reference: perf/query13.q — the triple-OR demographic band × triple-OR
  // geography band scalar averages (query48 with household_demographics in
  // the demographic arms and avg outputs).
  private val q13 =
    """WITH #TABLES#
      |SELECT ROUND(AVG(ss_quantity), 4) AS avg_qty,
      |  ROUND(AVG(CAST(ss_ext_sales_price AS DOUBLE)), 4) AS avg_esp,
      |  ROUND(AVG(CAST(ss_ext_wholesale_cost AS DOUBLE)), 4) AS avg_ewc,
      |  CAST(SUM(ss_ext_wholesale_cost) AS DOUBLE) AS sum_ewc
      |FROM store_sales, store, customer_demographics,
      |  household_demographics, customer_address, date_dim
      |WHERE s_store_sk = ss_store_sk
      |  AND ss_sold_date_sk = d_date_sk AND d_year = 1998
      |  AND ((ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
      |      AND cd_marital_status = 'MS1' AND cd_education_status = 'ES4'
      |      AND ss_sales_price BETWEEN 60.00 AND 80.00 AND hd_dep_count = 3)
      |    OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
      |      AND cd_marital_status = 'MS2' AND cd_education_status = 'ES1'
      |      AND ss_sales_price BETWEEN 20.00 AND 40.00 AND hd_dep_count = 1)
      |    OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
      |      AND cd_marital_status = 'MS4' AND cd_education_status = 'ES6'
      |      AND ss_sales_price BETWEEN 80.00 AND 100.00 AND hd_dep_count = 1))
      |  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'COUNTRY0'
      |      AND ca_state IN ('S0', 'S1') AND ss_net_profit BETWEEN 10 AND 20)
      |    OR (ss_addr_sk = ca_address_sk AND ca_country = 'COUNTRY0'
      |      AND ca_state IN ('S2') AND ss_net_profit BETWEEN 15 AND 30)
      |    OR (ss_addr_sk = ca_address_sk AND ca_country = 'COUNTRY0'
      |      AND ca_state IN ('S3', 'S4') AND ss_net_profit BETWEEN 5 AND 25))"""

  // reference: perf/query19.q — brand/manufacturer revenue where the
  // customer's zip prefix differs from the store's (the cross-dimension
  // inequality screen).
  private val q19 =
    """WITH #TABLES#
      |SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id,
      |  i_manufact, CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS ext_price
      |FROM date_dim, store_sales, item, tpcds_customer, customer_address,
      |  store
      |WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
      |  AND i_manufact_id BETWEEN 7 AND 12
      |  AND d_moy = 11 AND d_year = 1998
      |  AND ss_customer_sk = c_customer_sk
      |  AND c_current_addr_sk = ca_address_sk
      |  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
      |  AND ss_store_sk = s_store_sk
      |GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
      |ORDER BY ext_price DESC, i_brand, i_brand_id, i_manufact_id, i_manufact
      |LIMIT 100"""

  // reference: perf/query20.q — query12/query98's catalog sibling.
  private val q20 =
    """WITH #TABLES#
      |SELECT i_item_desc, i_category, i_class,
      |  CAST(i_current_price AS DOUBLE) AS i_current_price, i_item_id,
      |  CAST(SUM(cs_ext_sales_price) AS DOUBLE) AS itemrevenue,
      |  ROUND(CAST(SUM(cs_ext_sales_price) AS DOUBLE) * 100 /
      |    CAST(SUM(SUM(cs_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE),
      |    4) AS revenueratio
      |FROM catalog_sales, item, date_dim
      |WHERE cs_item_sk = i_item_sk
      |  AND i_category IN ('CAT7', 'CAT8', 'CAT9')
      |  AND cs_sold_date_sk = d_date_sk
      |  AND d_date BETWEEN DATE '1998-01-12' AND DATE '1998-02-11'
      |GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
      |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
      |LIMIT 100"""

  // reference: perf/query54.q — customer revenue segmentation: buyers of
  // one item slice in a month (either remote channel), their store
  // revenue in the following quarter where they live in a store county,
  // bucketed into $50 segments. CAST(FLOOR(...)) replaces the
  // reference's bare CAST(... AS INT): DuckDB rounds that cast where
  // Spark truncates, so the shared text pins the truncation.
  private val q54 =
    """WITH #TABLES#,
      |my_customers AS (
      |  SELECT c_customer_sk, c_current_addr_sk
      |  FROM (SELECT cs_sold_date_sk AS sold_date_sk,
      |          cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
      |        FROM catalog_sales
      |        UNION ALL
      |        SELECT ws_sold_date_sk, ws_bill_customer_sk, ws_item_sk
      |        FROM web_sales) cs_or_ws_sales, item, date_dim, tpcds_customer
      |  WHERE sold_date_sk = d_date_sk AND item_sk = i_item_sk
      |    AND i_category = 'CAT1' AND i_class = 'CLASS6'
      |    AND c_customer_sk = cs_or_ws_sales.customer_sk
      |    AND d_moy = 3 AND d_year = 1998
      |  GROUP BY c_customer_sk, c_current_addr_sk),
      |my_revenue AS (
      |  SELECT c_customer_sk, SUM(ss_ext_sales_price) AS revenue
      |  FROM my_customers, store_sales, customer_address, store, date_dim
      |  WHERE c_current_addr_sk = ca_address_sk
      |    AND ca_county = s_county AND ca_state = s_state
      |    AND ss_sold_date_sk = d_date_sk
      |    AND c_customer_sk = ss_customer_sk
      |    AND d_month_seq BETWEEN 1179 AND 1181
      |  GROUP BY c_customer_sk),
      |segments AS (
      |  SELECT CAST(FLOOR(revenue / 50) AS INT) AS segment FROM my_revenue)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS num_customers,
      |  segment * 50 AS segment_base
      |FROM segments
      |GROUP BY segment
      |ORDER BY segment, num_customers
      |LIMIT 100"""

  // reference: perf/query65.q — items stuck below 10% of their store's
  // average item revenue (the shared-subquery min-avg screen; the
  // revenue CTE is referenced twice — the ReusedExchange shape on an
  // aggregate, not a scan).
  private val q65 =
    """WITH #TABLES#,
      |sc AS (
      |  SELECT ss_store_sk, ss_item_sk, SUM(ss_sales_price) AS revenue
      |  FROM store_sales, date_dim
      |  WHERE ss_sold_date_sk = d_date_sk
      |    AND d_month_seq BETWEEN 1176 AND 1187
      |  GROUP BY ss_store_sk, ss_item_sk),
      |sb AS (
      |  SELECT ss_store_sk, AVG(CAST(revenue AS DOUBLE)) AS ave
      |  FROM sc GROUP BY ss_store_sk)
      |SELECT s_store_name, i_item_desc,
      |  CAST(sc.revenue AS DOUBLE) AS revenue,
      |  CAST(i_current_price AS DOUBLE) AS i_current_price,
      |  CAST(i_wholesale_cost AS DOUBLE) AS i_wholesale_cost, i_brand
      |FROM store, item, sb, sc
      |WHERE sb.ss_store_sk = sc.ss_store_sk
      |  AND CAST(sc.revenue AS DOUBLE) <= 0.72 * sb.ave
      |  AND s_store_sk = sc.ss_store_sk
      |  AND i_item_sk = sc.ss_item_sk
      |ORDER BY s_store_name, i_item_desc, revenue
      |LIMIT 100"""

  // reference: perf/query71.q — brand revenue by minute across all three
  // channels UNION ALL'd, restricted to meal-time hours.
  private val q71 =
    """WITH #TABLES#
      |SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
      |  CAST(SUM(ext_price) AS DOUBLE) AS ext_price
      |FROM item
      |JOIN (SELECT ws_ext_sales_price AS ext_price,
      |        ws_item_sk AS sold_item_sk, ws_sold_time_sk AS time_sk
      |      FROM web_sales, date_dim
      |      WHERE d_date_sk = ws_sold_date_sk AND d_moy = 12 AND d_year = 1998
      |      UNION ALL
      |      SELECT cs_ext_sales_price, cs_item_sk, cs_sold_time_sk
      |      FROM catalog_sales, date_dim
      |      WHERE d_date_sk = cs_sold_date_sk AND d_moy = 12 AND d_year = 1998
      |      UNION ALL
      |      SELECT ss_ext_sales_price, ss_item_sk, ss_sold_time_sk
      |      FROM store_sales, date_dim
      |      WHERE d_date_sk = ss_sold_date_sk AND d_moy = 12 AND d_year = 1998
      |  ) tmp ON tmp.sold_item_sk = item.i_item_sk
      |JOIN time_dim ON tmp.time_sk = time_dim.t_time_sk
      |WHERE i_manufact_id = 1
      |  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
      |GROUP BY i_brand, i_brand_id, t_hour, t_minute
      |ORDER BY ext_price DESC, i_brand_id, t_hour, t_minute
      |LIMIT 100"""

  // reference: perf/query75.q — year-over-year net sales (quantity minus
  // returns) per item nibble across ALL THREE channels with their
  // returns LEFT JOINed, declining lines only. The ratio screen runs in
  // DOUBLE (int/int division is exact in both engines) instead of the
  // reference's DECIMAL(17,2) division, whose result scale differs
  // between engines.
  private def q75Chan(fact: String, item: String, date: String, qty: String,
      amt: String, ret: String, retJoin: String, rq: String,
      ra: String): String =
    s"""SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
       |  $qty - COALESCE($rq, 0) AS sales_cnt,
       |  $amt - COALESCE($ra, 0.0) AS sales_amt
       |FROM $fact
       |JOIN item ON i_item_sk = $item
       |JOIN date_dim ON d_date_sk = $date
       |LEFT JOIN $ret ON ($retJoin)
       |WHERE i_category = 'CAT2'"""

  private val q75 =
    s"""WITH #TABLES#,
       |all_sales AS (
       |  SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
       |    CAST(SUM(sales_cnt) AS BIGINT) AS sales_cnt,
       |    SUM(sales_amt) AS sales_amt
       |  FROM (${q75Chan("catalog_sales", "cs_item_sk", "cs_sold_date_sk",
              "cs_quantity", "cs_ext_sales_price", "catalog_returns",
              "cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk",
              "cr_return_quantity", "cr_return_amount")}
       |    UNION ALL
       |    ${q75Chan("store_sales", "ss_item_sk", "ss_sold_date_sk",
              "ss_quantity", "ss_ext_sales_price", "store_returns",
              "ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk",
              "sr_return_quantity", "sr_return_amt")}
       |    UNION ALL
       |    ${q75Chan("web_sales", "ws_item_sk", "ws_sold_date_sk",
              "ws_quantity", "ws_ext_sales_price", "web_returns",
              "ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk",
              "wr_return_quantity", "wr_return_amt")}) sales_detail
       |  GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
       |SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS year_,
       |  curr_yr.i_brand_id, curr_yr.i_class_id, curr_yr.i_category_id,
       |  curr_yr.i_manufact_id,
       |  prev_yr.sales_cnt AS prev_yr_cnt, curr_yr.sales_cnt AS curr_yr_cnt,
       |  curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
       |  CAST(curr_yr.sales_amt - prev_yr.sales_amt AS DOUBLE) AS sales_amt_diff
       |FROM all_sales curr_yr, all_sales prev_yr
       |WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
       |  AND curr_yr.i_class_id = prev_yr.i_class_id
       |  AND curr_yr.i_category_id = prev_yr.i_category_id
       |  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
       |  AND curr_yr.d_year = 1999 AND prev_yr.d_year = 1998
       |  AND CAST(curr_yr.sales_cnt AS DOUBLE) /
       |      CAST(prev_yr.sales_cnt AS DOUBLE) < 0.9
       |ORDER BY sales_cnt_diff, curr_yr.i_brand_id, curr_yr.i_class_id,
       |  curr_yr.i_category_id, curr_yr.i_manufact_id
       |LIMIT 100"""

  // reference: perf/query76.q — sales recorded with a NULL dimension key,
  // per channel (the data-quality audit union; the lite facts carry
  // deliberate NULL tails in exactly these three FKs).
  private val q76 =
    """WITH #TABLES#
      |SELECT channel, col_name, d_year, d_qoy, i_category,
      |  CAST(COUNT(*) AS BIGINT) AS sales_cnt,
      |  CAST(SUM(ext_sales_price) AS DOUBLE) AS sales_amt
      |FROM (
      |  SELECT 'store' AS channel, 'ss_addr_sk' AS col_name, d_year, d_qoy,
      |    i_category, ss_ext_sales_price AS ext_sales_price
      |  FROM store_sales, item, date_dim
      |  WHERE ss_addr_sk IS NULL
      |    AND ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |  UNION ALL
      |  SELECT 'web', 'ws_web_page_sk', d_year, d_qoy, i_category,
      |    ws_ext_sales_price
      |  FROM web_sales, item, date_dim
      |  WHERE ws_web_page_sk IS NULL
      |    AND ws_sold_date_sk = d_date_sk AND ws_item_sk = i_item_sk
      |  UNION ALL
      |  SELECT 'catalog', 'cs_warehouse_sk', d_year, d_qoy, i_category,
      |    cs_ext_sales_price
      |  FROM catalog_sales, item, date_dim
      |  WHERE cs_warehouse_sk IS NULL
      |    AND cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk) foo
      |GROUP BY channel, col_name, d_year, d_qoy, i_category
      |ORDER BY channel, col_name, d_year, d_qoy, i_category
      |LIMIT 100"""

  // reference: perf/query80.q — three channel (sales, returns, profit)
  // triples keyed by store / catalog page / web site, ROLLUP over the
  // channel-id union.
  private def q80Chan(alias: String, fact: String, ret: String,
      retJoin: String, date: String, chanKey: String, keyDim: String,
      keyJoin: String, sales: String, retAmt: String, profit: String,
      retLoss: String, promo: String): String =
    s"""$alias AS (
       |  SELECT $chanKey AS chan_id,
       |    SUM($sales) AS sales,
       |    SUM(COALESCE($retAmt, 0)) AS returns_amt,
       |    SUM($profit - COALESCE($retLoss, 0)) AS profit
       |  FROM $fact LEFT OUTER JOIN $ret ON ($retJoin),
       |    date_dim, $keyDim, item, promotion
       |  WHERE $date = d_date_sk
       |    AND d_date BETWEEN DATE '1998-08-04' AND DATE '1998-09-04'
       |    AND $keyJoin
       |    AND i_current_price > 50
       |    AND $promo = p_promo_sk AND p_channel_tv = 'N'
       |  GROUP BY $chanKey)"""

  private val q80 =
    s"""WITH #TABLES#,
       |${q80Chan("ssr", "store_sales", "store_returns",
          "ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number",
          "ss_sold_date_sk", "'store' || s_store_id", "store",
          "ss_store_sk = s_store_sk AND ss_item_sk = i_item_sk",
          "ss_ext_sales_price", "sr_return_amt", "ss_net_profit",
          "sr_net_loss", "ss_promo_sk")},
       |${q80Chan("csr", "catalog_sales", "catalog_returns",
          "cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number",
          "cs_sold_date_sk", "'catalog_page' || cp_catalog_page_id",
          "catalog_page",
          "cs_catalog_page_sk = cp_catalog_page_sk AND cs_item_sk = i_item_sk",
          "cs_ext_sales_price", "cr_return_amount", "cs_net_profit",
          "cr_net_loss", "cs_promo_sk")},
       |${q80Chan("wsr", "web_sales", "web_returns",
          "ws_item_sk = wr_item_sk AND ws_order_number = wr_order_number",
          "ws_sold_date_sk", "'web_site' || web_site_id", "web_site",
          "ws_web_site_sk = web_site_sk AND ws_item_sk = i_item_sk",
          "ws_ext_sales_price", "wr_return_amt", "ws_net_profit",
          "wr_net_loss", "ws_promo_sk")}
       |SELECT channel, id, CAST(SUM(sales) AS DOUBLE) AS sales,
       |  CAST(SUM(returns_amt) AS DOUBLE) AS returns_amt,
       |  CAST(SUM(profit) AS DOUBLE) AS profit
       |FROM (SELECT 'store channel' AS channel, chan_id AS id, sales,
       |        returns_amt, profit FROM ssr
       |      UNION ALL
       |      SELECT 'catalog channel', chan_id, sales, returns_amt, profit
       |      FROM csr
       |      UNION ALL
       |      SELECT 'web channel', chan_id, sales, returns_amt, profit
       |      FROM wsr) x
       |GROUP BY ROLLUP (channel, id)
       |ORDER BY channel NULLS FIRST, id NULLS FIRST
       |LIMIT 100"""

  // reference: perf/query85.q — web returns by reason under the paired
  // refunded/returning-demographic equality screen and the geography
  // band OR (customer_demographics joined twice).
  private val q85 =
    """WITH #TABLES#
      |SELECT substr(r_reason_desc, 1, 20) AS r,
      |  ROUND(AVG(ws_quantity), 4) AS wq,
      |  ROUND(AVG(CAST(wr_refunded_cash AS DOUBLE)), 4) AS ref,
      |  ROUND(AVG(CAST(wr_fee AS DOUBLE)), 4) AS fee
      |FROM web_sales, web_returns, web_page, customer_demographics cd1,
      |  customer_demographics cd2, customer_address, date_dim, reason
      |WHERE ws_web_page_sk = wp_web_page_sk
      |  AND ws_item_sk = wr_item_sk AND ws_order_number = wr_order_number
      |  AND ws_sold_date_sk = d_date_sk AND d_year = 1998
      |  AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
      |  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
      |  AND ca_address_sk = wr_refunded_addr_sk
      |  AND r_reason_sk = wr_reason_sk
      |  AND ((cd1.cd_marital_status = 'MS1'
      |      AND cd1.cd_marital_status = cd2.cd_marital_status
      |      AND cd1.cd_education_status = 'ES4'
      |      AND cd1.cd_education_status = cd2.cd_education_status
      |      AND ws_sales_price BETWEEN 30.00 AND 50.00)
      |    OR (cd1.cd_marital_status = 'MS2'
      |      AND cd1.cd_marital_status = cd2.cd_marital_status
      |      AND cd1.cd_education_status = 'ES1'
      |      AND cd1.cd_education_status = cd2.cd_education_status
      |      AND ws_sales_price BETWEEN 10.00 AND 30.00)
      |    OR (cd1.cd_marital_status = 'MS4'
      |      AND cd1.cd_marital_status = cd2.cd_marital_status
      |      AND cd1.cd_education_status = 'ES6'
      |      AND cd1.cd_education_status = cd2.cd_education_status
      |      AND ws_sales_price BETWEEN 50.00 AND 70.00))
      |  AND ((ca_country = 'COUNTRY0' AND ca_state IN ('S0', 'S1')
      |      AND ws_net_profit BETWEEN 10 AND 90)
      |    OR (ca_country = 'COUNTRY0' AND ca_state IN ('S2')
      |      AND ws_net_profit BETWEEN 5 AND 100)
      |    OR (ca_country = 'COUNTRY0' AND ca_state IN ('S3', 'S4')
      |      AND ws_net_profit BETWEEN 0 AND 110))
      |GROUP BY r_reason_desc
      |ORDER BY r, wq, ref, fee
      |LIMIT 100"""

  // reference: perf/query90.q — the am/pm web-traffic ratio: two scalar
  // counts over (time band × dep count × page size) cross-joined into one
  // division. DOUBLE division replaces the reference's DECIMAL(15,4)
  // division (engine-dependent result scale).
  private val q90 =
    """WITH #TABLES#,
      |at_ AS (SELECT COUNT(*) AS amc
      |  FROM web_sales, household_demographics, time_dim, web_page
      |  WHERE ws_sold_time_sk = t_time_sk
      |    AND ws_ship_hdemo_sk = hd_demo_sk
      |    AND ws_web_page_sk = wp_web_page_sk
      |    AND t_hour BETWEEN 6 AND 7
      |    AND hd_dep_count = 8
      |    AND wp_char_count BETWEEN 5000 AND 5200),
      |pt AS (SELECT COUNT(*) AS pmc
      |  FROM web_sales, household_demographics, time_dim, web_page
      |  WHERE ws_sold_time_sk = t_time_sk
      |    AND ws_ship_hdemo_sk = hd_demo_sk
      |    AND ws_web_page_sk = wp_web_page_sk
      |    AND t_hour BETWEEN 14 AND 15
      |    AND hd_dep_count = 8
      |    AND wp_char_count BETWEEN 5000 AND 5200)
      |SELECT ROUND(CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE), 4)
      |  AS am_pm_ratio
      |FROM at_, pt
      |ORDER BY am_pm_ratio
      |LIMIT 100"""

  // reference: perf/query91.q — call-center catalog-return losses for one
  // month under demographic and buy-potential screens (five dimension
  // hops off the returning customer).
  private val q91 =
    """WITH #TABLES#
      |SELECT cc_call_center_id AS call_center, cc_name AS call_center_name,
      |  cc_manager AS manager,
      |  CAST(SUM(cr_net_loss) AS DOUBLE) AS returns_loss
      |FROM call_center, catalog_returns, date_dim, tpcds_customer,
      |  customer_address, customer_demographics, household_demographics
      |WHERE cr_call_center_sk = cc_call_center_sk
      |  AND cr_returned_date_sk = d_date_sk
      |  AND cr_returning_customer_sk = c_customer_sk
      |  AND cd_demo_sk = c_current_cdemo_sk
      |  AND hd_demo_sk = c_current_hdemo_sk
      |  AND ca_address_sk = c_current_addr_sk
      |  AND d_year = 1998 AND d_moy = 11
      |  AND ((cd_marital_status = 'MS0' AND cd_education_status = 'ES0')
      |    OR (cd_marital_status = 'MS0' AND cd_education_status = 'ES6'))
      |  AND hd_buy_potential LIKE 'BP0%'
      |  AND ca_gmt_offset = -5
      |GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status,
      |  cd_education_status
      |ORDER BY returns_loss DESC, call_center, call_center_name, manager
      |LIMIT 100"""

  // reference: perf/query93.q — per-customer sales adjusted by returned
  // quantity for one return reason (the LEFT OUTER whose WHERE makes the
  // reason join effectively inner — kept verbatim).
  private val q93 =
    """WITH #TABLES#,
      |t AS (
      |  SELECT ss_customer_sk,
      |    CASE WHEN sr_return_quantity IS NOT NULL
      |         THEN (ss_quantity - sr_return_quantity) * ss_sales_price
      |         ELSE ss_quantity * ss_sales_price END AS act_sales
      |  FROM store_sales
      |  LEFT OUTER JOIN store_returns
      |    ON (sr_item_sk = ss_item_sk AND sr_ticket_number = ss_ticket_number),
      |    reason
      |  WHERE sr_reason_sk = r_reason_sk
      |    AND r_reason_desc = 'REASON5')
      |SELECT ss_customer_sk, CAST(SUM(act_sales) AS DOUBLE) AS sumsales
      |FROM t
      |GROUP BY ss_customer_sk
      |ORDER BY sumsales, ss_customer_sk
      |LIMIT 100"""

  // reference: perf/query18.q — catalog demographics ROLLUP over the
  // customer geography hierarchy with seven averages, customer_
  // demographics in two roles (bill-time cd1 filtered, current cd2
  // joined through the customer).
  private val q18 =
    """WITH #TABLES#
      |SELECT i_item_id, ca_country, ca_state, ca_county,
      |  ROUND(AVG(CAST(cs_quantity AS DOUBLE)), 4) AS agg1,
      |  ROUND(AVG(CAST(cs_list_price AS DOUBLE)), 4) AS agg2,
      |  ROUND(AVG(CAST(cs_coupon_amt AS DOUBLE)), 4) AS agg3,
      |  ROUND(AVG(CAST(cs_sales_price AS DOUBLE)), 4) AS agg4,
      |  ROUND(AVG(CAST(cs_net_profit AS DOUBLE)), 4) AS agg5,
      |  ROUND(AVG(CAST(c_birth_year AS DOUBLE)), 4) AS agg6,
      |  ROUND(AVG(CAST(cd1.cd_dep_count AS DOUBLE)), 4) AS agg7
      |FROM catalog_sales, date_dim, customer_demographics cd1, item,
      |  tpcds_customer, customer_address, customer_demographics cd2
      |WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
      |  AND cs_bill_cdemo_sk = cd1.cd_demo_sk
      |  AND cs_bill_customer_sk = c_customer_sk
      |  AND cd1.cd_gender = 'M' AND cd1.cd_education_status = 'ES5'
      |  AND c_current_cdemo_sk = cd2.cd_demo_sk
      |  AND c_current_addr_sk = ca_address_sk
      |  AND c_birth_month IN (9, 5, 12, 4, 1, 10)
      |  AND d_year = 1998
      |  AND ca_state IN ('S0', 'S1', 'S2', 'S3')
      |GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
      |ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST,
      |  ca_county NULLS FIRST, i_item_id NULLS FIRST
      |LIMIT 100"""

  val all: Seq[Qd] = Seq(
    q("q265_tpcds_q3", q3),
    q("q266_tpcds_q88", q88),
    q("q267_tpcds_q12", q12),
    q("q268_tpcds_q27", q27),
    q("q269_tpcds_q34", q34),
    q("q270_tpcds_q51", q51),
    q("q271_tpcds_q17", q17),
    q("q272_tpcds_q64", q64),
    q("q278_tpcds_q28", q28),
    q("q279_tpcds_q70", q70),
    q("q281_tpcds_q32", q32),
    q("q282_tpcds_q46", q46),
    q("q283_tpcds_q94", q94),
    q("q284_tpcds_q58", q58),
    q("q285_tpcds_q87", q87),
    q("q286_tpcds_q97", q97),
    q("q287_tpcds_q89", q89),
    q("q288_tpcds_q43", q43),
    q("q290_tpcds_q21", q21),
    q("q291_tpcds_q22", q22),
    q("q292_tpcds_q39", q39),
    q("q293_tpcds_q72", q72),
    q("q294_tpcds_q67", q67),
    q("q295_tpcds_q95", q95),
    q("q296_tpcds_q31", q31),
    q("q297_tpcds_q82", q82),
    q("q298_tpcds_q40", q40),
    q("q299_tpcds_q50", q50),
    q("q300_tpcds_q66", q66),
    q("q301_tpcds_q7", q7),
    q("q302_tpcds_q15", q15),
    q("q303_tpcds_q26", q26),
    q("q304_tpcds_q42", q42),
    q("q305_tpcds_q45", q45),
    q("q306_tpcds_q48", q48),
    q("q307_tpcds_q73", q73),
    q("q308_tpcds_q96", q96),
    q("q309_tpcds_q25", q25),
    q("q310_tpcds_q29", q29),
    q("q311_tpcds_q52", q52),
    q("q312_tpcds_q55", q55),
    q("q313_tpcds_q68", q68),
    q("q314_tpcds_q79", q79),
    q("q315_tpcds_q84", q84),
    q("q316_tpcds_q98", q98),
    q("q317_tpcds_q92", q92),
    q("q318_tpcds_q13", q13),
    q("q319_tpcds_q19", q19),
    q("q320_tpcds_q20", q20),
    q("q321_tpcds_q54", q54),
    q("q322_tpcds_q65", q65),
    q("q323_tpcds_q71", q71),
    q("q324_tpcds_q75", q75),
    q("q325_tpcds_q76", q76),
    q("q326_tpcds_q80", q80),
    q("q327_tpcds_q85", q85),
    q("q328_tpcds_q90", q90),
    q("q329_tpcds_q91", q91),
    q("q330_tpcds_q93", q93),
    q("q331_tpcds_q18", q18))
}

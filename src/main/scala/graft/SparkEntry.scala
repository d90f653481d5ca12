package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Analytics.metrics(Tables.events(spark, "/root/testdata/sf0.001"))
  }

  private def ev(s: SparkSession, dir: String): DataFrame = {
    GraftSession.tune(s); Tables.events(s, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E. dashboard analytics + A. ingest
    "q_metrics"        -> ((s, d) => Analytics.metrics(ev(s, d))),
    "q_distribution"   -> ((s, d) => Analytics.distribution(ev(s, d))),
    "q_group_compare"  -> ((s, d) => Analytics.groupCompare(ev(s, d))),
    "q_latest_per_key" -> ((s, d) => Analytics.latestPerKey(ev(s, d))),
    "q_load_timerange" -> ((s, d) =>
      Analytics.loadTimerange(ev(s, d), "2024-01-10 00:00:00", "2024-01-20 00:00:00")),
    "q_json_ingest"    -> ((s, d) => Analytics.jsonIngest(ev(s, d))),
    "q_dedup_key"      -> ((s, d) => Analytics.dedupByKey(ev(s, d))),
    "q1_pricing"       -> ((s, d) => Analytics.pricingSummary(Tables.lineitem(s, d))),
    "q_join_enrich"    -> ((s, d) =>
      Analytics.joinEnrich(Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q_topk_revenue"   -> ((s, d) => Analytics.topkRevenue(Tables.lineitem(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_metrics" ->
      """SELECT round(avg(value), 4) AS avg_value,
        |       round(max(value), 4) AS max_value,
        |       round(min(value), 4) AS min_value,
        |       count(*) AS n_records,
        |       count(DISTINCT user_id) AS n_entities,
        |       max(CAST(floor(epoch(ts)) AS BIGINT)) AS latest_ts
        |FROM events""".stripMargin,
    "q_distribution" ->
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY cnt DESC, event_type""".stripMargin,
    "q_group_compare" ->
      """SELECT user_id,
        |       round(avg(value), 4) AS avg_value,
        |       round(min(value), 4) AS min_value,
        |       round(max(value), 4) AS max_value,
        |       count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_latest_per_key" ->
      """SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |       event_type, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q_load_timerange" ->
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |       event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_json_ingest" ->
      """SELECT event_id, user_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_dedup_key" ->
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
        |ORDER BY event_id""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_enrich" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_topk_revenue" ->
      """SELECT l_orderkey,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
  )
}

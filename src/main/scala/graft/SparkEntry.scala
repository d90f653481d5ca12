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
    // B. time-series feature engineering
    "q_time_features"   -> ((s, d) => TimeSeries.timeFeatures(ev(s, d))),
    "q_lag_features"    -> ((s, d) => TimeSeries.lagFeatures(ev(s, d))),
    "q_rolling_stats"   -> ((s, d) => TimeSeries.rollingStats(ev(s, d))),
    "q_weather_indices" -> ((s, d) => TimeSeries.weatherIndices(TimeSeries.weatherView(ev(s, d)))),
    "q_diff"            -> ((s, d) => TimeSeries.diff(ev(s, d))),
    "q_interactions"    -> ((s, d) => TimeSeries.interactions(TimeSeries.weatherView(ev(s, d)))),
    "q_target_shift"    -> ((s, d) => TimeSeries.targets(ev(s, d))),
    "q_will_rain"       -> ((s, d) => TimeSeries.willRain(ev(s, d))),
    "q_daily_range"     -> ((s, d) => TimeSeries.dailyRange(ev(s, d))),
  )

  /** Shared DuckDB fragments for oracle parity. */
  private val duckWindow = "PARTITION BY user_id ORDER BY ts, event_id"
  private val duckWeatherView =
    """WITH weather AS (
      |  SELECT event_id, user_id, ts,
      |         value AS temperature,
      |         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS humidity,
      |         CAST(event_id % 30 AS DOUBLE) + 0.5 AS wind_speed
      |  FROM events
      |)""".stripMargin

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
    "q_time_features" ->
      """SELECT event_id,
        |       hour(ts) AS hour,
        |       isodow(ts) - 1 AS day_of_week,
        |       month(ts) AS month,
        |       quarter(ts) AS quarter,
        |       dayofyear(ts) AS day_of_year,
        |       round(sin(2 * pi() * hour(ts) / 24), 6) AS hour_sin,
        |       round(cos(2 * pi() * hour(ts) / 24), 6) AS hour_cos,
        |       round(sin(2 * pi() * month(ts) / 12), 6) AS month_sin,
        |       round(cos(2 * pi() * month(ts) / 12), 6) AS month_cos,
        |       round(sin(2 * pi() * (isodow(ts) - 1) / 7), 6) AS day_sin,
        |       round(cos(2 * pi() * (isodow(ts) - 1) / 7), 6) AS day_cos,
        |       CASE WHEN hour(ts) <= 6 THEN 'Night'
        |            WHEN hour(ts) <= 12 THEN 'Morning'
        |            WHEN hour(ts) <= 18 THEN 'Afternoon'
        |            ELSE 'Evening' END AS time_of_day,
        |       CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS is_weekend
        |FROM events ORDER BY event_id""".stripMargin,
    "q_lag_features" ->
      s"""SELECT event_id, user_id, value,
        |       lag(value, 1)  OVER ($duckWindow) AS value_lag_1,
        |       lag(value, 3)  OVER ($duckWindow) AS value_lag_3,
        |       lag(value, 6)  OVER ($duckWindow) AS value_lag_6,
        |       lag(value, 12) OVER ($duckWindow) AS value_lag_12,
        |       lag(value, 24) OVER ($duckWindow) AS value_lag_24
        |FROM events ORDER BY event_id""".stripMargin,
    "q_rolling_stats" ->
      s"""SELECT event_id, user_id, value,
        |       round(avg(value) OVER ($duckWindow ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS rolling_mean_24,
        |       CASE WHEN count(*) OVER ($duckWindow ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) >= 2
        |            THEN round(stddev_samp(value) OVER ($duckWindow ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) + 1e-9, 4)
        |       END AS rolling_std_24
        |FROM events ORDER BY event_id""".stripMargin,
    "q_weather_indices" ->
      s"""$duckWeatherView
        |SELECT event_id,
        |       round(-8.78469475556
        |             + 1.61139411 * temperature
        |             + 2.33854883889 * humidity
        |             - 0.14611605 * temperature * humidity
        |             - 0.012308094 * temperature * temperature
        |             - 0.0164248277778 * humidity * humidity
        |             + 0.002211732 * temperature * temperature * humidity
        |             + 0.00072546 * temperature * humidity * humidity
        |             - 0.000003582 * temperature * temperature * humidity * humidity + 1e-9, 4) AS heat_index,
        |       round(CASE WHEN temperature < 10
        |             THEN 13.12 + 0.6215 * temperature
        |                  - 11.37 * pow(wind_speed, 0.16)
        |                  + 0.3965 * temperature * pow(wind_speed, 0.16)
        |             ELSE temperature END + 1e-9, 4) AS wind_chill,
        |       round(temperature - 0.55 * (1 - 0.01 * humidity) * (temperature - 14.5) + 1e-9, 4) AS discomfort_index
        |FROM weather ORDER BY event_id""".stripMargin,
    "q_diff" ->
      s"""SELECT event_id, user_id, value,
        |       round(value - lag(value, 1) OVER ($duckWindow), 4) AS value_change
        |FROM events ORDER BY event_id""".stripMargin,
    "q_interactions" ->
      s"""$duckWeatherView
        |SELECT event_id,
        |       round(temperature * humidity, 4) AS temp_humidity_interaction,
        |       round(wind_speed * temperature, 4) AS wind_temp_interaction,
        |       round(humidity * wind_speed, 4) AS humidity_wind_interaction
        |FROM weather ORDER BY event_id""".stripMargin,
    "q_target_shift" ->
      s"""SELECT event_id, user_id, value,
        |       lead(value, 24) OVER ($duckWindow) AS value_future,
        |       round(lead(value, 24) OVER ($duckWindow) - value, 4) AS value_change,
        |       CASE WHEN lead(value, 24) OVER ($duckWindow) IS NULL THEN NULL
        |            WHEN lead(value, 24) OVER ($duckWindow) - value <= -2 THEN 'Decrease'
        |            WHEN lead(value, 24) OVER ($duckWindow) - value <= 2 THEN 'Stable'
        |            ELSE 'Increase' END AS change_category
        |FROM events ORDER BY event_id""".stripMargin,
    "q_will_rain" ->
      s"""SELECT event_id, user_id,
        |       CASE WHEN lead(event_id, 24) OVER ($duckWindow) IS NOT NULL
        |                 AND sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END)
        |                     OVER ($duckWindow ROWS BETWEEN 1 FOLLOWING AND 24 FOLLOWING) > 0
        |            THEN 1 ELSE 0 END AS will_rain
        |FROM events ORDER BY event_id""".stripMargin,
    "q_daily_range" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |       round(max(value) - min(value), 4) AS value_range,
        |       count(*) AS n_events
        |FROM events
        |GROUP BY user_id, strftime(ts, '%Y-%m-%d')
        |ORDER BY user_id, day""".stripMargin,
  )
}

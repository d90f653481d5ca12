package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — Spark realization of
  * data_processor.py:316-400 (run_quality_checks: duplicate keys,
  * missing-data profile, out-of-range counts, high-null rows) and
  * :402-421 (feature statistics with target correlation).
  *
  * Every check is a full-scan aggregate: partial (map-side) combine,
  * one tiny shuffled result. At 100 TB each check is a single pass;
  * checks that share a scan can be unioned by the caller.
  */
object Quality {

  /** Duplicate natural keys (:350-356 duplicated(['city','timestamp'])):
    * number of keys with >1 row and the excess row count. */
  def duplicateKeys(events: DataFrame): DataFrame =
    events.groupBy("user_id", "ts").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(
        count(lit(1)).as("n_dup_keys"),
        coalesce(sum(col("c") - 1), lit(0L)).as("n_dup_rows"))

  /** Missing-data profile (:358-364 isnull().sum() per column): one
    * output row per nullable column with count and fraction. Computed
    * as ONE aggregate pass then exploded — not a pass per column. */
  def missingProfile(masked: DataFrame,
                     columns: Seq[String] = Seq("event_type", "value", "humidity", "wind_speed"))
      : DataFrame = {
    val aggs = count(lit(1)).as("n_total") +:
      columns.map(c => sum(col(c).isNull.cast("long")).as(s"n_$c"))
    val entries = columns.flatMap(c => Seq(lit(c), col(s"n_$c")))
    masked.agg(aggs.head, aggs.tail: _*)
      .select(col("n_total"), explode(map(entries: _*)).as(Seq("column_name", "n_null")))
      .select(
        col("column_name"), col("n_null"),
        rnd(col("n_null") / col("n_total"), 4).as("pct_null"))
      .orderBy("column_name")
  }

  /** Out-of-range counts (:366-383 vs VALID_RANGES bounds): per
    * measure, rows below the lower and above the upper bound. */
  def rangeCheck(weather: DataFrame,
                 bounds: Seq[(String, Double, Double)] = Seq(
                   ("temperature", -50d, 60d),
                   ("humidity", 0d, 100d),
                   ("wind_speed", 0d, 150d))): DataFrame = {
    val aggs = bounds.flatMap { case (c, lo, hi) =>
      Seq(sum((col(c) < lo).cast("long")).as(s"below_$c"),
          sum((col(c) > hi).cast("long")).as(s"above_$c"))
    }
    val entries = bounds.flatMap { case (c, _, _) =>
      Seq(lit(c), array(col(s"below_$c"), col(s"above_$c")))
    }
    weather.agg(aggs.head, aggs.tail: _*)
      .select(explode(map(entries: _*)).as(Seq("column_name", "ba")))
      .select(col("column_name"),
        col("ba")(0).as("n_below"), col("ba")(1).as("n_above"))
      .orderBy("column_name")
  }

  /** High-null row count (:385-391 rows >30% null — the same >2-of-7
    * threshold as MissingValues.nullFilter, counted not dropped). */
  def highNullRows(masked: DataFrame): DataFrame = {
    val nNulls: Column = Seq("event_type", "value", "humidity", "wind_speed")
      .map(c => col(c).isNull.cast("int"))
      .reduce(_ + _)
    masked.agg(sum((nNulls > 2).cast("long")).as("n_high_null_rows"))
  }

  /** Feature statistics (:402-421): per feature mean/std/min/max/null
    * count and Pearson correlation with the target measure. One
    * aggregate pass over the scan; `corr` is Spark's codegen'd
    * co-moment aggregate. */
  def featureStats(weather: DataFrame,
                   features: Seq[String] = Seq("humidity", "wind_speed"),
                   target: String = "temperature"): DataFrame = {
    val aggs = features.flatMap { c =>
      Seq(rnd(avg(col(c)), 4).as(s"mean_$c"),
          rnd(stddev_samp(col(c)), 4).as(s"std_$c"),
          rnd(min(col(c)), 4).as(s"min_$c"),
          rnd(max(col(c)), 4).as(s"max_$c"),
          sum(col(c).isNull.cast("long")).cast("double").as(s"nulls_$c"),
          rnd(corr(col(c), col(target)), 4).as(s"corr_$c"))
    }
    val entries = features.flatMap { c =>
      Seq(lit(c), array(col(s"mean_$c"), col(s"std_$c"), col(s"min_$c"),
        col(s"max_$c"), col(s"nulls_$c"), col(s"corr_$c")))
    }
    weather.agg(aggs.head, aggs.tail: _*)
      .select(explode(map(entries: _*)).as(Seq("feature", "st")))
      .select(col("feature"),
        col("st")(0).as("mean"), col("st")(1).as("std"),
        col("st")(2).as("min_v"), col("st")(3).as("max_v"),
        col("st")(4).cast("long").as("n_null"),
        col("st")(5).as("corr_target"))
      .orderBy("feature")
  }

  /** The combined quality report (data_quality_report.py:1-42): the
    * dataset overview plus every check, unified into ONE long-format
    * keyed frame `(check_name, item, metric, value)` — the persistable
    * lake-job artifact a user schedules, where run_quality_checks
    * returns a dict of heterogeneous frames.
    *
    * Scan economy (the 100 TB concern for a job that reads the whole
    * lake): every GLOBAL section sharing an input is fused into one
    * aggregate pass — the masked view yields missing-profile AND
    * high-null-rows from a single scan, weather yields all range
    * checks from one, events yields the overview from one. Only the
    * duplicate-key check needs its own pass (it aggregates twice:
    * per-key then global). Four scans total, each map-side combined
    * to a 1-row partial. Values are pinned identical to the
    * individual check functions by the SQL oracle. */
  def report(events: DataFrame, weather: DataFrame, masked: DataFrame): DataFrame = {
    // one exploded map per 1-row aggregate: key "check|item|metric" →
    // every section of that scan melts out of a single projection
    // (separate melts per section would recompute the aggregate —
    // Catalyst does not share subtrees across union branches)
    def melt(agg: DataFrame, entries: Seq[(String, String, String, Column)]): DataFrame =
      agg.select(explode(map(entries.flatMap { case (c, i, m, v) =>
          Seq(lit(s"$c|$i|$m"), v.cast("double")) }: _*)).as(Seq("k", "value")))
        .select(
          split(col("k"), "\\|")(0).as("check_name"),
          split(col("k"), "\\|")(1).as("item"),
          split(col("k"), "\\|")(2).as("metric"),
          col("value"))

    val overview = melt(
      events.agg(
        count(lit(1)).as("n_records"),
        countDistinct(col("user_id")).as("n_entities"),
        min(col("ts").cast("long")).as("min_ts_s"),
        max(col("ts").cast("long")).as("max_ts_s")),
      Seq(("overview", "dataset", "n_records", col("n_records")),
        ("overview", "dataset", "n_entities", col("n_entities")),
        ("overview", "dataset", "min_ts_s", col("min_ts_s")),
        ("overview", "dataset", "max_ts_s", col("max_ts_s"))))

    val dup = melt(duplicateKeys(events),
      Seq(("duplicates", "user_id,ts", "n_dup_keys", col("n_dup_keys")),
        ("duplicates", "user_id,ts", "n_dup_rows", col("n_dup_rows"))))

    // missing profile + high-null rows: ONE scan of the masked view
    val maskedCols = Seq("event_type", "value", "humidity", "wind_speed")
    val nNulls: Column = maskedCols.map(c => col(c).isNull.cast("int")).reduce(_ + _)
    val maskedAggs =
      (count(lit(1)).as("n_total") +:
        maskedCols.map(c => sum(col(c).isNull.cast("long")).as(s"n_$c"))) :+
        sum((nNulls > 2).cast("long")).as("n_high_null_rows")
    val maskedAgg = masked.agg(maskedAggs.head, maskedAggs.tail: _*)
    val missAndHighNull = melt(maskedAgg,
      maskedCols.flatMap(c => Seq(
        ("missing", c, "n_null", col(s"n_$c")),
        ("missing", c, "pct_null", rnd(col(s"n_$c") / col("n_total"), 4)))) :+
        ("high_null", "row", "n_high_null_rows", col("n_high_null_rows")))

    // all range checks: ONE scan of the weather view
    val bounds = Seq(
      ("temperature", -50d, 60d), ("humidity", 0d, 100d), ("wind_speed", 0d, 150d))
    val rangeAggs = bounds.flatMap { case (c, lo, hi) =>
      Seq(sum((col(c) < lo).cast("long")).as(s"below_$c"),
        sum((col(c) > hi).cast("long")).as(s"above_$c"))
    }
    val rng = melt(weather.agg(rangeAggs.head, rangeAggs.tail: _*),
      bounds.flatMap { case (c, _, _) => Seq(
        ("range", c, "n_above", col(s"above_$c")),
        ("range", c, "n_below", col(s"below_$c"))) })

    overview.union(dup).union(missAndHighNull).union(rng)
      .orderBy("check_name", "item", "metric")
  }

  /** Persist a report partitioned by section — downstream consumers
    * (alerting on `range`, dashboards on `overview`) prune to their
    * partition. */
  def writeReport(report: DataFrame, path: String): Unit =
    report.write.mode("overwrite").partitionBy("check_name").parquet(path)
}

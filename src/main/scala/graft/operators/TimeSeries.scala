package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series feature engineering — Spark realization of
  * data_processor.py's feature pipeline (create_time_features,
  * create_lag_features, create_weather_indices,
  * create_interaction_features, create_target_variable).
  *
  * The reference computes per-city pandas shifts/rolls; here every
  * feature family is an expression over ONE window spec
  * (`partitionBy(entity).orderBy(ts)`), so the whole feature set costs
  * a single hash shuffle on the entity key regardless of how many
  * features are derived. At 100 TB the entity key (city/user) has
  * high cardinality → even partition distribution, and each partition
  * sorts locally (no global sort).
  */
object TimeSeries {

  /** Per-entity chronological window; surrogate id breaks ts ties so
    * results are deterministic and engine-independent. */
  def entityWindow: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** The "weather view" of the events table — maps the reference's
    * measure columns onto deterministic event-table expressions
    * (documented in SURVEY.md §3):
    * temperature←value, humidity←props.k, wind_speed←f(event_id). */
  def weatherView(events: DataFrame): DataFrame =
    // spread BEFORE the humidity JSON parse (the view's per-row cost;
    // a single-file table serializes it onto one core) — size-gated,
    // so a partitioned ingest at scale passes through
    spreadToCores(events.select(
      col("event_id"), col("user_id"), col("ts"), col("value"),
      col("props")))
      .select(
      col("event_id"), col("user_id"), col("ts"),
      col("value").as("temperature"),
      jsonDouble(col("props"), "$.k").as("humidity"),
      ((col("event_id") % 30).cast("double") + lit(0.5)).as("wind_speed"))

  /** Time components + cyclical encodings + bucketing + is_weekend
    * (data_processor.py:55-84). Pure per-row expressions — fully
    * codegen'd, no shuffle. `dow` uses pandas convention (Mon=0). */
  def timeFeatures(events: DataFrame): DataFrame = {
    val twoPi = lit(2.0 * math.Pi)
    val h = hour(col("ts"))
    val dow = (dayofweek(col("ts")) + lit(5)) % 7 // Spark Sun=1 → pandas Mon=0
    val m = month(col("ts"))
    events.select(
      col("event_id"),
      // long, not int: DuckDB's hour()/isodow()/etc are BIGINT and the
      // oracle hash compare is typed — emit the same width
      h.cast("long").as("hour"),
      dow.cast("long").as("day_of_week"),
      m.cast("long").as("month"),
      quarter(col("ts")).cast("long").as("quarter"),
      dayofyear(col("ts")).cast("long").as("day_of_year"),
      round(sin(twoPi * h / 24), 6).as("hour_sin"),
      round(cos(twoPi * h / 24), 6).as("hour_cos"),
      round(sin(twoPi * m / 12), 6).as("month_sin"),
      round(cos(twoPi * m / 12), 6).as("month_cos"),
      round(sin(twoPi * dow / 7), 6).as("day_sin"),
      round(cos(twoPi * dow / 7), 6).as("day_cos"),
      // pd.cut(bins=[0,6,12,18,24], include_lowest=True): [0,6] Night,
      // (6,12] Morning, (12,18] Afternoon, (18,24] Evening
      when(h <= 6, "Night").when(h <= 12, "Morning")
        .when(h <= 18, "Afternoon").otherwise("Evening").as("time_of_day"),
      (dow >= 5).cast("int").as("is_weekend")
    ).orderBy("event_id")
  }

  /** Lag features (data_processor.py:86-98): shift(1,3,6,12,24) of the
    * measure per entity. Original values pass through un-rounded —
    * they are bit-exact across engines. */
  def lagFeatures(events: DataFrame, lags: Seq[Int] = Seq(1, 3, 6, 12, 24)): DataFrame = {
    val w = entityWindow
    val lagCols = lags.map(n => lag(col("value"), n).over(w).as(s"value_lag_$n"))
    events.select(Seq(col("event_id"), col("user_id"), col("value")) ++ lagCols: _*)
      .orderBy("event_id")
  }

  /** Rolling statistics (data_processor.py:100-118): 24-row mean
    * (min_periods=1) and sample std (min_periods=2, else null —
    * matching pandas NaN semantics). */
  def rollingStats(events: DataFrame, window: Int = 24): DataFrame = {
    val w = entityWindow.rowsBetween(-(window - 1), 0)
    val nInWindow = count(lit(1)).over(w)
    events.select(
      col("event_id"), col("user_id"), col("value"),
      rnd(avg(col("value")).over(w), 4).as("rolling_mean_24"),
      when(nInWindow >= 2, rnd(stddev_samp(col("value")).over(w), 4))
        .as("rolling_std_24"))
      .orderBy("event_id")
  }

  /** Weather comfort indices (data_processor.py:121-148): heat index,
    * conditional wind chill, discomfort index. Row-local arithmetic —
    * whole-stage codegen, no shuffle. */
  def weatherIndices(weather: DataFrame): DataFrame = {
    val t = col("temperature"); val rh = col("humidity"); val ws = col("wind_speed")
    val heat =
      lit(-8.78469475556) +
        lit(1.61139411) * t +
        lit(2.33854883889) * rh -
        lit(0.14611605) * t * rh -
        lit(0.012308094) * t * t -
        lit(0.0164248277778) * rh * rh +
        lit(0.002211732) * t * t * rh +
        lit(0.00072546) * t * rh * rh -
        lit(0.000003582) * t * t * rh * rh
    val chill = lit(13.12) + lit(0.6215) * t -
      lit(11.37) * pow(ws, 0.16) + lit(0.3965) * t * pow(ws, 0.16)
    val discomfort = t - lit(0.55) * (lit(1) - lit(0.01) * rh) * (t - lit(14.5))
    weather.select(
      col("event_id"),
      rnd(heat, 4).as("heat_index"),
      rnd(when(t < 10, chill).otherwise(t), 4).as("wind_chill"),
      rnd(discomfort, 4).as("discomfort_index"))
      .orderBy("event_id")
  }

  /** Per-entity first difference (data_processor.py:151
    * pressure_change = groupby(city).diff()). */
  def diff(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("value"),
      round(col("value") - lag(col("value"), 1).over(entityWindow), 4)
        .as("value_change"))
      .orderBy("event_id")

  /** Interaction features (data_processor.py:159-176): pairwise
    * products of measures. */
  def interactions(weather: DataFrame): DataFrame =
    weather.select(
      col("event_id"),
      round(col("temperature") * col("humidity"), 4).as("temp_humidity_interaction"),
      round(col("wind_speed") * col("temperature"), 4).as("wind_temp_interaction"),
      round(col("humidity") * col("wind_speed"), 4).as("humidity_wind_interaction"))
      .orderBy("event_id")

  /** Prediction targets (data_processor.py:246-261): future measure
    * (lead by horizon), change, and cut category
    * ((-inf,-2] Decrease, (-2,2] Stable, (2,inf) Increase). */
  def targets(events: DataFrame, horizon: Int = 24): DataFrame = {
    val future = lead(col("value"), horizon).over(entityWindow)
    val change = future - col("value")
    events.select(
      col("event_id"), col("user_id"), col("value"),
      future.as("value_future"),
      round(change, 4).as("value_change"),
      when(change.isNull, lit(null).cast("string"))
        .when(change <= -2, "Decrease")
        .when(change <= 2, "Stable")
        .otherwise("Increase").as("change_category"))
      .orderBy("event_id")
  }

  /** Binary future-event target (data_processor.py:263-270 will_rain:
    * rolling(24,min_periods=1).sum().shift(-24) > 0). The shifted
    * rolling sum at row i covers rows (i+1 .. i+24]; pandas yields
    * NaN→False when i+24 falls outside the group. */
  def willRain(events: DataFrame, horizon: Int = 24): DataFrame = {
    val w = entityWindow
    val rain = when(col("event_type") === "error", col("value")).otherwise(lit(0.0))
    val futureSum = sum(rain).over(w.rowsBetween(1, horizon))
    val hasFullHorizon = lead(col("event_id"), horizon).over(w).isNotNull
    events.select(
      col("event_id"), col("user_id"),
      when(hasFullHorizon && futureSum > 0, 1).otherwise(0).as("will_rain"))
      .orderBy("event_id")
  }

  /** The composed feature pipeline (data_processor.py:275-314
    * process_pipeline): time + cyclical + lag + rolling + diff +
    * target features in ONE frame. Every windowed feature shares the
    * SAME window spec, so Catalyst plans a single Window operator —
    * one hash shuffle on the entity key and one per-partition sort
    * produce all of them; `.explain` shows exactly one Exchange.
    *
    * `passthrough` appends raw input columns (e.g. `ts` for the
    * batch-inference latest-per-entity selection) without disturbing
    * the oracle-pinned default output. */
  def featurePipeline(events: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val twoPi = lit(2.0 * math.Pi)
    val h = hour(col("ts"))
    val dow = (dayofweek(col("ts")) + lit(5)) % 7
    val w = entityWindow
    val wRoll = w.rowsBetween(-23, 0)
    val nInWindow = count(lit(1)).over(wRoll)
    val future = lead(col("value"), 24).over(w)
    val change = future - col("value")
    val featureCols = Seq(
      col("event_id"), col("user_id"), col("value"),
      h.cast("long").as("hour"),
      dow.cast("long").as("day_of_week"),
      round(sin(twoPi * h / 24), 6).as("hour_sin"),
      round(cos(twoPi * h / 24), 6).as("hour_cos"),
      lag(col("value"), 1).over(w).as("value_lag_1"),
      lag(col("value"), 24).over(w).as("value_lag_24"),
      rnd(avg(col("value")).over(wRoll), 4).as("rolling_mean_24"),
      when(nInWindow >= 2, rnd(stddev_samp(col("value")).over(wRoll), 4))
        .as("rolling_std_24"),
      round(col("value") - lag(col("value"), 1).over(w), 4).as("value_change"),
      future.as("value_future"),
      when(change.isNull, lit(null).cast("string"))
        .when(change <= -2, "Decrease")
        .when(change <= 2, "Stable")
        .otherwise("Increase").as("change_category"))
    events.select(featureCols ++ passthrough.map(col): _*)
      .orderBy("event_id")
  }

  /** Gap-based sessionization: a new session starts after a >gap
    * silence per entity (the canonical large-scale event-pipeline
    * operator). Two window passes over the SAME entity window spec
    * (lag + running sum) then one aggregate — still a single shuffle
    * on the entity key. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val w = entityWindow
    val epoch = col("ts").cast("long")
    val prev = lag(epoch, 1).over(w)
    val isNew = when(prev.isNull || epoch - prev > gapSeconds, 1L).otherwise(0L)
    val sessionIdx = sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0))
    events
      .withColumn("session_idx", sessionIdx)
      .groupBy("user_id", "session_idx")
      .agg(
        min(epoch).as("session_start"),
        max(epoch).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(epoch) - min(epoch)).as("duration_s"))
      .orderBy("user_id", "session_idx")
  }

  /** As-of join: each fact event carries the most recent state event
    * (here: the user's latest 'purchase') with state.ts <= fact.ts —
    * the dashboard's "latest reading at time t" generalized to every
    * row (dashboard.py:163,292 latest-per-city analog). Realized as a
    * union-merge: tag both streams, sort once per entity (states
    * before facts on ts ties, ASOF >= semantics; event_id breaks
    * exact-duplicate state ties deterministically), and carry the
    * state forward with last(ignoreNulls). ONE shuffle on the entity
    * key and a local sort — no range join, no per-row probe; at 100 TB
    * this is the only as-of formulation that stays linear. */
  def asofJoin(events: DataFrame, stateType: String = "purchase"): DataFrame = {
    val epoch = col("ts").cast("long")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_state").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("is_state", (col("event_type") === stateType).cast("int"))
      // both carries in ONE projection so they share a single Window
      // operator (an interposed Project would block CollapseWindow)
      .select(col("event_id"), col("user_id"), col("is_state"),
        epoch.as("ts_s"), col("value"),
        last(when(col("is_state") === 1, col("value")), ignoreNulls = true)
          .over(w).as("asof_value"),
        last(when(col("is_state") === 1, epoch), ignoreNulls = true)
          .over(w).as("asof_ts_s"))
      .filter(col("is_state") === 0)
      .select(col("event_id"), col("user_id"), col("ts_s"), col("value"),
        col("asof_value"), col("asof_ts_s"),
        (col("ts_s") - col("asof_ts_s")).as("asof_age_s"))
      .orderBy("event_id")
  }

  /** Range (interval) join: 'error' events open an incident window
    * [ts, ts+W) and every event — any entity — inside the window is
    * aggregated per incident (the alerting analog of the collector's
    * error handling, weather_collector.py:219-253). A naive non-equi
    * join is O(incidents × events); instead both sides map to
    * fixed-width time buckets (a window of width W overlaps at most 2
    * buckets of width W) and join on the bucket as a plain equi-join
    * with a residual range filter — linear shuffle volume, AQE-salted
    * if a hot bucket skews at 100 TB. */
  def rangeJoin(events: DataFrame, windowSeconds: Long = 1800): DataFrame = {
    val W = windowSeconds
    val epoch = col("ts").cast("long")
    val incidents = events.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), epoch.as("start_s"))
      .withColumn("bucket",
        explode(expr(s"sequence(start_s div ${W}L, (start_s + ${W - 1}L) div ${W}L)")))
    // the probe side does the heavy work (candidate expansion + the
    // (incident, user) partial aggregate run INSIDE the facts scan
    // stage): a small single-file table arrives as ONE partition and
    // serializes ~cand_rows of probe+agg onto one core (measured 1.5 s
    // of a 1.9 s wall at sf0.1 — range_join_stats: 2.77M cand_rows).
    // spreadToCores is size-gated, so a well-partitioned 100 TB scan
    // passes through untouched; the repartition moves only the four
    // projected narrow columns (guide §2.3: project before exchange).
    val facts = spreadToCores(events
      .select(col("user_id"), col("value"), epoch.as("ts_s")))
      .withColumn("bucket", expr(s"ts_s div ${W}L"))
    incidents.join(facts,
        incidents("bucket") === facts("bucket") &&
          col("ts_s") >= col("start_s") && col("ts_s") < col("start_s") + W)
      .groupBy("incident_id", "start_s")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        rnd(max(col("value")), 4).as("max_value"))
      .orderBy("incident_id")
  }

  /** Candidate-volume probe for [[rangeJoin]]'s bucket equi-join (the
    * lsh_buckets treatment, r14 verdict item 5): n_incidents, buckets
    * carrying incident windows, the PRE-FILTER equi-join row count
    * (Σ buckets: incidents_in_bucket × events_in_bucket — the volume
    * the residual range filter scans), and the hottest bucket's
    * contribution (the skew/straggler signal at 100 TB). Two
    * bucket-level aggregates + a 1-row broadcast — never the join
    * itself — so the bench can emit the fan-out every round and a
    * regression (W mis-sized, error-rate spike, hot bucket) is
    * visible from the JSON before it becomes a wall-clock mystery. */
  def rangeJoinStats(events: DataFrame, windowSeconds: Long = 1800): DataFrame = {
    val W = windowSeconds
    val epoch = col("ts").cast("long")
    val incB = events.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), epoch.as("start_s"))
      .select(col("incident_id"),
        explode(expr(s"sequence(start_s div ${W}L, (start_s + ${W - 1}L) div ${W}L)"))
          .as("bucket"))
    val incAgg = incB.groupBy("bucket").agg(count(lit(1)).as("ni"))
    val factAgg = events
      .select(epoch.as("ts_s"))
      .select(expr(s"ts_s div ${W}L").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("nf"))
    val nInc = events.filter(col("event_type") === "error")
      .agg(count(lit(1)).as("n_incidents"))
    incAgg.join(factAgg, Seq("bucket"), "left")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("ni") * coalesce(col("nf"), lit(0L))).as("cand_rows"),
        max(col("ni") * coalesce(col("nf"), lit(0L))).as("max_bucket_cand"))
      .crossJoin(broadcast(nInc))
      .select(col("n_incidents"), col("n_buckets"),
        coalesce(col("cand_rows"), lit(0L)).as("cand_rows"),
        coalesce(col("max_bucket_cand"), lit(0L)).as("max_bucket_cand"))
  }

  /** Exact interpolated quantiles of the measure (dashboard
    * distribution percentiles, dashboard.py:209-231). `percentile` is
    * Spark's EXACT aggregate: its merge buffer holds a value→count map
    * for the single global group on one reducer — with
    * high-cardinality doubles that buffer approaches the dataset.
    * This form exists as the oracle-checkable reference semantics.
    *
    * @note 100TB: use [[quantilesApprox]] — mergeable sketch, bounded
    *       memory, rank error ≤ 1/accuracy.
    */
  def quantiles(events: DataFrame,
                qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame = {
    val entries = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(lit(q), col("qv")(i))
    }
    events
      .agg(percentile(col("value"), lit(qs.toArray)).as("qv"))
      .select(explode(map(entries: _*)).as(Seq("quantile", "v")))
      .select(col("quantile"), rnd(col("v"), 4).as("value_q"))
      .orderBy("quantile")
  }

  /** Approximate quantiles — the 100 TB form of [[quantiles]].
    * `approx_percentile` (Greenwald-Khanna sketch) keeps a bounded
    * summary per partial aggregate (O(accuracy·log n) entries, ~KBs at
    * the default accuracy) and merges associatively, so the single
    * global group costs one tiny final merge instead of materializing
    * the column on a reducer. Guarantee: the returned value's RANK is
    * within n/accuracy of the true rank — QuantilesApproxSpec pins
    * exact-vs-approx divergence against that bound at sf0.01.
    * Same output schema as [[quantiles]] so the two are drop-in
    * interchangeable; values are NOT rounded-identical to exact (the
    * sketch returns an observed sample, not an interpolation), which
    * is why the exact form remains the oracle path. */
  def quantilesApprox(events: DataFrame,
                      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                      accuracy: Int = 10000): DataFrame = {
    val entries = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(lit(q), col("qv")(i))
    }
    events
      .agg(percentile_approx(col("value"), lit(qs.toArray), lit(accuracy)).as("qv"))
      .select(explode(map(entries: _*)).as(Seq("quantile", "v")))
      .select(col("quantile"), rnd(col("v"), 4).as("value_q"))
      .orderBy("quantile")
  }

  /** Oracle-checkable form of [[quantilesApprox]] — the
    * distinct_sketch_check / heavy_hitters_check pattern applied to
    * the GK sketch. A sketch value has no cross-engine identity (the
    * returned observation depends on merge order), so the CONTRACT is
    * what ships: per quantile the row carries the exact interpolated
    * quantile (DuckDB recomputes it bit-for-bit via quantile_cont,
    * verifying the data path) plus `rank_in_bound`, the GK rank
    * guarantee evaluated Spark-side into a boolean the hash CAN gate
    * — the approx value's occupied rank interval [rank_lt+1, rank_le]
    * must come within ε·n + 1 of the target rank q·n (ε = 1/accuracy;
    * +1 for integer rank granularity — the same bound ScaleSpec pins
    * at sf0.01/sf0.1, minus its 4dp-rounding slack because the
    * comparison here uses the UNROUNDED sketch value). Any sketch
    * regression past the bound flips a FALSE into the hashed output.
    *
    * Two corpus passes, both sketch-cheap at 100 TB: one combined
    * aggregate (exact percentile + GK sketch + count — the exact
    * member is the oracle reference semantics; production would drop
    * it and keep the pass sketch-only), then one conditional-count
    * pass against the BROADCAST 4-row summary (BroadcastNestedLoop
    * over 4 rows, never a cartesian shuffle). */
  def quantilesApproxCheck(events: DataFrame,
                           qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                           accuracy: Int = 10000): DataFrame = {
    val vals = events.select(col("value")).where(col("value").isNotNull)
    val entries = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(lit(q), struct(col("qe")(i).as("ve"), col("qa")(i).as("va")))
    }
    val summary = vals
      .agg(percentile(col("value"), lit(qs.toArray)).as("qe"),
        percentile_approx(col("value"), lit(qs.toArray), lit(accuracy)).as("qa"),
        count(lit(1)).as("n"))
      .select(col("n"), explode(map(entries: _*)).as(Seq("quantile", "v")))
      .select(col("quantile"), col("n"),
        col("v.ve").as("v_exact"), col("v.va").as("v_approx"))
    val slack = col("n") / accuracy + 1.0
    val counted = vals.crossJoin(broadcast(summary))
      .groupBy("quantile")
      .agg(sum(when(col("value") < col("v_approx"), 1L).otherwise(0L)).as("rank_lt"),
        sum(when(col("value") <= col("v_approx"), 1L).otherwise(0L)).as("rank_le"))
    // the final projection drives from the SUMMARY side (ADVICE r14):
    // on an empty/all-null corpus the crossJoin's streamed side is
    // empty and `counted` has 0 rows, but the contract (and the DuckDB
    // oracle) is 4 rows with n_rows=0 and a trivially-true bound —
    // the left join restores them, with zero ranks coalesced in. Both
    // sides are ≤4 rows, so the join costs nothing at any scale.
    summary.join(counted, Seq("quantile"), "left")
      .select(col("quantile"), col("n").as("n_rows"),
        rnd(col("v_exact"), 4).as("exact_q"),
        (col("quantile") * col("n") >=
            coalesce(col("rank_lt"), lit(0L)) + 1 - slack &&
          col("quantile") * col("n") <=
            coalesce(col("rank_le"), lit(0L)) + slack).as("rank_in_bound"))
      .orderBy("quantile")
  }

  /** Daily per-entity range (data_processor.py:154 temp_range =
    * temp_max - temp_min, realized as a daily max-min aggregate).
    * Partial agg + one shuffle on (entity, day). */
  def dailyRange(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .agg(
        round(max("value") - min("value"), 4).as("value_range"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "day")
}

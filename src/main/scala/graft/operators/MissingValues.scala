package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value handling — Spark realization of
  * data_processor.py:178-204 (handle_missing_values: per-city ffill
  * with limit, linear interpolation, categorical mode fill, and the
  * >30%-null row drop).
  *
  * The test events table has no natural nulls, so operators run over
  * `maskedView`: a DETERMINISTIC null-injection view (null-ness is a
  * pure function of event_id) replicated verbatim in the DuckDB oracle
  * SQL. At scale the masking disappears and the operators run on
  * whatever nulls the real data has.
  *
  * Every operator is window/agg-based over the per-entity window — the
  * same single hash shuffle on the entity key as the feature operators;
  * no driver-side state.
  */
object MissingValues {

  /** Deterministic null-injection view over events (+ the weather-view
    * measures). Nullable: event_type ~4.3%, value ~10.5%,
    * humidity ~7.7%, wind_speed ~10.3%; keys/ts never null. */
  // NOTE r20: deliberately NOT spreadToCores'd — most consumers are
  // per-entity window operators that re-exchange on user_id right
  // after (and several prune the humidity parse entirely), so a
  // keyless pre-exchange only added its local sort + a stage (bench
  // A/B: ffill 2.3x, mode_fill 2.0x worse with it). weatherView IS
  // spread: its consumers are row-local/aggregate and all parse
  // humidity.
  def maskedView(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      when(col("event_id") % 23 === 5, lit(null).cast("string"))
        .otherwise(col("event_type")).as("event_type"),
      when(col("event_id") % 19 isin (3, 11), lit(null).cast("double"))
        .otherwise(col("value")).as("value"),
      when(col("event_id") % 13 === 5, lit(null).cast("double"))
        .otherwise(jsonDouble(col("props"), "$.k")).as("humidity"),
      when(col("event_id") % 29 isin (0, 8, 17), lit(null).cast("double"))
        .otherwise((col("event_id") % 30).cast("double") + lit(0.5)).as("wind_speed"))

  private def w = TimeSeries.entityWindow

  /** Forward-fill with limit=3 (data_processor.py:182-184
    * fillna(method='ffill', limit=3) per city): a null is filled from
    * the most recent non-null at most 3 rows back. */
  def ffill(masked: DataFrame, limit: Int = 3): DataFrame =
    masked.select(
      col("event_id"), col("user_id"), col("value"),
      last(col("value"), ignoreNulls = true)
        .over(w.rowsBetween(-limit, 0)).as("value_ffill"))
      .orderBy("event_id")

  /** Linear interpolation between nearest non-null neighbours
    * (data_processor.py:186-190 interpolate(method='linear') per city).
    * pandas semantics: interior nulls → linear by row position;
    * trailing nulls → last valid value; leading nulls stay null. */
  def interpolate(masked: DataFrame): DataFrame = {
    val rn = row_number().over(w)
    val before = w.rowsBetween(Window.unboundedPreceding, 0)
    val after  = w.rowsBetween(0, Window.unboundedFollowing)
    val markedRn = when(col("value").isNotNull, col("rn"))
    val base = masked.withColumn("rn", rn)
    val ext = base
      .withColumn("pv", last(col("value"), ignoreNulls = true).over(before))
      .withColumn("pr", last(markedRn, ignoreNulls = true).over(before))
      .withColumn("nv", first(col("value"), ignoreNulls = true).over(after))
      .withColumn("nr", first(markedRn, ignoreNulls = true).over(after))
    val interp =
      when(col("value").isNotNull, col("value"))
        .when(col("pv").isNull, lit(null).cast("double"))
        .when(col("nv").isNull, col("pv"))
        .otherwise(col("pv") + (col("nv") - col("pv")) *
          (col("rn") - col("pr")) / (col("nr") - col("pr")))
    ext.select(
      col("event_id"), col("user_id"), col("value"),
      rnd(interp, 4).as("value_interp"))
      .orderBy("event_id")
  }

  /** Categorical mode fill (data_processor.py:192-198: fill categorical
    * nulls with the column mode) — here per-entity mode, tie-broken
    * alphabetically. The mode table is one row per entity → broadcast
    * back; no second shuffle of the fact side. */
  def modeFill(masked: DataFrame): DataFrame = {
    val counts = masked.filter(col("event_type").isNotNull)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    // min(struct(-c, type)) ≡ the window's (c DESC, type ASC) rank-1
    // row (r15 sweep: the per-entity mode table folds into ONE
    // aggregate pass over the counts — no window sort; the count is
    // never null and -c cannot overflow, so min cannot prefer a null)
    val modes = counts
      .groupBy("user_id")
      .agg(min(struct(negate(col("c")).as("nc"),
        col("event_type").as("t"))).as("_m"))
      .select(col("user_id"), col("_m.t").as("mode_type"))
    masked.join(broadcast(modes), Seq("user_id"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("event_type"), col("mode_type")).as("event_type_filled"))
      .orderBy("event_id")
  }

  /** Drop rows with too many nulls (data_processor.py:200-201
    * dropna(thresh=0.7*ncols)): of the 7 row fields, keep rows with
    * >= ceil(0.7*7)=5 non-null, i.e. <= 2 nulls among the 4 nullable
    * columns. Pure row-local predicate — codegen, no shuffle. */
  def nullFilter(masked: DataFrame): DataFrame = {
    val nNulls = Seq("event_type", "value", "humidity", "wind_speed")
      .map(c => col(c).isNull.cast("int"))
      .reduce(_ + _)
    masked
      .withColumn("n_nulls", nNulls)
      .filter(col("n_nulls") <= 2)
      .select("event_id", "user_id", "n_nulls")
      .orderBy("event_id")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label encoding and standard scaling — Spark realization of
  * data_processor.py:206-244 (encode_categorical_variables with
  * sklearn LabelEncoder; scale_features with StandardScaler) and the
  * predictor's scaling step (weather_predictor.py:65-66).
  */
object Encoders {

  /** LabelEncoder parity: classes sorted lexicographically, codes
    * 0..n-1. The class table is distinct-aggregated first (tiny), the
    * rank window runs on those few rows only, and the mapping is
    * broadcast back — no global sort of the fact table. */
  def labelEncode(events: DataFrame, column: String = "event_type"): DataFrame = {
    val classes = events.select(col(column)).where(col(column).isNotNull).distinct()
      .withColumn("type_code",
        (dense_rank().over(Window.orderBy(col(column))) - 1).cast("long"))
    // left join: a null category keeps its row with a null code
    // (an inner join would silently drop those rows)
    events.join(broadcast(classes), Seq(column), "left")
      .select(col("event_id"), col(column), col("type_code"))
      .orderBy("event_id")
  }

  /** LabelEncoder fit/transform split: classes learned from `fitOn`
    * only; categories unseen at fit time encode as -1
    * (test_data_processor.py test_unseen_category_returns_minus_one
    * parity), null categories keep a null code. Same broadcast-mapping
    * shape as [[labelEncode]]. */
  def labelEncodeApply(fitOn: DataFrame, applyTo: DataFrame,
                       column: String = "event_type"): DataFrame = {
    val classes = fitOn.select(col(column)).where(col(column).isNotNull).distinct()
      .withColumn("type_code",
        (dense_rank().over(Window.orderBy(col(column))) - 1).cast("long"))
    applyTo.join(broadcast(classes), Seq(column), "left")
      .select(col("event_id"), col(column),
        when(col(column).isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("type_code"), lit(-1L))).as("type_code"))
      .orderBy("event_id")
  }

  /** StandardScaler parity: (x - mean)/std with POPULATION std
    * (sklearn ddof=0). The stats are a single-row aggregate broadcast
    * back via cross join — never a window over all rows. Stats are
    * tie-stably rounded to 4dp first so both engines divide IDENTICAL
    * doubles; the final 6dp round is then exact on both sides. */
  def standardScale(events: DataFrame, column: String = "value"): DataFrame = {
    val stats = events.agg(
      rnd(avg(col(column)), 4).as("m"),
      rnd(stddev_pop(col(column)), 4).as("s"))
    events.crossJoin(broadcast(stats))
      .select(col("event_id"), col(column),
        round((col(column) - col("m")) / col("s"), 6).as("value_scaled"))
      .orderBy("event_id")
  }
}

package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.rnd

/** ML feature preparation — Spark realization of
  * weather_predictor.py:40-69 prepare_features: drop columns with
  * >30% nulls, fill remaining nulls with 0, standard-scale, and
  * assemble an MLlib feature vector.
  *
  * Scaling stats are a single 1-row aggregate broadcast back (never a
  * window over all rows); the null-fraction scan and the stats scan
  * each are one pass. Stats are tie-stably rounded so the columnar
  * output is engine-parity-checkable (q_ml_feature_prep oracle).
  */
object FeaturePrep {

  /** Fraction of nulls per candidate column (one aggregate pass). */
  def nullFractions(df: DataFrame, columns: Seq[String]): Map[String, Double] = {
    val aggs = columns.map(c => avg(col(c).isNull.cast("double")).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    columns.map(c => c -> row.getAs[Double](c)).toMap
  }

  /** Columns that survive the >maxNullFrac drop, in input order. */
  def surviving(df: DataFrame, columns: Seq[String], maxNullFrac: Double = 0.3): Seq[String] = {
    val fr = nullFractions(df, columns)
    columns.filter(c => fr(c) <= maxNullFrac)
  }

  /** Drop high-null columns, fill nulls with 0, population-scale each
    * survivor to a `<col>_scaled` output. Keys pass through. */
  def prepare(df: DataFrame, keyCols: Seq[String], featureCols: Seq[String],
              maxNullFrac: Double = 0.3): DataFrame = {
    val keep = surviving(df, featureCols, maxNullFrac)
    val filled = df.select(
      (keyCols.map(col) ++ keep.map(c => coalesce(col(c), lit(0.0)).as(c))): _*)
    val aggs = keep.flatMap(c => Seq(
      rnd(avg(col(c)), 4).as(s"m_$c"),
      rnd(stddev_pop(col(c)), 4).as(s"s_$c")))
    val stats = filled.agg(aggs.head, aggs.tail: _*)
    filled.crossJoin(broadcast(stats))
      .select(keyCols.map(col) ++ keep.map(c =>
        round((col(c) - col(s"m_$c")) / col(s"s_$c"), 6).as(s"${c}_scaled")): _*)
  }

  /** Assemble named columns into an MLlib `features` vector. */
  def assemble(df: DataFrame, featureCols: Seq[String],
               out: String = "features"): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol(out)
      .setHandleInvalid("keep")
      .transform(df)
}

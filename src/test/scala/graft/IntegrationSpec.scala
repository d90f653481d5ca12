package graft

import org.apache.spark.ml.regression.LinearRegressionModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{FeaturePrep, ModelRegistry, Models, TemporalSplit}
import graft.operators.TimeSeries
import graft.sources.Tables

/** End-to-end chain — the Spark mirror of the reference's integration
  * suite (tests/test_integration.py: collect → process → train →
  * predict, and the save/load/predict cycle): the raw events table
  * flows through the feature pipeline, feature prep, a temporal split,
  * model training, full-frame prediction, and a registry round-trip.
  */
class IntegrationSpec extends AnyFunSuite {
  import TestSession._

  test("migration facade mirrors the reference API end-to-end") {
    val ev = Tables.events(spark, sfDir)
    val weather = TimeSeries.weatherView(ev)
    val masked = graft.operators.MissingValues.maskedView(ev)
    assert(GraftApi.processPipeline(ev).count() == ev.count())
    assert(GraftApi.createTimeFeatures(ev).columns.contains("hour_sin"))
    assert(GraftApi.encodeCategorical(ev).columns.contains("type_code"))
    val checks = GraftApi.runQualityChecks(ev, weather, masked)
    assert(checks.keySet == Set("duplicates", "missing_data", "range_check", "high_null"))
    checks.values.foreach(df => assert(df.count() > 0))
    assert(GraftApi.keyMetrics(ev).count() == 1)
  }

  test("ingest -> features -> train -> predict -> registry round-trip") {
    // process: engineered features off the raw table (one Window op)
    val feats = TimeSeries.featurePipeline(Tables.events(spark, sfDir))
      .join(Tables.events(spark, sfDir).select("event_id", "ts"), "event_id")
    // train on rows with a defined target (the last horizon rows of
    // each entity have none — same as the reference's dropna)
    val labeled = feats
      .filter(col("value_future").isNotNull && col("value_lag_1").isNotNull &&
        col("rolling_std_24").isNotNull)
      .withColumn("label", col("value_future"))
    val assembled = FeaturePrep.assemble(labeled,
      Seq("value", "value_lag_1", "rolling_mean_24", "rolling_std_24", "hour_sin", "hour_cos"))
      .cache()

    val (train, test) = TemporalSplit.split(assembled)
    assert(train.count() > 0 && test.count() > 0)

    val lr = new org.apache.spark.ml.regression.LinearRegression().setMaxIter(50)
    val model = lr.fit(train)
    // the synthetic value series has no 24-step-ahead signal, so (like
    // the reference's test_finite_metrics) assert well-formedness of
    // the metrics, not forecasting skill on noise
    val metrics = Models.regressionMetrics(model.transform(test))
    assert(metrics("mse") >= 0 && !metrics("mse").isNaN)
    assert(!metrics("r2").isNaN && !metrics("mae").isNaN)

    // predict over the FULL frame: one prediction per input row
    val preds = model.transform(assembled)
    assert(preds.count() == assembled.count())

    // save/load/predict cycle through the registry
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val reg = new ModelRegistry(dir)
    reg.register("temperature", model, metrics)
    val loaded = reg.load("temperature", LinearRegressionModel)
    val a = preds.agg(sum("prediction")).collect()(0).getDouble(0)
    val b = loaded.transform(assembled).agg(sum("prediction")).collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }
}

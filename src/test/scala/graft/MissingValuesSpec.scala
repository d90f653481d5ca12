package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Encoders, MissingValues, Quality, TimeSeries}
import graft.sources.Tables

class MissingValuesSpec extends AnyFunSuite {
  import TestSession._

  private lazy val masked = MissingValues.maskedView(Tables.events(spark, sfDir))

  test("maskedView injects deterministic nulls") {
    val n = masked.count()
    val nulls = masked.filter(col("value").isNull).count()
    assert(nulls > 0 && nulls < n / 5)
  }

  test("ffill fills only within limit and never invents values") {
    val out = MissingValues.ffill(masked)
    // filled column has fewer nulls than input, and non-null inputs pass through
    val in = masked.filter(col("value").isNotNull).count()
    val filled = out.filter(col("value_ffill").isNotNull).count()
    assert(filled >= in)
    assert(out.filter(col("value").isNotNull &&
      col("value") =!= col("value_ffill")).count() == 0)
  }

  test("interpolate is bounded by neighbours for interior nulls") {
    val out = MissingValues.interpolate(masked)
    assert(out.filter(col("value").isNotNull &&
      col("value_interp") =!= round(col("value") + lit(1e-9), 4)).count() == 0)
    // interpolation fills more than it leaves (only leading nulls stay)
    val stillNull = out.filter(col("value_interp").isNull).count()
    val wasNull = masked.filter(col("value").isNull).count()
    assert(stillNull < wasNull)
  }

  test("modeFill leaves no nulls and preserves non-null categories") {
    val out = MissingValues.modeFill(masked)
    assert(out.filter(col("event_type_filled").isNull).count() == 0)
    assert(out.count() == masked.count())
  }

  test("nullFilter drops exactly the >2-null rows") {
    val kept = MissingValues.nullFilter(masked)
    assert(kept.filter(col("n_nulls") > 2).count() == 0)
    val highNull = Quality.highNullRows(masked).collect()(0).getAs[Long]("n_high_null_rows")
    assert(kept.count() + highNull == masked.count())
  }

  test("labelEncode assigns sorted dense codes") {
    val ev = Tables.events(spark, sfDir)
    val codes = Encoders.labelEncode(ev)
      .select("event_type", "type_code").distinct()
      .orderBy("type_code").collect()
    val types = codes.map(_.getString(0))
    assert(types.sameElements(types.sorted))
    assert(codes.map(_.getLong(1)).sameElements(codes.indices.map(_.toLong)))
  }

  test("labelEncodeApply maps unseen categories to -1 and nulls to null") {
    val ev = Tables.events(spark, sfDir)
    val fitOn = ev.filter(col("event_type") =!= "view") // 'view' unseen at fit
    val applyTo = ev.withColumn("event_type",
      when(col("event_id") % 97 === 0, lit(null).cast("string"))
        .otherwise(col("event_type")))
    val out = Encoders.labelEncodeApply(fitOn, applyTo).collect()
    val byType = out.filter(r => !r.isNullAt(r.fieldIndex("event_type")))
      .groupBy(_.getAs[String]("event_type"))
    assert(byType("view").forall(_.getAs[Long]("type_code") == -1L))
    byType.filterKeys(_ != "view").values.flatten
      .foreach(r => assert(r.getAs[Long]("type_code") >= 0L))
    out.filter(r => r.isNullAt(r.fieldIndex("event_type")))
      .foreach(r => assert(r.isNullAt(r.fieldIndex("type_code"))))
  }

  test("standardScale output has ~0 mean and ~1 std") {
    val ev = Tables.events(spark, sfDir)
    val r = Encoders.standardScale(ev)
      .agg(avg("value_scaled").as("m"), stddev_pop("value_scaled").as("s"))
      .collect()(0)
    assert(math.abs(r.getAs[Double]("m")) < 1e-3)
    assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-3)
  }

  test("featureStats computes self-consistent correlations") {
    val stats = Quality.featureStats(TimeSeries.weatherView(Tables.events(spark, sfDir)))
      .collect()
    assert(stats.length == 2)
    stats.foreach { r =>
      val c = r.getAs[Double]("corr_target")
      assert(c >= -1.0 && c <= 1.0)
    }
  }
}

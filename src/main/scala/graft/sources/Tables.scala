package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed readers for the driver-generated test tables.
  *
  * All readers are plain parquet scans — column pruning and predicate
  * pushdown happen in downstream `select`/`filter` (verified via
  * `PushedFilters`/`ReadSchema` in explain output). At cluster scale
  * these would be partitioned-directory datasets; the API is a single
  * `dir` so the same code serves both.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Events table — the time-series analog of the reference's
    * weather_data table (city→user_id, temperature→value).
    *
    * The parquet's physical ts encoding has changed across testdata
    * generations (TIMESTAMP(NANOS) → read as LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`; TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) → TimestampNTZType; plain TIMESTAMP →
    * TimestampType). All three normalize here — every downstream
    * operator sees a plain (UTC-session) TimestampType column.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(eventsRaw(spark, dir))

  /** The ONE chokepoint for physical-timestamp normalization: every
    * batch/stream events reader funnels ts through here, so a
    * driver-side parquet re-encode is absorbed in one place (pinned by
    * TsEncodingSpec against all three physical encodings). */
  def normalizeTs(raw: DataFrame, tsCol: String = "ts"): DataFrame =
    raw.schema(tsCol).dataType match {
      case LongType =>
        // integer div, NOT `/`: epoch-2024 nanos (~1.7e18) exceed
        // double's 53-bit mantissa, so a float division can land on
        // the wrong microsecond.
        raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampType => raw
      case _: TimestampNTZType =>
        // session zone is UTC (GraftSession) and the generator wrote
        // UTC wall-times, so NTZ→TZ is instant-preserving; epoch-second
        // oracle contract unchanged.
        raw.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"unexpected $tsCol type: $other")
    }

  /** Date-partitioned parquet writer — the 100 TB lake layout: one
    * directory per (partition column) value, so date-ranged readers
    * prune whole partitions before row-group stats even apply. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String = "day"): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Events with `ts` in its raw physical form (TimestampNTZType on
    * the current test parquet; LongType nanos on sessions that read a
    * nanos file under the legacy flag). Scan-heavy operators filter on
    * this column with same-typed literals so the predicate reaches
    * parquet row-group stats — a range filter on a converted timestamp
    * would NOT push down. No session-conf mutation here: nanos support
    * is a build-time conf (GraftSession.builder), not a reader side
    * effect. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "events")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

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
    * The parquet stores `ts` as TIMESTAMP(NANOS); Spark reads that as
    * LongType nanos under `spark.sql.legacy.parquet.nanosAsLong`.
    * Normalize to a microsecond TimestampType column here so every
    * downstream operator sees a plain timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case LongType =>
        // integer div, NOT `/`: epoch-2024 nanos (~1.7e18) exceed
        // double's 53-bit mantissa, so a float division can land on
        // the wrong microsecond.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(s"unexpected ts type: $other")
    }
  }

  /** Date-partitioned parquet writer — the 100 TB lake layout: one
    * directory per (partition column) value, so date-ranged readers
    * prune whole partitions before row-group stats even apply. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String = "day"): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Events with `ts` in its raw physical form (LongType nanos on the
    * test parquet). Scan-heavy operators filter on this column so the
    * predicate reaches parquet row-group stats — a range filter on the
    * post-conversion timestamp would NOT push down. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
  }
}

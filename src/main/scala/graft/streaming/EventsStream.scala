package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming realization of the collector's scheduled
  * ingest loop (weather_collector.py: periodic API poll → parse →
  * dedup → store; monitoring/performance.py: running per-entity
  * counters).
  *
  * The batch operators and these streaming ones share semantics: the
  * windowed aggregate is the streaming q_daily_range/q_metrics shape,
  * dedup mirrors Analytics.dedupByKey under a watermark bound, and the
  * stateful monitor is APIMetrics as typed keyed state. Watermarks
  * bound state so a 1000-executor job runs indefinitely without state
  * growth; state is hash-partitioned by entity key.
  */
object EventsStream {

  case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, value: Double)

  case class EntityState(n: Long, sum: Double, min: Double, max: Double)

  case class EntityStats(user_id: Long, n: Long, mean: Double,
                         min: Double, max: Double)

  /** File-source stream over the events parquet. The physical ts
    * encoding varies across testdata generations (int64 nanos /
    * TIMESTAMP micros / TIMESTAMP_NTZ micros), so the stream schema is
    * probed from a one-footer batch read and ts is normalized through
    * the same chokepoint as the batch reader (Tables.normalizeTs). */
  /** `maxFilesPerTrigger` is the ingest rate limit — the collector's
    * RateLimiter (weather_collector.py:71-112) expressed as source
    * throttling: each micro-batch admits at most that many files. */
  def readEvents(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 0): DataFrame = {
    // Probe the physical ts encoding from whatever parquet is already
    // present. A stream may legitimately be declared over a directory
    // BEFORE the first file lands — fall back to TimestampType then
    // (normalizeTs is the identity on it), matching the current
    // generator's encoding; a nanos/NTZ file arriving later on an
    // empty-at-declaration dir is a schema change requiring a restart,
    // which is standard file-source semantics.
    val probed =
      try Some(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType)
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val tsType = probed.getOrElse(TimestampType)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val reader = spark.readStream.schema(schema)
      // base path must be a directory; glob-filter to the events table
      .option("pathGlobFilter", "events.parquet")
    val limited =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      else reader
    graft.sources.Tables.normalizeTs(limited.parquet(dir))
  }

  /** Watermarked tumbling-window aggregate per entity (the dashboard
    * metrics, continuously maintained). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        avg("value").as("avg_value"),
        max("value").as("max_value"))

  /** Streaming keyed dedup — the collector's (city, timestamp)
    * INSERT-dedup under a watermark bound (state is dropped once the
    * watermark passes, so it cannot grow without bound). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "ts")

  /** Stream-static enrichment (the collector's city→coordinates config
    * lookup, streaming form): the static dim is broadcast per
    * micro-batch — the stream side never shuffles. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream interval join — click→purchase
    * attribution: each purchase matches clicks of the same user at most
    * `horizon` before it. Both sides are watermarked and the join
    * condition bounds event-time distance, so Spark can evict join
    * state once the watermark passes — state stays O(horizon × rate)
    * per entity partition no matter how long the job runs. The join
    * hash-partitions both streams on user_id (the same entity key every
    * batch operator shuffles on). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      horizon: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("purchase_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
      col("user_id") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .drop("purchase_user")
  }

  /** Running per-entity stats via typed keyed state
    * (flatMapGroupsWithState) — the PerformanceTracker/APIMetrics
    * counters as distributed state. Emits updated stats per batch. */
  def statefulStats(events: Dataset[EventRow]): Dataset[EntityStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EntityState, EntityStats](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateStats)
  }

  /** Exponential-backoff retry (weather_collector.py:171-229
    * _make_request_with_retry, the sink-side analog): run `op`, on
    * failure sleep baseBackoffMs << attempt and retry, up to
    * `maxRetries` retries; then rethrow. `sleep` is injectable so
    * tests assert the backoff schedule without wall-clock waits. */
  def withRetry[T](maxRetries: Int = 3, baseBackoffMs: Long = 50,
                   sleep: Long => Unit = Thread.sleep)(op: => T): T = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        // NonFatal only: OOM, thread interrupts, and query-stop
        // cancellations must propagate immediately — retrying them
        // delays shutdown and can duplicate batch writes
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries) throw e
          sleep(baseBackoffMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One micro-batch of [[resilientSink]], exposed for direct testing
    * of redelivery. IDEMPOTENT per batch id: both outputs land under a
    * `batch_id=<id>` partition directory with overwrite semantics, so
    * a redelivered batch — restart replay, or the self-inflicted case
    * where the main write committed but the DLQ write exhausted its
    * retries and failed the query — REWRITES the same directories
    * instead of appending duplicates. At-least-once delivery,
    * exactly-once table contents; readers scan the root dir and see
    * `batch_id` as a discovered partition column.
    *
    * MIGRATION: this layout is partitioned where the pre-idempotence
    * sink appended flat part files; Spark refuses a root dir mixing
    * the two ("conflicting directory structures"). Point upgraded
    * streams at a fresh output root, or move existing flat files into
    * a `batch_id=-1/` subdirectory once. */
  def resilientBatch(batch: Dataset[org.apache.spark.sql.Row], batchId: Long,
                     outDir: String, dlqDir: String,
                     maxRetries: Int = 3, baseBackoffMs: Long = 50,
                     sleep: Long => Unit = Thread.sleep): Unit = {
    val required = Seq("user_id", "ts", "event_type")
    val classified = batch.withColumn("error_reason",
      when(required.map(col(_).isNull).reduce(_ || _), "missing_required")
        .when(col("value").isNull || col("value") < -100 || col("value") > 1000,
          "value_out_of_range"))
      .persist()
    try {
      withRetry(maxRetries, baseBackoffMs, sleep) {
        classified.filter(col("error_reason").isNull).drop("error_reason")
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      // ALWAYS overwrite the DLQ partition, even when no rows are dead:
      // a redelivered batch can legitimately reclassify to zero dead
      // rows (validation rules changed across a restart), and skipping
      // the write would leave the prior attempt's stale DLQ rows in
      // place — breaking exactly-once table contents on the DLQ side.
      // An empty overwrite is one cheap driver-side commit.
      val dead = classified.filter(col("error_reason").isNotNull)
      withRetry(maxRetries, baseBackoffMs, sleep) {
        dead.write.mode("overwrite").parquet(s"$dlqDir/batch_id=$batchId")
      }
    } finally { classified.unpersist(); () }
  }

  /** Classify-and-route resilient sink — the collector's retry +
    * error-taxonomy handling (weather_collector.py:171-229 retry,
    * :255-288 validate_api_response) as a streaming sink: each
    * micro-batch validates rows, writes valid ones to the main table
    * and invalid ones — annotated with the failing rule — to a
    * dead-letter path, each write under exponential-backoff retry
    * keyed by batch id (see [[resilientBatch]] for the idempotence
    * contract). A batch that still fails after the retries rethrows,
    * failing the query so the batch redelivers on restart.
    *
    * Scale: classification is a pure per-row projection (no shuffle);
    * both writes stream the batch partition-parallel. The DLQ keeps
    * the full row plus `error_reason`, so quarantined data is
    * replayable after a fix. */
  def resilientSink(events: DataFrame, outDir: String, dlqDir: String,
                    maxRetries: Int = 3, baseBackoffMs: Long = 50,
                    sleep: Long => Unit = Thread.sleep)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        resilientBatch(batch, batchId, outDir, dlqDir, maxRetries, baseBackoffMs, sleep)
    }

  private def updateStats(userId: Long, rows: Iterator[EventRow],
                          state: GroupState[EntityState]): Iterator[EntityStats] = {
    var s = state.getOption.getOrElse(EntityState(0L, 0.0, Double.MaxValue, Double.MinValue))
    var any = false
    rows.foreach { r =>
      any = true
      s = EntityState(s.n + 1, s.sum + r.value, math.min(s.min, r.value),
        math.max(s.max, r.value))
    }
    if (!any) Iterator.empty
    else {
      state.update(s)
      Iterator.single(EntityStats(userId, s.n, s.sum / s.n, s.min, s.max))
    }
  }
}

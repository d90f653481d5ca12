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
  // Memoized source handles per (session, path) — CATALOG behavior,
  // not a data cache (r15): `spark.read.parquet` re-lists files and
  // re-reads footer schemas on EVERY call, which charged each bench
  // query ~0.12 s of re-resolution a real deployment pays once at
  // table registration (a metastore table caches its FileIndex; the
  // pandas baseline goes further and holds the whole DATA in RAM
  // outside the timed region). The memo holds only the resolved
  // logical plan — every action still scans parquet — so the honest
  // checksum action's work is untouched and Caches.releaseAll (the
  // operator-result drain) is unaffected. Contract: a table dir is
  // immutable for the life of a session (true of the driver testdata,
  // fuzz dirs, and the marker-cached ScaleGen corpora); a test that
  // rewrites one calls [[invalidate]].
  //
  // Keying + retention (r16, ADVICE): keyed by the SESSION OBJECT
  // (SparkSession uses reference equality), not an identity hash —
  // two live sessions can share an identity-hash value, handing one a
  // DataFrame bound to the other (possibly stopped) session. A
  // DataFrame strongly references its session (df → QueryExecution →
  // SparkSession), so weak-keying cannot work — the memo's own values
  // would keep every key alive. Retention is instead bounded by an
  // access-ordered LRU over sessions: the memo pins at most
  // [[MaxSessions]] sessions' plans (one in any real deployment;
  // tests churn short-lived sessions and evict naturally), never the
  // JVM lifetime's worth.
  private val MaxSessions = 8
  private val handles =
    new java.util.LinkedHashMap[SparkSession, java.util.HashMap[String, DataFrame]](
      16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, java.util.HashMap[String, DataFrame]])
          : Boolean = size > MaxSessions
    }

  /** Drop all memoized source handles (for tests that overwrite a
    * table directory within one session). */
  def invalidate(): Unit = handles.synchronized { handles.clear() }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    handles.synchronized {
      val m = handles.get(spark)
      if (m != null) {
        val df = m.get(path)
        if (df != null) return df
      }
    }
    // parquet resolution OUTSIDE the lock: file listing + footer I/O
    // must not serialize unrelated callers (memo hits included); a
    // concurrent double-resolution of one path is benign — first
    // writer wins, the plans are equivalent
    val fresh = spark.read.parquet(path)
    handles.synchronized {
      var m = handles.get(spark)
      if (m == null) {
        m = new java.util.HashMap[String, DataFrame]()
        handles.put(spark, m)
      }
      val prev = m.get(path)
      if (prev != null) prev
      else { m.put(path, fresh); fresh }
    }
  }

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

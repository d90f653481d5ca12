package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format source/sink support — the tabular feeds a collector
  * realistically lands besides parquet (weather_collector.py stores
  * rows it pulled from a JSON API; CSV/JSONL are the interchange
  * forms of the same data).
  *
  * Discipline for both formats:
  * - ALWAYS an explicit schema. Inference costs a full extra pass over
  *   the data (fatal at lake scale) and can silently widen or
  *   mis-type columns between runs.
  * - PERMISSIVE mode with a `_corrupt_record` column: malformed lines
  *   become quarantinable rows instead of job failures — the batch
  *   analog of the streaming dead-letter route
  *   ([[graft.streaming.EventsStream.resilientSink]]).
  * - Text formats are row-oriented: no column pruning, no predicate
  *   pushdown, no row-group stats. They are INGEST formats — land
  *   them once, convert to (partitioned) parquet, and query that
  *   (use [[Tables.writePartitioned]]).
  */
object Formats {

  val corruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(corruptCol)) schema
    else schema.add(corruptCol, "string")

  /** Schema-first JSON-lines reader; malformed lines land in
    * `_corrupt_record` with every data column null. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Schema-first CSV reader (with header); malformed lines land in
    * `_corrupt_record`. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** Split a permissively-read frame into (clean rows, quarantine
    * rows) — the ingest counterpart of the streaming dead-letter
    * route. Clean rows drop the corrupt column; quarantine rows keep
    * the raw line for replay after a fix.
    *
    * The parsed batch is persisted first: Spark (correctly) refuses
    * plans whose required schema collapses to ONLY the corrupt
    * column — corruptness is undefined without parsing the data
    * columns — and its documented remedy is to materialize the parsed
    * result. The cache registers PINNED with
    * [[graft.operators.Caches.persistPinned]] — `releaseAll()` from an
    * interleaved pipeline cannot drop it mid-consumption (the
    * quarantine branch can never recompute from the raw files). It
    * registers under the AMBIENT scope: a caller that shares the
    * session wraps the call in `Caches.in(myScope) { quarantine(df) }`
    * and holds `myScope` as its release handle —
    * `Caches.releasePinned(myScope)` after BOTH branches have landed
    * drops this batch's cache and nobody else's; the zero-argument
    * [[graft.operators.Caches.releasePinned()*]] remains the
    * whole-process drain. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = graft.operators.Caches.persistPinned(df)
    val c = parsed.col(corruptCol)
    (parsed.filter(c.isNull).drop(corruptCol), parsed.filter(c.isNotNull))
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** The measurement-honesty action shared by Bench and Profile (r13
  * introduced it; r14 hoisted it here so the two sites cannot drift).
  *
  * `count()` let Catalyst prune every column the count didn't need —
  * projection-only queries (redact_pii, time_features, ...) counted
  * bare parquet rows (ReadSchema struct<>, regexes never ran),
  * window-only queries dropped their Window operators outright, and
  * aggregates kept only their GROUP KEYS. 39+ queries benched a
  * fraction of their work in every artifact before r13. xxhash64 over
  * ALL output columns makes every column load-bearing — projections,
  * windows, and aggregate functions all execute — while the terminal
  * checksum aggregate still lets EliminateSorts strip the presentation
  * orderBy (not an operator cost; composition pins show consumers
  * never pay it).
  *
  * The terminal aggregate is BIT_XOR, not SUM (the r14 correction):
  * xxhash64 yields uniform longs and Spark 4 runs with
  * `spark.sql.ansi.enabled=true` by default, so `sum` raised
  * `[ARITHMETIC_OVERFLOW] long overflow` the moment the running sum
  * overflowed — deterministically, for any output past a handful of
  * rows. 96 of 104 queries failed the timing action in BENCH_r13.
  * XOR is order-independent and closed over Long: it can never
  * overflow under any row count or partitioning. ChecksumSpec pins a
  * 1000-row uniform-hash frame under the session's default ANSI mode.
  *
  * MapType cannot be hashed by xxhash64 (AnalysisException) — frames
  * carrying a map column anywhere in their schema fall back to
  * `foreach` (full evaluation, sort included). No current query
  * outputs a map; the guard keeps the action total over any future
  * one.
  */
object Checksum {
  private[graft] def hasMap(dt: DataType): Boolean = dt match {
    case _: MapType   => true
    case a: ArrayType => hasMap(a.elementType)
    case s: StructType => s.fields.exists(f => hasMap(f.dataType))
    case _ => false
  }

  /** Evaluate every column of every row of `out`, cheaply. */
  def fullEval(out: DataFrame): Unit = {
    if (out.schema.fields.exists(f => hasMap(f.dataType))) out.foreach(_ => ())
    else out.select(xxhash64(out.columns.map(col): _*).as("_chk"))
      .agg(bit_xor(col("_chk"))).collect()
  }
}

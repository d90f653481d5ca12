package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, round}

package object operators {

  /** Tie-stable rounding for cross-engine (Spark vs DuckDB) parity.
    *
    * Derived measures here are rationals with small denominators (sums
    * of 2-decimal values divided by window counts, etc.), so a result
    * can land EXACTLY on a round-half boundary; the two engines' binary
    * doubles then sit on opposite sides and round differently. Any
    * value that is NOT an exact tie is >= ~1e-6 from the boundary, so
    * nudging by 1e-9 on BOTH sides resolves exact ties identically
    * while leaving every other value unchanged. Oracle SQL uses the
    * same `round(x + 1e-9, n)` form.
    */
  def rnd(c: Column, scale: Int): Column = round(c + lit(1e-9), scale)

  import org.apache.spark.sql.functions.{count, get_json_object, sum, trim, when}

  /** ANSI-safe DOUBLE extraction of a JSON string field: a malformed
    * payload or non-numeric value becomes null — quarantined by the
    * validation/quality operators — instead of aborting the job (one
    * bad record in 100 TB must never kill the pass; ANSI `cast`
    * throws CAST_INVALID_INPUT). Oracle parity: DuckDB errors outright
    * on malformed JSON, so its side is `CASE WHEN json_valid(props)
    * THEN TRY_CAST(... AS DOUBLE) END` (SparkEntry.duckJsonDouble);
    * both engines agree on every probe case incl. '1e3', '1.5',
    * '-0.0', empty, over-range (→ ±1e20-style doubles). */
  def jsonDouble(props: Column, path: String): Column =
    get_json_object(props, path).try_cast("double")

  /** ANSI-safe BIGINT extraction with an EXPLICIT integral-format
    * contract (optional sign + digits, surrounding whitespace ok):
    * the engines' native string→long rules diverge — Spark rejects
    * '1.5'/'1e3', DuckDB TRY_CAST rounds '1.5'→2 and parses
    * '1e3'→1000 — so a shared regex pins both to the same set.
    * Overflow beyond Long range passes the regex and nulls in both
    * (try_cast / TRY_CAST). Oracle side: SparkEntry.duckJsonLong. */
  def jsonLong(props: Column, path: String): Column = {
    val s = get_json_object(props, path)
    when(trim(s).rlike("^[+-]?[0-9]+$"), s.try_cast("long"))
  }

  /** Exact decimal sum of a fixed-point (<=6dp) column, as double.
    * Summing doubles accumulates order-dependent error that can
    * straddle a rounding boundary differently per engine; summing
    * DECIMAL is exact in both Spark and DuckDB, and the single
    * cast-to-double of the same exact value is bit-identical. */
  def decSum(c: Column): Column = sum(c.cast("decimal(38,6)")).cast("double")

  /** Tie-stable exact-sum average (sum is exact decimal, the division
    * and rounding run on bit-identical doubles in both engines). */
  def decAvg(c: Column, scale: Int): Column =
    rnd(decSum(c) / count(c), scale)

  /** Exact discounted-revenue sum Σ ext·(1−disc) for 2-decimal money
    * columns, in primitive LONG arithmetic instead of DECIMAL(38,6):
    * `round(x·100)` recovers each value's exact scaled integer from
    * its double representation, the per-row multiply and the sum run
    * on longs inside whole-stage codegen (~5-10× cheaper than
    * BigDecimal in the hot loop — measured 1.25 s → 0.5 s on the
    * 600k-row top-k), and one final division emits the nearest double
    * of the same exact rational the DECIMAL path (and the oracle's
    * sum-of-DECIMAL cast) produces.
    *
    * Exactness requires the per-GROUP scaled sum to stay below 2^53 —
    * true for any per-order/per-entity group at any corpus scale
    * (group size is bounded by the entity, not the corpus), NOT for
    * whole-table groups at 100 TB; those keep [[decSum]]. */
  def discountedRevenueSum(ext: Column, disc: Column): Column = {
    // floor(x·100 + 0.5), not round(x·100): Spark's Round on doubles
    // routes through BigDecimal per row — the very cost this helper
    // removes — while Floor is a bare Math.floor in generated code
    // (and already emits long). Half-up is exact for the non-negative
    // money/discount columns this is documented for.
    val extC = floor(ext * 100 + 0.5)
    val discPct = floor(disc * 100 + 0.5)
    sum(extC * (lit(100L) - discPct)).cast("double") / 1e4
  }

  /** Normalize a small frame's partitioning to the cluster's default
    * parallelism (a small parquet table arrives as ONE partition,
    * which serializes downstream per-row kernels and nested-loop
    * scoring onto a single core). A large input — one whose optimizer
    * size estimate exceeds `parallelism × files.maxPartitionBytes`,
    * the same ratio the file scan uses to split partitions — passes
    * through untouched, so a well-partitioned 100 TB scan is never
    * reshuffled or coalesced.
    *
    * The decision is purely plan-side — no `df.rdd` probe, which
    * would force a second physical-plan materialization per call. Two
    * consequences to know: in the SMALL regime the frame is
    * repartitioned to exactly `defaultParallelism` even if it already
    * had more partitions (same cores either way; the shuffle is
    * trivially cheap at that size), and a frame with UNKNOWN stats
    * (e.g. an RDD-backed LogicalRDD reporting Long.MaxValue) is
    * treated as large and passes through — callers feeding non-file
    * sources to quadratic kernels should pre-partition explicitly. */
  def spreadToCores(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(par) * maxPartitionBytes) df.repartition(par) else df
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global id assignment in key order — the "give every
  * document a stable 0..n-1 ordinal" primitive that training-data
  * pipelines need for shard addressing, sample bookkeeping, and
  * join-back tables.
  *
  * Why not the obvious forms:
  *  - `row_number() OVER (ORDER BY key)` funnels the ENTIRE dataset
  *    through one partition (Spark plans an empty-partition-spec
  *    window as a single-task sort) — the canonical 100 TB
  *    scale-killer.
  *  - `monotonically_increasing_id()` is partition-dependent,
  *    non-contiguous, and changes across runs — useless as a stable
  *    address.
  *
  * The scalable shape is range-bucket + offset: bucket each row by a
  * fixed arithmetic range of the key (a pure function of the key, so
  * every plan branch agrees without caching), count rows per bucket
  * (map-side-combined aggregate — ~`nBuckets` rows ever shuffle),
  * cumulate the counts into per-bucket starting offsets (a window
  * over ≤ `nBuckets` rows), broadcast the offsets back, and
  * `row_number` WITHIN each bucket. `global_id = offset + rank − 1`
  * equals the whole-dataset rank of the key exactly, for ANY bucket
  * boundaries — balance affects only parallelism, never values.
  *
  * Cost at scale: two passes over the source (the counting pass
  * reduces to `nBuckets` rows before its shuffle; caching a 100 TB
  * input to save the second scan would cost more than the scan) and
  * ONE full shuffle of the data — the hash exchange feeding the
  * per-bucket window. That is the floor for this semantics: a total
  * order needs at least one repartition by key range.
  */
object GlobalIds {

  /** Assign `global_id` ∈ [0, n) by ascending `key` order. `key` must
    * be a unique NON-NULL integral column (ties would get arbitrary
    * but still contiguous ids; null-key rows have no position in the
    * order and are dropped by the inner offset join — filter or
    * coalesce them first); its value range must fit in a signed
    * 64-bit span, which `require`s below. `nBuckets` bounds the offset
    * table (driver/broadcast state) — 4096 buckets address ~4096
    * executor cores; raise it for larger clusters, the offset table
    * is 16 bytes/bucket either way.
    *
    * `df` must be DETERMINISTIC across re-evaluation: the plan is
    * scanned three times (bounds, per-bucket counts, the final ranked
    * join), and a source whose rows can differ between scans — a
    * `sample`/`limit` without a seed-stable lineage, a shuffled RDD
    * conversion, a changing external table — can make the branches
    * disagree, yielding silently non-contiguous or duplicate ids.
    * Persist such an input (or write it out) before calling; parquet
    * scans and deterministic transformations over them are fine. */
  def assignIds(df: DataFrame, key: String, nBuckets: Int = 4096): DataFrame = {
    val bounds = df.agg(min(col(key)).cast("long"), max(col(key)).cast("long")).head()
    if (bounds.isNullAt(0)) {
      // empty input: zero rows, schema stable
      return df.withColumn("global_id", lit(0L)).where(lit(false))
    }
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    require(BigInt(mx) - BigInt(mn) < BigInt(Long.MaxValue),
      s"key range [$mn, $mx] exceeds a signed 64-bit span")
    val width = ((BigInt(mx) - BigInt(mn)) / nBuckets + 1).toLong
    // integer `div`, not `/`: double division loses exactness past 2^53
    val bucket = expr(s"(`$key` - ${mn}L) div ${width}L")

    val offsetW = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df
      .select(bucket.as("_bucket"))
      .groupBy("_bucket").agg(count(lit(1)).as("_n"))
      // this window IS single-partition — over ≤ nBuckets count rows,
      // not the data; the same shape as stratifiedSample's bounds
      .select(col("_bucket"), coalesce(sum("_n").over(offsetW), lit(0L)).as("_offset"))

    val rankW = Window.partitionBy("_bucket").orderBy(key)
    df.withColumn("_bucket", bucket)
      .join(broadcast(offsets), Seq("_bucket"))
      .withColumn("global_id", col("_offset") + row_number().over(rankW) - 1)
      .drop("_bucket", "_offset")
  }

  /** The reference form: one whole-dataset window. Kept as the oracle
    * for [[assignIds]]'s bit-identity test; never use on real data —
    * the empty partition spec serializes the sort onto one task. */
  private[graft] def assignIdsExact(df: DataFrame, key: String): DataFrame =
    df.withColumn("global_id",
      row_number().over(Window.orderBy(key)).cast("long") - 1)

  /** Contiguous weighted binning in key order: bin row r =
    * (Σ weight of all rows strictly before r, by ascending `key`)
    * div `perBin` — i.e. cut the key-ordered stream into consecutive
    * bins of ~`perBin` total weight, each row assigned to the bin its
    * cumulative START falls in. The weighted generalization of
    * [[assignIds]] (weight ≡ 1, perBin ≡ 1 degenerates to it), built
    * on the same range-bucket + broadcast-offset machinery and with
    * the same contracts: unique non-null integral `key`,
    * deterministic `df` (three scans), non-negative integral
    * `weight` whose TOTAL stays under 2^63.
    *
    * Scale: per-bucket weight sums (map-side-combined, ~nBuckets rows
    * shuffle) → offsets window over ≤ nBuckets rows → broadcast back →
    * within-bucket running sum. One data shuffle (the per-bucket
    * window), no whole-dataset window — exactness for any bucket
    * boundaries by the same offset argument as [[assignIds]]. */
  def binByCumWeight(df: DataFrame, key: String, weight: String,
                     perBin: Long, nBuckets: Int = 4096): DataFrame = {
    require(perBin > 0, s"perBin must be positive: $perBin")
    val bounds = df.agg(min(col(key)).cast("long"), max(col(key)).cast("long")).head()
    if (bounds.isNullAt(0)) {
      return df.withColumn("bin", lit(0L)).where(lit(false))
    }
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    require(BigInt(mx) - BigInt(mn) < BigInt(Long.MaxValue),
      s"key range [$mn, $mx] exceeds a signed 64-bit span")
    val width = ((BigInt(mx) - BigInt(mn)) / nBuckets + 1).toLong
    val bucket = expr(s"(`$key` - ${mn}L) div ${width}L")

    val offsetW = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df
      .select(bucket.as("_bucket"), col(weight).cast("long").as("_w"))
      .groupBy("_bucket").agg(sum("_w").as("_n"))
      // ≤ nBuckets count rows — the stratifiedSample bounds shape
      .select(col("_bucket"), coalesce(sum("_n").over(offsetW), lit(0L)).as("_offset"))

    val cumW = Window.partitionBy("_bucket").orderBy(key)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_bucket", bucket)
      .join(broadcast(offsets), Seq("_bucket"))
      .withColumn("_before",
        col("_offset") + coalesce(sum(col(weight).cast("long")).over(cumW), lit(0L)))
      .withColumn("bin", expr(s"_before div ${perBin}L"))
      .drop("_bucket", "_offset", "_before")
  }
}

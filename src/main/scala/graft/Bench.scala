package graft

import org.apache.spark.sql.SparkSession

/** Benchmark surface: times every SparkEntry query at the SF dir from
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup action runs
  * first so JVM/codegen/parquet-reader initialization is not billed to
  * whichever query happens to run first.
  *
  * Each query runs three times and reports the fastest run —
  * steady-state throughput, the TPC convention. The passes are
  * INTERLEAVED (the whole suite runs, then runs again), not
  * back-to-back repeats of each query: a transient stall on a shared
  * machine (co-tenant CPU burst, page-cache eviction) then lands in
  * one pass and the min recovers, where back-to-back samples would
  * both absorb it — exactly the round-2 artifact where an
  * alphabetically contiguous window of queries reported 3-10× their
  * reproducible times. The first execution of a query additionally
  * pays one-time Catalyst planning + whole-stage-codegen javac
  * compilation (~0.3–2 s, independent of data size — profiled with
  * graft.Profile); that cost is amortized away in any real deployment
  * and is excluded the same way the pandas baseline excludes
  * interpreter startup and imports. The sum of first-pass runs is
  * still reported as `cold_total`. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + codegen + shuffle machinery on the smallest SF
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop operator-internal caches so no query's footprint leaks
      // into the next measurement (the shared-session pollution fix)
      graft.operators.Caches.releaseAll()
      (dt, ok)
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val passes = 3
    // pass-major order: pass 0 = cold, passes 1..n-1 = steady samples
    val samples = (0 until passes).map(_ => ordered.map { case (_, fn) => time(fn) })
    val results = ordered.zipWithIndex.map { case ((name, _), qi) =>
      val runs = samples.map(_(qi))
      (name, runs.head._1, runs.map(_._1).min, runs.forall(_._2))
    }
    val qs = results.map { case (k, _, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    // LSH bucket-population probes: a skew regression in band/RHP
    // bucketing (one hot bucket -> quadratic candidate blowup) shows
    // up in these numbers long before a 100 TB straggler would
    val lsh = try {
      import graft.operators.{Dedup, Similarity}
      import graft.sources.Tables
      val m = Dedup.minhashBucketStats(Tables.documents(spark, sfDir)).collect()(0)
      val r = Similarity.rhpBucketStats(Tables.embeddings(spark, sfDir)).collect()(0)
      s""","lsh_buckets":{"minhash":{"n":${m.getLong(0)},"max":${m.getLong(1)},"cand_pairs":${m.getLong(2)}},"rhp":{"n":${r.getLong(0)},"max":${r.getLong(1)},"cand_pairs":${r.getLong(2)}}}"""
    } catch { case _: Throwable => "" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"failed":$failed$lsh,"sf":"$sfDir"}""")
    spark.stop()
  }
}

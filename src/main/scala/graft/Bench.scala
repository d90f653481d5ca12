package graft

import org.apache.spark.sql.SparkSession

/** Benchmark surface: times every SparkEntry query at the SF dir from
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup action runs
  * first so JVM/codegen/parquet-reader initialization is not billed to
  * whichever query happens to run first.
  *
  * Each query runs twice and reports the faster run — steady-state
  * throughput, the TPC convention. The first execution of a query
  * additionally pays one-time Catalyst planning + whole-stage-codegen
  * javac compilation (~0.3–2 s, independent of data size — profiled
  * with graft.Profile); that cost is amortized away in any real
  * deployment and is excluded the same way the pandas baseline
  * excludes interpreter startup and imports. The sum of first runs is
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (cold, okCold) = time(fn)
      val (warm, okWarm) = time(fn)
      (name, cold, math.min(cold, warm), okCold && okWarm)
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

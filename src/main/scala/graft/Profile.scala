package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: times a named query N times in one session to
  * separate fixed (planning/codegen) cost from marginal (data) cost.
  * Usage: runMain graft.Profile <sfDir> <name> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // job-count + summed-execution listener: the floor decomposition
    // (wall − Σ job execution = driver-side gaps: Catalyst analysis,
    // broadcast setup, scheduling) that motivated the r16 curation
    // plan-depth work reads straight off these counters
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val execNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          jobStart.put(s.jobId, System.nanoTime())
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          // explicit absent-key handling: the boxed remove() returns
          // null for an unseen jobId (e.g. a job started before the
          // counters were reset) — don't rely on Scala's null→0L
          // unboxing plus a sentinel compare to encode that case
          Option(jobStart.remove(e.jobId))
            .foreach(t0 => execNanos.addAndGet(System.nanoTime() - t0))
        }
      })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      jobs.set(0); execNanos.set(0L)
      val t0 = System.nanoTime()
      // the SHARED checksum action (graft.Checksum): count() would
      // let Catalyst prune projections/windows/agg functions and time
      // a bare row count; sharing the impl with Bench keeps the
      // MapType fallback and the bit_xor ANSI-overflow fix (r14) in
      // sync at both sites by construction
      Checksum.fullEval(SparkEntry.queries(name)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus BEFORE reading the counters: the
      // last job's end event arrives after the action returns, and
      // without the drain it undercounts this rep and bleeds into the
      // next one's reset
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      println(f"[profile] $name run $i: $wall%.3f s " +
        f"(jobs=${jobs.get}, job_exec=${execNanos.get / 1e9}%.2f s)")
      // drain operator caches between reps, as Bench does — otherwise
      // warm reps read persistTracked frames and overstate vs Bench
      graft.operators.Caches.releaseAll()
    }
    spark.stop()
  }
}

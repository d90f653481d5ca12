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
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // the SHARED checksum action (graft.Checksum): count() would
      // let Catalyst prune projections/windows/agg functions and time
      // a bare row count; sharing the impl with Bench keeps the
      // MapType fallback and the bit_xor ANSI-overflow fix (r14) in
      // sync at both sites by construction
      Checksum.fullEval(SparkEntry.queries(name)(spark, sfDir))
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // drain operator caches between reps, as Bench does — otherwise
      // warm reps read persistTracked frames and overstate vs Bench
      graft.operators.Caches.releaseAll()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Throwaway decomposition probe for the q_curate ≤4 s adjudication
  * (r18): times the composed curation in cumulative variants — core
  * (strip→quality→exact→near-dup→redact), +span, +decontam, +sample —
  * each as (resolution wall, checksum wall, jobs), caches released
  * between variants so every variant pays its full cost. Run:
  * runMain graft.CurateProbe <sfDir> [reps] */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bench = docs.filter(col("source") === "src0")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("source"), col("text"))

    def variant(name: String, mk: () => graft.CorpusCuration): Unit = {
      (1 to reps).foreach { i =>
        val cur = mk()
        jobs.set(0)
        val t0 = System.nanoTime()
        val f = cur.frame // forces near-dup resolution
        val t1 = System.nanoTime()
        val j1 = jobs.get
        Checksum.fullEval(f)
        val t2 = System.nanoTime()
        org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
        println(f"[curateprobe] $name rep $i: resolve ${(t1 - t0) / 1e9}%.2f s " +
          f"($j1 jobs) + eval ${(t2 - t1) / 1e9}%.2f s (total jobs ${jobs.get})")
        cur.release()
        graft.operators.Caches.releaseAll()
      }
    }

    variant("core", () => GraftApi.curatePlan(corpus))
    variant("core+span", () => GraftApi.curatePlan(corpus, spanDedupK = Some(20)))
    variant("core+span+decon", () => GraftApi.curatePlan(corpus,
      spanDedupK = Some(20), benchmark = Some(bench)))
    variant("full(q_curate)", () => GraftApi.curatePlan(corpus,
      perSource = 10, spanDedupK = Some(20), benchmark = Some(bench)))
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Regression locks on the physical-plan properties the 100 TB design
  * depends on. If a refactor silently reintroduces a shuffle, drops a
  * pushed filter, or un-broadcasts a dim join, these fail. */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("dim joins broadcast (no sort-merge join in q_join_enrich)") {
    val p = planOf("q_join_enrich")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("time-range predicate pushes to the parquet scan") {
    val p = planOf("q_load_timerange")
    assert(p.contains("GreaterThanOrEqual(ts,"), s"range lower bound not pushed:\n$p")
    assert(p.contains("LessThan(ts,"), s"range upper bound not pushed:\n$p")
  }

  test("feature pipeline computes all windowed features in ONE Window operator") {
    val df = SparkEntry.queries("q_feature_pipeline")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.split("Window \\[").length - 1 == 1, s"expected 1 Window operator:\n$p")
  }

  test("pricing aggregate is partial (two HashAggregate phases, one Exchange)") {
    val p = planOf("q1_pricing")
    assert(p.split("HashAggregate").length - 1 >= 2, p)
  }

  test("events scans prune columns (no props column where unused)") {
    val df = SparkEntry.queries("q_lag_features")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scan.contains("props"), s"lag features must not read props: $scan")
    assert(!scan.contains("event_type"), s"lag features must not read event_type: $scan")
  }

  test("asof join is one hash shuffle and one Window (union-merge, no range join)") {
    val p = planOf("q_asof_join")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one hash Exchange:\n$p")
    assert(p.split("Window \\[").length - 1 == 1, s"expected 1 Window operator:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("partitioned lake writes create prunable directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-lake").toString
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")).cast("string"))
    Tables.writePartitioned(ev, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("day=")) > 5, dirs.mkString(","))
    // partition-pruned read touches one directory
    val one = spark.read.parquet(out).filter(col("day") === dirs.head.stripPrefix("day="))
    assert(one.count() > 0)
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters"), scanned)
  }
}

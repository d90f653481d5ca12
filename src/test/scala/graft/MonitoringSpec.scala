package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.monitoring.PerformanceTracker
import graft.sources.Tables

class MonitoringSpec extends AnyFunSuite {
  import TestSession._

  test("tracker records query actions and manual spans") {
    val t = PerformanceTracker.install(spark)
    try {
      Tables.events(spark, sfDir).count()
      Tables.nation(spark, sfDir).count()
      val x = t.span("manual_op") { Thread.sleep(5); 42 }
      assert(x == 42)
      // listener bus is async; poll until delivered
      eventually(t.recorded.count(_.name == "count") >= 2)
      val s = t.summary
      assert(s.contains("manual_op"))
      val (n, total, mean, maxMs, failures) = s("manual_op")
      assert(n == 1 && failures == 0 && total >= 5.0 && mean == total && maxMs == total)
    } finally spark.listenerManager.unregister(t)
  }

  test("tracker records failures from spans") {
    val t = new PerformanceTracker
    intercept[RuntimeException](t.span("boom") { throw new RuntimeException("x") })
    assert(t.summary("boom")._5 == 1)
  }

  private def eventually(cond: => Boolean, tries: Int = 50): Unit = {
    var i = 0
    while (i < tries && !cond) { Thread.sleep(100); i += 1 }
    assert(cond)
  }
}

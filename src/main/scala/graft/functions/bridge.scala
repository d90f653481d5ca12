// Lives under org.apache.spark.sql so the private[sql] Column<->
// Expression converters (Spark 4 removed the public `new Column(expr)`
// constructor) are reachable — the standard pattern for third-party
// Catalyst extensions.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the asynchronous listener bus (private[spark], reachable
    * here because org.apache.spark.sql.* is inside the spark access
    * scope) — an action's SparkListenerJobEnd arrives on the bus
    * thread AFTER the action returns, so instrumentation that reads
    * listener-fed counters right after an action (graft.Profile's
    * job/exec decomposition) must drain first or it undercounts the
    * rep and bleeds the late event into the next one. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a function on a LIVE session's registry (the extensions
    * path only applies at session construction). */
  def registerFunction(spark: SparkSession, name: String, info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)

  /** Re-plan `df` on a CLONED session whose conf differs only by
    * `confs` — per-execution conf scoping WITHOUT mutating the
    * caller's shared session (the r17 caveat on CorpusCuration
    * .manifest's AQE toggle, and bloomFilterOf's sizing-limit raise:
    * a set/restore on the live session is mutable global state that a
    * concurrent query on the same session can observe mid-window).
    * `cloneSession` copies the session state (conf, temp views,
    * registered functions) and SHARES the SharedState — one
    * CacheManager, so plans persisted via the scoped registry still
    * hit from the clone. The clone is plan-scoped garbage afterwards:
    * nothing registers it, and it holds no state of its own. */
  def withSessionConfs(df: org.apache.spark.sql.DataFrame,
                       confs: Map[String, String]): org.apache.spark.sql.DataFrame = {
    val clone = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    confs.foreach { case (k, v) => clone.conf.set(k, v) }
    org.apache.spark.sql.classic.Dataset.ofRows(clone,
      df.queryExecution.analyzed)
  }
}

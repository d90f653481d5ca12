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
}

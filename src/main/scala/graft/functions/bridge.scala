// Lives under org.apache.spark.sql so the private[sql] Column<->
// Expression converters (Spark 4 removed the public `new Column(expr)`
// constructor) are reachable — the standard pattern for third-party
// Catalyst extensions.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

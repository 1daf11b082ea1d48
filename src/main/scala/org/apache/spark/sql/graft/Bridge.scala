package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for the `private[sql]` Column↔Expression converters —
  * the supported classic-API entry points for attaching custom Catalyst
  * expressions to DataFrame code (a subpackage of `org.apache.spark.sql`
  * is the documented pattern for extension libraries needing them).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

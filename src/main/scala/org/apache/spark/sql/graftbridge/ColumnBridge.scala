package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression conversions
  * (Spark 4 removed the public `new Column(expr)` constructor). Lives in
  * an `org.apache.spark.sql` subpackage solely to satisfy the access
  * qualifier — the standard technique for libraries shipping custom
  * Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4 hides
  * them behind the connect-compatible Column API). Living in an
  * `org.apache.spark.sql` subpackage is the standard extension-library
  * escape hatch; this is the only file outside the `graft` namespace.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

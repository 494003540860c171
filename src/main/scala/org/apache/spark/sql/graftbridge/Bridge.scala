package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Column/Expression
  * conversion `private[sql]` (org.apache.spark.sql.classic
  * .ExpressionUtils); custom Catalyst expressions still need it to be
  * exposed as user-facing Columns, so this object re-exports the two
  * converters from inside the sql package namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge: `ExpressionUtils` (Column <-> Catalyst Expression) is
  * `private[sql]` in Spark 4, so custom native expressions need a shim
  * inside the `org.apache.spark.sql` package tree to be wrapped as
  * user-facing `Column`s. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

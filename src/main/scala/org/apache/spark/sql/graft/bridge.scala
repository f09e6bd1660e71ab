package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` Column <-> Expression conversion —
  * the standard pattern for libraries that ship custom Catalyst
  * expressions without forking Spark. Kept to the two conversions;
  * everything else in this repo uses public APIs. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into `private[sql]` surface: Column <-> Catalyst
  * Expression conversion for registering custom expressions from the
  * Column API (Spark 4 moved Column onto ColumnNode; classic
  * conversions are sql-private).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

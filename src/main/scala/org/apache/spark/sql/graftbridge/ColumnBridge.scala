package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column wrap a ColumnNode instead of an Expression, and the
  * Expression<->Column converters (`org.apache.spark.sql.classic
  * .ExpressionUtils`) are private[sql]. This bridge lives under the
  * org.apache.spark.sql package solely to re-export those two conversions to
  * graft's custom Catalyst expressions. No other Spark internals are touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

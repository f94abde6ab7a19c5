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

  /** The materialized RDD behind a `localCheckpoint`ed Dataset, if any.
    * `Dataset.unpersist` is a no-op for checkpoint-backed frames (the
    * CacheManager doesn't track checkpoint RDD blocks), so freeing them
    * early requires unpersisting the underlying RDD directly. */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df match {
      case d: org.apache.spark.sql.classic.Dataset[_] =>
        d.queryExecution.analyzed.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD if l.rdd.isCheckpointed => l.rdd
        }
      case _ => None
    }
}

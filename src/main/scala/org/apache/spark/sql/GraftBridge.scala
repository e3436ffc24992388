package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into Spark's private[sql] Column <-> Expression
 * conversions (Spark 4.x moved Column to a ColumnNode wrapper; this
 * is the standard extension-library pattern for building typed
 * Columns around custom Catalyst expressions).
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 moved `Column` to a backend-agnostic representation
  * (`ColumnNode`); the classic-backend converters
  * (`classic.ExpressionUtils.column/expression`) are `private[sql]`.
  * This is the standard extension-library shim: one object inside the
  * `org.apache.spark.sql` package exposing exactly those two
  * conversions, so graft's custom expressions (e.g. VectorDistance)
  * can surface as ordinary `Column`s without registering per-session
  * SQL functions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

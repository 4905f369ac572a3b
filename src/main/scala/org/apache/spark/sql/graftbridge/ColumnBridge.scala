package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column onto ColumnNode and made the
  * Column↔Expression bridge (`classic.ExpressionUtils`) private[sql];
  * this package-located shim re-exposes it for graft's custom Catalyst
  * expressions (the sanctioned pattern for classic-mode extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 Column <-> catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]`, so custom expressions (graft.plans.*) go through this
  * package-located shim — the standard extension pattern for libraries
  * that add native Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

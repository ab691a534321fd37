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

  /** DataFrame from an RDD[InternalRow] WITHOUT the external-Row
    * decode/encode round-trip of `createDataFrame` (`internalCreate
    * DataFrame` is `private[sql]`, same shim rationale as above). Used
    * by operators that must drop to the RDD layer (e.g.
    * Sampling.denseGlobalIndex's zipWithIndex) but should not pay three
    * materializations of every row to get back into SQL.
    */
  def ofInternalRows(spark: org.apache.spark.sql.SparkSession,
                     rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                     schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** DataFrame from a hand-built LogicalPlan (custom operators, e.g.
    * graft.plans.AsOfJoinPlan). `classic.Dataset.ofRows` is
    * `private[sql]`, same shim rationale as above.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

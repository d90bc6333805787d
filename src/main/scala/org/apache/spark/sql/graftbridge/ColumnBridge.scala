package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Column ↔ Catalyst Expression conversion, which is
  * `private[sql]` in Spark 4 (ExpressionUtils). Lives under
  * org.apache.spark.sql so graft can register custom native expressions
  * as user-facing Columns.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Wrap a resolved logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`); used by plan-rewriting fast paths that splice
    * together analyzed fragments (e.g. Relational.coalesceColumns's
    * same-parent projection merge). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame over an RDD of InternalRow without the external-Row
    * conversion hop (`internalCreateDataFrame` is `private[sql]`); used by
    * byte-level sources (sources.SupersonicFile) whose decoders produce
    * catalyst-native values (UTF8String, days-int, micros-long) directly. */
  def fromInternalRows(spark: SparkSession,
                       rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                       schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}

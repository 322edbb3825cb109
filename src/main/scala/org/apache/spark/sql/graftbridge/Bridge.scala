package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: Spark 4 removed the public
  * `Column(expr)` constructor, so custom Catalyst expressions (our distance
  * kernels) need `classic.ExpressionUtils` to become user-facing Columns.
  * This is the narrow, sanctioned-by-convention seam — nothing else from
  * the private surface is exposed.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** DataFrame over a logical plan (Dataset.ofRows is private[sql]) —
    * lets the routing rule serve a plan CACHED at registration instead
    * of re-listing the index at every optimization pass. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

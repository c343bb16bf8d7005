package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the classic Column/Expression converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so third-party native
  * expressions need a shim inside the `org.apache.spark.sql` namespace —
  * the standard pattern for Spark extension libraries. Only these two
  * one-line forwarders live here; everything else stays in graft.*.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (`Dataset.ofRows` is private[sql]) —
    * used by tests to execute a plan after applying a custom Rule. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

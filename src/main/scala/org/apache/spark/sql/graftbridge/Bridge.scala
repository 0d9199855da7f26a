package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters.
  * Spark 4 hides the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; living under the
  * `org.apache.spark.sql` package grants access. This is the documented
  * extension-point pattern for libraries shipping custom Catalyst
  * expressions (no reflection, no copied Spark code).
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `Dataset.ofRows` (private[sql]) — a DataFrame over an analyzed
    * logical plan; used by the cow catalog's dynamic-overwrite command
    * to execute its aligned query child, the same way Spark's own
    * `InsertIntoDataSourceCommand.run` does.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

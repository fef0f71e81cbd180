package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge into `private[sql]` plan/column constructors, needed by
  * graft's optimizer rule (graft.plans.AnnIvfRewriteRule) to re-enter
  * the DataFrame API from inside a `Rule[LogicalPlan]` — the standard
  * pattern for extension libraries that compose rewritten subplans with
  * the public API instead of hand-assembling catalyst trees. */
object GraftPlanBridge {

  /** Wrap an analyzed/optimized logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Unwrap a user-facing Column to its catalyst Expression. */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}

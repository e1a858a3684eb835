package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the one `private[sql]` seam the optimizer-time width
  * sampler needs: execute a LogicalPlan FRAGMENT (a Project+Limit
  * over one join input) as a DataFrame. `Dataset.ofRows` is package-
  * private to `org.apache.spark.sql`, hence this shim package — the
  * standard extension-point pattern for code that composes plans the
  * public builder API can't reach (the fragment has no DataFrame
  * handle: it was torn out of a larger plan mid-optimization). */
object LogicalPlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Second `private[sql]` seam, same rationale: RUNTIME registration
  * of SQL table functions (`sessionState.tableFunctionRegistry`) for
  * sessions not built with `spark.sql.extensions=graft.GraftExtensions`
  * — extension-built sessions get the identical functions via the
  * public `injectTableFunction`, this only serves `Engine.init` on a
  * plain session. */
object TableFunctionReg {
  def register(spark: SparkSession, ident: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
}

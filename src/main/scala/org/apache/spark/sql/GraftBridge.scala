package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the sql-private Column↔Expression converters so the
  * engine's custom Catalyst expressions (graft.expressions.*) can expose a
  * public Column API. Standard SparkSessionExtensions-style technique; no
  * Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an (analyzed) logical plan as a DataFrame — the construction
    * path for the engine's custom logical operators (graft.plans.*). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

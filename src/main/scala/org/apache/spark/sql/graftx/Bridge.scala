package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal access shims for the three `private[sql]` seams a library-level
  * custom operator genuinely needs (Spark 4 exposes no public equivalent):
  * wrapping a LogicalPlan into a DataFrame, unwrapping a DataFrame's
  * analyzed plan, and converting a public `Column` to its Catalyst
  * `Expression` (Spark 4's Column wraps a ColumnNode, not an Expression).
  * Lives under `org.apache.spark.sql` solely for the access qualifier; no
  * Spark behavior is modified. Everything else in graft.plans sticks to
  * the documented extension APIs (`SparkSessionExtensions`, `SparkPlan`).
  */
object Bridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Convert a public Column to its Catalyst expression via the session's
    * ColumnNode converter (ExpressionUtils.expression would only wrap the
    * node lazily — unusable inside a custom logical operator). */
  def expr(s: SparkSession, c: Column): Expression =
    s.asInstanceOf[classic.SparkSession].expression(c)

  /** Float-normalize a grouping key the way Window/Aggregate keys are
    * normalized (-0.0 → 0.0, canonical NaN); no-op for other types. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}

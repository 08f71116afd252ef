package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion
  * (Spark 4 wraps Columns in ColumnNodes). Lives under
  * `org.apache.spark.sql` purely for access; the rest of graft calls
  * through here. Standard pattern for libraries shipping custom
  * Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`), and expose the analyzed plan for building nodes
    * over resolved attributes.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Run `body` under a NAMED SQL execution id
    * (`SQLExecution.withNewExecutionId` is `private[sql]`). The name
    * matters: `ExecutionListenerBus` relays a SQLExecutionEnd event to
    * `QueryExecutionListener`s only when the event carries an execution
    * name — which is how raw `toRdd` actions (no Dataset API, no
    * execution id of their own) become visible to listener-driven
    * machinery like [[graft.CacheScope]].
    */
  def withNamedExecution[T](qe: org.apache.spark.sql.execution.QueryExecution,
      name: String)(body: => T): T =
    org.apache.spark.sql.execution.SQLExecution.withNewExecutionId(qe, Some(name))(body)
}

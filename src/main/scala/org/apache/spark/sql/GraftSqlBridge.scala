package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-time bridge to `private[sql]` surface needed by graft's custom
  * operator (graft.plans.TopKPerKey): constructing a DataFrame from a
  * hand-built LogicalPlan.  Lives in `org.apache.spark.sql` solely for
  * access; contains no logic.  (The standard pattern for third-party plan
  * extensions — same access route Spark's own connectors use.) */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 hides `Column.expr` behind the
    * ColumnNode API).  Converts EAGERLY via the node converter:
    * `ExpressionUtils.expression` returns a lazy `ColumnNodeExpression`
    * wrapper that only Dataset API boundaries unwrap — inside a custom
    * LogicalPlan it would survive to execution and fail task
    * serialization.  The eager form yields plain (possibly unresolved)
    * catalyst expressions the analyzer resolves normally. */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Catalyst Expression → Column (the inverse of [[expr]]) — lets engine
    * code use a custom expression without a function-registry round-trip,
    * so it works on ANY session (test sessions carry no extensions). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}

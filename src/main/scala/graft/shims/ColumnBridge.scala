package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved `Column` onto the Connect-unified `ColumnNode`
  * representation; the classic `Column → catalyst.Expression`
  * conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This one-method bridge (the standard
  * spark-extensions pattern: a file compiled into the
  * `org.apache.spark.sql` package) re-exports exactly that conversion
  * for graft's manifest-stats pruning evaluator, which pattern-matches
  * the user's predicate tree against per-file min/max envelopes. */
object GraftColumnBridge {
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The reverse conversion, for the SQL DML lowering: predicates and
    * SET expressions arrive from the parser as raw catalyst
    * expressions and re-enter the engine through the public
    * Column-taking CoW verbs. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** A DataFrame over an arbitrary (possibly unresolved) logical plan —
    * MERGE's USING source is any relation/subquery/TVF the parser
    * produced; ofRows analyzes it in the session. */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

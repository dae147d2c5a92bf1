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
}

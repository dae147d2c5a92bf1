package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column helpers shared by the operator suite.
  *
  * Float discipline (SURVEY.md §5): sums over doubles are routed through
  * DECIMAL(18,s) so they are order-independent and bit-identical between
  * Spark and the DuckDB oracle, then surfaced as DOUBLE for a stable
  * output schema. All of these stay inside whole-stage codegen.
  */
object Cols {

  /** Order-independent sum of a double column: SUM(CAST(c AS DECIMAL(18,s)))
    * cast back to double. Matches oracle
    * `CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic average = decimal-sum / count. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** Epoch-aligned time bucketing (the reference's `date_bin`, see
    * reference docs/7 + tests/opt_parallel_execution.rs:33). Integer
    * arithmetic on microseconds — no double rounding at bin boundaries.
    * Oracle: `make_timestamp(epoch_us(CAST(c AS TIMESTAMP)) // (s*1000000) * (s*1000000))`.
    */
  def timeBin(colName: String, secs: Long): Column =
    timestamp_seconds(expr(s"unix_micros($colName) div ${secs * 1000000L} * $secs"))
}

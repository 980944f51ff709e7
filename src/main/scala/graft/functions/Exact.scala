package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Float-determinism helpers (SURVEY.md §5).
  *
  * Distributed double summation is order-dependent, so aggregated doubles go
  * through an exact DECIMAL(27,6) sum and are cast back to DOUBLE at the end.
  * Per-row arithmetic stays in DOUBLE (a fixed chain of IEEE ops is
  * bit-identical in any engine); only the commutative reduction needs the
  * exact carrier. The DuckDB oracle uses the identical cast chain, so results
  * are bit-identical regardless of partitioning — which also makes pipeline
  * output stable across cluster sizes.
  *
  * Scale-6 decimal midpoints are never exactly representable as binary
  * doubles (denominator contains 5^6), so the double->decimal rounding mode
  * can never disagree between engines.
  */
object Exact {
  /** Exact accumulation carrier for a computed double. */
  def acc(c: Column): Column = c.cast("decimal(27,6)")

  /** Order-insensitive exact sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(acc(c)).cast("double")

  /** Deterministic average: exact sum -> double, then one IEEE division. */
  def davg(c: Column): Column = sum(acc(c)).cast("double") / count(c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns — codegen'd
  * higher-order functions, float widened to double before any arithmetic so
  * results are engine-portable (SURVEY.md §2.C).
  */
object VectorFunctions {

  /** Elementwise widen to double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two double arrays — native codegen expression
    * (graft.plans.ArrayDotProduct), same sequential IEEE fold order as the
    * HOF formulation and the DuckDB oracle.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Squared L2 distance of two double arrays — native codegen expression
    * (graft.plans.ArraySqDist), the ADC hot loop (every PQ code
    * assignment and probed-candidate score); same sequential IEEE fold
    * order as the HOF formulation and the DuckDB oracle.
    */
  def sqDist(a: Column, b: Column): Column = call_function("graft_sqdist", a, b)

  /** L2 norm of a double array. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity given precomputed norms. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}

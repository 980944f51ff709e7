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

  /** Sequential left-fold sum — deterministic IEEE order. */
  private def foldSum(v: Column): Column = aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two double arrays. */
  def dot(a: Column, b: Column): Column = foldSum(zip_with(a, b, (x, y) => x * y))

  /** L2 norm of a double array. */
  def norm(v: Column): Column = sqrt(foldSum(transform(v, x => x * x)))

  /** Cosine similarity given precomputed norms. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}

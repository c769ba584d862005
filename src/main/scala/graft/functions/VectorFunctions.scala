package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure higher-order
  * column expressions (no UDFs; NS mandate: similarity search).
  *
  * These compose `zip_with`/`aggregate`, which evaluate per-element in the
  * interpreter — correct and shuffle-free, but not codegen'd. The planned
  * upgrade path (SURVEY.md §4) is a native Catalyst `Expression` with
  * `doGenCode` for the dot product; the call sites here won't change shape.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm inputs (rather than NaN) so
    * downstream top-k ordering stays total. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.expressions.{ArgMinDistSq, LshBuckets, VecCosine, VecDistSq, VecDiv, VecDot, VecMaxAbs, VecQuantize}

/** Vector math over `array<float>`/`array<double>` embedding columns
  * (NS mandate: similarity search).
  *
  * Backed by native codegen'd Catalyst expressions
  * ([[graft.expressions.VecDot]] / [[graft.expressions.VecCosine]]) — a
  * tight primitive loop inside whole-stage codegen. Accumulation order
  * (sequential left-to-right in double) is identical to the previous
  * higher-order-function formulation, so results are bit-compatible.
  */
object VectorFunctions {

  private def expr2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                        org.apache.spark.sql.catalyst.expressions.Expression) =>
                       org.apache.spark.sql.catalyst.expressions.Expression)
                   (a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All hyperplane-LSH bucket ids of an embedding as `array<int>`
    * (element t = table t's bucket) — see [[graft.expressions.LshBuckets]]. */
  def lshBuckets(emb: Column, planes: Array[Array[Double]], bits: Int): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(emb), planes, bits))

  /** Nearest centroid under squared L2 as `struct(d, j)` — distance and
    * index, ties to the smallest index; the centroid matrix rides as one
    * primitive reference object — see [[graft.expressions.ArgMinDistSq]]. */
  def argMinDistSq(emb: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(ArgMinDistSq(ColumnBridge.expression(emb), centroids))

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column = expr2(VecDot)(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Σ (aᵢ−bᵢ)² in double precision (squared L2 distance). */
  def distSq(a: Column, b: Column): Column = expr2(VecDistSq)(a, b)

  /** Cosine similarity; 0.0 for zero-norm inputs (rather than NaN) so
    * downstream top-k ordering stays total. */
  def cosine(a: Column, b: Column): Column = expr2(VecCosine)(a, b)

  /** max |aᵢ| — the scale pass of int8 quantization. */
  def maxAbs(a: Column): Column =
    ColumnBridge.column(VecMaxAbs(ColumnBridge.expression(a)))

  /** Element-wise aᵢ / s as array<double> (division, not reciprocal
    * multiply — bit-compatible with a SQL `x / s` oracle). */
  def vecDiv(a: Column, s: Column): Column = expr2(VecDiv)(a, s)

  /** Int8-style scalar quantization round(aᵢ·s) → array<int>, half away
    * from zero (matches Spark round(x,0) and DuckDB round). */
  def quantize(a: Column, s: Column): Column = expr2(VecQuantize)(a, s)
}

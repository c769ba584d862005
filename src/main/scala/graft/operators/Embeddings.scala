package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Embedding-column preparation operators (NS mandate: similarity search /
  * multimodal pipelines prep their vectors before indexing).
  *
  * All per-element math runs in the native codegen'd expressions
  * ([[graft.expressions.VecMaxAbs]] / [[graft.expressions.VecDiv]] /
  * [[graft.expressions.VecQuantize]]) — tight primitive loops inside
  * whole-stage codegen, no interpreted higher-order-function lambdas
  * (SURVEY.md §7.3b: HOF lambda bodies measured 4–8× slower).
  *
  * Scale shape: everything here is scan → per-row column math — no
  * shuffle, no driver involvement; it parallelizes linearly with input
  * splits at any corpus size. Quantization is the 100 TB ANN enabler:
  * int8 vectors are 4× smaller than float32 (less shuffle, less memory,
  * 4× more corpus per executor) and integer dot products are EXACT, so
  * quantized scores are bit-reproducible across engines, retries, and
  * partitionings — none of which holds for float accumulation.
  */
object Embeddings {

  /** L2-normalized vectors, one row per (id, dimension index) — the
    * exploded spelling keeps every output column scalar, which is what
    * makes it hash-comparable against a SQL oracle. `norm` rides along
    * (rounded by the caller). Zero vectors keep u = 0.0 (guarded
    * division), so the output stays total. */
  def normalize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val norm = sqrt(dot(col(vecCol), col(vecCol)))
    df.select(col(idCol), col(vecCol), norm.as("norm"))
      .select(col(idCol), col("norm"),
        posexplode(when(col("norm") === 0.0, col(vecCol).cast("array<double>"))
          .otherwise(vecDiv(col(vecCol), col("norm")))))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "u")
  }

  /** Per-vector int8 scale: 127 / max|xᵢ|, 0 for the zero vector — the
    * ONE spelling of the quantization contract, shared by [[quantizeI8]]
    * and [[knnI8]] (and mirrored verbatim in their DuckDB oracles). */
  private def i8Scale(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m = maxAbs(v)
    when(m === 0.0, lit(0.0)).otherwise(lit(127.0) / m)
  }

  /** Int8 scalar quantization: per-vector scale = 127 / max|xᵢ|, elements
    * round(xᵢ·scale) half-away-from-zero into [-127, 127]. Exploded to
    * (id, scale, i, q) rows for the same oracle-ability reason as
    * [[normalize]]. Zero vectors get scale = 0 and all-zero codes. */
  def quantizeI8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol), i8Scale(col(vecCol)).as("scale"))
      .select(col(idCol), col("scale"),
        posexplode(quantize(col(vecCol), col("scale"))))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "q")

  /** Exact top-k cosine over int8-QUANTIZED vectors — the memory-bound
    * ANN path at 100 TB (4× smaller vectors; the corpus side would be
    * quantized once at ingest). Unlike float kNN, every intermediate here
    * is exact: integer products (≤ 127²·dim ≈ 10⁶ per vector, far inside
    * double's 2⁵³ exact-integer range) make the cosine order-independent
    * and bit-reproducible — which is why THIS approximate-kNN variant is
    * DuckDB-oracle-checkable while IVF/LSH (sketch-family) are not.
    * Output contract matches [[Similarity.knn]]: (q_id, rank,
    * neighbor_id, cos). */
  def knnI8(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def qz(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(id), quantize(col(v), i8Scale(col(v))).cast("array<double>").as(v))
    // quantize both sides, then rank through Similarity.knnTopK — ONE
    // spelling of the bounded-buffer ranking contract (map-side partial
    // top-k ships k rows per (partition × query) into the shuffle instead
    // of every scored pair; measured 26 s → 11.6 s at 10× data vs the
    // row_number window, and tie-break/rank semantics stay in one place).
    Similarity.knnTopK(
      qz(corpus.toDF("neighbor_id", "c_emb"), "neighbor_id", "c_emb"),
      qz(queries.toDF("q_id", "q_emb"), "q_id", "q_emb"), k)
  }
}

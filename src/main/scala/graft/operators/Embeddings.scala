package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.dsum
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
  private[operators] def i8Scale(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
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
    // array<FLOAT>, not array<double>: the codes are integers in
    // [-127, 127], exactly representable in float32, and VecCosine reads
    // float arrays natively (fold still accumulates in double) — so the
    // scores are bit-identical while each vector flowing through the
    // broadcast ranking join is HALF the bytes. The double spelling made
    // the int8 EXACT path 15% SLOWER than float sim_knn at the 100×
    // decade (100.7 s vs 87.4 s, BENCH_SCALING r9): per ranked pair the
    // fold streamed 2×64 doubles where sim_knn streamed 2×64 floats —
    // the pair loop is memory-bound, so byte width, not arithmetic, set
    // the wall. (float32 is also what the "4× smaller vectors" memory
    // story already promises; materializing doubles quietly gave half of
    // it back.)
    def qz(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(id), quantize(col(v), i8Scale(col(v))).cast("array<float>").as(v))
    // quantize both sides, then rank through Similarity.knnTopK — ONE
    // spelling of the bounded-buffer ranking contract (map-side partial
    // top-k ships k rows per (partition × query) into the shuffle instead
    // of every scored pair; measured 26 s → 11.6 s at 10× data vs the
    // row_number window, and tie-break/rank semantics stay in one place).
    Similarity.knnTopK(
      qz(corpus.toDF("neighbor_id", "c_emb"), "neighbor_id", "c_emb"),
      qz(queries.toDF("q_id", "q_emb"), "q_id", "q_emb"), k)
  }

  /** Deterministic Lloyd k-means over an embedding column — the corpus
    * clustering step behind semantic dedup blocks, topic balancing, and
    * IVF coarse quantizers. Output: (idCol, cluster, cluster_size,
    * dist_sq) under the final centroids.
    *
    * Fully deterministic, hence cross-engine oracle-checkable:
    *  - seed = the k vectors with the smallest ids (no RNG);
    *  - assignment = argmin squared-L2 via the codegen'd
    *    [[graft.expressions.ArgMinDistSq]] ([[graft.expressions.VecDistSq]]'s
    *    left-to-right fold ≡ DuckDB list_sum, all k centroids in one
    *    native pass), ties to the smallest cluster index;
    *  - update = per-dimension mean through exact DECIMAL(25,6)
    *    accumulation (order-free), empty clusters keep their centroid.
    *
    * Scale shape: the assignment pass is scan → per-row math against k
    * BROADCAST centroid literals (no shuffle, no join); each update is
    * one k·dim-cell aggregation — the only driver traffic is the k×dim
    * centroid matrix per iteration, the same offline-fit contract as
    * [[Similarity.ivfKnn]]. Iterations are a fixed budget, not
    * convergence-tested: at 100 TB you run a few Lloyd rounds on a
    * sample and freeze the codebook. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame = {
    // null vectors carry no position: excluded up front (they would
    // otherwise seed a null centroid or take an arbitrary argmin).
    val src = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .localCheckpoint(true) // feeds iters+1 assignment passes
    var cents: Array[Array[Double]] = src.orderBy(idCol).limit(k)
      .select(vecCol).collect().map(_.getSeq[Double](0).toArray)
    // one native pass per row against the k×dim matrix (bit-identical
    // to the array_min-of-struct(distSq(v, array(lit…)), j) spelling it
    // replaces — same VecDistSq fold, same Double.compare tie-to-
    // smallest-j order; SURVEY §7.3g: folded array(lit…) centroids are
    // boxed, so the literal spelling paid k·dim unboxings per row)
    def assign(): DataFrame =
      src.withColumn("__best", argMinDistSq(col(vecCol), cents))
        .select(col(idCol), col(vecCol),
          col("__best.j").as("cluster"), col("__best.d").as("dist_sq"))
    for (_ <- 1 to iters) {
      val sums = assign()
        .select(col("cluster"), posexplode(col(vecCol)))
        .groupBy("cluster", "pos")
        .agg(dsum(col("col")).as("s"), count(lit(1)).as("cnt"))
        .collect()
      val next = cents.map(_.clone)
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    val fin = assign().drop(vecCol)
    val sizes = fin.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    fin.join(sizes, "cluster")
      .select(col(idCol), col("cluster"), col("cluster_size"), col("dist_sq"))
  }
}

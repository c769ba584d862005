package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Similarity-search bindings to the `embeddings` table; reusable operators
  * in [[Similarity]]. Query set = every 50th vector. */
object SimilarityQueries {

  private val K = 5

  val all: Seq[Q] = Seq(
    // Exact brute-force top-k: the correctness baseline every ANN variant
    // is measured against (recall in SimilaritySpec).
    Q("sim_knn",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        Similarity.knn(e, e.filter(col("vec_id") % 50 === 0), K)
          .select(col("q_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cosine"))
          .orderBy("q_id", "rank")
      },
      None),

    // IVF variant: k-means coarse quantizer, 16 cells, probe 2.
    Q("sim_knn_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        Similarity.ivfKnn(e, e.filter(col("vec_id") % 50 === 0), K)
          .select(col("q_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cosine"))
          .orderBy("q_id", "rank")
      },
      None),

    // Approximate top-k via multi-table hyperplane LSH (8 tables × 8 bits).
    Q("sim_knn_lsh",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        Similarity.lshKnn(e, e.filter(col("vec_id") % 50 === 0), K)
          .select(col("q_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cosine"))
          .orderBy("q_id", "rank")
      },
      None),
  )
}

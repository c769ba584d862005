package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (NS mandate): brute-force
  * cosine top-k as the exact baseline, and a multi-table random-hyperplane
  * LSH variant as the approximate scale path.
  *
  * Scale design: brute force broadcasts the (small) query set and scans the
  * corpus once — no shuffle of the corpus; per-query top-k is a windowed
  * row_number over (query, score). The LSH variant replaces the full scan
  * with a bucket equi-join: each vector lands in L=8 buckets (k=8
  * hyperplane bits each), candidates are same-bucket pairs, and exact
  * cosine runs on candidates only. At 100 TB the same plan works with the
  * corpus bucketed/bucket-partitioned on write.
  */
object SimilarityQueries {

  private val K = 5
  private val Tables_L = 8 // LSH tables
  private val Bits_K = 8   // hyperplanes per table
  private val Dim = 64

  /** Deterministic Gaussian hyperplane weights (fixed seed — identical
    * across sessions and executors). */
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(Tables_L * Bits_K)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  private def planeCol(p: Int) = array(planes(p).map(lit): _*)

  /** LSH bucket id for table `t`: k sign-bits of hyperplane dot products. */
  private def bucket(t: Int, emb: org.apache.spark.sql.Column) =
    (0 until Bits_K).map { j =>
      when(dot(emb, planeCol(t * Bits_K + j)) >= 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  val all: Seq[Q] = Seq(
    // Exact brute-force top-k: the correctness baseline every ANN variant
    // is measured against (recall in SimilaritySpec).
    Q("sim_knn",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
        val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor_id"))
        c.join(broadcast(q), col("q_id") =!= col("neighbor_id"))
          .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select(col("q_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cosine"))
          .orderBy("q_id", "rank")
      },
      None),

    // Approximate top-k via multi-table hyperplane LSH. Candidates =
    // vectors sharing any of the query's 8 buckets; exact cosine + top-k
    // on candidates only.
    Q("sim_knn_lsh",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val buckets = e.select(col("vec_id"),
            posexplode(array((0 until Tables_L).map(t => bucket(t, col("embedding"))): _*)))
          .toDF("vec_id", "t", "b")
        val qb = buckets.join(e.filter(col("vec_id") % 50 === 0), "vec_id")
          .select(col("vec_id").as("q_id"), col("t"), col("b"))
        val cand = buckets.toDF("neighbor_id", "ct", "cb")
          .join(broadcast(qb),
            col("ct") === col("t") && col("cb") === col("b") && col("q_id") =!= col("neighbor_id"))
          .select("q_id", "neighbor_id").distinct()
        val withVecs = cand
          .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), "q_id")
          .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb")), "neighbor_id")
        val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor_id"))
        withVecs
          .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select(col("q_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cosine"))
          .orderBy("q_id", "rank")
      },
      None),
  )
}

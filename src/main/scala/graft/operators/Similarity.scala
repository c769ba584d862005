package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Reusable similarity-search operators (NS mandate) — the library surface
  * behind `SimilarityQueries`.
  *
  * `knn` is the exact baseline: broadcast the (small) query set, scan the
  * corpus once, windowed top-k per query. `lshKnn` is the approximate scale
  * path: multi-table random-hyperplane LSH bucket join for candidates, exact
  * cosine + top-k on candidates only. At 100 TB the corpus side is bucketed
  * on write and the join key is (table, bucket).
  */
object Similarity {

  /** Deterministic Gaussian hyperplanes (fixed seed — identical across
    * sessions/executors). */
  private[operators] def planes(tables: Int, bits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(tables * bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Exact brute-force cosine top-k.
    * @param corpus  (id, embedding) rows
    * @param queries (id, embedding) rows, expected small (broadcast)
    * @return (q_id, rank, neighbor_id, cosine), rank 1..k */
  def knn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.toDF("q_id", "q_emb")
    val c = corpus.toDF("neighbor_id", "c_emb")
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor_id"))
    c.join(broadcast(q), col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Exact cosine top-k via the bounded [[graft.functions.TopKAggregator]]
    * buffer instead of a ranking window: the aggregation buffer holds at
    * most k pairs, so map-side partial aggregation ships k rows per
    * (partition × query) into the shuffle — where [[knn]]'s
    * `row_number` window shuffles EVERY candidate pair to sort it. Same
    * output contract as [[knn]] (proven by sharing its DuckDB oracle). */
  def knnTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.{functions => F, Encoders}
    val q = queries.toDF("q_id", "q_emb")
    val c = corpus.toDF("neighbor_id", "c_emb")
    val topk = F.udaf(new graft.functions.TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    c.join(broadcast(q), col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
      .groupBy("q_id")
      .agg(topk(col("cos"), col("neighbor_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col._2").as("neighbor_id"), col("col._1").as("cos"))
  }

  /** IVF-style approximate top-k: a k-means coarse quantizer (MLlib,
    * fixed seed) buckets the corpus into `nlist` cells; each query probes
    * its `nprobe` nearest centroids and ranks exact cosine only over those
    * cells' members. At scale the corpus is bucketed once at ingest (the
    * fit is offline) and the per-query work is |corpus|·nprobe/nlist.
    * Output shape matches [[knn]]. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.toDF("id", "emb")
    val fitted = new KMeans().setK(nlist).setSeed(42).setMaxIter(5)
      .setFeaturesCol("__fv").setPredictionCol("cell")
      .fit(c.withColumn("__fv", array_to_vector(col("emb"))))
    val bucketed = fitted.transform(c.withColumn("__fv", array_to_vector(col("emb"))))
      .select(col("id").as("neighbor_id"), col("emb").as("c_emb"), col("cell"))
    // rank centroids per query by ||q - ctr||^2 = |q|^2 - 2 q.ctr + |ctr|^2
    // (|q|^2 is constant per query, dropped); centroids ride as literals.
    val centerCols = fitted.clusterCenters.map(_.toArray).zipWithIndex.map {
      case (ctr, j) =>
        struct((lit(ctr.map(x => x * x).sum) -
                 lit(2.0) * dot(col("q_emb"), array(ctr.map(lit): _*))).as("score"),
               lit(j).as("cell"))
    }
    val probed = queries.toDF("q_id", "q_emb")
      .withColumn("probes", slice(array_sort(array(centerCols.toIndexedSeq: _*)), 1, nprobe))
      .select(col("q_id"), col("q_emb"), explode(col("probes.cell")).as("cell"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor_id"))
    bucketed.join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Approximate top-k via multi-table hyperplane LSH. Same output shape as
    * [[knn]]; recall grows with `tables` and shrinks with `bits` (see
    * SimilaritySpec for the measured trade-off). */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             tables: Int = 8, bits: Int = 8, dim: Int = 64): DataFrame = {
    val ps = planes(tables, bits, dim)
    def planeCol(p: Int): Column = array(ps(p).map(lit): _*)
    def bucket(t: Int, emb: Column): Column =
      (0 until bits).map { j =>
        when(dot(emb, planeCol(t * bits + j)) >= 0.0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)

    def bucketed(df: DataFrame): DataFrame = df
      .select(col("id"),
        posexplode(array((0 until tables).map(t => bucket(t, col("emb"))): _*)))
      .toDF("id", "t", "b")

    val c = corpus.toDF("id", "emb")
    val q = queries.toDF("id", "emb")
    val cand = bucketed(c).toDF("neighbor_id", "ct", "cb")
      .join(broadcast(bucketed(q).toDF("q_id", "t", "b")),
        col("ct") === col("t") && col("cb") === col("b") && col("q_id") =!= col("neighbor_id"))
      .select("q_id", "neighbor_id").distinct()
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor_id"))
    cand
      .join(q.toDF("q_id", "q_emb"), "q_id")
      .join(c.toDF("neighbor_id", "c_emb"), "neighbor_id")
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}

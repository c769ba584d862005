package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Reusable similarity-search operators (NS mandate) — the library surface
  * behind `SimilarityQueries`.
  *
  * `knn` is the exact baseline: broadcast the (small) query set, scan the
  * corpus once, windowed top-k per query. The approximate scale paths are
  * `ivfBuild`/`ivfProbe` (a PERSISTED coarse-quantizer index: fit offline
  * once, write codebook + cell-partitioned corpus as parquet artifacts,
  * then each serving batch scans only the probed cells) and `lshKnn`
  * (multi-table random-hyperplane buckets). At 100 TB the index artifacts
  * live on distributed storage next to the corpus and the probe-side scan
  * is pruned to nprobe/nlist of the data (see KnnScaleBench for the
  * measured exact-vs-probe crossover).
  */
object Similarity {

  /** Deterministic Gaussian hyperplanes (fixed seed — identical across
    * sessions/executors). */
  private[operators] def planes(tables: Int, bits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(tables * bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Shared ranking tail: (q_id, neighbor_id, cos) scored candidates →
    * (q_id, rank, neighbor_id, cos) via the bounded
    * [[graft.functions.TopKAggregator]] buffer — the aggregation buffer
    * holds at most k pairs, so map-side partial aggregation ships k rows
    * per (partition × query) into the shuffle, where a `row_number`
    * window would shuffle EVERY candidate pair to sort it. Ties break on
    * neighbor_id ascending (the aggregator's contract), identical to the
    * windowed spelling. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.{functions => F, Encoders}
    val topk = F.udaf(new graft.functions.TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    scored.groupBy("q_id")
      .agg(topk(col("cos"), col("neighbor_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col._2").as("neighbor_id"), col("col._1").as("cos"))
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

  /** Exact cosine top-k via the bounded aggregation buffer (see
    * [[rankTopK]]) — the 100 TB exact-ranking path. Same output contract
    * as [[knn]] (proven by sharing its DuckDB oracle). */
  def knnTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.toDF("q_id", "q_emb")
    val c = corpus.toDF("neighbor_id", "c_emb")
    rankTopK(
      c.join(broadcast(q), col("q_id") =!= col("neighbor_id"))
        .select(col("q_id"), col("neighbor_id"),
          cosine(col("q_emb"), col("c_emb")).as("cos")),
      k)
  }

  /** Fit the IVF coarse quantizer (MLlib k-means, fixed seed) and assign
    * every corpus vector to its cell.
    * @return (codebook (cell, ctr), cells (id, emb, cell)) */
  private def ivfFit(c: DataFrame, nlist: Int,
                     maxIter: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val s = c.sparkSession
    import s.implicits._
    val fv = c.withColumn("__fv", array_to_vector(col("emb").cast("array<double>")))
    val fitted = new KMeans().setK(nlist).setSeed(42).setMaxIter(maxIter)
      .setFeaturesCol("__fv").setPredictionCol("cell")
      .fit(fv)
    val codebook = fitted.clusterCenters.zipWithIndex
      .map { case (ctr, j) => (j, ctr.toArray) }.toSeq
      .toDF("cell", "ctr")
    (codebook, fitted.transform(fv).select(col("id"), col("emb"), col("cell")))
  }

  /** Rank centroids per query and explode to (q_id, q_emb, cell) probe
    * rows: score = |ctr|² − 2·q·ctr (|q|² is constant per query,
    * dropped), nprobe nearest cells each, ties to the smaller cell id.
    * The codebook is nlist×dim — broadcast, so probing is a narrow
    * per-query computation however large nlist grows (no giant literal
    * expressions; at nlist = √n this stays a few MB at any corpus size). */
  private def probeCells(queries: DataFrame, codebook: DataFrame,
                         nprobe: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(asc("score"), asc("cell"))
    queries.crossJoin(broadcast(codebook))
      .withColumn("score",
        dot(col("ctr"), col("ctr")) - lit(2.0) * dot(col("q_emb").cast("array<double>"), col("ctr")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= nprobe)
      .select("q_id", "q_emb", "cell")
  }

  /** Candidate generation + exact ranking over probed cells only: the
    * per-query work is |corpus|·nprobe/nlist instead of |corpus|. */
  private def ivfRank(cells: DataFrame, codebook: DataFrame,
                      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = probeCells(queries.toDF("q_id", "q_emb"), codebook, nprobe)
    rankTopK(
      cells.toDF("neighbor_id", "c_emb", "cell")
        .join(broadcast(probed), Seq("cell"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .select(col("q_id"), col("neighbor_id"),
          cosine(col("q_emb"), col("c_emb")).as("cos")),
      k)
  }

  /** OFFLINE index build: fit the coarse quantizer and persist the two
    * index artifacts under `indexDir` —
    *  - `codebook.parquet` (cell, ctr): nlist×dim, read + broadcast at
    *    serve time;
    *  - `cells.parquet` (id, emb), PARTITIONED BY cell: the corpus
    *    bucketed by cell, so a probe with a broadcast cell set prunes
    *    the scan to the probed partitions (dynamic partition pruning —
    *    at 100 TB this is the difference between scanning nprobe/nlist
    *    of the corpus and all of it).
    * Run once per corpus snapshot (the offline-fit contract); every
    * serving batch then pays only [[ivfProbe]]. */
  def ivfBuild(corpus: DataFrame, indexDir: String, nlist: Int,
               maxIter: Int = 5): Unit = {
    val (codebook, cells) = ivfFit(corpus.toDF("id", "emb"), nlist, maxIter)
    codebook.write.mode("overwrite").parquet(s"$indexDir/codebook.parquet")
    cells.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/cells.parquet")
  }

  /** [[ivfBuild]] only if the index artifacts are not already present —
    * the registered query's spelling of "fit offline once, probe every
    * serving batch". */
  def ivfBuildIfAbsent(corpus: DataFrame, indexDir: String, nlist: Int): Unit = {
    val marker = new java.io.File(s"$indexDir/cells.parquet/_SUCCESS")
    if (!marker.exists()) ivfBuild(corpus, indexDir, nlist)
  }

  /** ONLINE probe against a stored index: read + broadcast the codebook,
    * rank each query's nprobe nearest cells, scan ONLY those cells'
    * members (partition-pruned read of `cells.parquet`), exact cosine +
    * bounded top-k on the candidates. Output shape matches [[knn]]. */
  def ivfProbe(s: SparkSession, indexDir: String, queries: DataFrame,
               k: Int, nprobe: Int): DataFrame = {
    val codebook = s.read.parquet(s"$indexDir/codebook.parquet")
    val cells = s.read.parquet(s"$indexDir/cells.parquet")
      .select(col("id"), col("emb"), col("cell"))
    ivfRank(cells, codebook, queries, k, nprobe)
  }

  /** Session-scoped index location for a dataset tag: under
    * java.io.tmpdir, namespaced by the Spark application id (no cross-JVM
    * collisions) and the tag hash (one index per dataset per session). */
  def ivfIndexDir(s: SparkSession, tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${s.sparkContext.applicationId}/ivf_${Integer.toHexString(tag.hashCode)}")
      .getAbsolutePath

  /** Self-contained IVF approximate top-k (fit + probe in one plan, no
    * persisted artifacts) — the parameter-sweep form RecallBench drives;
    * production serving uses [[ivfBuild]]/[[ivfProbe]]. Identical output
    * to building then probing the same corpus (SimilaritySpec pins the
    * round-trip). */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    val (codebook, cells) = ivfFit(corpus.toDF("id", "emb"), nlist, maxIter = 5)
    ivfRank(cells.select("id", "emb", "cell"), codebook, queries, k, nprobe)
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
    rankTopK(
      cand
        .join(q.toDF("q_id", "q_emb"), "q_id")
        .join(c.toDF("neighbor_id", "c_emb"), "neighbor_id")
        .select(col("q_id"), col("neighbor_id"),
          cosine(col("q_emb"), col("c_emb")).as("cos")),
      k)
  }
}

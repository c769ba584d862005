package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-query-set similarity scaling: the registered sim_knn* queries
  * scale BOTH sides (query set = every 50th vector), so their work grows
  * ~sf² by construction. The serving-shaped question — "corpus grows,
  * query batch stays fixed" — is measured here: the SAME 40 query vectors
  * against each corpus given on the command line
  * (`runMain graft.KnnScaleBench <dir1> <dir2> ...`). Expected: brute
  * force and LSH both ~linear in corpus size (LSH with the smaller
  * constant; candidate count per query is bucket-bound). */
object KnnScaleBench {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: KnnScaleBench <sfDir>...")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val results = args.toSeq.map { dir =>
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select("vec_id", "embedding")
      // same 40 queries at every scale: the first 40 of the original
      // (copy-0) query family, present identically in every scaled dir
      val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
      val n = e.count()
      def brute = operators.Similarity.knnTopK(e, q, 5).count()
      def lsh = operators.Similarity.lshKnn(e, q, 5).count()
      brute; lsh // warmup
      val tb = (1 to 2).map(_ => time(brute)).min
      val tl = (1 to 2).map(_ => time(lsh)).min
      (dir, n, tb, tl)
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val js = results.map { case (dir, n, tb, tl) =>
      s"""{"dir":"$dir","corpus":$n,"brute_topk_sec":${fmt(tb)},"lsh_sec":${fmt(tl)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"knn_scale":$js,"queries":40,"k":5}""")
    spark.stop()
  }
}

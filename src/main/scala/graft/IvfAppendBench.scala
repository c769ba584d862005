package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-ingest cost benchmark for the stored IVF index
  * (`runMain graft.IvfAppendBench <embeddingsDir>`): measures the
  * growing-corpus serving question — "10% of the corpus arrives after the
  * index was built; what does indexing it cost?" — by timing
  * [[graft.operators.Similarity.ivfAppend]] of the batch against the
  * alternative a deployment avoids, a from-scratch [[ivfBuild]] over the
  * union. Also asserts the append contract end-to-end at scale:
  * `ivfValid(union)` must accept the appended index (the additive
  * manifest), and a fixed 40-query probe of the appended index is
  * compared against the same probe of the rebuilt index (they may differ
  * only where the rebuild's refit centroids draw different cell
  * boundaries). Committed operating points live in RECALL.md. */
object IvfAppendBench {

  private val K = 5

  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // SANDBOX-LAYOUT CONFIG (see Bench): not deployment advice
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double, d: Int = 1) =
      String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))

    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val nlist = math.max(16, math.round(math.sqrt(n.toDouble)).toInt)
    val base = e.filter(col("vec_id") % 10 =!= 0)   // the pre-indexed 90%
    val batch = e.filter(col("vec_id") % 10 === 0)  // the arriving 10%
    val queries = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)

    val idxA = operators.Similarity.ivfIndexDir(spark, s"$dir#appendbench")
    val idxR = operators.Similarity.ivfIndexDir(spark, s"$dir#rebuildbench")
    val tBuild90 = time(operators.Similarity.ivfBuild(base, idxA, nlist))
    val tAppend = time(operators.Similarity.ivfAppend(batch, idxA))
    val unionValid = operators.Similarity.ivfValid(e, idxA, nlist)
    val tRebuild = time(operators.Similarity.ivfBuild(e, idxR, nlist))

    def pairs(idx: String): Set[(Long, Long)] =
      operators.Similarity.ivfProbe(spark, idx, queries, K, nprobe = 4)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (pa, pr) = (pairs(idxA), pairs(idxR))
    val agree = (pa & pr).size.toDouble / math.max(pr.size, 1)

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    rmTree(new java.io.File(idxA)); rmTree(new java.io.File(idxR))

    println(s"""{"ivf_append":{"dir":"$dir","corpus":$n,"nlist":$nlist,""" +
      s""""build90_sec":${fmt(tBuild90)},"append10_sec":${fmt(tAppend)},""" +
      s""""rebuild_sec":${fmt(tRebuild)},"union_valid":$unionValid,""" +
      s""""probe_agreement_at5":${fmt(agree, 3)}}}""")
    spark.stop()
  }
}

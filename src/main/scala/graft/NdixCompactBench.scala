package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction benchmark for the STORED near-dup index
  * (`runMain graft.NdixCompactBench <sfDir> <batches>`): prices the
  * question [[graft.operators.Dedup.nearDupCompact]] exists to answer —
  * "a continuous ingest has committed N append batches; what does every
  * probe pay for the N extra roots, and what does the fold buy back?"
  *
  * Setup mirrors the registered dedup_incremental split: the corpus
  * (doc_id % 10 =!= 0) is indexed as a build over its even half plus N
  * [[Dedup.nearDupAppend]] installments of the odd half (hash-bucketed,
  * uniform); the held-out 10% (doc_id % 10 === 0) is the probe batch and
  * is NEVER appended, so the probe result is a pure function of the
  * logical index and MUST be bit-identical across the fold (required,
  * not just asserted — compaction is layout-only). Measured per
  * operating point: data files and storage roots in the serving READ
  * SET before/after (manifest-listed roots only — the deferred sweep
  * keeps superseded dirs one maintenance interval, so a whole-dir walk
  * would transiently overcount), probe wall (min of 3 after a warm
  * pass), fold wall, and the build/append context costs. Committed
  * operating points live in COMPACT.md. */
object NdixCompactBench {

  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // SANDBOX-LAYOUT CONFIG (see Bench): not deployment advice
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def fmt(v: Double, d: Int = 1) =
    String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    val Array(dir, batchesStr) = args.take(2)
    val batches = batchesStr.toInt
    val spark = session()
    import operators.Dedup
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val base = corpus.filter(col("doc_id") % 2 === 0)
    val arriving = corpus.filter(col("doc_id") % 2 === 1)
    val probeBatch = docs.filter(col("doc_id") % 10 === 0)
    val idx = Dedup.nearDupIndexDir(spark, s"$dir#ndixcompactbench")
    rmTree(new java.io.File(idx))
    val tBuild = time(Dedup.nearDupIndexWrite(base, "doc_id", "text", idx))
    val bucket = pmod(xxhash64(col("doc_id")), lit(batches))
    val tAppend = time((0 until batches).foreach(i =>
      Dedup.nearDupAppend(arriving.filter(bucket === i), idx)))

    // serving READ SET (manifest-listed roots only; the deferred sweep
    // keeps superseded dirs one interval, so no whole-dir walks)
    def readSet(): (Long, Long) = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else if (f.getName.startsWith("part-")) 1L
        else 0L
      val m = Dedup.readNdManifest(idx).get
      val roots = Seq(s"$idx/hot.parquet", s"$idx/shingles", s"$idx/sizes.parquet") ++
        m.batches.flatMap(b => Seq(s"$idx/batches/$b/shingles.parquet",
          s"$idx/batches/$b/sizes.parquet"))
      (roots.map(r => walk(new java.io.File(r))).sum,
        1L + m.batches.size) // shingle storage roots the probe joins
    }
    def probe() = Dedup
      .probeNearDups(Dedup.nearDupIndexLoad(spark, idx), probeBatch, "text")
      .select("doc_id", "dup_of", "inter", "n_batch", "n_corpus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    def probeWall(): Double = {
      probe() // warm (catalog/filesystem caches), like a serving steady state
      (1 to 3).map(_ => time(probe())).min
    }

    val (filesBefore, rootsBefore) = readSet()
    val wallBefore = probeWall()
    val pairsBefore = probe()
    val tCompact = time(Dedup.nearDupCompact(spark, idx))
    val (filesAfter, rootsAfter) = readSet()
    val wallAfter = probeWall()
    require(probe() == pairsBefore, "compact changed probe results")
    val m = Dedup.readNdManifest(idx).get
    require(m.batches.size == 1 && m.batches.head.startsWith("c"),
      s"unexpected post-compact manifest: $m")
    rmTree(new java.io.File(idx))

    println(s"""{"ndix_compact":{"dir":"$dir","corpus_docs":${corpus.count()},""" +
      s""""appended_docs":${m.appendedRows},"batches":$batches,""" +
      s""""build_sec":${fmt(tBuild)},"append_total_sec":${fmt(tAppend)},""" +
      s""""compact_sec":${fmt(tCompact)},""" +
      s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""probe_roots_before":$rootsBefore,"probe_roots_after":$rootsAfter,""" +
      s""""probe_wall_before_sec":${fmt(wallBefore, 2)},""" +
      s""""probe_wall_after_sec":${fmt(wallAfter, 2)},"probe_identical":true}}""")
    spark.stop()
  }
}

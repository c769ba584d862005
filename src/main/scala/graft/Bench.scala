package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Hygiene:
  *  - a warmup pass first (session/codegen/JIT/parquet-footer costs land
  *    there, not on the first measured query), stable name order, AQE on;
  *  - TWO measured passes, min per query: a single pass is dominated by
  *    JIT/GC noise on sub-second queries (observed 1.3s vs 11.6s for the
  *    same groupBy across driver runs);
  *  - timings printed with 2 decimals (total with 3), and the per-query
  *    map capped to the 45 slowest queries: the driver captures only the
  *    LAST 2000 chars of stdout, and full maps outgrew that window twice
  *    (BENCH_r01/r02 "parsed": null; ~2090 chars for 89 queries). The
  *    capped line is ~1000 chars — headroom for sbt's trailing [success]
  *    line and future query growth;
  *  - queries that throw are listed in "failed" (and excluded from the
  *    map/total), never recorded as normal-looking timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // ENVIRONMENT SELF-CERTIFICATION — measured before the session spins
    // up and recorded in the JSON line. BENCH_r15 was taken while a
    // leftover 8-core Verify JVM churned the same box, and its 2.05×
    // median per-query ratio vs r14 was unadjudicable for a round: a
    // contaminated measurement is worse than none when it can masquerade
    // as a regression (or as the absence of one). The guard RECORDS
    // rather than refuses — the driver's bench must never be zeroed by a
    // stray process — but the artifact now carries the evidence to
    // discount itself: 1-minute load average at start and the number of
    // OTHER JVMs alive (self and its sbt ancestors excluded).
    val loadAtStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val otherJvms: Long = {
      val self = Iterator.iterate(Option(ProcessHandle.current)) {
        _.flatMap(h => Option(h.parent.orElse(null)))
      }.takeWhile(_.isDefined).take(16).flatten.map(_.pid).toSet
      import scala.jdk.CollectionConverters._
      ProcessHandle.allProcesses().iterator().asScala.count { h =>
        !self(h.pid) &&
          h.info.command.map[Boolean](_.contains("java")).orElse(false)
      }
    }
    // PAGE-CACHE FINGERPRINT — the r16 hole: load1/other_jvms certify
    // CPU quiet but are blind to filesystem state, and the round's own
    // adjudication proved a cache-churned box (post-sf10-Verify) inflates
    // the many-small-file families 2-13x with load1 1.65 and zero other
    // JVMs. /proc/meminfo Cached at start is the evidence: a fresh boot
    // or an explicit drop_caches reads near zero; a box that just
    // digested a big-decade leg reads tens of GB. The chain drops caches
    // before timed legs; this field lets the artifact flag itself when
    // that discipline was skipped. -1 = unreadable (non-Linux).
    val cachedMb: Long = try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().collectFirst {
        case l if l.startsWith("Cached:") => l.split("\\s+")(1).toLong / 1024
      }.getOrElse(-1L)
      finally src.close()
    } catch { case _: Exception => -1L }
    if (otherJvms > 0 || loadAtStart > 2.0)
      System.err.println(f"[bench] WARNING: contended box at start — " +
        f"load1=$loadAtStart%.2f, other JVMs=$otherJvms; timings below " +
        "measure the CONTENTION, not the engine")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the production registration path (README "SQL surface"): the
      // injected vec_*/token/shingle functions and the asof strategy are
      // session-wide, and the registered sql_surface query runs pure SQL
      // text against them
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // SANDBOX-LAYOUT CONFIG — do not copy into a deployment. This
      // harness's inputs are MB-scale, so heavy per-row work (regex,
      // char-gram hashing, 64-dim vector folds, 1000-query broadcast
      // ranking) lands on ONE 128 MB-default split and runs single-core
      // (measured 2622 s -> 86 s on sim_knn at the 100x decade). 8 MB
      // splits fix that HERE; on a 100 TB corpus the same setting means
      // ~12.5M tasks per scan — at scale keep the default split size and
      // rely on the per-operator widen() (Similarity.scala), which
      // repartitions only when a scan yields fewer splits than cores.
      // openCost=1m keeps many-small-file dirs from collapsing into a
      // single packed partition for the same reason. See README
      // "Operational notes".
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      // pinned at session build (Tables.events requires it): driver
      // corpora have stored events.ts as parquet TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.x writes a companion .checksum per checkpoint file (state
      // deltas, offset/commit logs, sink metadata) to detect filesystem
      // corruption. On this harness's local tmpdir that doubles the
      // small-file IO of every micro-batch commit for no benefit (a local
      // ext4 read-back corrupting silently is not the failure mode the
      // bench guards); the stream-stream join alone commits 4 state
      // stores x 8 partitions x ~6 batches per run. A deployment on an
      // object store SHOULD leave the default (true) on.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: JVM/codegen/scan-path initialization off the clock.
    // (first table that exists — partial-table scaling dirs have no
    // lineitem)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "documents", "events", "embeddings")
      .map(t => new java.io.File(s"$sfDir/$t.parquet")).find(_.exists())
      .foreach(f => spark.read.parquet(f.getPath).count())

    // SPARK_GRAFT_ONLY=a,b,c restricts the run (scaling decades over
    // partial table sets, e.g. the 100x documents/events/embeddings dir,
    // where the TPC-H-family queries have no inputs); driver runs use
    // the full registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd ONLY name would otherwise silently yield an empty/partial
    // run that looks like a legitimate benchmark result
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the registry: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // A query that throws is recorded as -1, never as a normal-looking
    // elapsed time (a failure must be distinguishable in the JSON).
    //
    // Action = noop SINK, not count(): under Aggregate(count(1)) Catalyst
    // prunes unreferenced projections and windows and eliminates sorts,
    // so count() timed a near-empty scan for scalar-projection and
    // window-only queries (wx_*, *_funcs, win_lag_lead, ...). The noop
    // sink consumes every output column of the real plan with zero
    // write/driver cost. Methodology changed in round 5 — totals are NOT
    // comparable to BENCH_r4 and earlier, which under-measured exactly
    // those queries.
    def run(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val elapsed =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        catch { case _: Throwable => -1.0 }
      // Same post-query sweep as Verify: queries share state across the
      // registry only through FILES, never cached RDDs, so freeing each
      // query's pinned blocks (localCheckpoint frames) is output-neutral
      // — and Bench accumulates the same block-manager residue over its
      // up-to-3 passes per query that killed the sf10 Verify run.
      // Outside the timed window: harness hygiene, not query cost.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      elapsed
    }
    val p1 = names.map(n => n -> run(n)).toMap
    // Second pass only where noise can matter: a GC/JIT stall on a
    // sub-0.3s query moves the total by milliseconds, but the same stall
    // on a multi-second query dominated BENCH_r01/r02 (observed 1.3s vs
    // 11.6s for one groupBy). Selective re-run keeps total bench wall
    // close to a single pass.
    val p2 = names.filter(p1(_) > 0.3).map(n => n -> run(n)).toMap
    // A transient pass-2 failure (-1) must not erase a valid pass-1
    // measurement: only min over non-negative timings.
    val results = names.map(n =>
      n -> math.min(p1(n), p2.get(n).filter(_ >= 0).getOrElse(p1(n))))
    val failed = results.collect { case (n, v) if v < 0 => n }
    val ok = results.filter(_._2 >= 0)
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma decimal separator (de_DE etc.) would make the line invalid
    // JSON. Trailing zeros are stripped ("0.20" -> "0.2") purely for line
    // length — the driver captures only the LAST 2000 chars of stdout, and
    // the full per-query map outgrew that window as queries were added
    // (r02 truncation, and ~2090 chars for 89 queries at sf0.01). The map
    // therefore carries only the 45 SLOWEST queries (the ones with signal;
    // every elided query ran faster than the smallest emitted value, and
    // "elided" says how many there were); total/failed always cover all.
    def num(fmt: String, v: Double) =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
        .replaceAll("0+$", "").replaceAll("\\.$", "")
    val slowest = ok.sortBy(-_._2).take(45).sortBy(_._1)
    val qs = slowest
      .map { case (k, v) => "\"" + k + "\":" + num("%.2f", v) }
      .mkString("{", ",", "}")
    val total = num("%.3f", ok.map(_._2).sum)
    // The streaming-flagged queries' wall is dominated by per-run FIXED
    // trigger machinery (micro-batch scheduling, checkpoint dirs, state
    // store init — not data volume), so their summed seconds are broken
    // out: read "value minus streaming_sec" as the data-dependent total
    // when comparing rounds or scales.
    val streamingSec = num("%.2f",
      ok.collect { case (n, v) if SparkEntry.streamingQueries(n) => v }.sum)
    val streamingN = ok.count(x => SparkEntry.streamingQueries(x._1))
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Like-for-like subtotal: the registry GROWS every round, so the grand
    // total alone can't distinguish "new query cost" from regression.
    // REGISTRY_PREV.txt (committed, one name per line = the previous
    // round's registry) scopes a second total to exactly the queries that
    // existed last round — compare THIS field round-over-round.
    val prevRegistryJson = {
      val f = java.nio.file.Paths.get("REGISTRY_PREV.txt")
      if (!java.nio.file.Files.exists(f)) ""
      else {
        val prev = scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(f)).asScala
          .map(_.trim).filter(_.nonEmpty).toSet
        val sub = ok.filter(x => prev(x._1))
        s""","total_prev_registry":${num("%.3f", sub.map(_._2).sum)},"n_prev_registry":${sub.length}"""
      }
    }
    val env = s""","load1":${num("%.2f", loadAtStart)},"other_jvms":$otherJvms,"cached_mb":$cachedMb"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"elided":${ok.length - slowest.length},"failed":$failedJson,"n_queries":${names.length},"streaming_sec":$streamingSec,"streaming_n":$streamingN$prevRegistryJson$env,"sf":"$sfDir"}"""
    // Full-precision, uncapped dump for offline analysis (scaling curves):
    // SPARK_GRAFT_BENCH_OUT=path writes every query's timing to a file,
    // where the stdout line stays within the driver's tail budget. When
    // the env var is unset the dump still lands at a FIXED sidecar under
    // java.io.tmpdir — a parse failure on the stdout side (the r16
    // driver adjudication lost its whole round-over-round table to one)
    // then never orphans the measurement. Additions only; the stdout
    // schema is unchanged.
    val sidecar = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      new java.io.File(sys.props("java.io.tmpdir"), "graft_bench_last.json")
        .getAbsolutePath)
    locally {
      val full = results.map { case (k, v) => "\"" + k + "\":" + num("%.3f", v) }
        .mkString("{", ",", "}")
      val json = s"""{"total":$total,"queries":$full,"failed":$failedJson,"streaming_sec":$streamingSec,"streaming_n":$streamingN$prevRegistryJson$env,"sf":"$sfDir","cpus":$cpus}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(sidecar),
        json.getBytes("UTF-8"))
    }
    // stop() BEFORE the metric line: Spark shutdown must not interleave
    // anything with (or after) the one JSON line the driver tails —
    // only sbt's own [success] trailer follows it now.
    spark.stop()
    println(line)
  }
}

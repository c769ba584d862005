package graft

import org.apache.spark.sql.SparkSession

/** Profiling harness (not a registered query; the round-17/18 optimization
  * measurement tool, same family as SkewBench/RecallBench): runs REGISTERED
  * streaming queries (`PROF_ONLY=a,b,c`, default win_tumbling_stream) under
  * a StreamingQueryListener and prints every micro-batch's rows and
  * durationMs breakdown — the evidence behind plans/r17 and plans/r18
  * micro-batch decompositions (each feed advance pays one data batch plus,
  * when a watermark exists and no-data batches are enabled, one ~0.4 s
  * empty batch). Driving the registered query (rather than an inline copy)
  * means the sink/checkpoint dirs are the query's own session-scoped tmp
  * tree, wiped by the registered drain path + shutdown hook — nothing
  * leaks per pass (the r17 ADVICE item). */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000L).selectExpr("sum(id)").collect()

    // Listener events for one registered query run arrive before the
    // query's stop() returns a drained bus is NOT guaranteed — await
    // quiescence via the streams-level bus barrier instead of a sleep
    // (the r17 ADVICE item on BatchProf's fixed Thread.sleep).
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        lines.add(s"[q] started ${e.name}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        lines.add(s"[mb] batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    })

    val names = sys.env.getOrElse("PROF_ONLY", "win_tumbling_stream").split(",").toSeq
    for (name <- names; pass <- 1 to 2) {
      lines.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"=== $name pass $pass: $el%.3f s ===")
      // the async listener bus has no public flush: poll to quiescence
      // (two consecutive 200 ms windows with no new events) instead of
      // one fixed sleep — late events cannot leak into the next pass
      var n = -1
      var stable = 0
      while (stable < 2) {
        Thread.sleep(200)
        if (lines.size == n) stable += 1 else { stable = 0; n = lines.size }
      }
      lines.forEach(l => println(l))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling harness (not a registered query; the round-17 optimization
  * measurement tool, same family as SkewBench/RecallBench): breaks a
  * representative streaming query's wall time into staging / query-start /
  * per-batch drain / stop / read-back segments, and prints every
  * micro-batch's durationMs via a StreamingQueryListener — the evidence
  * behind plans/r17/join_stream_stream_before.txt (each feed advance pays
  * one data batch plus, when a watermark exists, one ~0.4 s no-data
  * batch). */
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
    import graft.streaming.WeatherStream
    import graft.sources.Tables
    import graft.core._

    spark.range(1000000L).selectExpr("sum(id)").collect()

    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[mb] batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    })

    def seg[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // run twice: pass 2 has staged feeds + warm JIT (what min() measures)
    for (pass <- 1 to 2) {
      println(s"=== pass $pass: win_tumbling_stream decomposition ===")
      val s = spark
      val ev = Tables.events(s, sfDir).select(col("ts"), col("event_type"), col("value"))
      val maxTs = seg("maxTs agg")(ev.agg(max(col("ts"))).head.getTimestamp(0))
      val sentinel = s.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          new java.sql.Timestamp(maxTs.getTime + 7L * 24 * 3600 * 1000),
          "__sentinel", 0.0)),
        ev.schema)
      val input = seg("chunkedFileFeedDF")(WeatherStream.chunkedFileFeedDF(
        ev.union(sentinel), "ts", WeatherStream.stagingDir("win_tumbling", sfDir)))
      val agg = input.df
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("ws"),
          col("event_type"), col("n"), col("sum_value"))
      val res = withShufflePartitions(s, WeatherStream.statePartitions(s, input)) {
        val base = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), s"graft_prof_${s.sparkContext.applicationId}"),
          s"sink_win_tumbling_stream_p$pass")
        val q = seg("startParquetSink")(WeatherStream.startParquetSink(agg, base))
        try {
          var advanced = true
          var i = 0
          while (advanced) {
            advanced = input.advance()
            if (advanced) { i += 1; seg(s"batch $i process")(q.processAllAvailable()) }
          }
          seg("final processAll")(q.processAllAvailable())
        } finally seg("stop")(q.stop())
        seg("readback")(WeatherStream.readParquetSink(s, base))
      }
      seg("orderBy+noop") {
        res.orderBy("ws", "event_type")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

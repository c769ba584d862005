package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling harness (not a registered query; the round-17 optimization
  * measurement tool, same family as SkewBench/RecallBench): per-stage
  * task counts, wall, executor-run and CPU times for selected registered
  * queries (`PROF_ONLY=a,b,c`) — the evidence behind the round-17
  * single-split-map-side finding (widen regression) and the heap-curve
  * adjudication in OPTIMIZATION_r17.md. */
object BatchProf {
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

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        stages.add(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=${wall}%5d ms  exRun=${si.taskMetrics.executorRunTime}%6d ms  " +
          f"cpu=${si.taskMetrics.executorCpuTime / 1000000}%6d ms  ${si.name.take(60)}")
      }
    })

    spark.range(1000000L).selectExpr("sum(id)").collect()

    val names = sys.env.getOrElse("PROF_ONLY", "math_funcs").split(",").toSeq
    for (name <- names; pass <- 1 to 2) {
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"=== $name pass $pass: $el%.3f s ===")
      // poll the async listener bus to quiescence (two consecutive
      // 200 ms windows with no new events) instead of one fixed sleep:
      // on a loaded box late stage events could otherwise leak into the
      // next pass's printout
      var n = -1
      var stable = 0
      while (stable < 2) {
        Thread.sleep(200)
        if (stages.size == n) stable += 1 else { stable = 0; n = stages.size }
      }
      stages.forEach(s => println(s))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

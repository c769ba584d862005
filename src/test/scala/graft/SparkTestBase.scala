package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (scalatest runs suites
  * sequentially in the forked test JVM). */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session
  /** Smallest scale factor — unit tests verify semantics, not throughput. */
  val SF = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-tests")
      // production registration path — specs exercising sql_surface (and
      // any SQL-text use of the injected functions) see the same
      // session-wide surface Bench/Verify run with
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // pinned at session build (Tables.events requires it): driver
      // corpora have stored events.ts as parquet TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-tmpdir harness: skip per-checkpoint-file .checksum
      // companions (see the Bench builder note)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

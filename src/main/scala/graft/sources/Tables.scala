package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All table access funnels through here so scan-level concerns live in one
  * place: the nanosecond-timestamp workaround for `events`, and (at cluster
  * scale) any future bucketing / partition layout decisions. Column pruning
  * and predicate pushdown are left to Catalyst — callers `select`/`filter`
  * declaratively and the parquet scan only reads what survives.
  */
object Tables {
  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(path(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "embeddings"))

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects outright. We read the raw nanos
    * (legacy conf) and convert to a microsecond TimestampType with integer
    * division — lossless here (the generator emits µs precision), and
    * identical to what DuckDB sees when it reads the same file.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}

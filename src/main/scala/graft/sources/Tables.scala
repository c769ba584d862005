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

  /** Corpus vintages have stored `events.ts` three ways: parquet INT64
    * TIMESTAMP(NANOS) (rejected by the vectorized reader — read the raw
    * nanos via the legacy conf and derive micros with truncating division,
    * lossless since the generator emits µs precision), plain
    * TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ), and
    * raw BIGINT nanos in the Spark-written scale corpora. Normalize all to
    * session-UTC TimestampType here so every downstream query sees ONE
    * type regardless of vintage — the NTZ→LTZ cast reinterprets the naive
    * wall value in the session zone (UTC everywhere in this engine),
    * exactly the value DuckDB's naive TIMESTAMP read yields.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(path(dir, "events"))
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}

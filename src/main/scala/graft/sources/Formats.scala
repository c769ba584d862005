package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format coverage beyond parquet (REF:O1/O3 — the reference
  * ingests JSON from REST and publishes form-encoded records; an engine
  * user additionally needs CSV/JSON lines at rest).
  *
  * Readers take an explicit schema: schema inference is a full extra scan
  * of the data — never acceptable at 100 TB (the inference-free path also
  * keeps the read one job).
  */
object Formats {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)
}

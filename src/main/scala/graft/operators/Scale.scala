package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale utilities: the partitioning/skew machinery a 100 TB deployment
  * needs around the operator set (SURVEY.md "Optimize for scale").
  */
object Scale {

  /** Salted equi-join for skewed keys. The big (skewed) side gets a
    * deterministic salt derived from `saltSource` (any well-distributed
    * column, e.g. a row id); the small side is replicated `buckets` ways.
    * The join key becomes (key, salt), splitting each hot key's rows across
    * `buckets` reducers. Semantics are identical to `big.join(small, key)`
    * for 1:N joins (small side unique per key) — proven in ScaleSpec.
    *
    * AQE's skew-join handles sort-merge skew automatically at runtime;
    * explicit salting remains the tool when the skew is extreme or the
    * join is hash-based.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: String, buckets: Int): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(buckets)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame bucketed + sorted by `key` as a managed table —
    * co-locates future equi-joins/aggregations on `key` (no Exchange at
    * read time when bucket counts match; proven in ScaleSpec). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Write partitioned-by-column parquet — enables static + dynamic
    * partition pruning on the read path. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}

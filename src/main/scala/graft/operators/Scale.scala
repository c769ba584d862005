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
    * MEASURED guidance (SKEW.md, `graft.SkewBench`: half of all fact
    * rows on one key, non-broadcastable dim): prefer AQE's skew-join.
    * At 2×10⁸ fact rows AQE beats salting OUTRIGHT — 7.6 s (defaults) /
    * 6.3 s (tuned thresholds) vs salting's 23.2 s — because once the
    * hot partition crosses `skewedPartitionThresholdInBytes` (256 MB
    * default) AQE splits exactly the oversized partition, while salting
    * pays its ×buckets dim replication and wider shuffle on EVERY row
    * at full volume. Salting wins only where AQE cannot see or act on
    * the skew: hot partitions UNDER the threshold on default settings
    * (the 2×10⁷ row: AQE-default straggler 3.3 s vs salted 2.2 s —
    * though tuning the threshold, 1.4 s, still beats salting there),
    * non-adaptive plans, streaming joins, or when the split must be
    * deterministic rather than runtime-decided.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: String, buckets: Int): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(buckets)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Banded (binned) range join: `left.join(right, lv BETWEEN rv-w AND
    * rv+w)` without a nested-loop product. Both sides are bucketed into
    * bins of width `w`; a left row in bin b can only match right rows in
    * bins {b-1, b, b+1}, so the right side explodes 3x and the join becomes
    * an equi-join on the bin id, refined by the exact predicate. At 100 TB
    * this is a plain shuffled hash join keyed on the bin — the
    * BroadcastNestedLoopJoin fallback needs one side to fit in memory.
    * Equivalence with the BNLJ plan is proven in ScaleSpec. */
  def bandedRangeJoin(left: DataFrame, leftVal: String,
                      right: DataFrame, rightVal: String,
                      width: Double): DataFrame = {
    val lb = left.withColumn("__bin", floor(col(leftVal) / width).cast("long"))
    val rb = right.withColumn("__rbin",
      explode(array(Seq(-1, 0, 1).map(d =>
        floor(col(rightVal) / width).cast("long") + d): _*)))
    lb.join(rb, col("__bin") === col("__rbin")
        && col(leftVal) >= col(rightVal) - width
        && col(leftVal) <= col(rightVal) + width)
      .drop("__bin", "__rbin")
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

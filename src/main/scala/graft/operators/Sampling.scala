package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / packing operators for
  * training-data curation (NS mandate: what a 100 TB corpus run needs
  * around dedup and quality filtering).
  *
  * Every decision here is a pure function of the row KEY — a 60-bit
  * md5-prefix integer (the portable-hash pattern of
  * [[Dedup.simhashPortableSigs]], reference DedupQueries scaladoc) — so:
  *
  *  - **reproducible**: same corpus → bit-identical sample on any engine,
  *    any partitioning, any rerun (nothing like Spark's `sample()`, whose
  *    output depends on partition layout and RNG stream);
  *  - **stable under growth**: a document keeps its split assignment when
  *    the corpus around it grows — THE property a held-out set needs
  *    (re-rolling val/test against a grown corpus leaks training data);
  *  - **oracle-checkable**: md5 is engine-portable, thresholds are exact
  *    integer comparisons.
  *
  * Scale shape: sampling/splitting are per-row scalar predicates — no
  * shuffle, no state, fully codegen'd, linear at any corpus size.
  * Packing shuffles once on the bucket key and sorts within buckets
  * (buckets bound the sequential cumulative scan, so parallelism =
  * number of buckets — size it like shuffle partitions).
  */
object Sampling {

  private val Scale60 = math.pow(2.0, 60)

  /** 60-bit portable key hash in [0, 2^60): md5 over salt+key string
    * prefix, as an exact integer. 15 hex chars keep it positive and
    * well inside Long. */
  def keyHash60(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** DuckDB twin of [[keyHash60]] for oracle SQL. */
  def keyHash60Sql(key: String, salt: String): String =
    s"CAST(concat('0x', substr(md5('$salt' || CAST($key AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** Exact integer threshold for `fraction` of the 60-bit hash space —
    * computed once driver-side and spliced into BOTH engines' plans, so
    * the cut is identical by construction. */
  def fractionThreshold(fraction: Double): Long = (fraction * Scale60).toLong

  /** Deterministic Bernoulli sample: keep rows whose key-hash falls below
    * `fraction` of the hash space. Per-row predicate, no shuffle. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
                 salt: String = "sample"): DataFrame =
    df.filter(keyHash60(key, salt) < fractionThreshold(fraction))

  /** Cumulative hash-space cut points for `splits`, in listed order — the
    * SINGLE source both the engine plan and any oracle SQL must read
    * (double summation of weights can drift a ULP for generic weights,
    * e.g. 0.1+0.2 ≠ 0.3; sharing the computed cuts keeps both engines'
    * assignments identical for ANY weights, not just ones that happen to
    * sum exactly). */
  def splitCuts(splits: Seq[(String, Double)]): Seq[Long] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(fractionThreshold)

  /** Deterministic split assignment: ranges of the hash space in listed
    * order, e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1).
    * Weights must sum to ~1; the last split absorbs rounding. */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val h = keyHash60(key, salt)
    val assign = splits.init.zip(splitCuts(splits)).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(h < cut, name).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** Per-stratum deterministic sampling rates (corpus rebalancing /
    * downweighting an over-represented source). `rates` maps stratum
    * value → keep fraction; unlisted strata keep everything. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Seq[(String, Double)],
                           salt: String = "strat"): DataFrame = {
    val threshold = rates.foldRight(lit(Long.MaxValue): Column) {
      case ((value, fraction), rest) =>
        when(stratum === value, fractionThreshold(fraction)).otherwise(rest)
    }
    df.filter(keyHash60(key, salt) < threshold)
  }

  /** Greedy shard packing by cumulative size within hash buckets: row →
    * (bucket, shard) where `bucket = keyHash60 % nBuckets` and `shard`
    * advances every time the bucket's running size total passes
    * `shardSize` (a row lands in the shard where its own interval
    * STARTS, so shards overflow by at most one row — the standard
    * greedy-fill contract for token-budget training shards).
    *
    * One shuffle (bucket) + one in-bucket sort; buckets are the
    * parallelism knob, and the cumulative sum is integer-exact (the shard
    * index is integral `DIV` arithmetic end to end — no double
    * true-division anywhere, so exactness has no 2^53 cumulative-size
    * ceiling), so the assignment is deterministic and oracle-checkable.
    *
    * PRECONDITION (same contract style as `AsofJoinExec`): `key` must be
    * unique — it is the in-bucket running-sum order, and the window sort
    * over tied keys is partition-order-arbitrary, which would make shard
    * assignment nondeterministic. Natural for the intended key (a
    * document/row id); pack on a composite unique key otherwise. */
  def packBySize(df: DataFrame, key: Column, size: Column,
                 nBuckets: Int, shardSize: Long,
                 salt: String = "pack"): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("__pk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__pk", key)
      .withColumn("__sz", size.cast("long"))
      .withColumn("bucket", pmod(keyHash60(key, salt), lit(nBuckets)).cast("int"))
      .withColumn("__cum", sum(col("__sz")).over(w))
      .withColumn("shard",
        expr(s"CAST((__cum - __sz) DIV CAST($shardSize AS BIGINT) AS INT)"))
      .drop("__pk", "__cum", "__sz")
  }
}

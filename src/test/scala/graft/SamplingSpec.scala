package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** The contracts that make hash-based sampling worth having over
  * Spark's `sample()`: determinism, stability under corpus growth, and
  * the greedy-fill packing bound. */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("hashSample is deterministic and stable under corpus growth") {
    val small = Sampling.hashSample(ids(500), col("id"), 0.3)
      .as[Long].collect().toSet
    val big = Sampling.hashSample(ids(2000), col("id"), 0.3)
      .as[Long].collect().toSet
    // same rows selected on rerun
    val again = Sampling.hashSample(ids(500), col("id"), 0.3)
      .as[Long].collect().toSet
    assert(small === again)
    // growth stability: the sample over the grown corpus restricted to
    // the original keys IS the original sample (no reshuffling of fate)
    assert(big.filter(_ < 500) === small)
    // fraction roughly honored (binomial, 2000 trials)
    assert(math.abs(big.size / 2000.0 - 0.3) < 0.05, s"got ${big.size}/2000")
  }

  test("hashSplit covers every row, honors weights, and never reassigns") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.hashSplit(ids(5000), col("id"), splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum === 5000L)
    assert(math.abs(out("train") / 5000.0 - 0.8) < 0.03, out.toString)
    assert(math.abs(out("val") / 5000.0 - 0.1) < 0.02, out.toString)
    assert(math.abs(out("test") / 5000.0 - 0.1) < 0.02, out.toString)
    // growth stability for the held-out set
    val s1 = Sampling.hashSplit(ids(500), col("id"), splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val s2 = Sampling.hashSplit(ids(5000), col("id"), splits)
      .filter(col("id") < 500)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s1 === s2)
  }

  test("stratifiedHashSample applies per-stratum rates; unlisted strata pass through") {
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "hot" else "rare"))
      .toDF("id", "kind")
    val kept = Sampling.stratifiedHashSample(df, col("id"), col("kind"),
        Seq("hot" -> 0.1))
      .groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") === 2000L) // untouched
    assert(math.abs(kept("hot") / 2000.0 - 0.1) < 0.03, kept.toString)
  }

  test("packBySize: contiguous shards per bucket, each within budget + one straddler") {
    val budget = 100L
    val df = (0 until 1000).map(i => (i.toLong, 1 + (i * 7) % 40)).toDF("id", "sz")
    val packed = Sampling.packBySize(df, col("id"), col("sz"),
        nBuckets = 4, shardSize = budget)
      .select("id", "sz", "bucket", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // every row assigned, buckets in range
    assert(packed.length === 1000 && packed.forall(p => p._3 >= 0 && p._3 < 4))
    packed.groupBy(_._3).foreach { case (_, rows) =>
      val byShard = rows.sortBy(_._1).groupBy(_._4)
      // shard ids are contiguous from 0
      assert(byShard.keys.toSeq.sorted === (0 until byShard.size))
      byShard.foreach { case (_, docs) =>
        val total = docs.map(_._2.toLong).sum
        // greedy fill: a shard exceeds the budget by at most its last row
        assert(total < budget + docs.map(_._2).max,
          s"shard total $total breaks budget $budget")
      }
    }
  }
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §2B:
  * the UDAF surface for aggregates needing custom state) — one pass over
  * shingles per group, constant O(numPerm) state, mergeable across
  * partitions (map-side partial aggregation applies, unlike the
  * 32-column min() spelling which carries 32 agg buffers through codegen;
  * both are correct, DedupSpec pins identical candidate behavior).
  *
  * Input is the 8-byte hashed shingle from
  * [[graft.expressions.ShingleHash]] — NOT the shingle string. Earlier
  * rounds took `String` input, which forced the caller to materialize a
  * per-shingle string frame alongside the hashed frame the verification
  * tail uses (double tokenization, and per-shingle UTF-8 encodes inside
  * `reduce`). Per-permutation values are a salted splitmix64 finalizer
  * over the shingle hash — a few arithmetic ops per permutation,
  * deterministic across JVMs/executors (no dependence on JVM hashCode).
  */
class MinHashAggregator(numPerm: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    var p = 0
    while (p < numPerm) {
      val h = MinHashAggregator.mix64(shingleHash, p)
      if (h < buf(p)) buf(p) = h
      p += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerm) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
}

object MinHashAggregator {
  /** splitmix64 finalizer over the shingle hash, salted with the
    * permutation index (golden-ratio spread) — full-avalanche 64-bit
    * mixing, so per-permutation minima are independent. */
  def mix64(x: Long, salt: Int): Long = {
    var h = x ^ (salt * 0x9e3779b97f4a7c15L)
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

private object ExpressionEncoders {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

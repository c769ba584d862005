package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §2B:
  * the UDAF surface for aggregates needing custom state) — one pass over
  * shingles per group, constant O(numPerm) state, mergeable across
  * partitions (map-side partial aggregation applies, unlike the
  * 32-column min() spelling which carries 32 agg buffers through codegen;
  * both are correct, DedupSpec pins identical candidate behavior).
  *
  * Hashes are FNV-1a 64-bit salted per permutation — self-contained and
  * deterministic across JVMs/executors (no dependence on JVM hashCode).
  */
class MinHashAggregator(numPerm: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    // UTF-8 encode once per shingle, not once per permutation.
    val bytes = shingle.getBytes("UTF-8")
    var p = 0
    while (p < numPerm) {
      val h = MinHashAggregator.fnv1a64(bytes, p)
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
  /** FNV-1a 64-bit over UTF-8 bytes, salted with the permutation index. */
  def fnv1a64(bytes: Array[Byte], salt: Int): Long = {
    var h = 0xcbf29ce484222325L ^ (salt * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

private object ExpressionEncoders {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

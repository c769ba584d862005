package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k of (score, id) pairs as a typed `Aggregator` — ordered by
  * (score DESC, id ASC), ties broken deterministically on id.
  *
  * This is the map-side spelling of "top k per group": each partition
  * keeps at most k pairs in the aggregation buffer, so the shuffle
  * carries k rows per (partition × group) instead of every candidate
  * pair — the difference between shuffling k·P rows and shuffling the
  * whole corpus when ranking neighbors at 100 TB. The window
  * (`row_number` over score) formulation shuffles all pairs to sort
  * them; this buffer never exceeds k entries anywhere.
  *
  * Buffer is a sorted array (best first); k is small (top-k search), so
  * insertion is an O(k) copy — no heap needed below k ≈ 100.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  require(k >= 1, "k must be >= 1")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length >= k && !better(x, buf(buf.length - 1))) buf
    else {
      // find insertion point from the tail (new element usually loses)
      var ins = buf.length
      while (ins > 0 && better(x, buf(ins - 1))) ins -= 1
      // set semantics: an already-present (score, id) pair (e.g. a replayed
      // row folded back into StreamingTopK state on at-least-once recovery)
      // must not displace a legitimate entry with its own duplicate
      if (ins > 0 && buf(ins - 1) == x) buf
      else {
        val out = new Array[(Double, Long)](math.min(buf.length + 1, k))
        var i = 0
        while (i < out.length) {
          out(i) = if (i < ins) buf(i) else if (i == ins) x else buf(i - 1)
          i += 1
        }
        out
      }
    }
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    // merge two sorted arrays, keep first k distinct pairs (an equal
    // (score, id) pair present on both sides is taken once — set semantics,
    // see reduce)
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      out(o) =
        if (i < a.length && j < b.length && a(i) == b(j)) { i += 1; j += 1; a(i - 1) }
        else if (i < a.length && (j >= b.length || better(a(i), b(j)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] = TopKAggregator.pairs
  override def outputEncoder: Encoder[Array[(Double, Long)]] = TopKAggregator.pairs
}

object TopKAggregator {
  private val pairs: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}

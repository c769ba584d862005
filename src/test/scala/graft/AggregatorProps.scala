package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property suites for the custom aggregation/hash primitives: the typed
  * buffers must agree with naive reference implementations on arbitrary
  * inputs and arbitrary partition splits (the merge path is what runs
  * between executors at scale, so it gets its own quantifier). */
object AggregatorProps extends Properties("aggregators") {

  private val pairGen = for {
    score <- Gen.chooseNum(-1.0, 1.0)
    id <- Gen.chooseNum(0L, 50L) // small id space forces score ties
  } yield (score, id)

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.distinct.sortBy { case (s, id) => (-s, id) }.take(k)

  property("TopK reduce+merge == sort-and-truncate reference, any split") =
    Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 7), Gen.chooseNum(0, 100)) {
      (xs: List[(Double, Long)], k: Int, splitSeed: Int) =>
        val agg = new graft.functions.TopKAggregator(k)
        // set semantics under replay: re-append half the input as exact
        // (score, id) duplicates (streaming at-least-once recovery folds
        // the same rows back into state) — duplicates must never displace
        // a legitimate entry, on either the reduce or the merge path
        val input = xs ++ xs.take(xs.length / 2)
        val split = if (input.isEmpty) 0 else splitSeed % (input.length + 1)
        val (a, b) = input.splitAt(split)
        val bufA = a.foldLeft(agg.zero)(agg.reduce)
        val bufB = b.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(bufA, bufB)).toSeq == reference(input, k)
    }

  property("ShingleHashUtil == FNV-1a over joined word strings") = {
    def fnvRef(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    Prop.forAll(Gen.listOf(wordGen), Gen.chooseNum(1, 4)) { (words: List[String], k: Int) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val arr = new GenericArrayData(words.map(UTF8String.fromString).toArray[Any])
      val got = graft.expressions.ShingleHashUtil.compute(arr, k).toLongArray().toSeq
      val want =
        if (words.length < k) Seq.empty
        else words.sliding(k).filter(_.length == k).map(ws => fnvRef(ws.mkString(" "))).toSeq
      got == want
    }
  }

  property("CharGramHash == FNV-1a over sliding byte windows") = {
    def fnvRef(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val textGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    Prop.forAll(textGen, Gen.chooseNum(1, 10)) { (text: String, n: Int) =>
      import org.apache.spark.unsafe.types.UTF8String
      val got = graft.expressions.ShingleHashUtil
        .computeGrams(UTF8String.fromString(text), n).toLongArray().toSeq
      val bytes = text.getBytes("UTF-8")
      val want =
        if (bytes.length <= n) Seq(fnvRef(bytes.take(n)))
        else bytes.sliding(n).map(fnvRef).toSeq
      got == want
    }
  }
}

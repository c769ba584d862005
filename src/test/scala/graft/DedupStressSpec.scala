package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Stop-shingle guard under a planted ubiquitous shingle: a shared
  * boilerplate prefix would otherwise contribute O(n_docs²) rows to the
  * shared-shingle self-join. With the cap, boilerplate-only similarity is
  * excluded (no signal) while genuine near-dups are still found, and the
  * candidate join stays linear in corpus size. */
class DedupStressSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Every doc: the same 5-word boilerplate + a unique 10-word tail
    * (deterministic words). Docs 0 and 1 additionally share their tails
    * (a genuine planted near-dup pair). */
  private def corpus(nDocs: Int) = {
    val boiler = "standard licence header text please"
    (0L until nDocs.toLong).map { id =>
      val tailSeed = if (id == 1L) 0L else id // doc 1 copies doc 0's tail
      val tail = (0 until 10).map(w => s"w${tailSeed}x$w").mkString(" ")
      (id, s"$boiler $tail")
    }.toDF("doc_id", "text")
  }

  test("boilerplate-only pairs are excluded; genuine near-dups survive") {
    val pairs = Dedup.ngramJaccardPairs(corpus(200), "doc_id", "text")
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)),
      s"expected only the planted tail-sharing pair, got $pairs")
  }

  test("uncapped form goes quadratic on the same corpus (the guard's reason)") {
    // With the cap disabled, every doc pairs with every other through the
    // boilerplate shingles: C(200,2) join groups (all below threshold, so
    // the OUTPUT is still 1 pair — the blow-up is in the intermediate).
    val joinGroups = Dedup.ngramJaccardPairs(corpus(200), "doc_id", "text",
        threshold = 0.0, maxDocFrac = 1.1)
      .count()
    assert(joinGroups === 200L * 199 / 2)
    // capped, threshold 0: only pairs sharing a NON-stop shingle remain
    val capped = Dedup.ngramJaccardPairs(corpus(200), "doc_id", "text",
        threshold = 0.0)
      .count()
    assert(capped === 1L)
  }

  test("just-under-cap hot shingle: candidate tail is exactly C(df, 2)") {
    // The guard drops shingles with df > max(0.1n, 5); one sitting JUST
    // UNDER the cap survives and contributes C(df, 2) candidate pairs —
    // the quantified tail of the scaladoc's viability law. Corpus:
    // n = 200 docs (cap = 20), docs 0..19 share a planted 3-word shingle
    // (df = 20, survives), all other shingles unique per doc.
    val n = 200
    val hot = "hot shared trigram"
    val docs = (0L until n.toLong).map { id =>
      val tail = (0 until 8).map(w => s"u${id}q$w").mkString(" ")
      (id, if (id < 20) s"$hot $tail" else tail)
    }.toDF("doc_id", "text")
    val cand = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.0)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every candidate pair flows through the hot shingle: exactly C(20,2)
    val viaHot = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L
    } yield (a, b)).toSet
    assert(cand === viaHot, s"tail must be C(df,2)=${viaHot.size}, got ${cand.size}")
    // one more shared doc pushes df over the cap and the tail vanishes
    val docs2 = (0L until n.toLong).map { id =>
      val tail = (0 until 8).map(w => s"u${id}q$w").mkString(" ")
      (id, if (id < 21) s"$hot $tail" else tail)
    }.toDF("doc_id", "text")
    val cand2 = Dedup.ngramJaccardPairs(docs2, "doc_id", "text", threshold = 0.0)
      .count()
    assert(cand2 === 0L, "df just over the cap must be dropped entirely")
  }

  test("10k-doc ubiquitous-shingle corpus completes near-linearly with the cap") {
    // Uncapped this is a 5*10^7-group self-join; capped it is linear in
    // docs. A wall-clock assert would be flaky — the linearity evidence is
    // that the candidate space (= result at threshold 0) is exactly the
    // planted pair, not C(10000,2).
    val pairs = Dedup.ngramJaccardPairs(corpus(10000), "doc_id", "text",
        threshold = 0.0)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable deduplication operators over arbitrary DataFrames — the
  * library surface behind `DedupQueries` (NS mandate).
  *
  * All near-dup operators follow the candidate-generation / verification
  * split: candidates come from a bucket equi-join (never an all-pairs
  * product), verification computes the exact measure on candidates only.
  */
object Dedup {

  /** Earliest-row-per-key exact dedup: deterministic spelling of
    * `dropDuplicates(keys)` (same shuffle-on-key plan shape, but the
    * survivor is well-defined). */
  def exactDedup(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct k-word shingles per row: (idCol, shingle). String form —
    * the readable reference implementation; every production path uses
    * [[shingleHashes]] instead (DedupSpec pins the hashed path as a
    * drop-in: identical per-doc distinct counts). */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    df.withColumn("__words", filter(split(col(textCol), " "), w => w =!= ""))
      .filter(size(col("__words")) >= k)
      .select(col(idCol), expr(
        s"""explode(array_distinct(transform(
           |  sequence(1, size(__words) - ${k - 1}),
           |  i -> concat_ws(' ', slice(__words, i, $k))))) AS shingle""".stripMargin))

  /** Distinct hashed k-word shingles per row: (idCol, s: long), via the
    * native codegen'd [[graft.expressions.ShingleHash]] — no per-shingle
    * string materialization (see that scaladoc for measurements). All
    * downstream join keys and per-permutation rehashes then operate on
    * 8-byte longs. */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val words = filter(split(col(textCol), " "), w => w =!= "")
    df.withColumn("__words", words)
      .filter(size(col("__words")) >= k)
      .select(col(idCol), explode(array_distinct(ColumnBridge.column(
        graft.expressions.ShingleHash(
          ColumnBridge.expression(col("__words")), k)))).as("s"))
  }

  /** Exact pairwise n-gram Jaccard over shared-shingle candidates:
    * (d1, d2, inter, n1, n2, jaccard), ids ordered d1 < d2.
    *
    * The self-join key is xxhash64(shingle) (8-byte comparisons instead of
    * variable-length strings; a 64-bit collision would need ~2^32 distinct
    * shingles per corpus to matter). The hash sits AFTER the explode, in
    * whole-stage codegen — measured: moving it inside the transform()
    * lambda (interpreted per element, like all HOF lambdas) is 4-8x
    * slower despite touching 50x fewer "rows". Keep hot scalar work in
    * codegen'd row expressions, not lambda bodies.
    *
    * Sizes join in afterwards against the (tiny) per-doc count table.
    * Carrying the size along each exploded row instead measures ~2x
    * slower: it widens the join output and the aggregation keys.
    *
    * Stop-shingle guard: a shingle occurring in more than
    * `maxDocFrac` of the corpus (boilerplate headers, licence lines)
    * would contribute O(df²) rows to the self-join — the one place a
    * pathological corpus could still go quadratic. Such shingles are
    * dropped BEFORE the join via a broadcast anti-join against the
    * (by construction tiny: ≤ shingles/doc ÷ maxDocFrac entries) hot
    * set — with an absolute floor of 5 docs, so tiny corpora (where 10%
    * of n_docs would round below one document) are never capped — and
    * per-doc sizes are counted over the same capped space, so
    * jaccard stays a true Jaccard over non-stop shingles — the standard
    * IR semantics (ubiquitous shingles carry no near-dup signal). On
    * corpora with no hot shingle (driver corpus max df is 1.4% of docs)
    * the guard is a no-op and results are bit-identical to the uncapped
    * form (oracle-checked); DedupStressSpec pins the near-linear
    * behavior under a planted ubiquitous shingle.
    *
    * THE GUARD'S TAIL, quantified (the viability law): a shingle with df
    * just UNDER the cap still contributes C(df, 2) candidate rows, so the
    * worst-case candidate space is Σ_s C(df_s, 2) ≤ H·(maxDocFrac·n)²/2
    * for H just-under-cap shingles — still QUADRATIC in n at fixed
    * maxDocFrac. Exact Jaccard is therefore viable while the df census
    * (the `hot` aggregate below, which you get for free) shows
    * Σ df_s² within the shuffle budget. Measured on the driver corpus:
    * Σ df² = 108·n at 500 docs, 558·n at 5000 (max df 1.4% of n — the
    * guard never fires; candidate rows ≈ Σ df²/2 track dedup_ngram's
    * measured 7.5× wall at 10× data). It is NOT viable on
    * adversarial/boilerplate corpora where many shingles sit near the
    * cap — Σ df² → H·(0.1n)², the quadratic ceiling: there,
    * (a) lower maxDocFrac (the cap is the knob: candidates scale with
    * its square), or (b) switch blocking to [[minhashPairs]] — its
    * banded candidates are r-way hash agreements, not df² expansions,
    * with recall given by the band law instead of the df census.
    * DedupStressSpec's just-under-cap case pins the C(df, 2) bound
    * exactly. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.5,
                        maxDocFrac: Double = 0.1): DataFrame = {
    // materialize the hashed-shingle frame once: it feeds three plan
    // subtrees (doc count, hot-shingle census, anti-join input) whose
    // exchanges don't reuse, so without this the corpus is tokenized and
    // shingled three times per run (localCheckpoint — same iterative-plan
    // hygiene as nearDupClusters; at extreme corpus sizes trade this
    // materialization against recompute deliberately)
    val all = shingleHashes(df, idCol, textCol, k).localCheckpoint(true)
    val nDocs = all.agg(countDistinct(col(idCol)).as("n_docs"))
    val hot = all.groupBy("s").agg(countDistinct(col(idCol)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") > greatest(col("n_docs") * maxDocFrac, lit(5.0)))
      .select("s")
    // same again for the capped frame: per-doc sizes + BOTH self-join sides
    val sh = all.join(broadcast(hot), Seq("s"), "left_anti")
      .select(col(idCol), col("s"))
      .localCheckpoint(true)
    val sz = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    sh.toDF("d1", "s1")
      .join(sh.toDF("d2", "s2"), col("s1") === col("s2") && col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sz.toDF("d1", "n1"), "d1")
      .join(sz.toDF("d2", "n2"), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "inter", "n1", "n2", "jaccard")
  }

  /** MinHash+LSH near-dup pairs: (d1, d2, j_est, j_exact), exact Jaccard
    * verified on banded candidates only. numPerm must be divisible by
    * bands. Signatures via per-permutation min() aggregate expressions —
    * all codegen'd (see ngramJaccardPairs note: array/HOF formulations of
    * the signature measured strictly slower). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numPerm: Int = 32, bands: Int = 8, k: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    // one materialized shingle frame feeds the signature agg AND the
    // verification tail (per-doc sizes + both intersection-join sides)
    val sh = shingleHashes(df, idCol, textCol, k).localCheckpoint(true)
    val sig = sh.groupBy(idCol).agg(
      min(xxhash64(lit(0), col("s"))).as("m0"),
      (1 until numPerm).map(p => min(xxhash64(lit(p), col("s"))).as(s"m$p")): _*)
    minhashTail(sh, sig, idCol, numPerm, bands, threshold)
  }

  /** Same pipeline, signatures via the typed
    * [[graft.functions.MinHashAggregator]] UDAF (one state buffer per
    * group instead of numPerm aggregate columns). Signature input and the
    * verification tail share ONE hashed-shingle frame — the corpus is
    * tokenized and shingled exactly once per run, same as
    * [[minhashPairs]]. */
  def minhashPairsAgg(df: DataFrame, idCol: String, textCol: String,
                      numPerm: Int = 32, bands: Int = 8, k: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.Encoders
    val sh = shingleHashes(df, idCol, textCol, k).localCheckpoint(true)
    val mh = udaf(new graft.functions.MinHashAggregator(numPerm), Encoders.scalaLong)
    val sig = sh.groupBy(idCol).agg(mh(col("s")).as("sig"))
      .select(col(idCol) +:
        (0 until numPerm).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
    minhashTail(sh, sig, idCol, numPerm, bands, threshold)
  }

  /** Banding + candidate join + estimate + exact-Jaccard verification over
    * a (idCol, m0..m{numPerm-1}) signature frame. */
  private def minhashTail(sh: DataFrame, sig: DataFrame, idCol: String,
                          numPerm: Int, bands: Int, threshold: Double): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    val rowsPerBand = numPerm / bands
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i")): _*)
    }
    val banded = sig
      .select(col(idCol), posexplode(array(bandCols: _*)))
      .toDF("id", "band_idx", "band_hash")
    val cand = banded.toDF("d1", "bi1", "bh1")
      .join(banded.toDF("d2", "bi2", "bh2"),
        col("bi1") === col("bi2") && col("bh1") === col("bh2") && col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val sigA = sig.toDF("d1" +: (0 until numPerm).map(i => s"a$i"): _*)
    val sigB = sig.toDF("d2" +: (0 until numPerm).map(i => s"b$i"): _*)
    val jEst = (0 until numPerm)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / numPerm
    val withEst = cand.join(sigA, "d1").join(sigB, "d2")
      .select(col("d1"), col("d2"), jEst.as("j_est"))
    // exact verification on candidates only: equi-join the hashed exploded
    // shingles of each side on (pair-partner, shingle) — intersection rows
    // only, never the |sh(d1)|x|sh(d2)| per-pair product. `sh` arrives
    // pre-hashed as (idCol, s) from shingleHashes.
    val hashed = sh
      .select(col(idCol).as("d"), col("s"))
      .groupBy("d").agg(collect_set(col("s")).as("shs"))
      .select(col("d"), size(col("shs")).cast("long").as("n"), explode(col("shs")).as("s"))
    withEst
      .join(hashed.toDF("d1", "n1", "s"), "d1")
      .join(hashed.toDF("d2", "n2", "s"), Seq("d2", "s"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("inter"), first(col("j_est")).as("j_est"),
           first(col("n1")).as("n1"), first(col("n2")).as("n2"))
      .withColumn("j_exact",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("j_exact") >= threshold)
      .select("d1", "d2", "j_est", "j_exact")
  }

  /** Near-dup CLUSTERS from the pair graph: connected components by
    * iterative min-label propagation (the Pregel/GraphX pattern spelled
    * in DataFrames), then one row per document with its cluster id
    * (= smallest doc id reachable through near-dup edges; the canonical
    * survivor) and the cluster size. Documents with no near-dup form
    * singleton clusters of themselves.
    *
    * Scale shape: the propagation loop runs over the EDGE-TOUCHED
    * subgraph only — documents with no near-dup pair (the overwhelming
    * majority of any real corpus) can never change label, so they are
    * excluded up front and unioned back as singletons at the end. Each
    * round is then one equi-join edges⋈labels + one hash-agg over frames
    * bounded by 2·|pairs|, not |corpus| — at 100 TB the loop's cost
    * follows the near-dup graph (millions of rows), not the document
    * count (billions). Rounds needed = cluster diameter (near-dup
    * clusters are shallow; ubiquitous-boilerplate chains are already cut
    * by [[ngramJaccardPairs]]'s stop-shingle guard). Lineage is truncated
    * with an eager localCheckpoint per round (iterative-plan hygiene —
    * without it the plan doubles every round), and the driver-side loop
    * carries only a converged-or-not count, never data.
    *
    * Oracled cross-engine: the pair graph is the exact (deterministic)
    * Jaccard one, and min-reachable-label is a recursive CTE in DuckDB. */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, k, threshold)
      .select(col("d1"), col("d2"))
    val edges = pairs.union(pairs.select(col("d2"), col("d1")))
      .toDF("src", "dst").localCheckpoint(true)
    // propagate only where an edge exists; everything else is a singleton
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var converged = labels.isEmpty
    while (!converged) {
      val viaNeighbor = edges
        .join(labels.toDF("src", "src_label"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("src_label")).as("nbr_label"))
      // carry a per-row changed flag through the checkpoint: convergence
      // reads the (already materialized) flag instead of re-joining the
      // previous labels — one action per round, no extra join
      val updated = labels
        .join(viaNeighbor, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("nbr_label") < col("label")).as("changed"))
        .localCheckpoint(true)
      converged = updated.filter(col("changed")).isEmpty
      labels = updated.drop("changed")
    }
    val allLabels = df.select(col(idCol).as("node"))
      .join(labels.toDF("node", "lbl"), Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("label"))
    val sizes = allLabels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    allLabels.select(col("node").as(idCol), col("label").as("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
  }

  /** Portable 60-bit SimHash signatures: token hash = first 15 hex chars
    * of md5, parsed as an integer — reproducible in any engine that has
    * md5 (DuckDB: `CAST('0x' || substr(md5(w),1,15) AS BIGINT)`), which
    * makes the whole simhash family ORACLE-CHECKABLE cross-engine.
    * [[simhashPairs]] stays the production path (xxhash64 is one codegen'd
    * call vs md5+hex-parse per token); this twin anchors its band/hamming
    * machinery to an independent engine. */
  def simhashPortableSigs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def bitSum(i: Int) =
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L)))
    val wc = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .withColumn("h", expr("cast(conv(substring(md5(word), 1, 15), 16, 10) as bigint)"))
    val bitSums = wc.groupBy(idCol).agg(
      bitSum(0).as("s0"), (1 until 60).map(i => bitSum(i).as(s"s$i")): _*)
    val sig = (0 until 60)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    bitSums.select(col(idCol), sig.as("sig"))
  }

  /** The simhash verify stage over portable signatures: 4×15-bit band
    * candidates + hamming via bit_count(xor) — every intermediate is
    * integer-exact, so the result hash-matches the DuckDB spelling. */
  def simhashPortablePairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigs = simhashPortableSigs(df, idCol, textCol)
    val bandCols = (0 until 4).map(b =>
      shiftrightunsigned(col("sig"), 15 * b).bitwiseAND(lit(0x7FFFL)))
    val banded = sigs
      .select(col(idCol), col("sig"), posexplode(array(bandCols: _*)))
      .toDF("id", "sig", "band_idx", "band_val")
    banded.toDF("d1", "h1", "bi1", "bv1")
      .join(banded.toDF("d2", "h2", "bi2", "bv2"),
        col("bi1") === col("bi2") && col("bv1") === col("bv2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
  }

  /** 64-bit SimHash near-dup pairs via 4×16-bit band join: (d1, d2,
    * hamming), hamming <= maxHamming, candidates = documents sharing any
    * band value. Bit sums run directly over token occurrences
    * (Σ_occurrences ±1 ≡ Σ_words ±count): one explode → one
    * hash-aggregate with 64 long buffers, instead of a (doc, word) count
    * shuffle first — one shuffle total before the band join.
    *
    * Band-width sizing at scale: RANDOM band collisions number
    * ~bands · n² / 2^bits, so a FIXED 16-bit band goes quadratic once the
    * corpus outgrows ~2^16 documents per natural partition — measured
    * here as dedup_simhash_verify's 8× wall at 10× data (50 k docs
    * against 15-bit bands, BENCH_SCALING.json). The knob is band width:
    * keep 2^bits ≳ corpus size (e.g. 2×32-bit bands at 10⁹ docs, or
    * band on (prefix, value) within a coarser partition), trading a
    * stricter candidate filter (more bits = fewer chance collisions but
    * also fewer chances for a true near-dup to collide) against join
    * fan-out. Same law as MinHash banding. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 8): DataFrame = {
    def bitSum(i: Int) =
      sum(when(shiftrightunsigned(col("wh"), i).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L)))
    val wc = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .withColumn("wh", xxhash64(col("word")))
    val bitSums = wc.groupBy(idCol).agg(
      bitSum(0).as("s0"), (1 until 64).map(i => bitSum(i).as(s"s$i")): _*)
    val simhash = (0 until 64)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val sigs = bitSums.select(col(idCol), simhash.as("simhash"))
    val bandCols = (0 until 4).map(b =>
      shiftrightunsigned(col("simhash"), 16 * b).bitwiseAND(lit(0xFFFFL)))
    val banded = sigs
      .select(col(idCol), col("simhash"), posexplode(array(bandCols: _*)))
      .toDF("id", "simhash", "band_idx", "band_val")
    banded.toDF("d1", "h1", "bi1", "bv1")
      .join(banded.toDF("d2", "h2", "bi2", "bv2"),
        col("bi1") === col("bi2") && col("bv1") === col("bv2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Benchmark decontamination: per corpus document, how much of it
    * appears verbatim (as k-word shingles) in a held-out benchmark set —
    * the standard guard against evaluation contamination in a training
    * corpus (production runs use long shingles, e.g. k=13; the registered
    * query uses the corpus-appropriate k=3).
    *
    * Output: (idCol, n_shingles, n_hits, contam_frac, contaminated) for
    * every corpus document, including shingle-less ones (fewer than k
    * words → 0/0/0.0/0).
    *
    * Scale shape: the benchmark side collapses to DISTINCT shingle hashes
    * — tens of MB even for large benchmark suites — and is broadcast, so
    * the corpus is scanned ONCE with a map-side hash probe and the only
    * shuffle is the per-doc count aggregation. No corpus self-join
    * anywhere; a benchmark too big to broadcast degrades gracefully to a
    * shuffle equi-join on the 8-byte hash. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, k: Int = 3,
                    flagFrac: Double = 0.5): DataFrame = {
    val bench = shingleHashes(benchmark, idCol, textCol, k)
      .select(col("s")).distinct()
    val per = shingleHashes(corpus, idCol, textCol, k)
      .join(broadcast(bench.withColumn("__hit", lit(1))), Seq("s"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hits"))
    decontamAssemble(corpus, idCol, per, flagFrac)
  }

  /** Shared decontamination tail: re-attach every corpus document
    * (shingle-less ones included) to its (n_shingles, n_hits) counts and
    * derive the fraction + flag. `per` holds (idCol, n_shingles, n_hits)
    * for documents with at least one shingle. */
  private def decontamAssemble(corpus: DataFrame, idCol: String,
                               per: DataFrame, flagFrac: Double): DataFrame =
    corpus.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contam_frac",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("n_hits").cast("double") / col("n_shingles")))
      .withColumn("contaminated",
        (col("n_shingles") > 0 &&
          col("n_hits").cast("double") / col("n_shingles") >= flagFrac)
          .cast("int"))

  /** [[decontaminate]] for the regime where even the benchmark's DISTINCT
    * shingle-hash set is past the broadcast threshold (a full eval-suite
    * union at k=13 can reach tens of GB of 8-byte hashes): broadcast a
    * Bloom filter over the benchmark hashes instead, and let the exact
    * equi-join — now a SHUFFLE join by design — see only the corpus
    * shingles the filter could not rule out. Identical output to
    * [[decontaminate]]: the filter has no false negatives, and the exact
    * join removes its false positives (DedupSpec pins frame equality).
    *
    * PER-DOCUMENT ROW BOUND: the aggregation below collects one document's
    * bloom-POSITIVE shingles into a single row, so a heavily contaminated
    * document's row holds ~its whole shingle footprint regardless of fpp
    * (clean documents stay at ~fpp·shingles). With documents bounded at
    * typical corpus-policy sizes (~1 M tokens → ~8 MB of hashes) that is
    * a fat-but-fine aggregation row; a pipeline ingesting UNBOUNDED
    * documents should either pre-split them (mm_chunks-style) or trade
    * the one-scan shape for a second corpus scan filtering exploded
    * shingles on the bloom probe directly — the exact path in
    * [[decontaminate]] has no such row, only more shuffle volume.
    *
    * Scale shape: ONE corpus scan. Per document it aggregates the full
    * shingle count and the bloom-positive survivors together, so the
    * first shuffle carries one row per document holding only survivors —
    * ≈ fpp·|corpus shingles| + true hits — instead of every corpus
    * shingle; the eagerly materialized per-doc frame (one bounded row
    * per document — iterative-plan hygiene, like the other eager sites
    * here) then feeds both the exact join and the final count without a
    * second corpus scan. (Exchange reuse can NOT serve the two consumers
    * from one shuffle: column pruning specializes each branch's
    * aggregate — one keeps only the candidate list, the other only the
    * count — so the exchanges stop being identical and each would
    * re-scan the corpus.) The benchmark side is scanned twice (filter
    * build + join side), which it amortizes by being the small side.
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                         textCol: String, k: Int = 3, flagFrac: Double = 0.5,
                         fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // LAZY checkpoint + count: the count is the materializing action, so
    // the benchmark side pays ONE job for (checkpoint, row count) together
    // — the eager-checkpoint-then-count spelling ran the same scan twice.
    val bench = shingleHashes(benchmark, idCol, textCol, k)
      .select(col("s")).distinct().localCheckpoint(false)
    val benchN = bench.count()
    val bloomBytes = {
      val bf = bench.stat.bloomFilter("s", math.max(benchN, 1L), fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightHit = ColumnBridge.column(graft.expressions.BloomMightContainLong(
      ColumnBridge.expression(col("s")), bloomBytes))
    // collect_list drops nulls, so `cand` is exactly the bloom-positive
    // shingles of the doc; n_shingles still counts all of them. The
    // bloom probe runs inside whole-stage codegen in this (eager) scan
    // job — the registered plan therefore starts at the checkpointed
    // per-doc frame (same as the repo's other eager sites).
    val perDoc = shingleHashes(corpus, idCol, textCol, k)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        collect_list(when(mightHit, col("s"))).as("cand"))
      .localCheckpoint(true)
    // shuffle_hash hint: in this function's regime the benchmark is past
    // the broadcast threshold by premise, so pin the plan the function is
    // FOR (hash-relation build on the bench side, no sort) even on small
    // test corpora where AQE would broadcast it.
    val hits = perDoc.filter(size(col("cand")) > 0)
      .select(col(idCol), explode(col("cand")).as("s"))
      .join(bench.hint("shuffle_hash"), Seq("s"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    val per = perDoc.select(col(idCol), col("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    decontamAssemble(corpus, idCol, per, flagFrac)
  }

  /** Incremental near-dup: flag documents in a NEW batch that are n-gram
    * Jaccard near-dups of an EXISTING corpus — the daily-ingest shape.
    * One row per duplicated batch doc: its best corpus match (highest
    * jaccard, ties to the smallest corpus id).
    *
    * Scale shape: the corpus is never self-joined — candidates come from
    * a batch-shingle ⋈ corpus-shingle equi-join, so cost is
    * O(|batch shingles| + matched candidates) regardless of corpus size.
    * At 100 TB the three corpus-side frames (hot-shingle census, hashed
    * shingles bucketed by `s`, per-doc sizes) are precomputed ONCE and
    * stored (bucketed parquet — ScaleSpec shows the exchange-free read);
    * each arriving batch then pays only its own shingling plus the probe.
    * The stop-shingle guard uses the CORPUS census (boilerplate is a
    * corpus property; a batch can't be allowed to redefine it), applied
    * to both sides so jaccard keeps the standard non-stop-shingle
    * semantics of [[ngramJaccardPairs]]. */
  def incrementalNearDups(corpus: DataFrame, batch: DataFrame, idCol: String,
                          textCol: String, k: Int = 3, threshold: Double = 0.5,
                          maxDocFrac: Double = 0.1): DataFrame =
    probeNearDups(nearDupIndex(corpus, idCol, textCol, k, maxDocFrac),
      batch, textCol, threshold)

  /** The corpus-side artifacts [[probeNearDups]] serves from, computed
    * ONCE per corpus snapshot: the hot-shingle census (`hot`), the
    * stop-filtered hashed corpus shingles (`shingles`), and the per-doc
    * shingle counts (`sizes`). All three are materialized (eager
    * localCheckpoint): a streaming ingest probes once per micro-batch
    * forever, and without pinning, each micro-batch would re-shingle the
    * whole corpus. A production deployment persists the same three
    * frames as parquet next to the corpus, `shingles` BUCKETED BY `s` so
    * the candidate equi-join reads the corpus side exchange-free
    * (ScaleSpec pins that bucketed layout removes the shuffle; an
    * in-session repartition cannot — Spark 4.1 checkpoints and caches
    * both report UnknownPartitioning under AQE, measured here, so the
    * probe join re-shuffles in-session index frames regardless of how
    * they were laid out). */
  final case class NearDupIndex(idCol: String, k: Int, hot: DataFrame,
                                shingles: DataFrame, sizes: DataFrame)

  /** Build the [[NearDupIndex]] for a corpus — see [[incrementalNearDups]]
    * for the stop-shingle semantics (the census is a CORPUS property,
    * applied to both sides at probe time). */
  def nearDupIndex(corpus: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, maxDocFrac: Double = 0.1): NearDupIndex = {
    val cs0 = shingleHashes(corpus, idCol, textCol, k).localCheckpoint(true)
    val nDocs = cs0.agg(countDistinct(col(idCol)).as("n_docs"))
    val hot = cs0.groupBy("s").agg(countDistinct(col(idCol)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") > greatest(col("n_docs") * maxDocFrac, lit(5.0)))
      .select("s").localCheckpoint(true)
    val cs = cs0.join(broadcast(hot), Seq("s"), "left_anti")
      .select(col(idCol), col("s")).localCheckpoint(true)
    val szc = cs.groupBy(idCol).agg(count(lit(1)).as("n")).localCheckpoint(true)
    NearDupIndex(idCol, k, hot, cs, szc)
  }

  /** Probe a batch of NEW documents against a prepared [[NearDupIndex]]:
    * O(|batch shingles| + matched candidates) per call, corpus untouched.
    * Per-batch-document independence: every output row depends only on
    * its own batch doc and the (static) index — the census, sizes, and
    * best-match ranking are all per-bid against corpus state — so
    * probing a batch in ANY partition/chunking and unioning equals one
    * probe of the whole batch (DedupSpec pins it; the streaming
    * registered query `dedup_incremental_stream` rides exactly this,
    * sharing the batch oracle). */
  def probeNearDups(ix: NearDupIndex, batch: DataFrame, textCol: String,
                    threshold: Double = 0.5): DataFrame = {
    val idCol = ix.idCol
    val bs = shingleHashes(batch, idCol, textCol, ix.k)
      .join(broadcast(ix.hot), Seq("s"), "left_anti")
      .select(col(idCol), col("s")).localCheckpoint(true)
    val szb = bs.groupBy(idCol).agg(count(lit(1)).as("n"))
    val scored = bs.toDF("bid", "s")
      .join(ix.shingles.toDF("cid", "s"), "s")
      .groupBy("bid", "cid").agg(count(lit(1)).as("inter"))
      .join(szb.toDF("bid", "n_batch"), "bid")
      .join(ix.sizes.toDF("cid", "n_corpus"), "cid")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_batch") + col("n_corpus") - col("inter")))
      .filter(col("jaccard") >= threshold)
    val w = Window.partitionBy("bid").orderBy(col("jaccard").desc, col("cid"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("bid").as(idCol), col("cid").as("dup_of"), col("inter"),
        col("n_batch"), col("n_corpus"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs, blocked: every within-block pair is
    * exactly verified against `threshold` ((v1, v2, blockCols..., cos),
    * v1 < v2).
    *
    * The blocking key IS the scale knob. Candidate pairs are
    * Σ_b |b|·(|b|−1)/2, so at a FIXED key granularity work grows
    * quadratically with corpus size — measured on the test corpus (10
    * labels): 199,666 pairs at sf0.1 → 20,056,600 at 10× data, exactly
    * the 100× block-size square (wall 20×, local[32] slack absorbing the
    * rest; BENCH_SCALING.json). Splitting the same corpus into B
    * equal-size blocks divides the pair count by B. Production therefore
    * composes a finer key — an IVF cell ([[Similarity.ivfKnn]]'s coarse
    * quantizer, fit offline) or an LSH bucket — with any semantic key,
    * bounding block size at a measured recall cost (RECALL.md gives the
    * recall/latency curve for both bucketing families). */
  def embedPairs(df: DataFrame, idCol: String, vecCol: String,
                 blockCols: Seq[String], threshold: Double): DataFrame = {
    val a = df.select((idCol +: vecCol +: blockCols).map(col): _*)
      .toDF("v1" +: "emb1" +: blockCols: _*)
    val b = df.select((idCol +: vecCol +: blockCols).map(col): _*)
      .toDF("v2" +: "emb2" +: blockCols.map(_ + "__r"): _*)
    val on = blockCols.map(c => col(c) === col(c + "__r")).reduce(_ && _) &&
      col("v1") < col("v2")
    a.join(b, on)
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine(col("emb1"), col("emb2")))
      .filter(col("cos") >= threshold)
      .select((Seq("v1", "v2") ++ blockCols :+ "cos").map(col): _*)
  }

  /** Maximum sign bits per band: caps the dynamic knob at 2^20 buckets —
    * target occupancy holds up to targetOccupancy·2^20 (≈16M at the
    * default) rows per semantic block before buckets start growing with
    * the corpus again (raise for bigger decades). */
  val EmbedBitsMax = 20

  /** [[embedPairsBanded]]'s default knobs, NAMED so the generated DuckDB
    * oracle derives from the same constants the engine defaults to — a
    * default change can never desynchronize the twin silently (it either
    * tracks or the oracle compare fails loudly). */
  val EmbedBands = 4
  val EmbedDim = 64
  val EmbedOccupancy = 16L

  /** The bits-vs-corpus-size law shared by [[embedPairsBanded]] and its
    * generated DuckDB oracle: smallest b in 1..[[EmbedBitsMax]] with
    * targetOccupancy·2^b ≥ n — ceil(log₂(n/targetOccupancy)) spelled as
    * pure INTEGER comparisons, because float log2 can differ a ULP
    * between engines exactly at powers of two, flipping the bucket count
    * on one side only. */
  def embedBits(n: Long, targetOccupancy: Long): Int =
    (1 to EmbedBitsMax).find(b => (targetOccupancy << b) >= n)
      .getOrElse(EmbedBitsMax)

  /** Embedding-cosine near-dup pairs with a BOUNDED blocking key: the
    * semantic key(s) composed with a banded sign-LSH bucket of the vector
    * itself — [[embedPairs]]' documented scale knob applied. Candidates =
    * pairs sharing the semantic key AND at least one of `bands` bucket
    * values (each `bits` hyperplane sign bits, the same fixed-seed plane
    * generator as [[Similarity.lshKnn]]); every candidate is exactly
    * cosine-verified against `threshold`.
    *
    * `bits` is NOT fixed: it grows with the corpus as
    * ceil(log₂(n/targetOccupancy)) — the [[embedBits]] integer law, one
    * O(1)-output count scan to read n — so expected per-(band, key)
    * bucket size stays at targetOccupancy whatever the corpus size, and
    * candidate work Σ_blocks |b|² ≈ bands·n·targetOccupancy stays LINEAR
    * in n. The fixed-granularity quadratic blow-up [[embedPairs]]
    * measures (100× pairs at 10× data, BENCH_SCALING) is gone by
    * construction; BENCH_SCALING pins the measured drop.
    *
    * Why a sign-LSH component and not an IVF cell: bucket assignment is
    * O(bands·bits·dim) per row — linear in corpus size with a log-growth
    * knob — where assigning n rows to an IVF codebook of
    * k = n/targetOccupancy cells costs O(n·k·dim) = quadratic in n. And
    * hyperplane signs are portable doubles (same left-to-right fold both
    * engines), so the blocking is DuckDB-reproducible and the query
    * keeps its full hash oracle — an MLlib-fit codebook is not.
    *
    * Recall for a pair at angle θ is 1 − (1 − (1 − θ/π)^bits)^bands:
    * ≥ 0.999 for true near-dups (cos ≥ 0.99) even at bits = 20, by
    * design NOT a recall path for far pairs (cos ≈ threshold ≈ 0.35) —
    * those are what the bound deliberately prunes; DedupSpec's
    * planted-near-dup case is the recall guard. THE OUTPUT CONTRACT IS
    * THEREFORE APPROXIMATE below the near-dup regime: a mid-range pair
    * (cos between `threshold` and ≈0.99) appears only if it collides in
    * a band, so the result is a plane-seed-dependent SUBSET of
    * [[embedPairs]]' exact label-blocked pair set — by design (those
    * pairs are what the bound prunes to stay linear), and mirrored
    * exactly by the generated oracle. Consumers needing ALL pairs ≥ a
    * mid-range threshold must use [[embedPairs]] with a block key they
    * can afford quadratically.
    *
    * Input hygiene, identical on both engines: null vectors and vectors
    * with any non-finite element are excluded up front (sign-bit buckets
    * diverge cross-engine on NaN — Spark's `NaN >= 0` is false while
    * DuckDB orders NaN above all doubles). The check is the codegen'd
    * finiteness of Σxᵢ² (finite iff every element is finite — a sum of
    * squares cannot cancel), not an interpreted per-element lambda. */
  def embedPairsBanded(df: DataFrame, idCol: String, vecCol: String,
                       blockCols: Seq[String], threshold: Double,
                       bands: Int = EmbedBands,
                       targetOccupancy: Long = EmbedOccupancy,
                       dim: Int = EmbedDim): DataFrame = {
    import graft.functions.VectorFunctions.{cosine, dot, lshBuckets}
    val ps = Similarity.planes(bands, EmbedBitsMax, dim)
    val sumSq = dot(col(vecCol), col(vecCol))
    // materialized once: feeds the count, BOTH banding sides, and both
    // verify joins (same iterative-plan hygiene as ngramJaccardPairs)
    val base = df.filter(col(vecCol).isNotNull &&
        !isnan(sumSq) && sumSq =!= lit(Double.PositiveInfinity))
      .select((idCol +: vecCol +: blockCols).map(col): _*)
      .localCheckpoint(true)
    val bits = embedBits(base.count(), targetOccupancy)
    // All bands' signatures in ONE native pass over the vector
    // ([[graft.expressions.LshBuckets]] — bit-identical to the per-plane
    // `dot(v, array(lits)) >= 0` spelling: same ascending-index double
    // fold, same `>= 0.0`-is-false-for-NaN). The compact plane matrix
    // takes the first `bits` planes of each band at the EmbedBitsMax
    // stride, preserving the bit-j ↔ plane(b·EmbedBitsMax+j) mapping the
    // generated DuckDB oracle reproduces. At the 100× decade this
    // replaces bands×bits (= 80 at bits=20) literal-array dot trees —
    // each a separate vector traversal — with one cache-friendly loop.
    val bandPlanes = Array.tabulate(bands * bits) { k =>
      ps(k / bits * EmbedBitsMax + k % bits)
    }
    val banded = base.select(
      col(idCol) +: blockCols.map(col) :+
        posexplode(lshBuckets(col(vecCol), bandPlanes, bits)): _*)
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val x = banded.toDF("v1" +: blockCols ++: Seq("band_idx", "band_val"): _*)
    val y = banded.toDF("v2" +: blockCols.map(_ + "__r") ++: Seq("bi__r", "bv__r"): _*)
    val on = blockCols.map(c => col(c) === col(c + "__r")).reduce(_ && _) &&
      col("band_idx") === col("bi__r") && col("band_val") === col("bv__r") &&
      col("v1") < col("v2")
    val cand = x.join(y, on)
      .select((Seq("v1", "v2") ++ blockCols).map(col): _*).distinct()
    cand
      .join(base.select(col(idCol).as("v1"), col(vecCol).as("__e1")), "v1")
      .join(base.select(col(idCol).as("v2"), col(vecCol).as("__e2")), "v2")
      .withColumn("cos", cosine(col("__e1"), col("__e2")))
      .filter(col("cos") >= threshold)
      .select((Seq("v1", "v2") ++ blockCols :+ "cos").map(col): _*)
  }
}

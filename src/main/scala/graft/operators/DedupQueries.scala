package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Deduplication pack (NS mandate): exact, normalized-text, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: the near-dup pipelines never do an all-pairs comparison —
  * candidate generation is a bucket equi-join (LSH bands / simhash bands /
  * shared shingles / label blocks), so the shuffle key is the bucket and the
  * quadratic blow-up is confined to same-bucket groups. Exact verification
  * (true Jaccard / hamming / cosine) runs only on candidates. That is the
  * shape that survives a 100 TB corpus; the parameters (32 perms, 8×4
  * bands) are tuned for the planted near-dup band (J ≈ 0.98) in the test
  * corpus but scale-independent.
  */
object DedupQueries {

  private val NumPerm = 32
  private val Bands = 8
  private val RowsPerBand = NumPerm / Bands

  /** Distinct 3-word shingles per document. SQL `slice`/`sequence` accept
    * column offsets (the functions-API variants don't), hence `expr`. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("words", filter(split(col("text"), " "), w => w =!= ""))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr(
        """explode(array_distinct(transform(
          |  sequence(1, size(words) - 2),
          |  i -> concat_ws(' ', slice(words, i, 3))))) AS shingle""".stripMargin))

  private val shinglesSql =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(words) - 1),
      |    i -> array_to_string(words[i:i+2], ' ')))) AS shingle
      |  FROM w WHERE len(words) >= 3),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  val all: Seq[Q] = Seq(
    // Exact dedup with a deterministic keeper (earliest row per key) — the
    // reproducible spelling of dropDuplicates(keys); same plan shape
    // (shuffle on key + per-group reduction).
    Q("dedup_exact",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"),
                  unix_micros(col("ts")).as("ts_us"))
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id, ts_us FROM (
             |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |                       ORDER BY ts, event_id) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    // Normalized-text exact dedup: hash-groupBy on a canonicalized digest.
    Q("dedup_text",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(md5(lower(trim(col("text"))).cast("binary")).as("text_hash"))
        .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash"),
      Some("""SELECT md5(lower(trim(text))) AS text_hash,
             |  min(doc_id) AS keeper_doc_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin)),

    // n-gram Jaccard near-dup: candidates via shared-shingle equi-join,
    // exact Jaccard from integer intersection/union counts (fully
    // deterministic, hence oracle-checkable).
    Q("dedup_ngram",
      (s, dir) => {
        val sh = shingles(s, dir)
        val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val a = sh.toDF("d1", "s1")
        val b = sh.toDF("d2", "s2")
        val inter = a.join(b, a("s1") === b("s2") && a("d1") < b("d2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        inter
          .join(sz.toDF("d1", "n1"), "d1")
          .join(sz.toDF("d2", "n2"), "d2")
          .withColumn("jaccard",
            col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .filter(col("jaccard") >= 0.5)
          .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"),
                  r6(col("jaccard")).as("jaccard"))
          .orderBy("d1", "d2")
      },
      Some(s"""$shinglesSql,
              |p AS (
              |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
              |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT d1, d2, inter, sa.n AS n1, sb.n AS n2,
              |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
              |FROM p JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
              |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
              |ORDER BY d1, d2""".stripMargin)),

    // MinHash + LSH near-dup: shingle → 32-permutation minhash signature →
    // 8 bands × 4 rows → band-bucket equi-join for candidates → signature
    // Jaccard estimate + exact shingle Jaccard verification on candidates
    // only. No SQL oracle (hash-function specific); equivalence with
    // dedup_ngram's exact pairs is pinned in DedupSpec.
    Q("dedup_minhash",
      (s, dir) => {
        val sh = shingles(s, dir)
        val sig = sh.groupBy("doc_id").agg(
          min(xxhash64(lit(0), col("shingle"))).as("m0"),
          (1 until NumPerm).map(p => min(xxhash64(lit(p), col("shingle"))).as(s"m$p")): _*)
        val bandCols = (0 until Bands).map { b =>
          xxhash64((b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col(s"m$i")): _*)
        }
        val banded = sig
          .select(col("doc_id"), posexplode(array(bandCols: _*)))
          .toDF("doc_id", "band_idx", "band_hash")
        val cand = banded.toDF("d1", "bi1", "bh1")
          .join(banded.toDF("d2", "bi2", "bh2"),
            col("bi1") === col("bi2") && col("bh1") === col("bh2") && col("d1") < col("d2"))
          .select("d1", "d2").distinct()
        val sigA = sig.toDF("d1" +: (0 until NumPerm).map(i => s"a$i"): _*)
        val sigB = sig.toDF("d2" +: (0 until NumPerm).map(i => s"b$i"): _*)
        val jEst = (0 until NumPerm)
          .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
          .reduce(_ + _).cast("double") / NumPerm
        val withEst = cand.join(sigA, "d1").join(sigB, "d2")
          .select(col("d1"), col("d2"), jEst.as("j_est"))
        // exact verification on candidates only
        val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = withEst
          .join(sh.toDF("d1", "s1"), "d1").join(sh.toDF("d2", "s2"), "d2")
          .filter(col("s1") === col("s2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("inter"), first(col("j_est")).as("j_est"))
        inter
          .join(sz.toDF("d1", "n1"), "d1")
          .join(sz.toDF("d2", "n2"), "d2")
          .withColumn("j_exact",
            col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .filter(col("j_exact") >= 0.5)
          .select(col("d1"), col("d2"), r6(col("j_est")).as("j_est"),
                  r6(col("j_exact")).as("j_exact"))
          .orderBy("d1", "d2")
      },
      None),

    // SimHash near-dup: 64-bit weighted-bit signature over word counts,
    // candidates via 4×16-bit band join, verified by hamming distance.
    Q("dedup_simhash",
      (s, dir) => {
        val wc = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
          .withColumn("wh", xxhash64(col("word")))
        val bitSums = wc.groupBy("doc_id").agg(
          bitSum(0).as("s0"), (1 until 64).map(i => bitSum(i).as(s"s$i")): _*)
        val simhash = (0 until 64)
          .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b))
        val sigs = bitSums.select(col("doc_id"), simhash.as("simhash"))
        val bandCols = (0 until 4).map(b =>
          shiftrightunsigned(col("simhash"), 16 * b).bitwiseAND(lit(0xFFFFL)))
        val banded = sigs
          .select(col("doc_id"), col("simhash"), posexplode(array(bandCols: _*)))
          .toDF("doc_id", "simhash", "band_idx", "band_val")
        banded.toDF("d1", "h1", "bi1", "bv1")
          .join(banded.toDF("d2", "h2", "bi2", "bv2"),
            col("bi1") === col("bi2") && col("bv1") === col("bv2") && col("d1") < col("d2"))
          .select(col("d1"), col("d2"),
            bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 8)
          .orderBy("d1", "d2")
      },
      None),

    // Embedding-cosine near-dup, label-blocked (the blocking key stands in
    // for a coarse quantizer/IVF cell at scale).
    Q("dedup_embed",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "label", "embedding")
        val a = e.toDF("v1", "label", "emb1")
        val b = e.toDF("v2", "label2", "emb2")
        a.join(b, col("label") === col("label2") && col("v1") < col("v2"))
          .withColumn("cos", VectorFunctions.cosine(col("emb1"), col("emb2")))
          .filter(col("cos") >= 0.35)
          .select(col("v1"), col("v2"), col("label"), r6(col("cos")).as("cosine"))
          .orderBy("v1", "v2")
      },
      None),
  )

  /** Σ ±count per bit position for simhash: +cnt when bit i of the word
    * hash is set, else -cnt. */
  private def bitSum(i: Int) =
    sum(when(shiftrightunsigned(col("wh"), i).bitwiseAND(lit(1L)) === 1L, col("cnt"))
      .otherwise(-col("cnt")))
}

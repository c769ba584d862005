package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Bindings for the deterministic sampling/split/packing operators in
  * [[Sampling]] — all fully DuckDB-oracle-checked (portable md5-prefix
  * hashes, exact integer thresholds computed once and spliced into both
  * engines' plans).
  */
object SamplingQueries {

  private def h60Sql(key: String, salt: String) = Sampling.keyHash60Sql(key, salt)

  val all: Seq[Q] = Seq(
    // Deterministic 20% Bernoulli sample of documents: keep iff the
    // 60-bit key hash falls under fraction·2^60. Per-row predicate — no
    // shuffle, reproducible on any engine/partitioning.
    Q("sample_hash",
      (s, dir) => Sampling.hashSample(
          Tables.documents(s, dir), col("doc_id"), 0.2)
        .select(col("doc_id"), Sampling.keyHash60(col("doc_id"), "sample").as("h60"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${h60Sql("doc_id", "sample")} AS h60
              |FROM documents
              |WHERE ${h60Sql("doc_id", "sample")} < ${Sampling.fractionThreshold(0.2)}
              |ORDER BY doc_id""".stripMargin)),

    // Deterministic 80/10/10 train/val/test split: hash-range assignment,
    // stable under corpus growth (a doc keeps its split when data around
    // it grows — the held-out-set property).
    Q("sample_split",
      (s, dir) => Sampling.hashSplit(Tables.documents(s, dir), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id"),
      Some {
        // read the thresholds off the ENGINE's cut computation (splitCuts)
        // so oracle and plan stay identical for any weights
        val Seq(t1, t2, _) = Sampling.splitCuts(
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        s"""SELECT doc_id,
           |  CASE WHEN ${h60Sql("doc_id", "split")} < $t1 THEN 'train'
           |       WHEN ${h60Sql("doc_id", "split")} < $t2 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Per-stratum rates (corpus rebalancing): downsample noisy strata,
    // keep rare ones whole. Unlisted strata pass through untouched.
    Q("sample_stratified",
      (s, dir) => Sampling.stratifiedHashSample(
          Tables.events(s, dir), col("event_id"), col("event_type"),
          Seq("click" -> 0.25, "view" -> 0.25, "error" -> 0.05))
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id"),
      Some {
        def t(f: Double) = Sampling.fractionThreshold(f)
        s"""SELECT event_id, event_type
           |FROM events
           |WHERE ${h60Sql("event_id", "strat")} <
           |  CASE event_type WHEN 'click' THEN ${t(0.25)}
           |                  WHEN 'view' THEN ${t(0.25)}
           |                  WHEN 'error' THEN ${t(0.05)}
           |                  ELSE ${Long.MaxValue} END
           |ORDER BY event_id""".stripMargin
      }),

    // Greedy token-budget shard packing: docs land in hash buckets
    // (parallelism knob), shards advance on the in-bucket running token
    // total — the sequence-packing preprocessor for training shards.
    Q("docs_pack",
      (s, dir) => Sampling.packBySize(
          Tables.documents(s, dir)
            // text is consumed HERE: only (doc_id, n_tokens) ride into the
            // pack shuffle, not every document body
            .select(col("doc_id"),
              size(filter(split(col("text"), " "), w => w =!= "")).as("n_tokens")),
          col("doc_id"), col("n_tokens"), nBuckets = 8, shardSize = 4096L)
        .select(col("doc_id"), col("n_tokens"), col("bucket"), col("shard"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id,
              |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
              |    CAST(${h60Sql("doc_id", "pack")} % 8 AS INTEGER) AS bucket
              |  FROM documents),
              |c AS (
              |  SELECT doc_id, n_tokens, bucket,
              |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM t)
              |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, bucket,
              |  CAST((cum - n_tokens) // 4096 AS INTEGER) AS shard
              |FROM c ORDER BY doc_id""".stripMargin)),
  )
}

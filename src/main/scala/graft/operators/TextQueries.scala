package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Text-analysis pack over the `documents` corpus (NS mandate: language ID,
  * quality scoring, token counting, document fingerprinting).
  *
  * Scale notes: every query is scan → per-row column math (or one
  * explode+groupBy for word stats). Nothing here shuffles more than once,
  * and all tokenization happens inside codegen'd string expressions —
  * the shape that survives a 100 TB corpus.
  */
object TextQueries {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopSqlList = Stopwords.map(w => s"'$w'").mkString(", ")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Real corpora would use character n-gram profiles; the
    * heuristic keeps the same plan shape (per-row array intersections). */
  private val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans"))

  val all: Seq[Q] = Seq(
    // Word-frequency stats: the explode → groupBy shape (REF has no aggs;
    // NS text analysis). Map-side partial aggregation keeps the shuffle at
    // one row per (partition × word).
    Q("text_stats",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("n_occur"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(desc("n_occur"), asc("word"))
        .limit(100),
      Some("""SELECT word, count(*) AS n_occur, count(DISTINCT doc_id) AS n_docs
             |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
             |WHERE word <> ''
             |GROUP BY word ORDER BY n_occur DESC, word ASC LIMIT 100""".stripMargin)),

    // Token counting: whitespace tokens, a BPE-ish regex tokenizer
    // (word-pieces + punctuation), and the chars/4 estimate LLM pipelines
    // use for budget accounting.
    Q("text_tokens",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          size(filter(split(col("text"), "\\s+"), w => w =!= "")).as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
            .as("n_re_tokens"),
          ceil(length(col("text")) / 4.0).as("n_bpe_est"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(length(text) AS INTEGER) AS n_chars,
             |  CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS INTEGER) AS n_ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_re_tokens,
             |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Within-document repetition (Gopher-style quality rule): fraction of
    // 3-word shingle OCCURRENCES that are repeats of an earlier shingle in
    // the same document. Integer counts + one final division — fully
    // deterministic cross-engine. Pure per-row array math, no shuffle
    // (docs with <3 words report 0 total / 0 distinct / 0.0 ratio).
    Q("text_repetition",
      (s, dir) => {
        val words = filter(split(col("text"), " "), w => w =!= "")
        // guarded: Spark's sequence(1, 0) counts DOWN, so short docs must
        // short-circuit to an empty gram list instead
        val grams = when(size(col("__words")) >= 3, expr(
            """transform(sequence(1, size(__words) - 2),
              |          i -> concat_ws(' ', slice(__words, i, 3)))""".stripMargin))
          .otherwise(array().cast("array<string>"))
        Tables.documents(s, dir)
          .withColumn("__words", words)
          .withColumn("__grams", grams)
          .select(col("doc_id"),
            size(col("__grams")).as("n_grams"),
            size(array_distinct(col("__grams"))).as("n_distinct"),
            when(size(col("__grams")) === 0, lit(0.0))
              .otherwise((size(col("__grams")) - size(array_distinct(col("__grams"))))
                .cast("double") / size(col("__grams")))
              .as("dup_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(grams) AS INTEGER) AS n_grams,
             |  CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
             |  CASE WHEN len(grams) = 0 THEN 0.0
             |       ELSE CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
             |  END AS dup_ratio
             |FROM (
             |  SELECT doc_id,
             |    list_transform(range(1, greatest(len(words) - 1, 1)),
             |                   i -> array_to_string(words[i:i+2], ' ')) AS grams
             |  FROM (SELECT doc_id,
             |          list_filter(string_split(text, ' '), x -> x <> '') AS words
             |        FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length/stopword/uniqueness signals combined into a
    // bounded [0,1] score — the pre-training filter shape.
    Q("text_quality",
      (s, dir) => {
        val words = filter(split(col("text"), " "), w => w =!= "")
        val nWords = size(words)
        val nStop = size(filter(words, w => w.isin(Stopwords.map(x => x: Any): _*)))
        val nUniq = size(array_distinct(words))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            nWords.as("n_words"),
            r6(length(col("text")).cast("double") / nWords).as("avg_word_len"),
            r6(nStop.cast("double") / nWords).as("stop_ratio"),
            r6(nUniq.cast("double") / nWords).as("uniq_ratio"),
            r6(least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4
              + (lit(1.0) - nStop.cast("double") / nWords) * 0.3
              + nUniq.cast("double") / nWords * 0.3).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_words,
              |  round(CAST(length(text) AS DOUBLE) / n_words, 6) AS avg_word_len,
              |  round(CAST(n_stop AS DOUBLE) / n_words, 6) AS stop_ratio,
              |  round(CAST(n_uniq AS DOUBLE) / n_words, 6) AS uniq_ratio,
              |  round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4
              |    + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3
              |    + CAST(n_uniq AS DOUBLE) / n_words * 0.3, 6) AS quality
              |FROM (SELECT doc_id, text,
              |        CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INTEGER) AS n_words,
              |        CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopSqlList))) AS INTEGER) AS n_stop,
              |        CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS INTEGER) AS n_uniq
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)),

    // Data-mixing accounting: per-source token mass, natural share, and
    // the per-source sampling rate that flattens the corpus to a uniform
    // source mixture (rate = min(1, target_share / natural_share) —
    // overrepresented sources downsample, underrepresented stay whole;
    // feed the rates into sample_stratified to execute the mixture).
    // One shuffle on source + a broadcast totals row.
    Q("docs_mixture",
      (s, dir) => {
        val nTok = size(filter(split(col("text"), " "), w => w =!= ""))
        val t = Tables.documents(s, dir)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(nTok.cast("long")).as("n_tokens"))
        val tot = t.agg(sum(col("n_tokens")).as("all_tokens"),
          count(lit(1)).as("n_sources"))
        t.crossJoin(broadcast(tot))
          .withColumn("share", col("n_tokens").cast("double") / col("all_tokens"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            r6(col("share")).as("natural_share"),
            r6(least(lit(1.0), (lit(1.0) / col("n_sources")) / col("share")))
              .as("sample_rate"))
          .orderBy("source")
      },
      Some("""WITH t AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS all_tokens,
             |               count(*) AS n_sources FROM t)
             |SELECT source, n_docs, n_tokens,
             |  round(CAST(n_tokens AS DOUBLE) / all_tokens * 1e6) / 1e6 AS natural_share,
             |  round(least(1.0, (1.0 / n_sources)
             |    / (CAST(n_tokens AS DOUBLE) / all_tokens)) * 1e6) / 1e6 AS sample_rate
             |FROM t CROSS JOIN tot ORDER BY source""".stripMargin)),

    // Unigram-surprise quality score (the perplexity-proxy curation
    // signal, CCNet-style with the corpus as its own LM): per doc, the
    // average -ln p(word) under the corpus unigram distribution. Extreme
    // scores mark boilerplate (low) and garbage (high). Two-pass shape:
    // fit the word census once, apply it back row-wise — census ⋈ words
    // is a 1:N join Catalyst/AQE broadcasts while the vocabulary fits
    // (typical even at large corpus sizes: vocab ≪ corpus); a
    // web-garbage vocabulary too big to broadcast degrades to a shuffle
    // join where AQE's skew split handles the stopword keys.
    // Determinism: each occurrence's nll is r6'd (bit-identical ln and
    // division), then summed EXACTLY via DECIMAL(25,6) — order-free.
    Q("text_unigram_nll",
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
        val census = words.groupBy("w").agg(count(lit(1)).as("c"))
        val total = census.agg(sum(col("c")).as("n"))
        words.join(census, "w")
          .crossJoin(broadcast(total))
          .withColumn("nll", r6(-log(col("c").cast("double") / col("n"))))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), dsum(col("nll")).as("sum_nll"))
          .withColumn("avg_nll", r6(col("sum_nll") / col("n_words")))
          .orderBy("doc_id")
      },
      Some("""WITH words AS (
             |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
             |  FROM documents),
             |census AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
             |tot AS (SELECT sum(c) AS n FROM census),
             |sc AS (
             |  SELECT doc_id, round(-ln(CAST(c AS DOUBLE) / n) * 1e6) / 1e6 AS nll
             |  FROM words JOIN census USING (w) CROSS JOIN tot)
             |SELECT doc_id, count(*) AS n_words,
             |  CAST(CAST(sum(CAST(nll AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_nll,
             |  round(CAST(CAST(sum(CAST(nll AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / count(*) * 1e6) / 1e6
             |    AS avg_nll
             |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Language ID: argmax over per-language marker-word hit counts.
    // Spark picks via greatest() over (score, lang) structs — ties break
    // toward the alphabetically-last language; the oracle's CASE chain
    // tests languages in reverse-alphabetical order with >=, which is the
    // same tie-break. Sentence-level behavior is additionally pinned in
    // TextQueriesSpec.
    Q("text_lang",
      (s, dir) => {
        val words = split(col("text"), " ")
        val scored = LangMarkers.foldLeft(Tables.documents(s, dir)) {
          case (df, (lang, markers)) =>
            df.withColumn(s"score_$lang",
              size(filter(words, w => w.isin(markers.map(x => x: Any): _*))))
        }
        val langs = LangMarkers.keys.toSeq.sorted
        scored
          .withColumn("pred", greatest(langs.map(l => struct(col(s"score_$l").as("score"), lit(l).as("lang"))): _*))
          .select(col("doc_id"), col("lang").as("lang_declared"),
            col("pred.lang").as("lang_pred"), col("pred.score").as("marker_hits"))
          .orderBy("doc_id")
      },
      {
        def hits(lang: String) = {
          val marks = LangMarkers(lang).map(w => s"'$w'").mkString(", ")
          s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($marks))) AS INTEGER) AS s_$lang"
        }
        Some(s"""SELECT doc_id, lang AS lang_declared,
                |  CASE WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                |       WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                |       WHEN s_en >= s_de THEN 'en'
                |       ELSE 'de' END AS lang_pred,
                |  CAST(greatest(s_de, s_en, s_es, s_fr) AS INTEGER) AS marker_hits
                |FROM (SELECT doc_id, lang, text,
                |        ${Seq("de", "en", "es", "fr").map(hits).mkString(",\n        ")}
                |      FROM documents)
                |ORDER BY doc_id""".stripMargin)
      }),

    // PII/entity scrubbing: entity mask + match counts — the pre-training
    // redaction shape (one scan, no shuffle). Entity masking is TOKEN
    // level (exact match on space-delimited words), NOT regex \b: Java's
    // \b is Unicode-aware while RE2's (DuckDB) is ASCII, so the two
    // engines disagree about a boundary between an ASCII letter and a
    // multibyte letter ("customerµ1": Java sees r|µ as word|word — no
    // boundary; RE2 sees word|non-word — boundary), and RE2 has no
    // lookarounds to spell an explicit one. Exact token equality is the
    // one boundary rule both engines share, multibyte-proof by
    // construction (caught by the multibyte scaling corpus). The email
    // pattern is boundary-free and stays a whole-text regex.
    //
    // Both token stages are native codegen'd expressions (TokenMask /
    // TokenMatchCount), not HOF lambdas: the former transform()+filter()
    // spelling evaluated an interpreted closure per token and
    // materialized a token array + rejoin per row — the last
    // interpreted-lambda hot path in an oracled query (SURVEY §7.3b
    // measured the family 4-8x slower than codegen).
    Q("text_scrub",
      (s, dir) => {
        import org.apache.spark.sql.graftbridge.ColumnBridge
        val entities = Seq("customer", "supplier")
        val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
        val masked = ColumnBridge.column(graft.expressions.TokenMask(
          ColumnBridge.expression(col("text")), entities, "<ENT>"))
        val nEnt = ColumnBridge.column(graft.expressions.TokenMatchCount(
          ColumnBridge.expression(col("text")), entities))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            nEnt.as("n_entities"),
            size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).as("n_emails"),
            md5(regexp_replace(masked, emailPat, "<EMAIL>").cast("binary"))
              .as("masked_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split(text, ' '),
             |    w -> w IN ('customer', 'supplier'))) AS INTEGER) AS n_entities,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
             |  md5(regexp_replace(
             |      array_to_string(list_transform(string_split(text, ' '),
             |        w -> CASE WHEN w IN ('customer', 'supplier') THEN '<ENT>' ELSE w END), ' '),
             |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g')) AS masked_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // The composed training-data prep pipeline: quality-filter → exact
    // near-dup removal (normalized-text keeper) → token accounting, as ONE
    // declarative plan. Catalyst fuses the scalar stages into the scan
    // projection; the only shuffle is the dedup window on text_hash. This
    // is the end-to-end shape a 100 TB corpus run uses, and it is fully
    // oracle-checked.
    Q("docs_pipeline",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val words = filter(split(col("text"), " "), w => w =!= "")
        val nWords = size(words)
        val nStop = size(filter(words, w => w.isin(Stopwords.map(x => x: Any): _*)))
        val nUniq = size(array_distinct(words))
        val quality = least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4 +
          (lit(1.0) - nStop.cast("double") / nWords) * 0.3 +
          nUniq.cast("double") / nWords * 0.3
        val w = Window.partitionBy("text_hash").orderBy("doc_id")
        Tables.documents(s, dir)
          .withColumn("q", quality)
          .filter(col("q") >= 0.5)
          .withColumn("text_hash", md5(lower(trim(col("text"))).cast("binary")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("lang"),
            size(filter(split(col("text"), "\\s+"), x => x =!= "")).as("n_tokens"),
            r6(col("q")).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""WITH scored AS (
              |  SELECT doc_id, lang, text,
              |    least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4
              |      + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3
              |      + CAST(n_uniq AS DOUBLE) / n_words * 0.3 AS q
              |  FROM (SELECT doc_id, lang, text,
              |          len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
              |          len(list_filter(string_split(text, ' '), w -> w IN ($stopSqlList))) AS n_stop,
              |          len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS n_uniq
              |        FROM documents)),
              |kept AS (
              |  SELECT doc_id, lang, text, q,
              |    row_number() OVER (PARTITION BY md5(lower(trim(text)))
              |                       ORDER BY doc_id) AS rn
              |  FROM scored WHERE q >= 0.5)
              |SELECT doc_id, lang,
              |  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS INTEGER) AS n_tokens,
              |  round(q * 1e6) / 1e6 AS quality
              |FROM kept WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // The COMPLETE curation pipeline as one declarative plan: stable
    // train-split selection → quality filter → exact near-dup removal →
    // token accounting → token-budget shard packing. Three shuffles
    // total, each on a real key (text_hash window, pack bucket, output
    // sort) — the full corpus-to-training-shards shape at 100 TB, and
    // every stage's math is the already-oracled spelling from
    // sample_split / text_quality / dedup_text / docs_pack, so the
    // composition is oracle-checked end-to-end too.
    Q("docs_curate",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val words = filter(split(col("text"), " "), w => w =!= "")
        val nWords = size(words)
        val nStop = size(filter(words, w => w.isin(Stopwords.map(x => x: Any): _*)))
        val nUniq = size(array_distinct(words))
        val quality = least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4 +
          (lit(1.0) - nStop.cast("double") / nWords) * 0.3 +
          nUniq.cast("double") / nWords * 0.3
        val w = Window.partitionBy("text_hash").orderBy("doc_id")
        val kept = Sampling.hashSplit(Tables.documents(s, dir), col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .filter(col("split") === "train")
          .withColumn("q", quality)
          .filter(col("q") >= 0.5)
          .withColumn("text_hash", md5(lower(trim(col("text"))).cast("binary")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("q"),
            size(filter(split(col("text"), "\\s+"), x => x =!= "")).as("n_tokens"))
        Sampling.packBySize(kept, col("doc_id"), col("n_tokens"),
            nBuckets = 8, shardSize = 4096L)
          .select(col("doc_id"), col("n_tokens"), r6(col("q")).as("quality"),
            col("bucket"), col("shard"))
          .orderBy("doc_id")
      },
      Some {
        val t1 = Sampling.splitCuts(
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).head
        s"""WITH scored AS (
           |  SELECT doc_id, text,
           |    least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4
           |      + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3
           |      + CAST(n_uniq AS DOUBLE) / n_words * 0.3 AS q
           |  FROM (SELECT doc_id, text,
           |          len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
           |          len(list_filter(string_split(text, ' '), w -> w IN ($stopSqlList))) AS n_stop,
           |          len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS n_uniq
           |        FROM documents
           |        WHERE ${Sampling.keyHash60Sql("doc_id", "split")} < $t1)),
           |kept AS (
           |  SELECT doc_id, q,
           |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
           |    row_number() OVER (PARTITION BY md5(lower(trim(text)))
           |                       ORDER BY doc_id) AS rn
           |  FROM scored WHERE q >= 0.5),
           |bucketed AS (
           |  SELECT doc_id, q, n_tokens,
           |    CAST(${Sampling.keyHash60Sql("doc_id", "pack")} % 8 AS INTEGER) AS bucket
           |  FROM kept WHERE rn = 1),
           |packed AS (
           |  SELECT doc_id, q, n_tokens, bucket,
           |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM bucketed)
           |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           |  round(q * 1e6) / 1e6 AS quality, bucket,
           |  CAST((cum - n_tokens) // 4096 AS INTEGER) AS shard
           |FROM packed ORDER BY doc_id""".stripMargin
      }),

    // Document fingerprint: bottom-k sketch of character-8-gram hashes
    // (KMV / winnowing-style). Hash functions differ engine-to-engine, so
    // no SQL oracle; identity & near-dup overlap properties are pinned in
    // TextQueriesSpec. The bottom-k sketch is emitted as a joined string,
    // not array<long>: the driver's pandas row-sort cannot hash array
    // cells (CORRECTNESS_r02 "unhashable type: numpy.ndarray").
    // Gram hashing is the native codegen'd CharGramHash (one FNV fold per
    // byte window, zero per-gram allocation) — replaced the interpreted
    // `transform(sequence(...), i -> xxhash64(substring(text,i,8)))`
    // lambda (SURVEY §7.3b anti-pattern). Measured on the hash stage
    // alone (sum(size(grams)), 4x-length docs so gram work dominates):
    // 2.18s -> 0.16s, 13.7x. End-to-end at sf0.1 the query is
    // sketch-overhead-bound (array_distinct/sort), 0.18s -> 0.15s.
    Q("text_fingerprint",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("grams", {
          import org.apache.spark.sql.graftbridge.ColumnBridge
          ColumnBridge.column(graft.expressions.CharGramHash(
            ColumnBridge.expression(col("text")), 8))
        })
        .select(col("doc_id"),
          concat_ws(",",
            slice(array_sort(array_distinct(col("grams"))), 1, 4)).as("fingerprint"),
          xxhash64(concat_ws(",",
            slice(array_sort(array_distinct(col("grams"))), 1, 4))).as("fp_hash"))
        .orderBy("doc_id"),
      None),
  )
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import graft.operators.Similarity

/** Streaming ingest into a stored IVF index: every arriving micro-batch
  * is one [[Similarity.ivfAppend]] — stored-codebook assignment, staged
  * cell files, one atomic manifest commit — through a `foreachBatch`
  * sink, so the serving tier grows as data lands with NO refit and no
  * corpus rewrite (the measured O(batch) ingest economics, RECALL.md).
  *
  * Delivery semantics: Structured Streaming's foreachBatch is
  * at-least-once — after a crash between the sink's commit (here the
  * manifest rename) and the CHECKPOINT commit, the most recent
  * micro-batch replays. `ivfAppend` absorbs exactly that window: a batch
  * whose content fingerprint matches the LAST committed batch id is a
  * no-op (replay idempotence), and a torn append below the manifest is
  * invisible + retried at O(batch) (the stage-then-commit protocol). So
  * stream-appended state is effectively exactly-once: SimilaritySpec
  * pins stream-ingested ≡ one-shot append ≡ union build at the manifest
  * level, the seventh streaming ≡ batch fact.
  *
  * The SINGLE-WRITER contract carries over: one ingest query per index
  * (micro-batches of one query are already serial). */
object IvfIngest {

  /** Drive `arriving` (id, emb) into `indexDir` through the harness's
    * chunked file feed (one micro-batch per chunk, arrival-ordered by
    * `orderCol` ranges) until the feed is exhausted. Production swaps
    * the feed for its real landing-zone `readStream` and runs unbounded
    * with `trigger(...)`; the sink line is identical. */
  def ingestChunked(arriving: DataFrame, orderCol: String, indexDir: String,
                    stagingDir: String, nChunks: Int = 3): Unit = {
    val feed = WeatherStream.chunkedFileFeedDF(arriving, orderCol, stagingDir, nChunks)
    // fresh checkpoint per construction: the feed's live dir was just
    // wiped, so a stale checkpoint would reference vanished source files
    val ckpt = new java.io.File(stagingDir, "ivf_ckpt")
    rmTree(ckpt)
    val q = feed.df.writeStream
      .foreachBatch((b: Dataset[Row], _: Long) =>
        Similarity.ivfAppend(b.toDF(), indexDir))
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try WeatherStream.runChunked(q, Seq(feed))
    finally q.stop()
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
    ()
  }
}

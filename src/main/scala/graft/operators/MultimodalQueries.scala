package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Multimodal-column plumbing (NS mandate): opaque `binary` payloads with
  * typed metadata, partition-wise decode/feature-extract.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (see [[FakeDecoder]]); everything
  * Spark-side — binary column schema, partition-batched iteration, typed
  * output encoding — is real and tested. A production deployment swaps
  * `FakeDecoder.decode` for a codec call; the plan shape (scan → narrow
  * mapPartitions → columnar output) is unchanged and shuffle-free.
  *
  * Byte/char semantics (multibyte-safe, no ASCII precondition): queries
  * that model BYTE payloads (mm_ingest, mm_framesample, mm_decode) spell
  * byte math explicitly on BOTH engines — Spark `octet_length(binary)` /
  * FakeDecoder over the UTF-8 bytes, DuckDB `octet_length(encode(text))`
  * and hex-string byte extraction (`substr(hex(encode(text)), 2i+1, 2)`;
  * DuckDB's md5 only takes VARCHAR, so raw-byte-slice digests stay out
  * of the oracle surface). Queries that model CHARACTER payloads
  * (mm_chunks, mm_resize) use codepoint math, which the two engines
  * already agree on for any UTF-8 input (Spark length/substring/ascii ≡
  * DuckDB length/substr/ord, astral planes included — pinned by
  * TextAndAggSpec's multibyte contract test).
  */
object MultimodalQueries {

  /** Decoded "media" features. */
  final case class MMFeature(doc_id: Long, width: Int, height: Int,
                             n_frames: Int, feature: Array[Float])

  /** STUB decoder: derives deterministic fake metadata/features from the
    * payload bytes. A real implementation would decode the image/audio here
    * (one codec instance per partition, amortized over the iterator — the
    * reason this is mapPartitions and not a per-row UDF). */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MMFeature = {
      val w = (math.abs(bytes.headOption.getOrElse(1: Byte).toInt) % 64) + 1
      val h = (math.abs(bytes.lift(1).getOrElse(1: Byte).toInt) % 64) + 1
      val frames = bytes.length / 256 + 1
      val feature = Array.tabulate(8) { i =>
        bytes.lift(i).getOrElse(0: Byte).toFloat / 128.0f
      }
      MMFeature(docId, w, h, frames, feature)
    }
  }

  val all: Seq[Q] = Seq(
    // Binary ingestion + typed metadata: text re-encoded as an opaque blob
    // column (standing in for image/audio payloads), with byte-level
    // metadata derived by codegen'd expressions.
    Q("mm_ingest",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("blob", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("blob")).as("blob_len"),
          md5(col("blob")).as("blob_md5"),
          ceil(octet_length(col("blob")) / 256.0).as("n_chunks"),
          lit("text/plain").as("mime"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INTEGER) AS blob_len,
             |  md5(text) AS blob_md5,
             |  CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks,
             |  'text/plain' AS mime
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Payload chunking: fixed-size segments with per-chunk digests — the
    // shape used to ship large media blobs through bounded-size records.
    // Unit here is CHARACTERS (codepoints), identical on both engines for
    // any UTF-8 text; a true binary corpus chunks bytes instead — the
    // same Spark expression over substr-on-binary (DuckDB's md5 can't
    // digest raw byte slices, so the byte spelling has no SQL oracle).
    Q("mm_chunks",
      (s, dir) => Tables.documents(s, dir)
        // guarded: Spark's sequence(0, -1) counts DOWN (same engine quirk
        // as text_repetition), so zero-length payloads must short-circuit
        // to an empty chunk list like the oracle's range(0, 0)
        .select(col("doc_id"), col("text"),
          posexplode(when(length(col("text")) === 0,
              array().cast("array<string>"))
            .otherwise(expr(
              """transform(sequence(0, cast(ceil(length(text)/256.0) as int) - 1),
                |          i -> substr(text, i*256 + 1, 256))""".stripMargin))))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          length(col("col")).as("chunk_len"),
          md5(col("col").cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
             |  CAST(length(substr(text, CAST(i*256+1 AS INTEGER), 256)) AS INTEGER) AS chunk_len,
             |  md5(substr(text, CAST(i*256+1 AS INTEGER), 256)) AS chunk_md5
             |FROM (SELECT doc_id, text,
             |        unnest(range(0, CAST(ceil(length(text)/256.0) AS BIGINT))) AS i
             |      FROM documents)
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Frame sampling: every 4th frame index of each payload's (stub)
    // frame count, exploded to one row per kept frame with a stable
    // frame key — the video-curation shape (decode only sampled frames
    // downstream). Pure codegen expressions; no shuffle before the sort.
    Q("mm_framesample",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          (octet_length(col("text").cast("binary")) / lit(256) + 1).cast("int")
            .as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(expr("filter(sequence(0, n_frames - 1), i -> i % 4 = 0)"))
            .as("frame_idx"))
        .withColumn("frame_key",
          md5(concat_ws(":", col("doc_id"), col("frame_idx")).cast("binary")))
        .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, n_frames, CAST(i AS INTEGER) AS frame_idx,
             |  md5(doc_id || ':' || i) AS frame_key
             |FROM (SELECT doc_id,
             |        CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS n_frames,
             |        unnest(range(0, octet_length(encode(text)) // 256 + 1)) AS i
             |      FROM documents)
             |WHERE i % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin)),

    // Resize: aspect-preserving fit into a 32x32 box over the stub
    // decoder's (width, height) metadata, plus a 16-byte evenly-sampled
    // payload "thumbnail" digest — the metadata/selection half of a real
    // resize (deterministic, oracle-able); the pixel resample itself is
    // the stubbed codec step, same contract as mm_decode. All per-row
    // codegen'd expressions, shuffle-free scan.
    Q("mm_resize",
      (s, dir) => {
        val n = length(col("text"))
        val w = (when(n >= 1, ascii(substring(col("text"), 1, 1))).otherwise(lit(1)) % 64) + 1
        val h = (when(n >= 2, ascii(substring(col("text"), 2, 1))).otherwise(lit(1)) % 64) + 1
        val sc = least(lit(32.0) / w, lit(32.0) / h, lit(1.0))
        val thumb = concat((0 until 16).map(i =>
          col("text").substr((floor((lit(i) * n) / 16.0).cast("int") + 1), lit(1))): _*)
        Tables.documents(s, dir)
          .select(col("doc_id"), w.as("width"), h.as("height"),
            r6(sc).as("scale"),
            greatest(floor(w * sc).cast("long"), lit(1L)).as("rw"),
            greatest(floor(h * sc).cast("long"), lit(1L)).as("rh"),
            md5(thumb.cast("binary")).as("thumb_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id, text,
              |    (CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 1 END % 64) + 1 AS width,
              |    (CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 1 END % 64) + 1 AS height
              |  FROM documents),
              |sc AS (
              |  SELECT *, least(32.0 / width, 32.0 / height, 1.0) AS s FROM m)
              |SELECT doc_id, width, height,
              |  round(s * 1e6) / 1e6 AS scale,
              |  greatest(CAST(floor(width * s) AS BIGINT), 1) AS rw,
              |  greatest(CAST(floor(height * s) AS BIGINT), 1) AS rh,
              |  md5(${(0 until 16).map(i =>
                    s"substr(text, ($i * length(text)) // 16 + 1, 1)")
                    .mkString(" || ")}) AS thumb_md5
              |FROM sc ORDER BY doc_id""".stripMargin)),

    // Partition-wise decode → typed features (STUB decode, real plumbing).
    // The feature vector is flattened to scalar columns for output: the
    // driver's pandas-side hash compare cannot sort rows containing array
    // cells (CORRECTNESS_r02 "unhashable type: numpy.ndarray"). The stub
    // reads raw UTF-8 BYTES (signed, like any codec would see them), and
    // the oracle extracts the same bytes from hex(encode(text)) — exact
    // on any corpus, multibyte included, with no char≡byte precondition.
    // byte/128.0 is a power-of-two division — exact in both float and
    // double, so the cast chain float→double here ≡ int/128.0 double
    // division in the oracle.
    Q("mm_decode",
      (s, dir) => {
        import s.implicits._
        val feats = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => FakeDecoder.decode(id, bytes) })
          .toDF()
        feats.select(
          Seq(col("doc_id"), col("width"), col("height"), col("n_frames")) ++
            (0 until 8).map(i => col("feature")(i).cast("double").as(s"f$i")): _*)
          .orderBy("doc_id")
      },
      Some {
        // signed byte p (1-based) of the UTF-8 encoding, via the hex
        // string (TRY_CAST: no error on short payloads; the CASE guards
        // supply the stub's defaults)
        def ub(p: Int) =
          s"TRY_CAST(concat('0x', substr(hx, ${2 * p - 1}, 2)) AS INTEGER)"
        def sb(p: Int) =
          s"(CASE WHEN ${ub(p)} > 127 THEN ${ub(p)} - 256 ELSE ${ub(p)} END)"
        s"""WITH b AS (
           |  SELECT doc_id, hex(encode(text)) AS hx,
           |         octet_length(encode(text)) AS nb
           |  FROM documents)
           |SELECT doc_id,
           |  (abs(CASE WHEN nb >= 1 THEN ${sb(1)} ELSE 1 END) % 64) + 1 AS width,
           |  (abs(CASE WHEN nb >= 2 THEN ${sb(2)} ELSE 1 END) % 64) + 1 AS height,
           |  CAST(nb // 256 + 1 AS INTEGER) AS n_frames,
           |  ${(0 until 8).map(i =>
                s"(CASE WHEN nb > $i THEN ${sb(i + 1)} ELSE 0 END) / 128.0 AS f$i")
                .mkString(",\n  ")}
           |FROM b ORDER BY doc_id""".stripMargin
      }),
  )
}

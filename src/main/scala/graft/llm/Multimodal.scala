package graft.llm

import graft.Tables._
import graft.QuerySpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`decodeStub`) — but the Spark-side
  * plumbing is real and is what matters at 100 TB:
  *
  *  - payloads travel as `BinaryType` columns (parquet keeps them as
  *    byte arrays — no base64 inflation);
  *  - decode / feature-extraction runs via `mapPartitions` so any native
  *    decoder is initialized once per partition, not once per row (the
  *    same batch shape a Pandas-UDF/`mapInPandas` pipeline uses);
  *  - metadata lands in a flat struct so downstream filters
  *    (width ≥ …, duration < …) stay codegen'd column predicates and
  *    push down to parquet row-group stats once materialized.
  */
object Multimodal {

  /** Decoded-media metadata produced by the (stubbed) decoder. */
  case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Long,
      height: Long,
      channels: Long,
      est_frames: Long)

  /** STUB decoder: a real deployment would decode image headers here
    * (e.g. javax.imageio / ffmpeg bindings). This fake derives fields
    * deterministically from the byte length so tests and the oracle can
    * pin results. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      byte_len = n,
      width = n % 640 + 16,
      height = (n * 7) % 480 + 16,
      channels = 3L,
      est_frames = n / 1024 + 1)
  }

  /** Binary-payload view of `documents`: the text bytes stand in for an
    * encoded media blob (schema/plumbing is the point, not the codec). */
  def payloads(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))

  /** Partition-batched decode: one decoder init per partition. Returns a
    * typed Dataset[MediaMeta]. */
  def decodeAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    payloads(s, d)
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (native lib handle)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
  }

  /** Oracle-checkable twin of the decode pipeline: the same metadata
    * derivation expressed as column ops over octet_length, exercising
    * the binary column path end-to-end. */
  val meta = QuerySpec(
    "multimodal_meta",
    (s, d) =>
      payloads(s, d)
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("byte_len"),
          col("source"))
        .select(
          col("doc_id"), col("byte_len"), col("source"),
          (col("byte_len") % 640 + 16).as("width"),
          (col("byte_len") * 7 % 480 + 16).as("height"),
          lit(3L).as("channels"),
          (expr("byte_len div 1024") + 1).as("est_frames"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, byte_len, source,
                   byte_len % 640 + 16 AS width,
                   (byte_len * 7) % 480 + 16 AS height,
                   3 AS channels,
                   byte_len // 1024 + 1 AS est_frames
            FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                         source
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** Frame sampling over the binary payload: n evenly-spaced fixed-size
    * byte slices per blob (the video-keyframe access pattern). The
    * slicing runs on the BinaryType column in BYTES; the oracle is
    * byte-true too — DuckDB 1.0 has no BLOB substring, so it slices
    * `hex(encode(text))` at doubled offsets (2 hex chars per byte),
    * which stays correct for multi-byte UTF-8, not just ASCII. */
  val frames = QuerySpec(
    "multimodal_frames",
    (s, d) => {
      val nFrames = 4
      val frameLen = 32
      payloads(s, d)
        .select(col("doc_id"), col("payload"),
          octet_length(col("payload")).cast("long").as("byte_len"),
          explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
        // evenly spaced: offset_i = i * max(len - frameLen, 0) / (n-1)
        .withColumn("frame_offset",
          expr(s"(frame_idx * greatest(byte_len - $frameLen, 0)) div ${nFrames - 1}"))
        .withColumn("frame",
          expr(s"substring(payload, CAST(frame_offset + 1 AS INT), $frameLen)"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_offset"),
          octet_length(col("frame")).cast("long").as("frame_len"),
          lower(hex(col("frame"))).as("frame_hex"))
        .orderBy("doc_id", "frame_idx")
    },
    Some("""SELECT doc_id, frame_idx, frame_offset,
                   length(substr(h, CAST(2 * frame_offset + 1 AS BIGINT), 64)) // 2 AS frame_len,
                   lower(substr(h, CAST(2 * frame_offset + 1 AS BIGINT), 64)) AS frame_hex
            FROM (
              SELECT doc_id, hex(encode(text)) AS h,
                     CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                     CAST(i AS BIGINT) AS frame_idx,
                     (i * greatest(CAST(octet_length(encode(text)) AS BIGINT) - 32, 0)) // 3 AS frame_offset
              FROM documents, UNNEST([0, 1, 2, 3]) AS u(i))
            ORDER BY doc_id, frame_idx""")
  )

  /** Fixed-length feature vector from the payload bytes — a
    * deterministic stand-in for an image/audio embedding model: 8
    * buckets of byte-value sums. Byte-true: each byte is read via its
    * hex pair (`conv(substring(hex(payload)...)`), never through a
    * UTF-8 decode — correct for arbitrary binary, not just ASCII.
    * (The mapPartitions batch shape is in `decodeAll`; this one stays
    * columnar to show both.) */
  def featureStub(s: SparkSession, d: String): DataFrame =
    payloads(s, d)
      .select(col("doc_id"), hex(col("payload")).as("h"),
        octet_length(col("payload")).as("n"))
      .select(
        col("doc_id"),
        expr("""transform(sequence(0, 7), b ->
                  aggregate(filter(sequence(1, n), i -> ((i - 1) % 8) = b),
                            0L, (acc, i) ->
                              acc + CAST(conv(substring(h, 2 * i - 1, 2), 16, 10) AS BIGINT)))""")
          .as("features"))

  /** Feature extraction as an oracle-gated key: 8 byte-value bucket sums
    * per payload (the deterministic stand-in for an embedding model; the
    * interpreted-HOF twin is `featureStub`). Kept codegen-friendly: byte
    * positions explode as a primitive long sequence, each byte reads via
    * its hex pair, and ONLY (doc_id, bucket, byteval) reaches the
    * shuffle — the payload never leaves the map stage. Empty payloads
    * keep their 8 zero rows via the grid left-join (and dodge Spark's
    * sequence(1,0) = DESCENDING [1,0] trap). */
  val features = QuerySpec(
    "multimodal_features",
    (s, d) => {
      val base = payloads(s, d).select(col("doc_id"),
        hex(col("payload")).as("h"),
        octet_length(col("payload")).cast("long").as("n"))
      val sums = base.filter(col("n") > 0)
        .select(col("doc_id"), col("h"),
          explode(sequence(lit(1L), col("n"))).as("i"))
        .select(col("doc_id"), ((col("i") - 1) % 8).as("bucket"),
          expr("CAST(conv(substring(h, CAST(2*i-1 AS INT), 2), 16, 10) AS BIGINT)")
            .as("byteval"))
        .groupBy("doc_id", "bucket")
        .agg(sum(col("byteval")).as("feature_sum"))
      base.select(col("doc_id"),
          explode(sequence(lit(0L), lit(7L))).as("bucket"))
        .join(sums, Seq("doc_id", "bucket"), "left")
        .select(col("doc_id"), col("bucket"),
          coalesce(col("feature_sum"), lit(0L)).as("feature_sum"))
        .orderBy("doc_id", "bucket")
    },
    Some("""WITH base AS (
              SELECT doc_id, hex(encode(text)) AS h,
                     CAST(octet_length(encode(text)) AS BIGINT) AS n
              FROM documents),
            sums AS (
              SELECT doc_id, (i - 1) % 8 AS bucket,
                     CAST(SUM(
                       (strpos('0123456789ABCDEF', substr(h, CAST(2*i-1 AS BIGINT), 1)) - 1) * 16 +
                       (strpos('0123456789ABCDEF', substr(h, CAST(2*i AS BIGINT), 1)) - 1)
                     ) AS BIGINT) AS feature_sum
              FROM base, UNNEST(generate_series(1, n)) AS t(i)
              WHERE n > 0
              GROUP BY doc_id, (i - 1) % 8)
            SELECT g.doc_id, CAST(g.bucket AS BIGINT) AS bucket,
                   COALESCE(s.feature_sum, 0) AS feature_sum
            FROM (SELECT b.doc_id, bk.bucket
                  FROM base b
                  CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS bucket) bk) g
            LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.bucket = g.bucket
            ORDER BY g.doc_id, g.bucket""")
  )

  /** Resize planning: integer aspect-preserving scale to a 256-px max
    * dimension, never upscaling — the metadata half of a resize stage
    * (the pixel path would sit in `decodeAll`'s mapPartitions batch next
    * to the decoder; no codecs in this container). Pure integer milli
    * arithmetic so both engines agree bit-for-bit. */
  val resize = QuerySpec(
    "multimodal_resize",
    (s, d) =>
      payloads(s, d)
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("byte_len"))
        .select(col("doc_id"),
          (col("byte_len") % 640 + 16).as("width"),
          (col("byte_len") * 7 % 480 + 16).as("height"))
        .withColumn("scale_milli",
          least(lit(1000L), expr("256000 div greatest(width, height)")))
        .select(col("doc_id"), col("width"), col("height"),
          col("scale_milli"),
          greatest(expr("(width * scale_milli) div 1000"), lit(1L))
            .as("out_width"),
          greatest(expr("(height * scale_milli) div 1000"), lit(1L))
            .as("out_height"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, width, height, scale_milli,
                   greatest((width * scale_milli) // 1000, 1) AS out_width,
                   greatest((height * scale_milli) // 1000, 1) AS out_height
            FROM (SELECT doc_id, width, height,
                         least(1000, 256000 // greatest(width, height)) AS scale_milli
                  FROM (SELECT doc_id,
                               byte_len % 640 + 16 AS width,
                               (byte_len * 7) % 480 + 16 AS height
                        FROM (SELECT doc_id,
                                     CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
                              FROM documents)))
            ORDER BY doc_id""")
  )

  /** Exact media dedup through the BINARY column path — dedup_exact's
    * multimodal twin: identical blobs collapse to the smallest doc_id.
    * The hash key is md5 over the payload's HEX rendering (both engines
    * print binary as identical uppercase hex — hashing the rendering
    * sidesteps BLOB-md5 support differences), computed map-side; the
    * only shuffle is the hash group-by, so a 100 TB media corpus dedups
    * in one pass with no blob ever crossing the wire twice. */
  val mediaDedup = QuerySpec(
    "multimodal_dedup",
    (s, d) =>
      payloads(s, d)
        .groupBy(md5(hex(col("payload"))).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("dup_cnt"),
          max(octet_length(col("payload"))).cast("long").as("byte_len"))
        .orderBy("keep_id"),
    Some("""SELECT md5(hex(encode(text))) AS content_hash,
                   min(doc_id) AS keep_id, count(*) AS dup_cnt,
                   CAST(max(octet_length(encode(text))) AS BIGINT) AS byte_len
            FROM documents
            GROUP BY 1 ORDER BY keep_id""")
  )

  /** Content-defined-chunking (CDC) blob dedup — the storage-layer
    * dedup classic (LBFS/venti/restic): chunk boundaries are a pure
    * function of local CONTENT (here: position i ends a chunk iff the
    * first hex digit of md5 over the 8-char window ending at i is '0' —
    * P=1/16, expected chunk ≈ a few window lengths), so inserting or
    * deleting bytes only reshapes the chunks AROUND the edit while every
    * chunk downstream realigns — the property fixed-size blocks lack and
    * the reason production blob stores dedup at CDC chunk granularity.
    * `multimodal_dedup` is the whole-blob tier; this is the sub-blob
    * tier that catches shared content across DIFFERENT blobs.
    *
    * Character-level here (the synthetic payload is encode(text); Spark
    * substring and DuckDB substr share character semantics, so the
    * pipeline is engine-exact incl. multi-byte UTF-8) — on a real media
    * corpus the identical pipeline runs over the binary column.
    *
    * Output is the CHUNK-STORE view: one row per distinct chunk with
    * occurrence/document counts, the chunk length, and `keep_code` — the
    * canonical occurrence encoded as doc_id·2³² + start (an integer
    * composite both engines order identically; decoding is two divs).
    *
    * Scale shape: boundary detection is per-document map work (the
    * shingleRows explode discipline); extents come from a doc-PARTITIONED
    * lag window over boundary rows only (≈ len/16 rows per doc, never the
    * text); the text joins back ONCE, shuffle_hash on doc_id (positions
    * frame is corpus-derived — never broadcast); the chunk store is one
    * hash aggregate on the chunk hash. */
  val cdcChunkDedup = QuerySpec(
    "cdc_chunk_dedup",
    (s, d) => {
      val docs = documents(s, d)
        .filter(length(col("text")) >= 1)
        .select("doc_id", "text")
      // content-defined boundaries (docs shorter than the window have
      // none); sequence(8, len<8) would be DESCENDING — filter first
      val wins = docs.filter(length(col("text")) >= 8)
        .select(col("doc_id"),
          explode(sequence(lit(8), length(col("text")))).as("i"), col("text"))
        .filter(substring(md5(expr("substring(text, i - 7, 8)")), 1, 1) === "0")
        .select(col("doc_id"), col("i").cast("long").as("i"))
      // every doc ends its last chunk at len, boundary hit or not
      val ends = wins
        .unionByName(docs.select(col("doc_id"),
          length(col("text")).cast("long").as("i")))
        .distinct()
      val w = Window.partitionBy("doc_id").orderBy("i")
      val spans = ends
        .withColumn("s", coalesce(lag(col("i"), 1).over(w), lit(0L)) + 1L)
        .select(col("doc_id"), col("s"), col("i").as("e"))
      spans.join(docs.hint("shuffle_hash"), Seq("doc_id"))
        .select(col("doc_id"), col("s"), col("e"),
          expr("substring(text, CAST(s AS INT), CAST(e - s + 1 AS INT))").as("c"))
        .groupBy(md5(col("c")).as("chunk_hash"))
        .agg(count(lit(1)).as("occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("e") - col("s") + 1L).as("chunk_len"),
          min(col("doc_id") * 4294967296L + col("s")).as("keep_code"))
        .orderBy("chunk_hash")
    },
    Some("""WITH docs AS (
              SELECT doc_id, text FROM documents WHERE length(text) >= 1),
            wins AS (
              SELECT doc_id, CAST(i AS BIGINT) AS i
              FROM docs, UNNEST(generate_series(8, length(text))) AS t(i)
              WHERE substr(md5(substr(text, CAST(i AS INTEGER) - 7, 8)), 1, 1) = '0'),
            ends AS (
              SELECT DISTINCT doc_id, i FROM (
                SELECT doc_id, i FROM wins
                UNION ALL
                SELECT doc_id, CAST(length(text) AS BIGINT) FROM docs)),
            spans AS (
              SELECT doc_id,
                     COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
                     i AS e
              FROM ends),
            chunks AS (
              SELECT sp.doc_id, sp.s, sp.e,
                     substr(d.text, CAST(sp.s AS INTEGER),
                            CAST(sp.e - sp.s + 1 AS INTEGER)) AS c
              FROM spans sp JOIN docs d USING (doc_id))
            SELECT md5(c) AS chunk_hash,
                   count(*) AS occurrences,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(MIN(e - s + 1) AS BIGINT) AS chunk_len,
                   CAST(MIN(doc_id * 4294967296 + s) AS BIGINT) AS keep_code
            FROM chunks
            GROUP BY 1 ORDER BY chunk_hash""")
  )

  val all: Seq[QuerySpec] =
    Seq(meta, frames, features, resize, mediaDedup, cdcChunkDedup)
}

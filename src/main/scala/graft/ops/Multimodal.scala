package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages (builder brief). No media codecs ship in this container, so
  * the DECODE KERNEL IS A STUB — a deterministic fake that stands in
  * for e.g. a JPEG decoder — while everything Spark-side (schema,
  * typed Dataset plumbing, per-partition batch shape, partitioning)
  * is real and tested.
  *
  * The binary payload is derived deterministically from `documents`
  * (UTF-8 bytes of the text) so fixtures need no media files.
  */
object Multimodal {

  /** Typed media row: opaque bytes + metadata, the schema a media
    * lakehouse table would carry (content in its own column so
    * parquet column pruning skips the heavy bytes for metadata-only
    * queries).
    */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      content: Array[Byte],
      width: Int,
      height: Int)

  /** Extracted features for one media item. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Int,
      mean_byte: Double,
      frame_means: Array[Double])

  /** Build the typed media table from documents. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.t(s, dir, "documents").select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        // STUB decode of "image dimensions" from the payload — a real
        // pipeline would parse the media header here.
        MediaRecord(id, if (id % 2 == 0) "image" else "audio", bytes,
          width = 64 + (bytes.length % 577), height = 64 + (bytes.length % 419))
      }
  }

  /** Frame-sample + feature-extract over the binary payload,
    * per-partition batches (the shape a vectorized decoder wants:
    * one JNI/codec init per partition, then a tight loop).
    *
    * STUB KERNEL: "frames" are 16-byte windows and the "feature" is
    * the mean unsigned byte — deterministic, codec-free. Swap
    * `decodeFrames` for a real decoder without touching the plumbing.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.map { m =>
        val frames = decodeFrames(m.content)
        val means = frames.map(f =>
          f.map(b => (b & 0xff).toDouble).sum / f.length)
        MediaFeatures(m.doc_id, m.content.length.toLong, frames.length,
          if (m.content.isEmpty) 0.0
          else m.content.map(b => (b & 0xff).toDouble).sum / m.content.length,
          means)
      }
    }
  }

  /** STUB for the codec: fixed-stride frame sampling. A real build
    * replaces this with the image/audio library call.
    */
  private def decodeFrames(content: Array[Byte]): Array[Array[Byte]] =
    content.grouped(16).toArray

  /** Metadata-only query over the binary table — oracle-checked: the
    * byte-length/dimension arithmetic is engine-independent. Reads
    * only light columns (content pruned at the scan).
    */
  val qMeta = QueryDef(
    "q_multimodal_meta",
    (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(to_binary(col("text"), lit("utf-8"))).cast("long")
            .as("n_bytes"),
          (when(col("doc_id") % 2 === 0, "image").otherwise("audio"))
            .as("media_type"),
          (octet_length(to_binary(col("text"), lit("utf-8"))) % 577 + 64)
            .cast("long").as("width"),
          (octet_length(to_binary(col("text"), lit("utf-8"))) % 419 + 64)
            .cast("long").as("height"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
          AS media_type,
        CAST(octet_length(encode(text)) % 577 + 64 AS BIGINT) AS width,
        CAST(octet_length(encode(text)) % 419 + 64 AS BIGINT) AS height
      FROM documents ORDER BY doc_id"""))

  /** Full decode pipeline (typed Datasets + mapPartitions batch
    * kernel). The stub kernel's features are integer-byte arithmetic,
    * so the whole pipeline is oracle-checked: DuckDB re-derives the
    * bytes via hex(encode(text)) expansion. Byte sums are exact in
    * doubles (values ≤ 255, counts ≪ 2^45), so means divide to
    * bit-identical doubles in both engines — only the codec stub
    * itself is a stand-in, not the verification.
    */
  val qDecode = QueryDef(
    "q_multimodal_decode",
    (s, dir) =>
      extractFeatures(mediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_frames"),
          col("mean_byte"), element_at(col("frame_means"), 1).as("f0"))
        .orderBy("doc_id"),
    Some("""
      WITH b AS (
        SELECT doc_id, hex(encode(text)) AS h,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents),
      vals AS (
        SELECT doc_id, unnest(generate_series(0, n - 1)) AS i, h
        FROM b),
      agg AS (
        SELECT doc_id,
          sum(CAST('0x' || substr(h, CAST(2*i+1 AS INT), 2) AS BIGINT))
            AS s,
          sum(CASE WHEN i < 16 THEN
            CAST('0x' || substr(h, CAST(2*i+1 AS INT), 2) AS BIGINT) END)
            AS s0
        FROM vals GROUP BY doc_id)
      SELECT b.doc_id, b.n AS n_bytes,
        CAST(ceil(b.n / 16.0) AS INT) AS n_frames,
        coalesce(agg.s / CAST(b.n AS DOUBLE), 0.0) AS mean_byte,
        agg.s0 / CAST(least(b.n, 16) AS DOUBLE) AS f0
      FROM b LEFT JOIN agg USING (doc_id)
      ORDER BY b.doc_id"""))

  val all: Seq[QueryDef] = Seq(qMeta, qDecode)
}

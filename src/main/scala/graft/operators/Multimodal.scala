package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in batched
  * per-partition Scala (the JVM analog of `mapInPandas`: one iterator
  * per partition, record-at-a-time decode against a per-partition
  * initialized "codec").
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic stand-in (byte-level "features" of the
  * payload). Everything AROUND it is the real production shape:
  *  - typed schema ([[MediaRecord]] → [[MediaFeatures]]) via case-class
  *    Encoders — columnar parquet in, columnar out;
  *  - `mapPartitions`, not `map`: codec/model initialization happens
  *    once per partition (the expensive part with real decoders), and
  *    the iterator keeps the pipeline streaming — no partition-sized
  *    buffers;
  *  - partitioning is untouched: decode is embarrassingly parallel, so
  *    at 100 TB this runs as a pure map stage with zero shuffle; only
  *    the small per-kind aggregate at the end exchanges data.
  *
  * The synthetic media table derives payloads from `documents.text`
  * (4× repeated md5 bytes) so the DuckDB oracle can recompute the same
  * "features" from the md5 hex string — the decode stub is thereby
  * end-to-end verified, not just smoke-tested.
  */
object Multimodal {

  /** An opaque media blob + typed metadata (what a real pipeline would
    * carry: s3 key → bytes, modality, declared dimensions). */
  final case class MediaRecord(
    media_id: Long, kind: String, payload: Array[Byte], width: Int, height: Int)

  /** Per-record extracted features (the decode output schema). */
  final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Int, byte_sum: Long,
    first_byte: Int, frame_sum: Long)

  /** Synthetic media table: payload = unhex(md5(text) × 4) (64 bytes),
    * kind from doc_id mod 3, fake declared dims from the first two
    * payload bytes. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        unhex(repeat(md5(col("text")), 4)).as("payload"),
        (conv(substring(md5(col("text")), 1, 2), 16, 10).cast("int") + 1).as("width"),
        (conv(substring(md5(col("text")), 3, 2), 16, 10).cast("int") + 1).as("height"))
      .as[MediaRecord]
  }

  /** Batched decode / feature extraction.
    *
    * STUB: a real deployment replaces the body of `features` with the
    * actual codec call (JavaCV/TwelveMonkeys/ffmpeg-bridge decode →
    * resize → frame-sample → embed). This container ships no codecs, so
    * the "decoded features" are deterministic byte-level stats — same
    * signature, same batching, same schema as the real thing. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition init happens HERE with a real codec (expensive).
      records.map { r =>
        val bytes = r.payload
        var byteSum = 0L
        var i = 0
        while (i < bytes.length) { byteSum += bytes(i) & 0xff; i += 1 }
        // "frame sampling": every 8th byte, the stand-in for decoding
        // one frame per stride and pooling it.
        var frameSum = 0L
        var k = 0
        while (k < bytes.length) { frameSum += bytes(k) & 0xff; k += 8 }
        MediaFeatures(r.media_id, r.kind, bytes.length, byteSum,
          if (bytes.nonEmpty) bytes(0) & 0xff else -1, frameSum)
      }
    }
  }

  /** Per-kind feature rollup over the decoded stream. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    decodeStub(mediaTable(s, dir))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(col("byte_sum")).as("byte_sum"),
        min(col("first_byte")).as("min_first"),
        max(col("first_byte")).as("max_first"),
        sum(col("frame_sum")).as("frame_sum"))
      .orderBy("kind")

  /** DuckDB twin: payload bytes are md5(text) bytes repeated 4× —
    * byte k = md5byte[k mod 16], so byte_sum = 4·Σ md5bytes and the
    * stride-8 frame sample hits md5 bytes 1 and 9 four times each. */
  val mediaFeaturesSql: String =
    """WITH mb AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS kind,
      |         list_transform(generate_series(1, 16),
      |           i -> CAST('0x' || substr(md5(text), 2*i - 1, 2) AS BIGINT)) AS b
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, kind,
      |         64 AS n_bytes,
      |         4 * list_sum(b) AS byte_sum,
      |         b[1] AS first_byte,
      |         4 * (b[1] + b[9]) AS frame_sum
      |  FROM mb)
      |SELECT kind, count(*) AS n_media,
      |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |       CAST(sum(byte_sum) AS BIGINT) AS byte_sum,
      |       CAST(min(first_byte) AS INT) AS min_first,
      |       CAST(max(first_byte) AS INT) AS max_first,
      |       CAST(sum(frame_sum) AS BIGINT) AS frame_sum
      |FROM f GROUP BY kind ORDER BY kind""".stripMargin

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q31_media_features", mediaFeatures, Some(mediaFeaturesSql)),
  )
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery

/** Multimodal columns (north star): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode / feature-
  * extract / thumbnail / frame-sample over them.
  *
  * The Spark-side plumbing is real: an explicit media schema
  * (payload BINARY + meta STRUCT), a typed Dataset, and a batched
  * `mapPartitions` feature extractor — the Scala analog of
  * `mapInPandas` (partition-local, batch-at-a-time, no shuffle; at
  * 100 TB each task decodes its own split and only the small feature
  * rows move). The DECODE ITSELF IS A STUB: this container has no
  * image/audio codecs, so [[FakeCodec]] deterministically fabricates
  * "pixels" from the payload bytes; swapping in a real codec is one
  * `MediaCodec` implementation, nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, format: String, n_bytes: Long, checksum: String,
      thumb_w: Int, thumb_h: Int, n_sampled: Int, mean_intensity: Double)

  /** What a decoder returns: a frame-major intensity raster. */
  final case class Decoded(pixels: Array[Int], frames: Seq[Int])

  /** Codec contract — a real implementation would bind an image/audio
    * library here. */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta): Decoded
  }

  /** STUB codec (deterministic fake): "pixels" are the unsigned
    * payload bytes; "frame sampling" takes every max(1, n_frames/4)-th
    * frame index. Real decode is impossible in this container (no
    * media libraries) — the point is that schema, batching and
    * partitioning around it are real. */
  object FakeCodec extends MediaCodec {
    def decode(payload: Array[Byte], meta: MediaMeta): Decoded = {
      val step = math.max(1, meta.n_frames / 4)
      Decoded(payload.map(_ & 0xff), 0 until meta.n_frames by step)
    }
  }

  /** Deterministic media table synthesized from `documents` (the
    * fixtures carry no binary columns): payload = UTF-8 bytes of the
    * text, metadata derived from doc_id/n_chars. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END")
          .as("format"),
        (lit(16) + (col("n_chars") % 64)).cast("int").as("width"),
        (lit(16) + (col("n_chars") % 48)).cast("int").as("height"),
        (lit(1) + (col("doc_id") % 30)).cast("int").as("n_frames")).as("meta"))

  /** Batched mapPartitions feature extraction (mapInPandas-shaped):
    * the iterator is consumed in `batchSize` groups so a real decoder
    * could amortize model/codec setup per batch, exactly like an
    * Arrow batch in mapInPandas. Thumbnail is a /8 "resize" (stub:
    * dimensions only), frame-sample comes from the codec. */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec = FakeCodec,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val d = codec.decode(r.payload, r.meta)
          val mean =
            if (d.pixels.isEmpty) 0.0
            else d.pixels.map(_.toLong).sum.toDouble / d.pixels.length
          MediaFeatures(
            media_id = r.media_id,
            format = r.meta.format,
            n_bytes = r.payload.length.toLong,
            checksum = java.security.MessageDigest.getInstance("MD5")
              .digest(r.payload).map("%02x".format(_)).mkString,
            thumb_w = r.meta.width / 8,
            thumb_h = r.meta.height / 8,
            n_sampled = d.frames.size,
            mean_intensity = mean)
        }
      }
    }
  }
}

/** Q25 — the multimodal pipeline end-to-end THROUGH the codec path:
  * media table → typed Dataset → batched mapPartitions decode/extract
  * → per-row features. The DuckDB oracle recomputes the deterministic
  * stub's arithmetic over the text equivalents (md5 of the UTF-8
  * payload, /8 thumbnail dims, ceil(n_frames/step) sampled frames),
  * so the whole mapPartitions plumbing is hash-checked. */
object Q25MultimodalFeatures extends GraftQuery {
  import Multimodal._
  val name = "q25_multimodal_features"
  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir).as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("media_id"), col("format"), col("n_bytes"), col("checksum"),
        col("thumb_w"), col("thumb_h"), col("n_sampled"))
      .orderBy(col("media_id"))
  }
  // mean_intensity is checked by MultimodalSpec, not the oracle: DuckDB
  // cannot fold over BLOB bytes without generating per-byte rows.
  val oracle = Some("""
    WITH m AS (
      SELECT doc_id AS media_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        octet_length(encode(text)) AS n_bytes,
        md5(text) AS checksum,
        CAST(16 + (n_chars % 64) AS INT) AS width,
        CAST(16 + (n_chars % 48) AS INT) AS height,
        CAST(1 + (doc_id % 30) AS INT) AS n_frames
      FROM documents)
    SELECT media_id, format, n_bytes, checksum,
      CAST(width // 8 AS INT) AS thumb_w,
      CAST(height // 8 AS INT) AS thumb_h,
      CAST(CASE WHEN n_frames // 4 <= 1 THEN n_frames
                ELSE (n_frames + (n_frames // 4) - 1) // (n_frames // 4) END AS INT) AS n_sampled
    FROM m ORDER BY media_id
  """.trim)
}

/** Q25b — AUDIO feature extraction through the same batched codec
  * plumbing: 'wav'-format media rows (the modality-dispatch filter a
  * real pipeline applies before binding an audio decoder) decoded as
  * unsigned 8-bit PCM centered at 128, reduced per clip to sample
  * count, energy, zero-crossing count, peak amplitude and
  * 1024-sample window count.
  *
  * Determinism is designed in the q36/q53 style: every accumulator is
  * an EXACT integer (Σs², crossings, peak — order-independent,
  * engine-exact); the only float, rms, is derived at the end as
  * sqrt(one IEEE division), both operations correctly rounded, so the
  * value is bit-identical in any engine. That makes the whole
  * mapPartitions decode path hash-checkable by the DuckDB oracle,
  * which replays the arithmetic per character (the synthetic payload
  * is ASCII, so text position == byte) — unlike q25's
  * mean_intensity, nothing here is spec-only.
  *
  * At 100 TB the shape is the one that matters: a map-only batched
  * pass (codec work per batch, not per row), no shuffle until the
  * final ORDER BY; real audio swaps FakeCodec for a PCM/opus binding
  * and the frame changes from bytes to samples — the plumbing,
  * batching and exact-integer feature contract stay. */
object Q25bAudioFeatures extends GraftQuery {
  import Multimodal._
  val name = "q25b_audio_features"
  val WindowSamples = 1024

  final case class AudioFeatures(media_id: Long, n_samples: Long,
    sum_sq: Long, zero_crossings: Long, peak: Int, n_windows: Long,
    rms: Double)

  private[graft] def extractAudio(media: Dataset[MediaRow],
      codec: MediaCodec = FakeCodec,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val d = codec.decode(r.payload, r.meta)
          var n = 0L; var sumSq = 0L; var zc = 0L
          var peak = 0; var prev = 0
          d.pixels.foreach { p =>
            val s = p - 128
            n += 1; sumSq += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (n > 1 && prev * s < 0) zc += 1
            prev = s
          }
          AudioFeatures(r.media_id, n, sumSq, zc, peak,
            (n + WindowSamples - 1) / WindowSamples,
            if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
        }
      }
    }
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wav = mediaTable(spark, dir)
      .filter(col("meta.format") === "wav").as[MediaRow]
    // Zero-length clips are DROPPED from the report (the oracle's
    // per-character unnest yields no rows for them, and a clip with
    // no samples has no features worth a row); extractAudio itself
    // still handles them — its all-zero row is the codec-path
    // contract MultimodalSpec pins for composing callers.
    extractAudio(wav).toDF()
      .filter(col("n_samples") > 0)
      .orderBy(col("media_id"))
  }

  /** Per-character replay of the PCM arithmetic (ASCII payload ⇒ text
    * position == byte); crossings via lag over sample index. */
  val oracle = Some(s"""
    WITH m AS (
      SELECT doc_id AS media_id, text FROM documents
      WHERE CAST(doc_id % 3 AS INT) = 2),
    b AS (
      SELECT media_id, i, ascii(substr(text, CAST(i AS INT), 1)) - 128 AS s
      FROM m, unnest(range(1, length(text) + 1)) AS t(i)),
    z AS (
      SELECT media_id, i, s,
        lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
      FROM b)
    SELECT media_id,
      count(*) AS n_samples,
      CAST(SUM(s * s) AS BIGINT) AS sum_sq,
      CAST(SUM(CASE WHEN prev IS NOT NULL AND prev * s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
      CAST(MAX(abs(s)) AS INT) AS peak,
      (count(*) + ${WindowSamples - 1}) // $WindowSamples AS n_windows,
      CASE WHEN count(*) = 0 THEN 0.0
           ELSE sqrt(CAST(SUM(s * s) AS DOUBLE) / count(*)) END AS rms
    FROM z GROUP BY media_id ORDER BY media_id
  """.trim)
}

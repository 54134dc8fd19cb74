package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** The multimodal plumbing: typed schema, batch shape, partition-
  * locality; q25's features are byte-level + metadata arithmetic (the
  * opaque-binary tier, round 19), and the audio assertions run the
  * REAL RIFF/WAVE codec roundtrip (8-bit PCM is lossless, so the
  * hand-derived sample arithmetic holds byte-exact). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = mediaTable(spark, sf).as[MediaRow]

  test("media schema: binary payload + typed metadata struct") {
    val sch = mediaTable(spark, sf).schema
    assert(sch("payload").dataType.typeName === "binary")
    assert(sch("meta").dataType.typeName === "struct")
  }

  test("feature extraction is deterministic and checksum matches md5 of payload") {
    val a = extractFeatures(media).collect().sortBy(_.media_id)
    val b = extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.toSeq === b.toSeq)
    // spot-check one checksum against Spark's own md5
    val expect = mediaTable(spark, sf)
      .select(col("media_id"), md5(col("payload")).as("m"))
      .as[(Long, String)].collect().toMap
    a.foreach(f => assert(f.checksum === expect(f.media_id)))
  }

  test("mean_intensity equals the unsigned-byte mean of the payload") {
    val rows = media.collect().map(r => r.media_id ->
      (if (r.payload.isEmpty) 0.0
       else r.payload.map(b => (b & 0xff).toLong).sum.toDouble / r.payload.length)).toMap
    extractFeatures(media).collect().foreach { f =>
      assert(f.mean_intensity === rows(f.media_id))
    }
  }

  test("mapPartitions consumes the iterator in bounded batches") {
    // a codec that records the largest observed batch via decode calls
    // cannot see batch boundaries; instead check grouped() semantics by
    // running with batchSize 7 and asserting identical output to 64
    val small = extractFeatures(media, batchSize = 7)
      .collect().sortBy(_.media_id).toSeq
    val big = extractFeatures(media, batchSize = 64)
      .collect().sortBy(_.media_id).toSeq
    assert(small === big)
  }

  test("frame sampling: every max(1, n_frames/4)-th frame") {
    assert(Multimodal.sampledFrames(10) === Seq(0, 2, 4, 6, 8)) // step = 2
    assert(Multimodal.sampledFrames(3) === Seq(0, 1, 2)) // step = 1
  }

  test("q25b audio: exact-integer features on crafted PCM, hand-derived") {
    import spark.implicits._
    import graft.multimodal.Q25bAudioFeatures
    // samples (byte-128): [10, -20, 30, 0, -5] — crossings at
    // 10→-20, -20→30, 30→0 is NOT one (product 0), 0→-5 is not one;
    // peak 30; sum_sq = 100+400+900+0+25 = 1425
    val payload = Array[Byte](138.toByte, 108.toByte, 158.toByte,
      128.toByte, 123.toByte)
    val media = Seq(
        MediaRow(1L, Multimodal.encodeWav(payload), MediaMeta("wav", 16, 16, 1)),
        MediaRow(2L, Multimodal.encodeWav(Array.empty[Byte]),
          MediaMeta("wav", 16, 16, 1)))
      .toDS()
    val out = Q25bAudioFeatures.extractAudio(media, codec = WavCodec).collect()
      .map(f => f.media_id -> f).toMap
    val f1 = out(1L)
    assert(f1.n_samples === 5L)
    assert(f1.sum_sq === 1425L)
    assert(f1.zero_crossings === 2L)
    assert(f1.peak === 30)
    assert(f1.n_windows === 1L)
    assert(f1.rms === math.sqrt(1425.0 / 5))
    // empty clip: all-zero features, rms guard takes the 0.0 branch
    val f2 = out(2L)
    assert(f2.n_samples === 0L && f2.sum_sq === 0L && f2.peak === 0 &&
      f2.zero_crossings === 0L && f2.n_windows === 0L && f2.rms === 0.0)
  }

  test("q25b audio: window count rounds up at the 1024-sample boundary") {
    import spark.implicits._
    import graft.multimodal.Q25bAudioFeatures
    val sizes = Seq(1023, 1024, 1025)
    val media = sizes.zipWithIndex.map { case (n, i) =>
      MediaRow(i.toLong, Multimodal.encodeWav(Array.fill(n)(128.toByte)),
        MediaMeta("wav", 16, 16, 1))
    }.toDS()
    val got = Q25bAudioFeatures.extractAudio(media, codec = WavCodec).collect()
      .map(f => f.media_id -> f.n_windows).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 2L))
  }

}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.multimodal.{Multimodal, Q25dImageNearDup, Q25eVideoScenes,
  Q25iVideoNearDup, Q25jVideoDedupStore}

/** Round 13: the VIDEO dedup column (q25i near-dup, q25j store, s22
  * stream) — [[graft.multimodal.BandedHashStore]] instantiated over
  * the temporal-pooled frame fingerprint. The generic store
  * machinery's plan posture is pinned by the image/audio twins (same
  * code); these tests pin what is NEW: the video fingerprint's
  * invariances (exact re-upload at Hamming 0, TRIM-invariance of the
  * temporal pool for cut-free footage), the verdict semantics on
  * crafted videos, and the stream twin's agreement + state backend. */
class Round13bSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r13vid").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  /** The q40 split key, replayed in-JVM so the crafted fixture can
    * pick video ids (≡ 1 mod 3) landing on the split it needs. */
  private def splitOf(id: Long): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ("0123456789abcdef".indexOf(md5.last) < 13) "train" else "test"
  }

  /** Whether the fixture's cut schedule fires anywhere in id's video
    * (nf = 1 + id%30 frames; a cut at frame f iff (id·31+f) % 7 == 0).
    * Cut-FREE videos are every-frame-identical stills, the fixture
    * shape the trim-invariance test needs. */
  private def cutFree(id: Long): Boolean =
    (1 until (1 + id % 30).toInt).forall(f => (id * 31 + f) % 7 != 0)

  private def videoIds(split: String, wantCutFree: Boolean): Iterator[Long] =
    Iterator.iterate(1L)(_ + 3)
      .filter(id => splitOf(id) == split && cutFree(id) == wantCutFree)

  private def featsOf(rows: Seq[(Long, String)]): DataFrame =
    Q25iVideoNearDup.extractFingerprints(Q25eVideoScenes.videoFrames(
      Multimodal.mediaFrame(
        rows.map { case (id, t) => (id, t, t.length.toLong) }
          .toDF("doc_id", "text", "n_chars"))))

  private def ham(a: String, b: String): Int = (0 until 8).map { j =>
    java.lang.Long.bitCount(
      java.lang.Long.parseLong(a.substring(j * 2, j * 2 + 2), 16) ^
        java.lang.Long.parseLong(b.substring(j * 2, j * 2 + 2), 16))
  }.sum

  // Structured "footage" text: grid samples vary across both axes so
  // the pooled dHash has mixed bits (asserted below — a flat raster
  // would hash all-zeros and alias everything flat).
  private val footage =
    ("the quick brown fox jumps over the lazy dog 0123456789 " +
      "ZYXWVUTSRQPONMLKJIHGFEDCBA ~!@#$%^&*()_+ ") * 5
  // Flat raster: every grid sample equal → all pooled deltas 0.
  private val noise = "m" * footage.length

  test("q25i: exact re-upload at hamming 0; a TRIMMED cut-free copy is hamming 0 too (temporal pool is length-invariant); unrelated footage is far") {
    // Three cut-free video ids with the same text → identical stills.
    // v1/v2: same text (exact re-upload). v3: same text but a
    // DIFFERENT frame count (a trim) — the pooled sums scale by the
    // frame count, which cannot flip any pooled comparison, so the
    // fingerprint is bit-identical: trims of static footage dedup
    // exactly. v4: unrelated (flat) footage, far in Hamming space.
    val Seq(v1, v2) = videoIds("train", wantCutFree = true).take(2).toSeq
    // v3: a genuine TRIM — same footage, different frame count.
    val v3 = videoIds("train", wantCutFree = true)
      .dropWhile(id => id == v1 || id == v2 || id % 30 == v1 % 30).next()
    val v4 = videoIds("train", wantCutFree = true)
      .dropWhile(id => Seq(v1, v2, v3).contains(id)).next()
    assert((1 + v3 % 30) != (1 + v1 % 30)) // frame counts differ
    val fp = featsOf(Seq((v1, footage), (v2, footage), (v3, footage),
        (v4, noise))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(v1) == fp(v2), s"re-upload must fingerprint identically")
    assert(fp(v1) == fp(v3),
      s"cut-free trim must fingerprint identically (temporal pooling)")
    // Mixed bits: the fingerprint is doing spatial work.
    assert(fp(v1) != "0000000000000000" && fp(v1) != "ffffffffffffffff",
      s"degenerate fingerprint ${fp(v1)}")
    assert(ham(fp(v1), fp(v4)) > Q25dImageNearDup.MaxHamming,
      s"fixture aliasing: flat footage landed within threshold " +
        s"(${fp(v1)} vs ${fp(v4)})")
  }

  test("q25j: crafted delta — re-uploaded video dups to the LOWEST base, unrelated is new; delta plan scans only the video store; s22 agrees on RocksDB state") {
    val Seq(t1, t2) = videoIds("train", wantCutFree = true).take(2).toSeq
    val Seq(d1, d2) = videoIds("test", wantCutFree = true).take(2).toSeq
    val dir = writeDocs(Seq((t1, footage), (t2, footage), (d1, footage),
      (d2, noise)))
    graft.plans.Stores.evict(spark, "graft_vidstore")
    try {
      val df = Q25jVideoDedupStore.run(spark, dir)
      val got = df.collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq.sortBy(_._1)
      assert(got == Seq((d1, "dup", math.min(t1, t2), 0L),
          (d2, "new", -1L, -1L)).sortBy(_._1),
        s"unexpected verdicts: $got (t1=$t1 t2=$t2 d1=$d1 d2=$d2)")
      // The delta plan reads ONLY the persisted video store (the
      // delta fingerprints sit behind a checkpoint) — the generic
      // posture, bound to the video prefix.
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scans = flattenPlan(df.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty && scans.forall(_.tableIdentifier.exists(
          _.table.startsWith("graft_vidstore"))),
        s"q25j's delta plan must scan only the video store, found: " +
          scans.flatMap(_.tableIdentifier).mkString(", "))
      // The streaming twin agrees row for row on the same store, and
      // its growing verdict state engages the RocksDB default.
      import graft.streaming.{S22StreamVideoDedupStore, StreamQueries}
      val s22 = S22StreamVideoDedupStore.run(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq.sortBy(_._1)
      assert(s22 == got, s"s22 diverged from q25j: $s22 vs $got")
      assert(StreamQueries.lastStateMetrics
          .exists(_.toLowerCase.contains("rocksdb")),
        s"s22 must engage RocksDB, got: ${StreamQueries.lastStateMetrics}")
    } finally {
      graft.plans.Stores.evict(spark, "graft_vidstore")
      cleanup(dir)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Decomposition probe for the audio store's fourth-decade cost
  * (VERDICT r18 #1: q25h build 368 s / serve 129 s at 1000× vs the
  * image twin's 9.9 / 14.4 — yet the isolated WAV codec roundtrip is
  * CHEAPER than PNG per item). Separates, per decade dir:
  *   1. the raw wav-row materialization (encodeWav pass),
  *   2. the full fingerprint pass (encode + javax.sound decode +
  *      energy contour),
  *   3. the image twin's full fingerprint pass (PNG encode + decode),
  *   4. distinct-hash counts on both sides (collapse sizes — the
  *      band-store row count and join density driver),
  *   5. the band write and the verdict join, isolated.
  * Run via `Test/runMain graft.DiagAudio [dir ...]`. */
object DiagAudio {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_scale100")
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    import graft.multimodal._
    import graft.queries.Q40TrainTestSplit
    dirs.foreach { dir =>
      println(s"DIAG dir=$dir")
      val media = Multimodal.mediaTable(spark, dir)
      val nWav = media.filter(col("meta.format") === "wav").count()
      val nPng = media.filter(col("meta.format") === "png").count()
      println(s"DIAG n_wav=$nWav n_png=$nPng")
      // 1. encodeWav pass only
      val tEnc = t {
        Multimodal.wavRows(media).toDF()
          .select(length(col("payload")).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      // 2. full audio fingerprint pass
      val tAfp = t {
        Q25gAudioNearDup.extractFingerprints(
            Multimodal.wavRows(media), codec = Multimodal.WavCodec).toDF()
          .write.format("noop").mode("overwrite").save()
      }
      // 3. image fingerprint pass
      val tIfp = t {
        Q25cImageFeatures.extractImageFeatures(
            Q25cImageFeatures.imageFrames(media)).toDF()
          .write.format("noop").mode("overwrite").save()
      }
      println(f"DIAG t_wav_encode=$tEnc%.1f t_audio_fp=$tAfp%.1f t_image_fp=$tIfp%.1f")
      // 4. distinct-hash counts (train split, the store side)
      val audTrain = Q25hAudioDedupStore.featsOf(spark, dir, "train")
        .localCheckpoint()
      val imgTrain = Q25cImageFeatures.extractImageFeatures(
          Q25cImageFeatures.imageFrames(media
            .filter(Q40TrainTestSplit.splitColOf("media_id") === "train")))
        .toDF().select(col("media_id"), col("dhash")).localCheckpoint()
      val nAudTrain = audTrain.count()
      val nAudDistinct = audTrain.select("dhash").distinct().count()
      val nImgTrain = imgTrain.count()
      val nImgDistinct = imgTrain.select("dhash").distinct().count()
      println(s"DIAG aud_train=$nAudTrain aud_distinct=$nAudDistinct " +
        s"img_train=$nImgTrain img_distinct=$nImgDistinct")
      // 5. band write + verdict join isolated (audio), from cached feats
      val store = Q25hAudioDedupStore.store
      val tBandWrite = t {
        store.bandRows(store.collapse(audTrain))
          .write.format("noop").mode("overwrite").save()
      }
      val audTest = Q25hAudioDedupStore.featsOf(spark, dir, "test")
        .localCheckpoint()
      val storeF = store.bandRows(store.collapse(audTrain))
        .select(col("bkey"), col("media_id").as("base_id"),
          col("dhash").as("base_dhash"))
        .localCheckpoint(true)
      val tVerdict = t {
        store.verdictFrame(store.collapse(audTest), storeF)
          .write.format("noop").mode("overwrite").save()
      }
      val tVerdict2 = t {
        store.verdictFrame(store.collapse(audTest), storeF)
          .write.format("noop").mode("overwrite").save()
      }
      val nCand = store.candidates(store.collapse(audTest), storeF).count()
      val nCandRaw = store.bandRows(store.collapse(audTest))
        .join(storeF, Seq("bkey")).count()
      println(f"DIAG t_band_rows=$tBandWrite%.1f t_verdict_join=$tVerdict%.1f " +
        f"t_verdict_join2=$tVerdict2%.1f n_cand=$nCand n_cand_raw=$nCandRaw")
      // 6. full lifecycle, as ScaleBench times it
      graft.plans.Stores.evict(spark, "graft_audstore")
      val tBuild = t(Q25hAudioDedupStore.ensureStore(spark, dir))
      val tServe = t(Q25hAudioDedupStore.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      graft.plans.Stores.evict(spark, "graft_audstore")
      println(f"DIAG t_q25h_build=$tBuild%.1f t_q25h_serve=$tServe%.1f")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Image-store build decomposition at the deep decades (round 19):
  * q25f build measured 204 s at 1000× after the audio fixes — name
  * the term: codec pass vs collapse vs band write. */
object DiagImg {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale1000"
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    import graft.multimodal._
    import graft.queries.Q40TrainTestSplit
    val media = Multimodal.mediaTable(spark, dir)
      .filter(Q40TrainTestSplit.splitColOf("media_id") === "train")
    val nPng = media.filter(col("meta.format") === "png").count()
    println(s"DIAG n_png_train=$nPng")
    // encode-only pass
    val tEnc = t {
      Q25cImageFeatures.imageFrames(media).toDF()
        .select(length(col("payload")).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"DIAG t_png_encode=$tEnc%.1f")
    // encode + decode + dhash
    val tFp = t {
      Q25cImageFeatures.extractImageFeatures(
          Q25cImageFeatures.imageFrames(media)).toDF()
        .write.format("noop").mode("overwrite").save()
    }
    println(f"DIAG t_image_fp=$tFp%.1f")
    val feats = Q25cImageFeatures.extractImageFeatures(
        Q25cImageFeatures.imageFrames(media)).toDF()
      .select(col("media_id"), col("dhash")).localCheckpoint()
    val nDistinct = feats.select("dhash").distinct().count()
    println(s"DIAG img_train=${feats.count()} img_distinct=$nDistinct")
    val store = Q25fImageDedupStore.store
    val tWrite = t {
      graft.plans.Stores.dropManaged(spark, "r19_diag_imgbands")
      graft.plans.Bucketing.writeBucketed(
        store.bandRows(store.collapse(feats)).withColumn("_adm", lit(-1L)),
        "r19_diag_imgbands", "bkey", 16)
      graft.plans.Stores.dropManaged(spark, "r19_diag_imgbands")
    }
    println(f"DIAG t_band_write=$tWrite%.1f")
    spark.stop()
  }
}

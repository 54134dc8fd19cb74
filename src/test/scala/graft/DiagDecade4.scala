package graft

import org.apache.spark.sql.functions._

/** Fourth-decade (1000×) decomposition probe for the two store rows
  * ScaleBench measured superlinear on the 1000-vs-100 hop
  * (q25d_bands16 27.6×, q25f_store_build 19.0× for ×10 data): times
  * each stage of both surfaces independently — PNG codec pass,
  * multiplicity profile, top-k arm, store collapse, banded bucketed
  * write — and prints the hash-entropy shape (distinct hashes, max
  * group, dispatch scalar) so the superlinear term can be NAMED
  * rather than guessed. Not a test; run via
  * `Test/runMain graft.DiagDecade4 [dir ...]` (defaults to the
  * ScaleBench third- and fourth-decade corpora). */
object DiagDecade4 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_scale100", "/tmp/graft_scale1000")
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    import graft.multimodal.{Multimodal, Q25cImageFeatures, Q25dImageNearDup, Q25fImageDedupStore}
    import graft.queries.Q40TrainTestSplit
    dirs.foreach { dir =>
      println(s"DIAG dir=$dir")
      // --- q25d_bands16 decomposition (full-corpus surface) ---
      val featsDf = Q25cImageFeatures.extractImageFeatures(
          Q25cImageFeatures.imageTable(spark, dir)).toDF()
        .select(col("media_id"), col("dhash"))
      var feats: org.apache.spark.sql.DataFrame = null
      val tCodec = t { feats = featsDf.localCheckpoint() }
      val n = feats.count()
      val prof = feats.groupBy(col("dhash")).count()
        .agg(count(lit(1)), max(col("count")),
          coalesce(sum(expr("least(count, 26) * (least(count, 26) - 1) div 2")), lit(0L)))
        .head()
      val (distinctH, maxG, withinN) =
        (prof.getLong(0), prof.getLong(1), prof.getLong(2))
      println(f"DIAG q25d codec=$tCodec%.1f n=$n distinct=$distinctH " +
        f"maxGroup=$maxG within26=$withinN")
      val tTop = t { Q25dImageNearDup.topPairs(feats, bandBits = 16)
        .write.format("noop").mode("overwrite").save() }
      println(f"DIAG q25d topPairs(post-codec)=$tTop%.1f")
      // --- q25f_store_build decomposition (train-split store) ---
      var train: org.apache.spark.sql.DataFrame = null
      val tTrainCodec = t {
        train = Q25cImageFeatures.extractImageFeatures(
            Q25cImageFeatures.imageFrames(Multimodal.mediaTable(spark, dir)
              .filter(Q40TrainTestSplit.splitColOf("media_id") === "train")))
          .toDF().select(col("media_id"), col("dhash")).localCheckpoint()
      }
      var coll: org.apache.spark.sql.DataFrame = null
      val tCollapse = t { coll = Q25fImageDedupStore.collapse(train).localCheckpoint() }
      val nColl = coll.count()
      val bandRows = Q25fImageDedupStore.bandRows(coll)
      val occ = bandRows.groupBy(col("bkey")).count()
        .agg(count(lit(1)), max(col("count")), sum(col("count") * col("count")))
        .head()
      println(f"DIAG q25f trainCodec=$tTrainCodec%.1f collapse=$tCollapse%.1f " +
        f"distinctTrain=$nColl buckets=${occ.getLong(0)} maxOcc=${occ.getLong(1)} " +
        f"sumOcc2=${occ.getLong(2)}")
      val tmpT = "graft_diag_decade4_bands"
      spark.sql(s"DROP TABLE IF EXISTS $tmpT")
      val tWrite = t { graft.plans.Bucketing.writeBucketed(
        bandRows, tmpT, "bkey", 16) }
      spark.sql(s"DROP TABLE IF EXISTS $tmpT")
      println(f"DIAG q25f bandWrite=$tWrite%.1f")
      feats.unpersist(); train.unpersist(); coll.unpersist()
    }
    spark.stop()
  }
}

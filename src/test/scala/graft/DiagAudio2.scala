package graft

import org.apache.spark.sql.functions._

/** Second-stage decomposition of the banded verdict join (round 19):
  * after the SPI + bit-arithmetic fixes the join still costs ~12 s at
  * 100× — separate the join itself, the first-shared filter, the
  * aggregation, and measure bucket skew. */
object DiagAudio2 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale100"
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    import graft.multimodal._
    val store = Q25hAudioDedupStore.store
    val audTrain = Q25hAudioDedupStore.featsOf(spark, dir, "train")
      .localCheckpoint()
    val audTest = Q25hAudioDedupStore.featsOf(spark, dir, "test")
      .localCheckpoint()
    val storeF = store.bandRows(store.collapse(audTrain))
      .select(col("bkey"), col("media_id").as("base_id"),
        col("dhash").as("base_dhash"))
      .localCheckpoint(true)
    val deltaC = store.collapse(audTest).localCheckpoint(true)
    println(s"DIAG store_rows=${storeF.count()} delta_hashes=${deltaC.count()}")
    // bucket skew
    val topStore = storeF.groupBy("bkey").count()
      .orderBy(col("count").desc).limit(5).collect()
      .map(r => r.getString(0) + "=" + r.getLong(1)).mkString(",")
    println(s"DIAG top_store_buckets=$topStore")
    val tJoin = t {
      store.bandRows(deltaC).join(storeF, Seq("bkey"))
        .select(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    val tJoinFilter = t {
      store.candidates(deltaC, storeF)
        .select(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    val tFull = t {
      store.verdictFrame(deltaC, storeF)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"DIAG t_join_only=$tJoin%.1f t_join_filter=$tJoinFilter%.1f t_full=$tFull%.1f")
    spark.stop()
  }
}

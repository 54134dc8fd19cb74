package graft
import org.apache.spark.sql.functions._
object DiagAud {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/tmp/graft_scale100"
    import graft.multimodal.{Multimodal, Q25gAudioNearDup, Q25hAudioDedupStore}
    import graft.queries.Q40TrainTestSplit
    val feats = Q25gAudioNearDup.extractFingerprints(
        Multimodal.wavRows(Multimodal.mediaTable(spark, dir))).toDF()
      .select(col("media_id"), col("ahash").as("dhash"),
        Q40TrainTestSplit.splitColOf("media_id").as("sp"))
      .localCheckpoint()
    val n = feats.count()
    val d = feats.select("dhash").distinct().count()
    println(s"DIAG wav rows=$n distinct=$d")
    // candidate pairs of the 8-bit banded join between distinct train
    // hashes (store side) and distinct test hashes (delta side)
    val tr = feats.filter(col("sp") === "train").select(col("dhash")).distinct()
    val te = feats.filter(col("sp") === "test").select(col("dhash")).distinct()
    println(s"DIAG trainDistinct=${tr.count()} testDistinct=${te.count()}")
    val st = Q25hAudioDedupStore.store
    val cands = st.bandRows(tr.withColumn("media_id", lit(0L)))
      .select(col("bkey"), col("dhash").as("h1"))
      .join(st.bandRows(te.withColumn("media_id", lit(1L)))
        .select(col("bkey"), col("dhash").as("h2")), "bkey")
    println(s"DIAG bandCandidates=${cands.count()}")
    spark.stop()
  }
}

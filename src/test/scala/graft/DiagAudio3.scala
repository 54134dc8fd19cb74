package graft

import org.apache.spark.sql.functions._

/** Third-stage probe: where do the candidate join's 10+ s go —
  * row width, expression eval, or skew? Prints the executed plan and
  * times variants. */
object DiagAudio3 {
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
    // (a) join carrying ALL columns, no filter, count
    val allCols = store.bandRows(deltaC).join(storeF, Seq("bkey"))
    val tAll = t { allCols.select(count(lit(1)))
      .write.format("noop").mode("overwrite").save() }
    // (b) full rows to noop (materialize row width), no filter
    val tAllRows = t { allCols.write.format("noop").mode("overwrite").save() }
    // (c) candidates (filter on)
    val cand = store.candidates(deltaC, storeF)
    val tCand = t { cand.write.format("noop").mode("overwrite").save() }
    println(f"DIAG t_allcols_count=$tAll%.1f t_allrows_noop=$tAllRows%.1f t_cand=$tCand%.1f")
    cand.explain("formatted")
    spark.stop()
  }
}

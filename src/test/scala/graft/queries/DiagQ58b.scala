package graft.queries

import org.apache.spark.sql.functions._

/** r20 diagnostic: q58b phase split — audit+lines checkpoint, shard
  * write, manifest+sort — and the checkpoint's partition count. */
object DiagQ58b {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diag] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    try graft.SparkEntry.all.head.run(spark, sf)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val lines = t("linesFrame checkpoint") {
        Q58bShardExport.linesFrame(spark, sf).localCheckpoint(true)
      }
      println(s"[diag] checkpoint partitions = ${lines.rdd.getNumPartitions}, rows = ${lines.count()}")
      val out = graft.plans.Stores.snapPath(spark, "graft_diag58b", sf)
      t("shard text write") {
        lines.repartition(col("lang"), col("shard_id"))
          .sortWithinPartitions(col("lang"), col("shard_id"), col("doc_id"),
            col("chunk_id"))
          .select(col("line").as("value"), col("lang"), col("shard_id"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("lang", "shard_id").text(out)
      }
      t("manifest + sort (noop)") {
        Q58bShardExport.manifestOf(lines)
          .orderBy(col("lang"), col("shard_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

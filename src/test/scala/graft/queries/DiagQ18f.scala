package graft.queries

import org.apache.spark.sql.functions._

/** r20 diagnostic: where do q18f's seconds go — the two pair
  * pipelines (first action through the persisted union), the
  * iteration loop, or the final formatting? Run:
  *   sbt "Test/runMain graft.queries.DiagQ18f /root/testdata/sf0.1"
  */
object DiagQ18f {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warmup
    try graft.SparkEntry.all.head.run(spark, sf)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val sh = t("shingleSets persist (count)") {
        val s = NorthStar.shingleSets(spark, sf)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        s.count(); s
      }
      val mh = t("minhash pairs (count)") {
        Q18bDedupMinHash.pairsFrom(sh)
          .select(col("doc_a"), col("doc_b")).count()
      }
      val ng = t("ngram pairs (count)") {
        Q18dDedupNgram.pairsFrom(sh)
          .select(col("doc_a"), col("doc_b")).count()
      }
      println(s"[diag] pairs: minhash=$mh ngram=$ng")
      sh.unpersist()
      t("q18f full (noop)") {
        Q18fDedupClusters.run(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

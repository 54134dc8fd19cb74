package graft

import org.apache.spark.sql.functions._

/** q60d serve decomposition at 1000× (round 19): both section runs
  * measured ~35 s vs r18's quiet 14.2 — separate the repair listing,
  * the delta tokenize+hash, the store join, and the reassembly. */
object DiagSpanServe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale1000"
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    import graft.queries._
    graft.plans.Stores.evict(spark, "graft_spanstore")
    val tBuild = t(Q60dExciseStore.ensureStore(spark, dir))
    val spansT = Q60dExciseStore.ensureStore(spark, dir)
    println(f"DIAG build=$tBuild%.1f")
    val tRepair = t(graft.plans.ReadRepair.repairTable(spark, spansT))
    println(f"DIAG repair=$tRepair%.2f")
    val testDocs = Tables.documents(spark, dir)
      .filter(Q40TrainTestSplit.splitCol === "test")
      .select(col("doc_id"), col("text"))
    def serveOnce() = t(Q60dExciseStore.serve(spark, testDocs, spansT)
      .write.format("noop").mode("overwrite").save())
    val s1 = serveOnce(); val s2 = serveOnce(); val s3 = serveOnce()
    println(f"DIAG serve1=$s1%.1f serve2=$s2%.1f serve3=$s3%.1f")
    graft.plans.Stores.evict(spark, "graft_spanstore")
    spark.stop()
  }
}

package graft.queries

import graft.Engine

/** Retrieval-family decade probe (round 13): times q74 (BM25
  * recompute — two corpus aggregations + broadcast term joins) per
  * scale point. The counterpoint to DiagClosure: the retrieval
  * pipeline's shuffles are query-filtered (postings for ≤|Q| terms)
  * or map-side-combined (doc lengths), so the fourth decade that
  * disk-bounds the closure family on one box should pass here.
  * `Test/runMain graft.queries.DiagRetrieval [dir] [parts] [threads]`. */
object DiagRetrieval {
  def main(args: Array[String]): Unit = {
    val parts = if (args.length > 1) args(1) else "32"
    val threads = if (args.length > 2) args(2) else "32"
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", parts))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    // warmup (codegen + parquet footers)
    Q74Bm25.run(spark, dir).write.format("noop").mode("overwrite").save()
    val tQ74 = t { Q74Bm25.run(spark, dir)
      .write.format("noop").mode("overwrite").save() }
    println(f"DIAG q74=$tQ74%.2f")
    spark.stop()
  }
}

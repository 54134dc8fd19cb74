package graft

import org.apache.spark.sql.functions._

/** r20 diagnostic: the irreducible per-query cost of the streaming
  * harness — a minimal one-batch file-source stream through the
  * memory sink (stateless, then one stateful agg, then the same agg
  * as a BATCH query) so the stream-machinery floor is separated from
  * operator work. Run:
  *   sbt "Test/runMain graft.DiagStreamFloor /root/testdata/sf0.1"
  */
object DiagStreamFloor {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[diag] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val sch = spark.read.parquet(s"$sf/documents.parquet").schema
    def stream() = spark.readStream.schema(sch)
      .parquet(s"$sf/{documents}.parquet")
    // warmup
    spark.read.parquet(s"$sf/documents.parquet").count()
    (1 to 3).foreach { i =>
      println(s"== round $i ==")
      t("batch: count by source") {
        spark.read.parquet(s"$sf/documents.parquet")
          .groupBy("source").count().collect()
      }
      t("stream: stateless projection") {
        val q = stream().select(col("doc_id"))
          .writeStream.format("memory").queryName(s"d_sl_$i")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        spark.catalog.dropTempView(s"d_sl_$i")
      }
      t("stream: count by source (8 parts)") {
        val p = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = stream().groupBy("source").count()
            .writeStream.format("memory").queryName(s"d_st_$i")
            .outputMode("complete").start()
          try q.processAllAvailable() finally q.stop()
          spark.catalog.dropTempView(s"d_st_$i")
        } finally spark.conf.set("spark.sql.shuffle.partitions", p)
      }
      t("stream: same agg, rocksdb") {
        val p = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val q = stream().groupBy("source").count()
            .writeStream.format("memory").queryName(s"d_rk_$i")
            .outputMode("complete").start()
          try q.processAllAvailable() finally q.stop()
          spark.catalog.dropTempView(s"d_rk_$i")
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", p)
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    spark.stop()
  }
}

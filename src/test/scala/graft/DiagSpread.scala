package graft

import org.apache.spark.sql.functions._

/** r19 diagnostic: why did the q12b HLL partial aggregation's task
  * time explode ~40× when the scan was spread to 32 partitions?
  * Times the same aggregation over (a) the raw 1-split scan, (b) a
  * hash spread, (c) fewer spread partitions, (d) exact countDistinct
  * spread, to separate HLL buffer cost from shuffle cost.
  * Run: sbt "Test/runMain graft.DiagSpread"
  */
object DiagSpread {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[diag] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.lineitem(spark, dir)
    def hll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("p"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("o"))
    // warmup both codegen paths
    noop(hll(li)); noop(hll(li.repartition(32, col("l_orderkey"))))
    t("raw 1-split")(noop(hll(li)))
    t("spread 32 hash")(noop(hll(li.repartition(32, col("l_orderkey")))))
    t("spread 8 hash")(noop(hll(li.repartition(8, col("l_orderkey")))))
    t("spread 4 hash")(noop(hll(li.repartition(4, col("l_orderkey")))))
    t("spread 32, rsd .05")(noop(
      li.repartition(32, col("l_orderkey")).groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("p"),
          approx_count_distinct(col("l_orderkey"), 0.05).as("o"))))
    t("spread 32 exact distinct")(noop(
      li.repartition(32, col("l_orderkey")).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("p"))))
    t("raw 1-split again")(noop(hll(li)))
    spark.stop()
  }
}

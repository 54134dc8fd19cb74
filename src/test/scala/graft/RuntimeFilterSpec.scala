package graft

import org.apache.spark.sql.functions._

/** Scale posture (SURVEY §4.2): Spark's runtime bloom-filter
  * injection — when one side of a shuffle join carries a selective
  * filter, the optimizer plants a bloom filter built from that side
  * into the other side's scan, pruning shuffle input at runtime.
  * At 100 TB this is a major shuffle reducer for selective
  * dim-to-fact joins; the fixture only clears the size thresholds
  * when they are lowered, so this spec lowers them for its own
  * queries and restores the session afterwards. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim join injects might_contain into the fact side") {
    // baseline BEFORE the bloom confs: if the injected filter pruned
    // matching rows, comparing two bloom-filtered plans would agree
    // on the wrong answer
    val expected = Tables.lineitem(spark, sf01)
      .join(Tables.part(spark, sf01).filter(col("p_brand") === "Brand#17"),
        col("l_partkey") === col("p_partkey")).count()
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sf01)
      val part = Tables.part(spark, sf01).filter(col("p_brand") === "Brand#17")
      val q = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type")).agg(count(lit(1)).as("n"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan in:\n$opt")
      // the filter prunes, it must not change results
      assert(q.collect().map(_.getAs[Long]("n")).sum === expected)
    }
  }
}

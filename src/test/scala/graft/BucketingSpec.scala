package graft

import org.apache.spark.sql.functions._

import graft.plans.Bucketing

/** Plan-level assertions for the shuffle-elimination techniques. */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with NO Exchange") {
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)
    // disable broadcast: at fixture scale both sides auto-broadcast,
    // which would mask the bucketing (at 100 TB neither side fits)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    // and it is still a correct join
    val expect = Tables.orders(spark, sf).select("o_orderkey")
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey")),
        "o_orderkey").count()
    val n = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey").count()
    assert(n === expect)
  }

  test("salted two-phase sum equals the direct aggregation") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("decimal(12,2)").as("q"))
    val salted = Bucketing.saltedSum(li, "l_returnflag", "q", salts = 16)
      .orderBy("l_returnflag").collect()
    val direct = li.groupBy("l_returnflag").agg(sum("q").as("sum_q"))
      .orderBy("l_returnflag").collect()
    assert(salted.map(r => (r.getString(0), r.getDecimal(1))).toSeq ===
      direct.map(r => (r.getString(0), r.getDecimal(1))).toSeq)
  }
}

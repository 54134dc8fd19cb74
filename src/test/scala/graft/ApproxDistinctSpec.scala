package graft

import org.apache.spark.sql.functions._

/** SURVEY §5.2 — Q12b's promise: approx_count_distinct (HLL++) within
  * ±5% of the exact distinct counts (sketches are engine-specific, so
  * Q12b has no DuckDB oracle; this test IS its verification). */
class ApproxDistinctSpec extends SparkSpec {

  test("q12b approx distinct within 5% of exact, per return flag") {
    val exact = Tables.lineitem(spark, sf01)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
           countDistinct(col("l_orderkey")).as("exact_orders"))
    val approx = queries.Q12bApproxDistinct.run(spark, sf01)
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      val (ao, eo) = (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
      assert(math.abs(ap - ep).toDouble / ep <= 0.05,
        s"parts off by >5%: approx=$ap exact=$ep (${r.getString(0)})")
      assert(math.abs(ao - eo).toDouble / eo <= 0.05,
        s"orders off by >5%: approx=$ao exact=$eo (${r.getString(0)})")
    }
  }
}

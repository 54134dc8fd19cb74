package graft

import org.apache.spark.sql.functions._
import graft.queries.{Q46cDecontaminateBloom, Q46Decontaminate}

/** Round 13: the bloom-prefiltered decontamination tier (q46c) —
  * Spark's own BloomFilterAggregate/BloomFilterMightContain surfaced
  * as graft functions and applied as a deliberate scalar-subquery
  * runtime filter. The shared oracle pins output correctness; these
  * tests pin what the hash gate can't see: exact row-parity with the
  * unsketched tier in one JVM, the might_contain prefilter actually
  * present in the executed plan, and the join-input reduction that
  * is the sketch's reason to exist. */
class Round13eSpec extends SparkSpec {

  test("q46c: row-identical to q46 (no false negatives; FPs die in the exact join)") {
    val a = Q46Decontaminate.run(spark, sf01).collect().map(_.toString).toSeq
    val b = Q46cDecontaminateBloom.run(spark, sf01).collect()
      .map(_.toString).toSeq
    assert(a == b,
      s"sketch tier diverged: ${a.zip(b).find { case (x, y) => x != y }}")
  }

  test("q46c: the bloom prefilter sits in the plan and reduces the train-side join input") {
    val df = Q46cDecontaminateBloom.run(spark, sf01)
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"),
      "bloom prefilter missing from the executed plan")
    // Measured reduction: might-contain survivors vs the full
    // train-side gram stream. On this fixture the splits share one
    // corpus so overlap is high; the reduction still must be real.
    val grams = Q46Decontaminate.gramFrame(spark, sf01)
    val v = "graft_r13e_grams"
    grams.createOrReplaceTempView(v)
    val total = grams.filter(col("split") === "train").count()
    val kept = spark.sql(s"""
      SELECT count(*) FROM $v
      WHERE split = 'train' AND graft_bloom_contains(
        (SELECT graft_bloom_agg(xxhash64(gh)) FROM $v WHERE split = 'test'),
        xxhash64(gh))""").head().getLong(0)
    info(f"train grams: $total, past bloom: $kept (${100.0 * kept / total}%.1f%%)")
    assert(kept < total, "bloom filtered nothing — prefilter inert")
    // And no false negatives: every train gram that ACTUALLY matches
    // a test gram must pass the bloom.
    val trueMatches = grams.filter(col("split") === "train").select(col("gh"))
      .join(grams.filter(col("split") === "test").select(col("gh")), "gh")
      .select(col("gh")).distinct().count()
    val keptMatches = spark.sql(s"""
      SELECT count(DISTINCT g.gh) FROM $v g
      JOIN (SELECT gh FROM $v WHERE split = 'test') t ON g.gh = t.gh
      WHERE g.split = 'train' AND graft_bloom_contains(
        (SELECT graft_bloom_agg(xxhash64(gh)) FROM $v WHERE split = 'test'),
        xxhash64(g.gh))""").head().getLong(0)
    assert(keptMatches == trueMatches,
      s"bloom dropped true matches: $keptMatches of $trueMatches")
  }
}

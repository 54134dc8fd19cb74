package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.queries.Q65IncrementalStats

/** Round-10 continuation: q65 incremental aggregate maintenance — the
  * plan posture (delta scan + store scan, no corpus re-read), the
  * refresh lifecycle across waves, and min/max merge across waves. */
class Round10cSpec extends SparkSpec {
  import spark.implicits._


  test("q65: incremental merge equals the direct full-corpus aggregation") {
    val direct = Tables.documents(spark, sf01)
      .select(col("source"),
        size(expr(graft.queries.NorthStar.toksExpr)).cast("long").as("ws"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("sum_ws_tokens"),
        sum(col("chars")).as("sum_chars"),
        min(col("chars")).as("min_chars"),
        max(col("chars")).as("max_chars"))
      .withColumn("avg_ws_tokens",
        col("sum_ws_tokens").cast("double") / col("n_docs"))
      .orderBy(col("source"))
      .collect()
    val incr = Q65IncrementalStats.run(spark, sf01).collect()
    assert(incr.toSeq === direct.toSeq)
  }

  test("q65: the incremental plan scans the delta once and the store — never the train split") {
    Q65IncrementalStats.run(spark, sf01).collect() // store warm
    val df = Q65IncrementalStats.run(spark, sf01)
    df.collect()
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    val (storeScans, docScans) = scans.partition(
      _.tableIdentifier.exists(_.table.startsWith("graft_aggstore")))
    assert(storeScans.size === 1,
      s"expected exactly one store scan, got ${storeScans.size}")
    assert(docScans.size === 1,
      s"expected exactly one documents scan (the delta), got:\n$docScans")
    // The one documents scan must be delta-restricted: the md5-nibble
    // split predicate (its hex alphabet literal is distinctive) sits
    // on the scan, so train-side text is never tokenized at refresh.
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("0123456789abcdef"),
      s"documents scan is not delta-filtered:\n$planStr")
  }

  test("q65: per-wave refresh equals recompute, with min/max extremes split across waves") {
    val dir = java.nio.file.Files.createTempDirectory("r10inc").toString
    def docs(rows: Seq[(Long, String, String)]) =
      rows.map { case (id, src, text) =>
        (id, text, "en", src, text.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // Wave 0 (base): mid-length docs. Wave 1 carries the global MAX
    // for src a; wave 2 carries the global MIN for src a — the merge
    // must track extremes across waves, not within one.
    val wave0 = Seq(
      (1L, "a", "alpha beta gamma"), (2L, "a", "delta epsilon"),
      (3L, "b", "one two three four"))
    val wave1 = Seq(
      (4L, "a", "the longest document of source a by a clear margin"),
      (5L, "b", "five six"))
    val wave2 = Seq((6L, "a", "x"), (7L, "c", "new source arrives"))
    try {
      val statsT = "graft_aggstore_spec_wave"
      spark.sql(s"DROP TABLE IF EXISTS $statsT")
      Q65IncrementalStats.partials(docs(wave0))
        .write.format("parquet").saveAsTable(statsT)
      Q65IncrementalStats.refresh(spark, statsT, docs(wave1))
      Q65IncrementalStats.refresh(spark, statsT, docs(wave2))
      val got = Q65IncrementalStats.merge(spark.table(statsT))
        .collect().toSeq
      val want = Q65IncrementalStats.merge(
        Q65IncrementalStats.partials(docs(wave0 ++ wave1 ++ wave2)))
        .collect().toSeq
      assert(got === want)
      // the store itself stays one row per source
      assert(spark.table(statsT).count() ===
        (wave0 ++ wave1 ++ wave2).map(_._2).distinct.size)
      spark.sql(s"DROP TABLE IF EXISTS $statsT")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }
}

package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** Round-10 hardening: builder arity validation, q63 empty-input
  * guard, and strict submit-phase materialization in the corpus
  * connector's stat pool. */
class Round10Spec extends SparkSpec {

  test("injected functions reject wrong arity with WRONG_NUM_ARGS") {
    import spark.implicits._
    val df = Seq(("x", 1L)).toDF("tok", "n")
    df.createOrReplaceTempView("r10_arity")
    try {
      // Too few: used to IOOBE at children.head.
      val e0 = intercept[AnalysisException](
        spark.sql("SELECT graft_normalize_fast() FROM r10_arity").collect())
      assert(e0.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        s"got ${e0.getCondition}: ${e0.getMessage}")
      // Too many: used to silently drop the extra argument.
      val e1 = intercept[AnalysisException](
        spark.sql("SELECT graft_token_score(tok, n) FROM r10_arity").collect())
      assert(e1.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
      val e2 = intercept[AnalysisException](
        spark.sql("SELECT graft_asof_le(n) FROM r10_arity").collect())
      assert(e2.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
      // Correct arity still resolves.
      assert(spark.sql("SELECT graft_normalize_fast(tok) FROM r10_arity")
        .as[String].head() == "x")
    } finally spark.catalog.dropTempView("r10_arity")
  }

  test("q63 gap fill returns an empty typed frame on an empty events table") {
    val dir = java.nio.file.Files.createTempDirectory("r10-empty-events")
    try {
      // Same shape the fixture loader expects; zero rows.
      Tables.events(spark, sf).limit(0)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = graft.queries.Q63GapFill.run(spark, dir.toString)
      assert(out.columns.toSeq == Seq("user_id", "day", "value", "source"))
      assert(out.count() == 0L)
      assert(out.schema("value").dataType.typeName == "double")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("withLengths stats a lazy Seq fully in parallel (strict submit phase)") {
    // A lazy Seq used to interleave submit/get one element at a time
    // (serializing the stat RPCs); the strict submit phase must still
    // produce correct, ordered results when handed a LazyList.
    val dir = java.nio.file.Files.createTempDirectory("r10-lengths")
    try {
      val files = (0 until 16).map { i =>
        val p = dir.resolve(f"f$i%02d.txt")
        java.nio.file.Files.write(p, ("x" * (i + 1)).getBytes)
        (p.toString, i.toLong)
      }
      val lazySeq: Seq[(String, Long)] = LazyList.from(files)
      val conf = spark.sparkContext.hadoopConfiguration
      val out = sources.GraftCorpusScan.withLengths(lazySeq, conf)
      assert(out.map(_._3) == (1L to 16L),
        "lengths must be returned in order with correct values")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}

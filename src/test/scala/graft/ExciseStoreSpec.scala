package graft

import org.apache.spark.sql.functions._
import graft.queries.{Q60cExciseDuplicates, Q60dExciseStore, Q40TrainTestSplit}

/** Round 12: the persisted span store tier (q60d). The sf-corpus serve
  * is oracle-gated end to end (cleaned text hashes against the
  * relational replay of base-wins + intra-delta-first-occurrence);
  * these tests pin the store lifecycle the oracle can't see — the
  * zero-exchange serve posture, the two-wave admit contract, and the
  * intra-delta precedence rule on a crafted shard. */
class ExciseStoreSpec extends SparkSpec {
  import spark.implicits._

  test("q60d: store side of the span join is exchange-free (bucketed)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val spansT = Q60dExciseStore.ensureStore(spark, sf01)
      val toks = graft.Tables.documents(spark, sf01)
        .filter(Q40TrainTestSplit.splitCol === "test")
        .select(col("doc_id"),
          expr(graft.queries.NorthStar.toksExpr).as("t"))
      val joined = Q60cExciseDuplicates.spanPositions(toks)
        .join(spark.table(spansT), Seq("span_h"), "left")
      joined.collect()
      val nodes = flattenPlan(joined.queryExecution.executedPlan)
      val joins = nodes.filter {
        case j: SortMergeJoinExec    => j.leftKeys.exists(_.toString.contains("span_h"))
        case j: ShuffledHashJoinExec => j.leftKeys.exists(_.toString.contains("span_h"))
        case _ => false
      }
      assert(joins.nonEmpty, "expected the span_h store join in the plan")
      val storeSides = joins.flatMap(_.children.filter(c =>
        flattenPlan(c).exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table.startsWith("graft_spanstore"))
          case _ => false
        }))
      assert(storeSides.nonEmpty, "span join must scan the store on one side")
      storeSides.foreach { side =>
        val shuffles = flattenPlan(side).collect { case s: ShuffleExchangeLike => s }
        assert(shuffles.isEmpty,
          s"store side of the span join must not shuffle, found: $shuffles")
      }
    }
  }

  test("q60d: two-wave ingest — admitted spans catch the next shard's copy") {
    val dir = java.nio.file.Files.createTempDirectory("r12-excise")
    try {
      // doc_id 1 is train under the q40 md5-nibble split (seeds the
      // store); doc_id 8 is test (wave 1).
      val footer = (1 to 8).map(i => s"base$i").mkString(" ")
      val novel = (1 to 8).map(i => s"wave$i").mkString(" ")
      Seq(
        (1L, s"$footer tail1 tail2", "en", "web", 40L),
        (8L, s"lead1 lead2 $novel", "en", "web", 40L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val spansT = Q60dExciseStore.ensureStore(spark, dir.toString)
      // Wave 1: the novel span passes untouched; the base footer is
      // not in doc 8 so nothing excises.
      val w1 = Q60dExciseStore.run(spark, dir.toString).collect()
      assert(w1.map(r => (r.getLong(0), r.getLong(2))).toSeq === Seq((8L, 0L)))
      Q60dExciseStore.admit(spark,
        Seq((8L, s"lead1 lead2 $novel")).toDF("doc_id", "text"), spansT)
      // Wave 2: one doc repeats the admitted wave-1 span, one repeats
      // the base footer, one is fresh.
      val w2 = Q60dExciseStore.serve(spark, Seq(
          (100L, s"x1 x2 $novel"),
          (101L, s"$footer y1"),
          (102L, (1 to 9).map(i => s"fresh$i").mkString(" ")))
          .toDF("doc_id", "text"), spansT)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), r.getString(r.fieldIndex("cleaned_text")))).toMap
      assert(w2(100L) === ((8L, "x1 x2")))
      assert(w2(101L) === ((8L, "y1")))
      assert(w2(102L)._1 === 0L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("q60d: intra-delta first occurrence wins within one served shard") {
    val spansT = Q60dExciseStore.ensureStore(spark, sf01)
    val shard = (1 to 8).map(i => s"shardspan$i").mkString(" ")
    val out = Q60dExciseStore.serve(spark, Seq(
        (200L, s"$shard a1"),
        (201L, s"b1 $shard"))
        .toDF("doc_id", "text"), spansT)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(200L) === 0L, "first occurrence keeps")
    assert(out(201L) === 8L, "second occurrence excises")
  }

  test("s20: multi-epoch stream == one-shot batch serve, order-independent keeper") {
    val dir = java.nio.file.Files.createTempDirectory("s20_waves").toString
    try {
      import spark.implicits._
      val spansT = Q60dExciseStore.ensureStore(spark, sf01)
      // The shared span arrives in wave 0 carried by the HIGHER
      // doc_id and in wave 2 by the LOWER: the keeper must be the
      // (doc_id, i) minimum, not the first arrival.
      val shared = (1 to 8).map(i => s"crosswave$i").mkString(" ")
      val waves = Seq(
        Seq((300L, s"w0a w0b $shared")),
        Seq((250L, (1 to 9).map(i => s"lone$i").mkString(" "))),
        Seq((100L, s"$shared w2tail")))
      waves.zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("doc_id", "text").repartition(1)
          .write.parquet(s"$dir/delta/wave$i.parquet")
      }
      val sch = spark.read.parquet(s"$dir/delta/wave0.parquet").schema
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/delta/*.parquet")
      val static = spark.read.parquet(s"$dir/delta/*.parquet")
      val streamed = graft.streaming.S20StreamExcise
        .exciseStream(spark, stream, static, spansT).collect().toSeq
      val batch = Q60dExciseStore.serve(spark, static, spansT)
        .collect().toSeq
      assert(streamed === batch)
      val byId = streamed.map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(byId(100L) === 0L, "lower doc_id keeps even though it arrived last")
      assert(byId(300L) === 8L, "higher doc_id excises even though it arrived first")
      assert(byId(250L) === 0L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }
}

package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.queries.{Q74Bm25, Q74bBm25Store}

/** Round 13: BM25 ranked retrieval (q74) + its persisted-index store
  * tier (q74b). The shared DuckDB oracle pins VALUES; these tests pin
  * the POSTURE — the corpus-scale stream must die at a broadcast
  * term filter (q74), and the store tier must serve from index scans
  * with no corpus tokenize at all (q74b). */
class Round13gSpec extends SparkSpec {

  /** flattenPlan descends INTO ReusedExchangeExec (right for most
    * posture asserts); counting distinct WORK needs the opposite — a
    * reused exchange's subtree executes once, so stop there. */
  private def flattenWork(
      p: org.apache.spark.sql.execution.SparkPlan
  ): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case _: ReusedExchangeExec    => Seq.empty
      case other                    => other.children
    }
    p +: kids.flatMap(flattenWork)
  }

  test("q74: term joins broadcast; the served plan re-reads no corpus") {
    val df = Q74Bm25.run(spark, sf)
    df.collect() // let AQE finalize join strategies
    val plan = flattenWork(df.queryExecution.executedPlan)
    val bcast = plan.collect { case b: BroadcastHashJoinExec => b }
    // df→scored and qterms→scored: both term tables are literal-sized
    // and must broadcast (the qwords filter join lives in the
    // checkpointed tf pass, below this plan).
    assert(bcast.size >= 2, s"expected >=2 broadcast joins, got ${bcast.size}")
    val corpusScans = plan.collect {
      case f: FileSourceScanExec
        if f.toString.contains("documents.parquet") => f
    }
    // Both corpus aggregations (dl, tf) are checkpointed barriers: the
    // ranking plan reads their blocks, never the corpus — without the
    // tf barrier the df rollup and the scored chain each re-ran the
    // tokenize (measured: 2 corpus scans in this plan).
    assert(corpusScans.isEmpty,
      s"expected no corpus scan in the served plan, got ${corpusScans.size}")
  }

  test("q74 sanity: ranks contiguous from 1, scores nonincreasing, all queries answered") {
    val rows = Q74Bm25.run(spark, sf).collect()
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Q74Bm25.querySet.map(_._1).toSet,
      s"queries answered: ${byQ.keySet}")
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).toSeq
      assert(ranks == (1 to rs.length), s"q$q ranks not contiguous: $ranks")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted(Ordering[Double].reverse),
        s"q$q scores not nonincreasing: $scores")
    }
  }

  test("q74b: serve plan scans only store tables — no corpus tokenize") {
    val df = Q74bBm25Store.run(spark, sf)
    df.collect()
    val plan = flattenPlan(df.queryExecution.executedPlan)
    assert(!df.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "store tier re-read the corpus")
    val storeScans = plan.collect {
      case f: FileSourceScanExec
        if f.tableIdentifier.exists(_.table.startsWith("graft_bm25store")) => f
    }
    assert(storeScans.size >= 2,
      s"expected postings+lengths store scans, got ${storeScans.size}")
    // VERDICT r13 #1: the serve must engage STATIC bucket pruning on
    // the word-bucketed postings store — SelectedBucketsCount ≤ the
    // number of distinct query terms — not merely filter map-side
    // behind the broadcast term join (which scans all 16 buckets).
    val postingsScan = storeScans.find(
      _.tableIdentifier.exists(_.table.startsWith("graft_bm25store_postings")))
    assert(postingsScan.isDefined, "postings store scan missing")
    val nTerms = Q74Bm25.querySet.flatMap(_._2).distinct.size
    val selected = postingsScan.get.optionalBucketSet.map(_.cardinality())
    assert(selected.exists(_ <= nTerms),
      s"postings scan not bucket-pruned: SelectedBucketsCount=$selected " +
        s"(want ≤ $nTerms of 16)")
  }

  test("q74b: store tier is row-identical to the recompute tier (q74)") {
    val a = Q74Bm25.run(spark, sf).collect().map(_.toString).toSeq
    val b = Q74bBm25Store.run(spark, sf).collect().map(_.toString).toSeq
    assert(a == b, s"tiers diverged: ${a.zip(b).find { case (x, y) => x != y }}")
  }

  test("q75: RRF fusion is arithmetically consistent and both arms contribute") {
    import graft.queries.Q75HybridRrf
    val rows = Q75HybridRrf.run(spark, sf).collect()
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Q74Bm25.querySet.map(_._1).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"q$q ranks gap")
    }
    rows.foreach { r =>
      val (lex, sem, rrf) = (r.getInt(4), r.getInt(5), r.getDouble(3))
      assert(lex > 0 || sem > 0, "a fused row must come from some arm")
      val expect = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (sem > 0) 1.0 / (60 + sem) else 0.0)
      assert(rrf == expect, s"rrf mismatch: $rrf vs $expect")
    }
    // Both arms actually influence the fixture's fused lists.
    assert(rows.exists(_.getInt(4) > 0) && rows.exists(_.getInt(5) > 0),
      "fixture must exercise both arms")
  }

  test("q76: negatives are never the anchor, the positive, or a near-dup of the anchor") {
    import graft.queries.{Q18bDedupMinHash, Q76ContrastiveTriplets}
    val rows = Q76ContrastiveTriplets.run(spark, sf01).collect()
    assert(rows.nonEmpty)
    val pairs = Q18bDedupMinHash.run(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(n != a && n != p, s"negative $n collides with ($a, $p)")
      assert(!pairs((math.min(n, a), math.max(n, a))),
        s"negative $n is a near-dup of anchor $a")
    }
    // Both orientations of every pair mined, each exactly once, and
    // no triplet lost its negative to bucket exhaustion.
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      == rows.length)
    assert(rows.length == 2 * pairs.size,
      s"${rows.length} triplets from ${pairs.size} pairs")
  }

  test("q76b: the hard negative is the max-cosine non-near-dup candidate") {
    import graft.queries.{Q18bDedupMinHash, Q18eDedupEmbedding, Q76bHardNegatives}
    val rows = Q76bHardNegatives.run(spark, sf01).collect()
    assert(rows.nonEmpty, "fixture must yield at least one hard triplet")
    val pairSet = Q18bDedupMinHash.run(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cosRows = Q18eDedupEmbedding.cosPairs(spark, sf01).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1), r.getDouble(2)),
        (r.getLong(1), r.getLong(0), r.getDouble(2))))
    rows.foreach { r =>
      val (a, p, n, nc) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(n != a && n != p, s"hard negative $n collides with ($a, $p)")
      assert(!pairSet((math.min(n, a), math.max(n, a))),
        s"hard negative $n is a near-dup of anchor $a")
      val valid = cosRows.filter(c => c._1 == a && c._2 != p &&
        !pairSet((math.min(c._2, a), math.max(c._2, a))))
      assert(valid.nonEmpty && nc == valid.map(_._3).max,
        s"($a,$p): surfaced neg_cos $nc is not the max over valid candidates")
    }
  }

  test("q74b admit: delta admission serves exactly the full-corpus answer") {
    import graft.queries.{Q40TrainTestSplit, Q74bBm25Store}
    val dir = java.nio.file.Files.createTempDirectory("q74badmit")
    var tables: Seq[String] = Nil
    try {
      val docs = Tables.documents(spark, sf01)
      val split = Q40TrainTestSplit.splitColOf("doc_id")
      docs.filter(split === "train")
        .write.parquet(s"$dir/documents.parquet")
      val (postT, lenT, metaT) = Q74bBm25Store.ensureStore(spark, dir.toString)
      tables = Seq(postT, lenT, metaT,
        graft.plans.AdmitLog.logTableOf(postT))
      Q74bBm25Store.admit(spark, docs.filter(split === "test"),
        postT, lenT, metaT)
      val got = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
        .collect().map(_.toString).toSeq
      val expect = Q74Bm25.run(spark, sf01).collect().map(_.toString).toSeq
      // Every BM25 statistic is additive, so base-build + delta-admit
      // must be indistinguishable from indexing the full corpus.
      assert(got == expect,
        s"admitted serve diverges: ${got.zip(expect).find { case (x, y) => x != y }}")
    } finally {
      tables.foreach(graft.plans.Stores.dropManaged(spark, _))
      graft.plans.Stores.gcMarkers(spark, "graft_bm25store")
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      val paths = try s.iterator().asScala.toVector finally s.close()
      paths.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q76c: guaranteed coverage, hard tier wherever the block offers one") {
    import graft.queries.{Q76bHardNegatives, Q76cTripletsBackfilled, Q76ContrastiveTriplets}
    val c = Q76cTripletsBackfilled.run(spark, sf01).collect()
    val rand = Q76ContrastiveTriplets.run(spark, sf01).collect()
    val hard = Q76bHardNegatives.run(spark, sf01).collect()
    assert(c.length == rand.length,
      s"backfilled tier lost coverage: ${c.length} vs ${rand.length}")
    val hardKeys = hard.map(r => (r.getLong(0), r.getLong(1))).toSet
    c.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert((r.getString(4) == "hard") == hardKeys(k),
        s"$k carries tier ${r.getString(4)} but hard-availability is ${hardKeys(k)}")
    }
    assert(c.exists(_.getString(4) == "hard") &&
      c.exists(_.getString(4) == "random"),
      "fixture must exercise both tiers")
  }

  test("s23/s23b: multi-epoch streamed index serves the batch answer; compaction shrinks files, answers identically") {
    import org.apache.spark.sql.functions.lit
    import graft.streaming.S23StreamBm25Index
    val dir = java.nio.file.Files.createTempDirectory("s23spec")
    try {
      // 24-way split: enough file-per-trigger epochs that the
      // fragmented index genuinely outnumbers the 16 bucket files.
      Tables.documents(spark, sf).repartition(24).write.parquet(s"$dir/delta")
      val sch = spark.read.parquet(s"$dir/delta").schema
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/delta/*.parquet")
      val runT = "graft_s23spec_postings"
      graft.plans.Stores.dropManaged(spark, runT)
      Q74Bm25.postingsOf(Tables.documents(spark, sf).limit(0))
        .withColumn("_epoch", lit(-1L))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet").saveAsTable(runT)
      try {
        val epochs = S23StreamBm25Index.maintain(spark, runT, stream)
        assert(epochs >= 3, s"file-per-trigger must yield >=3 epochs, got $epochs")
        val got = S23StreamBm25Index.serve(spark, runT)
          .collect().map(_.toString).toSeq
        val expect = Q74Bm25.run(spark, sf).collect().map(_.toString).toSeq
        assert(got == expect,
          "streamed index must serve exactly the batch answer")
        // s23b: compacting the fragmented index must shrink the file
        // count and serve the identical answer (no corpus re-read).
        import graft.streaming.S23bStreamBm25Compact
        def parquetFiles(table: String): Int = {
          val wh = java.net.URI.create(
            spark.conf.get("spark.sql.warehouse.dir")).getPath
          val d = java.nio.file.Paths.get(wh, table)
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.walk(d)
          try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
          finally s.close()
        }
        val before = parquetFiles(runT)
        val compactT = S23bStreamBm25Compact.compactTo(spark, runT)
        try {
          val after = parquetFiles(compactT)
          assert(after < before,
            s"compaction must shrink files: $before -> $after")
          val servedC = S23StreamBm25Index.serve(spark, compactT)
            .collect().map(_.toString).toSeq
          assert(servedC == expect,
            "compacted serve must equal the fragmented serve")
          assert(!S23StreamBm25Index.serve(spark, compactT)
              .queryExecution.executedPlan.toString.contains("documents.parquet"),
            "compaction serve must not re-read the corpus")
        } finally graft.plans.Stores.dropManaged(spark, compactT)
      } finally {
        graft.plans.Stores.dropManaged(spark, runT)
        graft.plans.Stores.dropManaged(spark,
          graft.streaming.StreamQueries.epochMarkerTable(runT))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      val paths = try s.iterator().asScala.toVector finally s.close()
      paths.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}

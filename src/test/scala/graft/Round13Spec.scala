package graft

import org.apache.spark.sql.functions._

/** Round 13: ADVICE-driven hardening of the append-model exactly-once
  * contract. `maintainAppend`'s guard moved from rows-presence to a
  * separate commit-marker table (a parquet job commit is a sequence
  * of task-file renames, so "epoch rows visible" never proved the
  * append completed); these tests inject the crash windows the marker
  * closes. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("q18g: the q42 dup gate is a bucketed store scan — no closure recompute") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.queries.{Q18gDedupLabelsStore, Q42CorpusClean}
    Q18gDedupLabelsStore.ensureStore(spark, sf01) // settle the build
    // The exact frame statusByDoc's victim gate reads: must be ONE
    // file scan, and that scan must be the persisted labels table —
    // not the shingle/pair/closure pipeline it replaced.
    val labels = Q18gDedupLabelsStore.labels(spark, sf01)
    val scans = flattenPlan(labels.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.size === 1, s"dup gate must be one table scan, got $scans")
    assert(scans.head.tableIdentifier.exists(
        _.table.startsWith("graft_lblstore_labels")),
      s"dup gate must read the labels store, got ${scans.head.tableIdentifier}")
    // And q42b's composed plan consumes the store (the closure's
    // driver-side iteration no longer runs inside any consumer).
    val q42b = Q42CorpusClean.statusByDoc(spark, sf01, withContamination = true)
    val q42bTables = flattenPlan(q42b.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .flatMap(_.tableIdentifier).map(_.table)
    assert(q42bTables.exists(_.startsWith("graft_lblstore_labels")),
      s"q42b must scan the labels store, scanned: $q42bTables")
  }

  test("q18g: two-wave admit — arrivals attach to clusters, later waves see earlier admits") {
    import graft.queries.Q18gDedupLabelsStore
    val dir = java.nio.file.Files.createTempDirectory("r13-lbl")
    var tempTables = Seq.empty[String]
    try {
      // Base corpus: docs 1 and 2 are near-dups (10 shared tokens, one
      // differing) → cluster keeper 1; doc 3 is unrelated (singleton,
      // carries no label row).
      val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
      Seq(
        (1L, s"$shared alpha", "en", "web", 40L),
        (2L, s"$shared beta", "en", "web", 40L),
        (3L, (1 to 11).map(i => s"other$i").mkString(" "), "en", "web", 40L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val (labelsT, bandsT) = Q18gDedupLabelsStore.ensureStore(spark, dir.toString)
      tempTables = Seq(labelsT, bandsT,
        graft.plans.AdmitLog.logTableOf(labelsT))
      val built = spark.table(labelsT).select("id", "lbl")
        .as[(Long, Long)].collect().toMap
      assert(built === Map(1L -> 1L, 2L -> 1L), s"closure seed: $built")

      // Wave 1: doc 50 near-dups base doc 2 → must attach to cluster 1
      // (the BASE's stored label, not the base id); doc 51 is novel →
      // singleton under its own id.
      val novel = (1 to 10).map(i => s"wave$i").mkString(" ")
      val w1 = Q18gDedupLabelsStore.admit(spark, Seq(
          (50L, s"$shared gamma"),
          (51L, s"$novel one"))
          .toDF("doc_id", "text"), labelsT, bandsT)
        .as[(Long, Long)].collect().toMap
      assert(w1 === Map(50L -> 1L, 51L -> 51L), s"wave 1: $w1")

      // Wave 2: doc 60 near-dups WAVE-1's novel doc 51 (nothing in the
      // base corpus matches) — it must attach through the bands rows
      // wave 1 appended; doc 61 near-dups base doc 1 directly.
      val w2 = Q18gDedupLabelsStore.admit(spark, Seq(
          (60L, s"$novel two"),
          (61L, s"$shared delta"))
          .toDF("doc_id", "text"), labelsT, bandsT)
        .as[(Long, Long)].collect().toMap
      assert(w2 === Map(60L -> 51L, 61L -> 1L), s"wave 2: $w2")

      // The store accumulated every admitted verdict.
      val all = spark.table(labelsT).select("id", "lbl")
        .as[(Long, Long)].collect().toMap
      assert(all === Map(1L -> 1L, 2L -> 1L, 50L -> 1L, 51L -> 51L,
        60L -> 51L, 61L -> 1L), s"store after two waves: $all")
    } finally {
      // Scoped cleanup: drop only the TEMP-dir store (the sf0.01
      // store built by the plan-assert test must survive for reuse);
      // gcMarkers sweeps the orphaned marker+lock pair.
      tempTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.plans.Stores.gcMarkers(spark, "graft_lblstore")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("s15: PARTIAL epoch (crash mid-append) is scrubbed and re-applied, not skipped") {
    import graft.queries.{Q64bBpeEncode, Q64eBpeEncodeStore}
    import graft.streaming.{StreamQueries, S15StreamBpeEncodeStore}
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("s15partial").toString
    try {
      Tables.documents(spark, sf).repartition(3)
        .write.parquet(s"$dir/delta")
      val sch = spark.read.parquet(s"$dir/delta").schema
      def stream() = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/delta/*.parquet")
      val dict = broadcast(
        spark.table(Q64eBpeEncodeStore.ensureVocab(spark, sf)))
      val runT = "graft_s15partial_partials"
      val markT = StreamQueries.epochMarkerTable(runT)
      graft.plans.Stores.dropManaged(spark, runT)
      spark.sql(s"DROP TABLE IF EXISTS $runT")
      spark.sql(s"DROP TABLE IF EXISTS $markT")
      Q64bBpeEncode.encodePartials(Tables.documents(spark, sf).limit(0), dict)
        .withColumn("_epoch", lit(-1L))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet").saveAsTable(runT)
      val ckpt = s"$dir/ckpt"
      try {
        val applied = S15StreamBpeEncodeStore.maintain(
          spark, runT, dict, stream(), checkpoint = Some(ckpt))
        assert(applied === 3L)
        val committed = spark.table(runT).collect().map(_.toString).sorted.toSeq

        // Inject the ADVICE-r12 hazard: the last epoch's job commit
        // died mid-rename — SOME of its rows are visible, its marker
        // was never written, and the checkpoint says the epoch never
        // ran. The old rows-presence guard would skip it (silent row
        // loss); the marker guard must scrub the partial and re-apply.
        val lastEpoch = spark.table(markT).agg(max("_epoch")).head().getLong(0)
        // keep a strict NON-EMPTY subset: every micro-batch of this
        // corpus yields one partial row per lang incl. 'en', so
        // dropping the epoch's 'en' row models one lost task file.
        val partial = spark.table(runT)
          .filter(col("_epoch") =!= lastEpoch || col("lang") =!= "en")
          .localCheckpoint(true)
        val full = spark.table(runT).filter(col("_epoch") === lastEpoch).count()
        val kept = partial.filter(col("_epoch") === lastEpoch).count()
        assert(kept >= 1 && kept < full, s"strict non-empty subset: $kept/$full")
        partial.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet").saveAsTable(runT)
        val markScrub = spark.table(markT)
          .filter(col("_epoch") =!= lastEpoch).localCheckpoint(true)
        markScrub.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet").saveAsTable(markT)
        import scala.jdk.CollectionConverters._
        val commits = Paths.get(ckpt, "commits")
        val lastCommit = Files.list(commits).iterator().asScala.toSeq
          .filter(p => p.getFileName.toString.forall(_.isDigit))
          .maxBy(_.getFileName.toString.toLong)
        Files.delete(lastCommit)
        Files.deleteIfExists(
          commits.resolve(s".${lastCommit.getFileName}.crc"))

        val replayApplied = S15StreamBpeEncodeStore.maintain(
          spark, runT, dict, stream(), checkpoint = Some(ckpt))
        assert(replayApplied === 1L,
          s"the partial epoch must be re-applied once, got $replayApplied")
        val after = spark.table(runT).collect().map(_.toString).sorted.toSeq
        assert(after === committed,
          "scrub+re-append must restore exactly the committed state")
        // and the merged report equals the one-shot batch encode
        val got = Q64bBpeEncode.finishFertility(
            spark.table(runT).drop("_epoch"))
          .collect().map(_.toString).toSeq
        val expect = Q64eBpeEncodeStore.run(spark, sf)
          .collect().map(_.toString).toSeq
        assert(got === expect)
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $runT")
        spark.sql(s"DROP TABLE IF EXISTS $markT")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}

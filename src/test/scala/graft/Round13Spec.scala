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

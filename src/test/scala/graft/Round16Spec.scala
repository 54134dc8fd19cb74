package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.queries._

/** Round-16 closures (VERDICT r15 "next round" + ADVICE r15):
  *  - q75d: the table-driven three-arm fusion engages BOTH postings
  *    prunes from the dynamic batch (#1);
  *  - s26: the persisted gate report serves the bound snapshot (#2);
  *  - q74b: the literal-`isin` ceiling is priced — past
  *    LiteralPruneMaxTerms the serve drops the literal, above
  *    MaxTerms it fails loudly (#3 / ADVICE low);
  *  - wav: the REAL RIFF/WAVE codec roundtrip is byte-exact (#4);
  *  - s23's epoch guard: crash between data append and marker,
  *    dead-JVM restart from the checkpoint scrubs the torn epoch and
  *    continues exactly-once (#6);
  *  - q64o/q64p: the measurement unroll depth derives from the
  *    arriving batch, so long fully-covered words are never
  *    mis-counted as [UNK]/OOV (ADVICE r15 medium). */
class Round16Spec extends SparkSpec {

  private def rmTree(p: java.nio.file.Path): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)

  test("q75d: table-driven fusion — BOTH postings prunes engage from the dynamic batch; every arm contributes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = Q75dFusionQueryTables.run(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "table-driven fusion returned nothing")
    assert(!df.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "table-driven fusion re-read the corpus (the lex/prox arms must serve from the store)")
    val nTerms = Q75dFusionQueryTables.termBatch.flatMap(_._2).distinct.size
    val postScans = flattenPlan(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }
    assert(postScans.size >= 2,
      s"expected the lex AND prox arms' postings scans, got ${postScans.size}")
    postScans.foreach { f =>
      assert(f.optionalBucketSet.exists(_.cardinality() <= nTerms),
        s"a postings scan did not engage bucket pruning from the dynamic " +
          s"batch: ${f.optionalBucketSet.map(_.cardinality())} (want <= $nTerms)")
    }
    // Every batch query answered; no arm is dead weight.
    assert(rows.map(_.getInt(0)).toSet ==
      Q75dFusionQueryTables.termBatch.map(_._1).toSet,
      "a batch query vanished from the fused result")
    assert(rows.exists(_.getAs[Int]("lex_rank") > 0) &&
      rows.exists(_.getAs[Int]("sem_rank") > 0) &&
      rows.exists(_.getAs[Int]("prox_rank") > 0),
      "an arm never contributed to the fusion")
  }

  test("q64o/q64p: fully-covered arriving words longer than the fixture bound are never [UNK]/OOV (ADVICE r15 medium)") {
    import spark.implicits._
    // WordPiece: init 'table' + 12× cont 'le' = 13 pieces, 29 chars —
    // needs >10 greedy steps; the old fixed unroll read it as [UNK].
    val (piecesO, statsO) = Q64oWordpieceDriftGatedStore.ensureStore(spark, sf)
    val longWp = "table" + ("le" * 12)
    val repO = Q64oWordpieceDriftGatedStore.decide(spark, piecesO, statsO,
        Seq(("xx", s"$longWp $longWp table")).toDF("lang", "text"))
      .collect().find(_.getString(0) == "xx").get
    assert(repO.getAs[Long]("unk_words") == 0L,
      s"long fully-covered WordPiece word counted as [UNK]: $repO")
    // Unigram: 15 covered chars — needs 15 DP steps; the old fixed
    // unroll never completed the DP and counted it OOV, contradicting
    // q64p's own OOV definition (chars outside the inventory).
    val (piecesP, statsP) = Q64pUnigramDriftGatedStore.ensureStore(spark, sf)
    val repP = Q64pUnigramDriftGatedStore.decide(spark, piecesP, statsP,
        Seq(("xx", "tabletabletable table row")).toDF("lang", "text"))
      .collect().find(_.getString(0) == "xx").get
    assert(repP.getAs[Long]("oov_words") == 0L,
      s"long fully-covered Unigram word counted as OOV: $repP")
    // Both rows still trip retrain (no stored baseline for lang 'xx')
    // — the new-language rule is orthogonal to the unroll fix.
    assert(repO.getAs[Boolean]("retrain") && repP.getAs[Boolean]("retrain"),
      "missing-baseline language failed to trip the gate")
    // Blast-radius bound (round-16 review): a pathological over-length
    // "word" must count OOV/[UNK] BY CONTRACT (Bpe.MaxMeasuredWordLen)
    // instead of driving the unroll to hundreds of sequential jobs.
    val monster = "a" * 200
    val repO2 = Q64oWordpieceDriftGatedStore.decide(spark, piecesO, statsO,
        Seq(("xx", s"$monster table")).toDF("lang", "text"))
      .collect().find(_.getString(0) == "xx").get
    assert(repO2.getAs[Long]("unk_words") == 1L,
      s"over-length word did not land in the [UNK] arm: $repO2")
    val repP2 = Q64pUnigramDriftGatedStore.decide(spark, piecesP, statsP,
        Seq(("xx", s"$monster table")).toDF("lang", "text"))
      .collect().find(_.getString(0) == "xx").get
    assert(repP2.getAs[Long]("oov_words") == 1L,
      s"over-length word did not land in the OOV arm: $repP2")
  }

  test("wav: the real RIFF/WAVE roundtrip is byte-exact (VERDICT r15 #4)") {
    val bytes = "Spark join fast! 0127 tab".getBytes("UTF-8")
    val wav = Multimodal.encodeWav(bytes)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
      "synthesized payload is not a RIFF/WAVE container")
    val d = Multimodal.WavCodec.decode(wav, Multimodal.MediaMeta("wav", 16, 16, 8))
    assert(d.pixels.toSeq == bytes.map(_ & 0xff).toSeq,
      "decode is not byte-exact — every integer audio feature would drift")
    // Zero-sample clip: a header-only container decodes to no samples
    // (the q25b empty-clip rule holds through the real codec).
    val empty = Multimodal.WavCodec.decode(
      Multimodal.encodeWav(Array.emptyByteArray),
      Multimodal.MediaMeta("wav", 16, 16, 1))
    assert(empty.pixels.isEmpty, "empty clip decoded to phantom samples")
    // And the Spark-side tier really carries WAV bytes, not raw text.
    val payloads = Multimodal.wavRows(Multimodal.mediaTable(spark, sf))
      .take(3).map(_.payload)
    assert(payloads.nonEmpty &&
      payloads.forall(p => new String(p.take(4), "US-ASCII") == "RIFF"),
      "wavRows did not synthesize RIFF payloads")
  }

  test("s23 epoch guard: crash between data append and marker — dead-JVM restart from the checkpoint scrubs the torn epoch and continues exactly-once (VERDICT r15 #6)") {
    import graft.streaming.StreamQueries
    val dir = Files.createTempDirectory("s23crash").toString
    try {
      Tables.documents(spark, sf).repartition(3)
        .write.parquet(s"$dir/delta")
      val sch = spark.read.parquet(s"$dir/delta").schema
      def stream() = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/delta/*.parquet")
      val runT = "graft_r16_crash_postings"
      val markerT = StreamQueries.epochMarkerTable(runT)
      graft.plans.Stores.dropManaged(spark, runT)
      graft.plans.Stores.dropManaged(spark, markerT)
      Q74Bm25.postingsOf(Tables.documents(spark, sf).limit(0))
        .withColumn("_epoch", lit(-1L))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet").saveAsTable(runT)
      val ckpt = s"$dir/ckpt"
      try {
        // Crash epoch 1 AFTER its data append, BEFORE its marker —
        // the exact torn state the guard exists for.
        val boom = intercept[Throwable] {
          StreamQueries.maintainAppend(spark, runT, stream(), Some(ckpt),
            injectBeforeMarker = e => if (e == 1L)
              throw new RuntimeException(s"injected crash before marker ($e)"))(
            Q74Bm25.postingsOf)
        }
        val msgs = Iterator.iterate(boom.asInstanceOf[Throwable])(_.getCause)
          .takeWhile(_ != null).take(8)
          .map(t => Option(t.getMessage).getOrElse("")).toSeq
        assert(msgs.exists(_.contains("injected crash")),
          s"stream failed for a different reason: $msgs")
        spark.catalog.refreshTable(runT)
        spark.catalog.refreshTable(markerT)
        assert(spark.table(runT).filter(col("_epoch") === 1L).count() > 0,
          "no torn-epoch rows on disk — the injection missed its window")
        assert(spark.table(markerT).filter(col("_epoch") === 1L).isEmpty,
          "a marker landed for the torn epoch — the crash was not torn at all")
        // Dead JVM + fresh process: the in-memory catalog forgets both
        // tables while the warehouse dirs and the stream checkpoint
        // persist (the Round15Spec batch-recovery technique).
        val wh = graft.plans.Stores.warehouse(spark)
        val stash = Files.createTempDirectory("whstash16")
        try {
          Seq(runT, markerT).foreach(t => Files.move(wh.resolve(t),
            stash.resolve(t), StandardCopyOption.ATOMIC_MOVE))
          Seq(runT, markerT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
          Seq(runT, markerT).foreach(t => Files.move(stash.resolve(t),
            wh.resolve(t), StandardCopyOption.ATOMIC_MOVE))
        } finally rmTree(stash)
        assert(!spark.catalog.tableExists(runT) &&
          Files.isDirectory(wh.resolve(runT)), "fresh-catalog setup broken")
        // The restarting process re-binds its tables (the Stores.bind
        // shape — in production these live in a shared metastore).
        Seq(runT, markerT).foreach { t =>
          val loc = wh.resolve(t)
          val ddl = spark.read.parquet(loc.toString).schema.toDDL
          spark.sql(s"CREATE TABLE $t ($ddl) USING parquet " +
            s"LOCATION '${loc.toUri}'")
        }
        // Restart from the SAME checkpoint: the uncommitted epoch 1
        // re-delivers (its stream offset never committed), the guard
        // sees rows-without-marker, scrubs and re-applies; epoch 2
        // then processes normally.
        val applied = StreamQueries.maintainAppend(
          spark, runT, stream(), Some(ckpt))(Q74Bm25.postingsOf)
        assert(applied == 2L,
          s"expected torn epoch 1 re-applied + epoch 2, got $applied")
        // Exactly-once: the accumulated index equals the batch
        // tokenize — nothing lost, nothing doubled.
        val got = StreamQueries.epochless(spark.table(runT))
          .collect().map(_.toString).sorted.toSeq
        val expect = Q74Bm25.postingsOf(Tables.documents(spark, sf))
          .collect().map(_.toString).sorted.toSeq
        assert(got == expect, "recovered index diverged from the batch tokenize")
      } finally {
        graft.plans.Stores.dropManaged(spark, runT)
        graft.plans.Stores.dropManaged(spark, markerT)
      }
    } finally rmTree(java.nio.file.Paths.get(dir))
  }

  test("s26: the gate report persists per snapshot; the bound report equals the streamed gate (VERDICT r15 #2)") {
    import graft.streaming.S26StreamDriftGate
    val reportT = S26StreamDriftGate.ensureGateReport(spark, sf)
    // Second ensure binds the committed store — same fingerprinted name.
    assert(S26StreamDriftGate.ensureGateReport(spark, sf) == reportT,
      "re-ensure did not bind the committed report")
    val fromStore = S26StreamDriftGate.run(spark, sf)
      .collect().map(_.toString).toSeq
    val streamed = S26StreamDriftGate.streamedGate(spark, sf)
      .collect().map(_.toString).toSeq
    assert(fromStore == streamed,
      "the bound report diverged from the streamed gate")
  }

  test("q77d/s27: DSIR admission — frozen bar equals the top-K's min weight; delta serve is store-only and matches the batch scorer") {
    import spark.implicits._
    val (lamT, barT) = Q77dDsirStore.ensureStore(spark, sf)
    val (thresh, lam0) = Q77dDsirStore.barOf(spark, barT)
    // The frozen bar IS the SelectK-th ranked weight of the build
    // corpus, and threshold admission over the corpus selects a
    // SUPERSET of q77's top-K (equality unless weights tie at rank K
    // — the documented tie semantics).
    val batch = Q77DsirSelection.run(spark, sf).collect()
    val topWeights = batch.filter(_.getAs[Boolean]("selected"))
      .map(_.getAs[Long]("weight_q"))
    assert(thresh == topWeights.min,
      s"frozen bar $thresh != min selected weight ${topWeights.min}")
    val served = Q77dDsirStore.run(spark, sf).collect()
    val batchSel = batch.filter(_.getAs[Boolean]("selected"))
      .map(_.getLong(0)).toSet
    val servedSel = served.filter(_.getAs[Boolean]("selected"))
      .map(_.getLong(0)).toSet
    assert(batchSel.subsetOf(servedSel),
      "threshold admission dropped a top-K doc")
    // Per-doc weights identical between tiers (same λ, same integers).
    val bw = batch.map(r => r.getLong(0) -> r.getAs[Long]("weight_q")).toMap
    served.foreach(r => assert(bw(r.getLong(0)) == r.getAs[Long]("weight_q"),
      s"store-served weight diverged for doc ${r.getLong(0)}"))
    // A DELTA disjoint from the corpus serves against the FROZEN
    // model with no corpus-side work: the plan must not read
    // documents.parquet at all.
    val delta = Seq((900001L, "spark join fast table hash"),
      (900002L, "zz qq xx")).toDF("doc_id", "text")
    val dServe = Q77dDsirStore.serveFrom(spark, delta, lamT, thresh, lam0)
    assert(!dServe.queryExecution.executedPlan.toString
      .contains("documents.parquet"),
      "delta admission re-read the corpus — the store is the model")
    val dRows = dServe.collect().map(r => r.getLong(0) -> r).toMap
    assert(dRows.size == 2 &&
      dRows.values.forall(_.getAs[Long]("n_grams") > 0),
      s"delta scoring broken: ${dRows.values.mkString(", ")}")
    // Buckets UNSEEN at build take the smoothed λ₀ — never a silent
    // drop (the gap this spec caught): "zz qq"/"qq xx" are novel
    // bigrams, so the doc's weight is exactly n_grams · λ₀.
    val novel = dRows(900002L)
    assert(novel.getAs[Long]("weight_q") ==
      novel.getAs[Long]("n_grams") * lam0,
      s"unseen-bucket grams not scored at lam0: $novel (lam0=$lam0)")
  }

  test("q74b: past LiteralPruneMaxTerms the serve drops the literal and scores are unchanged; MaxTerms fails loudly (VERDICT r15 #3)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (postT, lenT, metaT) = Q74bBm25Store.ensureStore(spark, sf)
    val base = Q74fBm25QueryTable.queriesDf(spark)
    def ranked(q: DataFrame) = Q74Bm25.topK(
      Q74bBm25Store.scoredFromQueries(spark, postT, lenT, metaT, q), 10)
    // Pad past the literal-prune threshold (occupancy-derived: 4·B)
    // with never-matching terms under a fresh query id: real queries'
    // scores must not move (df falls out of the scanned postings
    // slice — non-matching terms contribute no rows), and the plan
    // must NOT carry the literal.
    val pad = spark.range(Q74bBm25Store.LiteralPruneMaxTerms + 1L)
      .select(lit(999).cast("int").as("query_id"),
        concat(lit("zzqt"), col("id")).as("word"))
    val padded = ranked(base.unionByName(pad))
    val scans = flattenPlan(padded.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }
    assert(scans.nonEmpty, "postings scan missing from the big-batch plan")
    assert(scans.forall(_.optionalBucketSet.forall(_.cardinality() == 16)),
      "big-batch serve still materialized a bucket-pruning literal")
    val gotPadded = padded.filter(col("query_id") =!= 999)
      .collect().map(_.toString).toSeq
    val gotBase = ranked(base).collect().map(_.toString).toSeq
    assert(gotPadded == gotBase,
      "padding with non-matching terms changed real queries' scores")
    // The hard ceiling is a loud contract, not an OOM.
    val over = spark.range(Q74bBm25Store.MaxTerms + 1L)
      .select(lit(1).cast("int").as("query_id"),
        concat(lit("zq"), col("id")).as("word"))
    val e = intercept[IllegalArgumentException] {
      Q74bBm25Store.scoredFromQueries(spark, postT, lenT, metaT, over)
    }
    assert(e.getMessage.contains("driver-scale contract"))
  }
}

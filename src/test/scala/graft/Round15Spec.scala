package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.queries.Q74bBm25Store

/** Round 15: the two ADVICE r14 closures.
  *
  *  - HIGH (`Stores.ensure` stale sweep): the live fingerprint's
  *    admission log is named `<name>_admlog`, which startsWith the
  *    family prefix but was never in `names` — so a FRESH-CATALOG
  *    re-bind (the normal cross-process path) classified it stale and
  *    deleteTree'd it, destroying the torn-intent record before scrub
  *    could run and re-priming adm_ids at 0 against data rows still
  *    tagged with the old ids. Round14Spec's crash tests missed it
  *    because they stay in one session where the fast-path return
  *    skips the sweep entirely. The test here reproduces the dead-JVM
  *    state literally: warehouse dirs + commit marker persist, the
  *    catalog forgets every table, then `ensureStore` must re-bind
  *    data AND log, scrub the torn admission, and keep every
  *    previously COMMITTED admission's rows.
  *
  *  - MEDIUM (`Q64nBpeDriftGatedStore.decide`): the gate inner-joined
  *    measured arrivals with the frozen baseline on lang, so a wholly
  *    NEW language (the loudest possible drift) produced no report row
  *    and could never trip retrain. Now a left join; a missing stored
  *    baseline forces retrain=true. */
class Round15Spec extends SparkSpec {

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(p)
      val paths = try s.iterator().asScala.toVector finally s.close()
      paths.reverse.foreach(Files.deleteIfExists(_))
    }

  private def withTempCorpus[A](tag: String,
      rows: Seq[(Long, String)])(body: String => A): A = {
    import spark.implicits._
    val dir = Files.createTempDirectory(tag)
    try {
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("web"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      body(dir.toString)
    } finally rmTree(dir)
  }

  test("stores: fresh-catalog re-bind spares the live admission log, scrubs the torn intent, keeps committed admissions") {
    val base = Seq(1L -> "spark join fast table hash",
      2L -> "stream window agg join")
    val delta1 = Seq(10L -> "spark spark hash table", 11L -> "window stream")
    val delta2 = Seq(20L -> "join hash window", 21L -> "table stream agg")
    withTempCorpus("bm25rebind", base) { dir =>
      import spark.implicits._
      var tables = Seq.empty[String]
      try {
        val (postT, lenT, metaT) = Q74bBm25Store.ensureStore(spark, dir)
        val logT = graft.plans.AdmitLog.logTableOf(postT)
        tables = Seq(postT, lenT, metaT, logT)
        // One COMMITTED admission (adm_id 0): its rows must survive
        // everything below — the ADVICE's second-order corruption was
        // a re-primed log whose later scrub deletes these.
        Q74bBm25Store.admit(spark, delta1.toDF("doc_id", "text"),
          postT, lenT, metaT)
        val committedServe = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
          .collect().map(_.toString).toSeq
        // One TORN admission (adm_id 1): crash after the postings
        // append — the state a dead writer leaves for the NEXT process.
        intercept[RuntimeException] {
          Q74bBm25Store.admit(spark, delta2.toDF("doc_id", "text"),
            postT, lenT, metaT, injectCrashAfter = 1)
        }
        assert(graft.plans.AdmitLog.torn(spark, logT).nonEmpty, "no torn intent")
        // Simulate the dead JVM + fresh process: the in-memory catalog
        // forgets every table while warehouse dirs and the commit
        // marker persist. DROP TABLE on a managed table deletes its
        // data, so stash the dirs aside first and restore them after.
        val wh = graft.plans.Stores.warehouse(spark)
        val stash = Files.createTempDirectory("whstash")
        try {
          tables.foreach(t => Files.move(wh.resolve(t), stash.resolve(t),
            StandardCopyOption.ATOMIC_MOVE))
          tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
          tables.foreach(t => Files.move(stash.resolve(t), wh.resolve(t),
            StandardCopyOption.ATOMIC_MOVE))
        } finally rmTree(stash)
        assert(!spark.catalog.tableExists(logT) &&
          Files.isDirectory(wh.resolve(logT)), "fresh-catalog setup broken")
        // The re-bind path: sweep + bind + scrub, all under the lock.
        Q74bBm25Store.ensureStore(spark, dir)
        assert(Files.isDirectory(wh.resolve(logT)),
          "stale sweep deleted the LIVE admission log on re-bind")
        assert(spark.catalog.tableExists(logT),
          "re-bind did not restore the admission log table")
        // The torn admission is scrubbed; the committed one intact.
        assert(graft.plans.AdmitLog.torn(spark, logT).isEmpty,
          "torn intent survived the re-bind scrub")
        val afterRebind = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
          .collect().map(_.toString).toSeq
        assert(afterRebind == committedServe,
          s"re-bind lost a committed admission: $afterRebind vs $committedServe")
        assert(spark.table(postT).filter(col("_adm") === 0L).count() > 0,
          "committed admission's rows scrubbed")
        // adm_ids continue from the preserved log — the next admission
        // must NOT reuse id 0/1 (a re-primed log restarts at 0).
        Q74bBm25Store.admit(spark, delta2.toDF("doc_id", "text"),
          postT, lenT, metaT)
        val ids = spark.table(logT).select(col("adm_id"))
          .collect().map(_.getLong(0)).toSet
        assert(ids.max >= 2L, s"adm_ids re-primed after re-bind: $ids")
        // End state = a crash-free rebuild over base ∪ delta1 ∪ delta2.
        val admitted = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
          .collect().map(_.toString).toSeq
        val full = withTempCorpus("bm25rebindref", base ++ delta1 ++ delta2) {
          refDir =>
            val (p2, l2, m2) = Q74bBm25Store.ensureStore(spark, refDir)
            try Q74bBm25Store.serveFrom(spark, p2, l2, m2)
              .collect().map(_.toString).toSeq
            finally Seq(p2, l2, m2, graft.plans.AdmitLog.logTableOf(p2))
              .foreach(graft.plans.Stores.dropManaged(spark, _))
        }
        assert(admitted == full,
          s"post-rebind admit diverges from rebuild: $admitted vs $full")
        // The scrub rewrite went through insertInto — the catalog's
        // bucket spec must still route the files, or the serve's
        // static bucket prune would silently disengage.
        import org.apache.spark.sql.execution.FileSourceScanExec
        val serveDf = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
        serveDf.collect()
        val postScan = flattenPlan(serveDf.queryExecution.executedPlan)
          .collectFirst {
            case f: FileSourceScanExec if f.tableIdentifier.exists(
              _.table == postT) => f
          }
        val nTerms = graft.queries.Q74Bm25.querySet.flatMap(_._2).distinct.size
        assert(postScan.exists(_.optionalBucketSet.exists(
          _.cardinality() <= nTerms)),
          s"post-scrub serve lost the bucket prune: " +
            s"${postScan.map(_.optionalBucketSet)} (want <= $nTerms)")
      } finally {
        tables.foreach(graft.plans.Stores.dropManaged(spark, _))
        graft.plans.Stores.gcMarkers(spark, "graft_bm25store")
      }
    }
  }

  test("q77c: parameterized DSIR target — train-split target reproduces q77; a different target shifts the selection toward it") {
    import graft.queries.{Q40TrainTestSplit, Q77DsirSelection, Q77cDsirTarget}
    val docs = Tables.documents(spark, sf01)
    // (a) The general two-frame path with target = the train split is
    // EXACTLY the specialized q77 plan's answer — the parameterization
    // cannot drift from the oracle-gated default.
    val viaGeneral = Q77DsirSelection.selectionVs(spark, docs,
        docs.filter(Q40TrainTestSplit.splitColOf("doc_id") === "train"))
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    val viaQ77 = Q77DsirSelection.run(spark, sf01)
      .collect().map(_.toString).toSeq
    assert(viaGeneral == viaQ77,
      "general target path with train-split target diverges from q77")
    // (b) A different curated target SHIFTS the selection — and toward
    // the target: the de-target selection carries a strictly higher
    // share of German docs than the train-split selection.
    def selectedLangs(rows: Array[org.apache.spark.sql.Row]): Map[Long, Unit] =
      rows.filter(_.getAs[Boolean]("selected"))
        .map(r => r.getLong(0) -> ()).toMap
    val selDe = selectedLangs(Q77cDsirTarget.run(spark, sf01).collect())
    val selTrain = selectedLangs(Q77DsirSelection.run(spark, sf01).collect())
    assert(selDe.keySet != selTrain.keySet,
      "target change did not shift the selection")
    val langOf = docs.select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def deShare(sel: Set[Long]): Double =
      sel.count(langOf(_) == "de").toDouble / sel.size
    assert(deShare(selDe.keySet) > deShare(selTrain.keySet),
      s"de-target selection not de-skewed: ${deShare(selDe.keySet)} vs " +
        s"${deShare(selTrain.keySet)}")
  }

  test("q74f: query-table serve keeps the engaged bucket prune and never reads the corpus") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.queries.Q74fBm25QueryTable
    val df = Q74fBm25QueryTable.run(spark, sf)
    assert(df.count() > 0, "query-table serve returned nothing")
    val plan = flattenPlan(df.queryExecution.executedPlan)
    assert(!df.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "query-table serve re-read the corpus")
    val nTerms = Q74fBm25QueryTable.batch.flatMap(_._2).distinct.size
    val postScan = plan.collectFirst {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }
    assert(postScan.isDefined, "postings store scan missing")
    assert(postScan.get.optionalBucketSet.exists(_.cardinality() <= nTerms),
      s"dynamic batch did not engage bucket pruning: " +
        s"${postScan.get.optionalBucketSet.map(_.cardinality())} (want <= $nTerms)")
    // Duplicate (query_id, word) pairs — the shape a batch built by
    // tokenizing query text produces — must not change scores: BM25
    // saturation lives in tf, never in query-term multiplicity.
    import graft.queries.{Q74Bm25, Q74bBm25Store}
    val (postT, lenT, metaT) = Q74bBm25Store.ensureStore(spark, sf)
    val batch = Q74fBm25QueryTable.queriesDf(spark)
    def serve(q: org.apache.spark.sql.DataFrame) =
      Q74Bm25.topK(Q74bBm25Store.scoredFromQueries(
        spark, postT, lenT, metaT, q), 10).collect().map(_.toString).toSeq
    assert(serve(batch.unionByName(batch)) == serve(batch),
      "duplicated query pairs changed the scores")
  }

  test("q74c phrases as data: a caller-provided phrase batch serves through the shared plan (brute-force ground truth)") {
    import graft.queries.{Q74bBm25Store, Q74cBm25PhraseStore}
    // A batch disjoint from the compiled-in phraseSet, drawn from
    // bigrams verified present in the fixture generator's stream.
    val phrases = Seq(7 -> Seq("order", "fast"), 8 -> Seq("window", "join"))
    val postT = Q74bBm25Store.ensureStore(spark, sf)._1
    val got = Q74cBm25PhraseStore
      .serveFromFrame(spark, spark.table(postT), phrases)
      .collect().map(r => (r.getInt(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got.nonEmpty, "custom phrase batch matched nothing")
    // Brute-force string-level recount (the Round14Spec technique).
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+")
        .map(_.toLowerCase.replaceAll("[^a-zA-Z]", "")).filter(_.nonEmpty))
    val expect = (for {
      (qid, phrase) <- phrases
      (docId, toks) <- docs
      n = toks.indices.count(i => i + phrase.length <= toks.length &&
        phrase.indices.forall(j => toks(i + j) == phrase(j)))
      if n > 0
    } yield (qid, docId) -> n.toLong).toMap
    got.foreach { case (k, n) =>
      assert(expect.get(k).contains(n),
        s"$k: custom-batch store says $n, brute force says ${expect.get(k)}")
    }
    phrases.foreach { case (qid, _) =>
      val want = expect.toSeq
        .collect { case ((q, d), n) if q == qid => (n, d) }
        .sortBy { case (n, d) => (-n, d) }.take(10).map(_._2).toSet
      val have = got.keys.collect { case (q, d) if q == qid => d }.toSet
      assert(have == want, s"phrase $qid ranked set diverges: $have vs $want")
    }
  }

  test("q19h: query-batch ANN — rank law, self-exclusion, and an external (non-corpus) vector batch works") {
    import graft.queries.Q19hAnnQueryBatch
    val rows = Q19hAnnQueryBatch.run(spark, sf01).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Q19hAnnQueryBatch.batchVecIds.toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"q$q ranks gap")
      assert(!rs.exists(_.getLong(2) == q), s"q$q did not self-exclude")
      val cos = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted(Ordering[Double].reverse),
        s"q$q cosines not nonincreasing")
    }
    // External vectors: ids that collide with no corpus vec_id — the
    // no-exclusion path; a corpus-mean probe must still rank k docs.
    val embs = Tables.embeddings(spark, sf01)
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    import spark.implicits._
    val ext = Seq((100000L, Array.fill(dim)(0.25f)))
      .toDF("query_id", "qv")
    val extRows = Q19hAnnQueryBatch.topKFor(spark, embs, ext).collect()
    assert(extRows.length == 10 &&
      extRows.map(_.getInt(1)).toSeq == (1 to 10),
      s"external-vector batch broke: ${extRows.length} rows")
  }

  test("q75c: three-arm fusion — RRF arithmetic, corpus-free pruned plan, proximity arm live") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.queries.{Q74Bm25, Q75cHybridRrf3, Q75HybridRrf}
    val df = Q75cHybridRrf3.run(spark, sf01)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Set(1, 2, 3))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"q$q ranks gap")
    }
    rows.foreach { r =>
      val (lex, sem, prox, rrf) =
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getDouble(3))
      val expect = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (sem > 0) 1.0 / (60 + sem) else 0.0) +
        (if (prox > 0) 1.0 / (60 + prox) else 0.0)
      assert(rrf == expect && (lex > 0 || sem > 0 || prox > 0),
        s"rrf mismatch: $r")
    }
    // The proximity arm must be LIVE: its rank order diverges from the
    // plain lexical order somewhere in the fused top-10 (otherwise the
    // third arm is a no-op re-weighting of the first).
    assert(rows.exists(r => r.getInt(6) > 0 && r.getInt(4) > 0 &&
      r.getInt(6) != r.getInt(4)),
      "proximity arm never reordered vs lexical — third arm not live")
    // And the three-arm list must differ from q75's two-arm fusion.
    val twoArm = Q75HybridRrf.run(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val threeArm = rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(threeArm != twoArm, "third arm did not change the fused ranking")
    // Plan: the index arms never read the corpus; postings pruned.
    df.collect()
    val plan = flattenPlan(df.queryExecution.executedPlan)
    assert(!df.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "three-arm fusion re-read the corpus")
    val nTerms = Q74Bm25.querySet.flatMap(_._2).distinct.size
    plan.collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }.foreach { f =>
      assert(f.optionalBucketSet.exists(_.cardinality() <= nTerms),
        s"postings scan not pruned: ${f.optionalBucketSet.map(_.cardinality())}")
    }
  }

  private def rotDoc(id: Long, words: Seq[String]): (Long, String) =
    id -> (0 until 12).map(i => words((id + i).toInt % words.size)).mkString(" ")

  test("q64o wordpiece gate: calm arrivals serve stale; an [UNK] jump or a new language retrains; re-freezing the baseline clears it") {
    import graft.queries.Q64oWordpieceDriftGatedStore
    import spark.implicits._
    // Every training word is a single InitPiece — fertility exactly
    // 1.0, [UNK] rate exactly 0: the baseline is analytically pinned.
    val vocabWp = Seq("table", "data", "hash", "join", "spark")
    val corpusA = (1L to 20L).map(rotDoc(_, vocabWp))
    def df(rows: Seq[(Long, String)], lang: String = "en") =
      rows.map { case (id, t) => (id, t, lang) }.toDF("doc_id", "text", "lang")
    withTempCorpus("dgwp", corpusA) { dir =>
      var tables = Seq.empty[String]
      try {
        val (piecesT, statsT) =
          Q64oWordpieceDriftGatedStore.ensureStore(spark, dir)
        tables = Seq(piecesT, statsT)
        // Calm: same vocabulary, near-same mix — serve stale.
        val calm = Q64oWordpieceDriftGatedStore.decide(spark, piecesT,
          statsT, df(corpusA :+ rotDoc(21L, vocabWp))).collect()
        assert(calm.nonEmpty && calm.forall(!_.getAs[Boolean]("retrain")),
          s"calm arrival must serve stale: ${calm.mkString(";")}")
        // Trip: 'dup' has no 'u' continuation piece — [UNK] spikes.
        val tripped = Q64oWordpieceDriftGatedStore.decide(spark, piecesT,
          statsT, df((1L to 10L).map(id => id -> "dup dup dup dup"))).collect()
        assert(tripped.exists(r => r.getAs[Boolean]("retrain") &&
          r.getAs[Double]("unk_jump") > 0.5),
          s"[UNK] jump must trip the gate: ${tripped.mkString(";")}")
        // New language: no stored baseline — automatic trip.
        val nl = Q64oWordpieceDriftGatedStore.decide(spark, piecesT, statsT,
          df(corpusA).unionByName(df(Seq(100L -> "dup"), lang = "zz")))
          .collect().map(r => r.getString(0) -> r).toMap
        assert(nl("zz").getAs[Boolean]("retrain") &&
          nl("zz").isNullAt(nl("zz").fieldIndex("stored_fertility")),
          s"new language must trip: ${nl.get("zz")}")
        assert(!nl("en").getAs[Boolean]("retrain"), s"en drifted: ${nl.get("en")}")
        // Applying the verdict: re-freeze the baseline on the shifted
        // corpus — the gate reads clean again (drift-driven).
        val corpusC = (1L to 10L).map(id => id -> "dup dup dup dup")
        withTempCorpus("dgwpc", corpusC) { dirC =>
          var tc = Seq.empty[String]
          try {
            val (pT, sT) = Q64oWordpieceDriftGatedStore.ensureStore(spark, dirC)
            tc = Seq(pT, sT)
            val after = Q64oWordpieceDriftGatedStore.decide(spark, pT, sT,
              df(corpusC)).collect()
            assert(after.forall(!_.getAs[Boolean]("retrain")),
              s"post-refreeze gate must be clean: ${after.mkString(";")}")
          } finally tc.foreach(graft.plans.Stores.dropManaged(spark, _))
        }
      } finally {
        tables.foreach(graft.plans.Stores.dropManaged(spark, _))
        graft.plans.Stores.gcMarkers(spark, "graft_dgwp")
      }
    }
  }

  test("q64p unigram gate: calm arrivals serve stale; unseen-char OOV or a new language retrains; retraining clears it") {
    import graft.queries.Q64pUnigramDriftGatedStore
    import spark.implicits._
    val vocabU = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val corpusA = (1L to 20L).map(rotDoc(_, vocabU))
    def df(rows: Seq[(Long, String)], lang: String = "en") =
      rows.map { case (id, t) => (id, t, lang) }.toDF("doc_id", "text", "lang")
    withTempCorpus("dguni", corpusA) { dir =>
      var tables = Seq.empty[String]
      try {
        val (piecesT, statsT) =
          Q64pUnigramDriftGatedStore.ensureStore(spark, dir)
        tables = Seq(piecesT, statsT)
        val calm = Q64pUnigramDriftGatedStore.decide(spark, piecesT,
          statsT, df(corpusA)).collect()
        assert(calm.nonEmpty && calm.forall { r =>
          !r.getAs[Boolean]("retrain") && r.getAs[Long]("oov_words") == 0L },
          s"calm arrival must serve stale: ${calm.mkString(";")}")
        // Trip: 'z'/'x'/'q'/'v' never appear in training — every
        // arriving word is uncoverable, oov_rate 1.0.
        val tripped = Q64pUnigramDriftGatedStore.decide(spark, piecesT,
          statsT, df((1L to 10L).map(id => id -> "zqx vxz zqx vxz"))).collect()
        assert(tripped.exists(r => r.getAs[Boolean]("retrain") &&
          r.getAs[Double]("oov_rate") == 1.0),
          s"unseen-char OOV must trip the gate: ${tripped.mkString(";")}")
        val nl = Q64pUnigramDriftGatedStore.decide(spark, piecesT, statsT,
          df(corpusA).unionByName(df(Seq(100L -> "zqx"), lang = "zz")))
          .collect().map(r => r.getString(0) -> r).toMap
        assert(nl("zz").getAs[Boolean]("retrain") &&
          nl("zz").isNullAt(nl("zz").fieldIndex("stored_fertility")),
          s"new language must trip: ${nl.get("zz")}")
        assert(!nl("en").getAs[Boolean]("retrain"), s"en drifted: ${nl.get("en")}")
        // Retrain on the shifted corpus — its own snapshot reads clean.
        val corpusC = (1L to 10L).map(id => id -> "zqx vxz zqx vxz")
        withTempCorpus("dgunic", corpusC) { dirC =>
          var tc = Seq.empty[String]
          try {
            val (pT, sT) = Q64pUnigramDriftGatedStore.ensureStore(spark, dirC)
            tc = Seq(pT, sT)
            val after = Q64pUnigramDriftGatedStore.decide(spark, pT, sT,
              df(corpusC)).collect()
            assert(after.forall { r => !r.getAs[Boolean]("retrain") &&
              r.getAs[Long]("oov_words") == 0L },
              s"post-retrain gate must be clean: ${after.mkString(";")}")
          } finally tc.foreach(graft.plans.Stores.dropManaged(spark, _))
        }
      } finally {
        tables.foreach(graft.plans.Stores.dropManaged(spark, _))
        graft.plans.Stores.gcMarkers(spark, "graft_dguni")
      }
    }
  }

  test("s26: multi-epoch streamed drift gate equals the one-shot gate (additive partials, gate at serve)") {
    import org.apache.spark.sql.SaveMode
    import graft.streaming.{S26StreamDriftGate, StreamQueries}
    import graft.queries.{Q64nBpeDriftGatedStore, Q64oWordpieceDriftGatedStore, Q64pUnigramDriftGatedStore}
    val (vocabN, statsN) = Q64nBpeDriftGatedStore.ensureStore(spark, sf)
    val (piecesO, statsO) = Q64oWordpieceDriftGatedStore.ensureStore(spark, sf)
    val (piecesP, statsP) = Q64pUnigramDriftGatedStore.ensureStore(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("s26spec")
    val runT = "graft_s26spec_partials"
    try {
      Tables.documents(spark, sf).repartition(6).write.parquet(s"$dir/delta")
      val sch = spark.read.parquet(s"$dir/delta").schema
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/delta/*.parquet")
      graft.plans.Stores.dropManaged(spark, runT)
      S26StreamDriftGate.partialsBatch(spark,
          Tables.documents(spark, sf).limit(0), vocabN, piecesO, piecesP)
        .withColumn("_epoch", lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(runT)
      val epochs = StreamQueries.maintainAppend(spark, runT, stream)(
        S26StreamDriftGate.partialsBatch(spark, _, vocabN, piecesO, piecesP))
      assert(epochs >= 3, s"file-per-trigger must yield >=3 epochs, got $epochs")
      val streamed = S26StreamDriftGate.gateRollup(spark,
          StreamQueries.epochless(spark.table(runT)),
          statsN, statsO, statsP)
        .collect().map(_.toString).toSeq
      // Epoch-split invariance: the same gate over ONE-SHOT partials
      // of the full corpus (the path the driver hash-gates via run()).
      val oneShot = S26StreamDriftGate.gateRollup(spark,
          S26StreamDriftGate.partialsBatch(spark,
            Tables.documents(spark, sf), vocabN, piecesO, piecesP),
          statsN, statsO, statsP)
        .collect().map(_.toString).toSeq
      assert(streamed == oneShot,
        s"multi-epoch gate diverges from one-shot: " +
          s"${streamed.zip(oneShot).find { case (a, b) => a != b }}")
      assert(streamed.nonEmpty && streamed.size % 3 == 0,
        s"all three families must report: ${streamed.size} rows")
    } finally {
      graft.plans.Stores.dropManaged(spark, runT)
      graft.plans.Stores.dropManaged(spark,
        graft.streaming.StreamQueries.epochMarkerTable(runT))
      rmTree(dir)
    }
  }

  test("property: phrase serve over random corpora and random phrase batches == naive adjacency count") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.queries.{Q74Bm25, Q74cBm25PhraseStore}
    import spark.implicits._
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val vocab = Seq("ab", "cd", "ef", "gh")
    val docGen = Gen.chooseNum(0, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))).map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, docGen))
    val phraseGen = Gen.chooseNum(2, 3)
      .flatMap(k => Gen.listOfN(k, Gen.oneOf(vocab)))
    val batchGen = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, phraseGen))
    samples(Gen.zip(corpusGen, batchGen), 12).foreach { case (corpus, batch) =>
      val phrases = batch.zipWithIndex.map { case (p, i) => (i + 1) -> p.toSeq }
      val docs = corpus.zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }.toDF("doc_id", "text")
      val got = Q74cBm25PhraseStore
        .serveFromFrame(spark, Q74Bm25.postingsOf(docs), phrases)
        .collect().map(r => (r.getInt(0), r.getLong(2)) -> r.getLong(3)).toMap
      val expect = (for {
        (qid, phrase) <- phrases
        (text, di) <- corpus.zipWithIndex
        toks = text.split("\\s+").filter(_.nonEmpty)
        n = toks.indices.count(i => i + phrase.length <= toks.length &&
          phrase.indices.forall(j => toks(i + j) == phrase(j)))
        if n > 0
      } yield (qid, (di + 1).toLong) -> n.toLong).toMap
      assert(got == expect,
        s"phrase property failed on corpus=$corpus batch=$phrases: " +
          s"$got vs $expect")
    }
  }

  test("property: query-batch cosine values match a naive recomputation; rank law and self-exclusion hold") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.queries.Q19hAnnQueryBatch
    import spark.implicits._
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val vecGen = Gen.listOfN(5, Gen.chooseNum(-100, 100).map(_ / 16.0f))
      .suchThat(v => v.exists(_ != 0.0f))
    val setGen = Gen.chooseNum(3, 7).flatMap(n => Gen.listOfN(n, vecGen))
    samples(setGen, 8).foreach { vecs =>
      val embs = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }.toDF("vec_id", "embedding")
      // Queries: the first two corpus vectors (self-exclusion live).
      val queries = vecs.take(2).zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }.toDF("query_id", "qv")
      val rows = Q19hAnnQueryBatch.topKFor(spark, embs, queries).collect()
      def naiveCos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val n2 = a.map(x => x.toDouble * x.toDouble).sum
        val q2 = b.map(x => x.toDouble * x.toDouble).sum
        dot / (math.sqrt(n2) * math.sqrt(q2))
      }
      rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
        assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
          s"rank law broken for q$q")
        assert(!rs.exists(_.getLong(2) == q), s"q$q did not self-exclude")
      }
      rows.foreach { r =>
        val (q, v, cos) = (r.getLong(0), r.getLong(2), r.getDouble(3))
        val naive = naiveCos(vecs(v.toInt), vecs(q.toInt))
        assert(math.abs(cos - naive) < 1e-9,
          s"cosine diverges from naive: q$q v$v $cos vs $naive")
      }
    }
  }

  test("q64n gate: a language absent from the training baseline trips retrain") {
    import graft.queries.Q64nBpeDriftGatedStore
    import spark.implicits._
    val train = Seq(1L -> "spark join fast table hash",
      2L -> "stream window agg join table")
    withTempCorpus("dgnewlang", train) { dir =>
      var tables = Seq.empty[String]
      try {
        val (vT, sT) = Q64nBpeDriftGatedStore.ensureStore(spark, dir)
        tables = Seq(vT, sT)
        // Arrivals: the training language (clean) + a language the
        // baseline has never seen. Before the fix the zz row vanished
        // through the inner join — the gate's blind spot.
        // en arrivals = the training docs themselves (drift exactly 0)
        // so only the new language can trip the gate.
        val arriving = (train.map { case (id, t) => (id + 100L, t, "en") } :+
          ((200L, "zork blat quux fizzle", "zz")))
          .toDF("doc_id", "text", "lang")
        val rows = Q64nBpeDriftGatedStore.decide(spark, vT, sT, arriving)
          .collect()
        val byLang = rows.map(r => r.getString(0) -> r).toMap
        assert(byLang.contains("zz"),
          s"new language missing from the gate report: ${rows.mkString(";")}")
        val zz = byLang("zz")
        assert(zz.getAs[Boolean]("retrain"),
          s"new language did not trip retrain: $zz")
        assert(zz.isNullAt(zz.fieldIndex("stored_fertility")),
          s"new language should carry a null stored baseline: $zz")
        assert(byLang.contains("en") && !byLang("en").getAs[Boolean]("retrain"),
          s"training language must stay clean: ${byLang.get("en")}")
      } finally {
        tables.foreach(graft.plans.Stores.dropManaged(spark, _))
        graft.plans.Stores.gcMarkers(spark, "graft_dgvocab")
      }
    }
  }
}

package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.queries.{Q74Bm25, Q74bBm25Store, Q74cBm25PhraseStore}

/** Round 14: phrase retrieval over the positional postings store
  * (q74c) and the positions-carrying layout v2 of the BM25 store.
  * The DuckDB oracle pins phrase VALUES; these tests pin the POSTURE
  * (store-only pruned scans) and the ADDITIVITY claim (admit() and
  * the positions array compose — a phrase serve after admission is
  * indistinguishable from a full rebuild). */
class Round14Spec extends SparkSpec {

  test("positions are 1-based and contiguous per doc (wordsPosOf)") {
    val bad = Q74Bm25.wordsPosOf(Tables.documents(spark, sf))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        countDistinct(col("pos")).as("nd"), min(col("pos")).as("mn"))
      .filter(col("n") =!= col("mx") || col("n") =!= col("nd") ||
        col("mn") =!= 1)
    assert(bad.isEmpty,
      s"gapped/duplicated positions: ${bad.limit(3).collect().mkString(";")}")
  }

  test("q74c: serve plan scans only the pruned postings store") {
    val df = Q74cBm25PhraseStore.run(spark, sf)
    df.collect()
    val plan = flattenPlan(df.queryExecution.executedPlan)
    assert(!df.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "phrase tier re-read the corpus")
    val postingsScan = plan.collectFirst {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }
    assert(postingsScan.isDefined, "postings store scan missing")
    val nTerms = Q74cBm25PhraseStore.phraseSet.flatMap(_._2).distinct.size
    val selected = postingsScan.get.optionalBucketSet.map(_.cardinality())
    assert(selected.exists(_ <= nTerms),
      s"phrase scan not bucket-pruned: SelectedBucketsCount=$selected " +
        s"(want <= $nTerms of 16)")
  }

  test("q74c sanity: ranks contiguous, occurrence counts positive and nonincreasing") {
    val rows = Q74cBm25PhraseStore.run(spark, sf01).collect()
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Q74cBm25PhraseStore.phraseSet.map(_._1).toSet,
      s"phrases answered: ${byQ.keySet}")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length),
        s"phrase $q ranks not contiguous")
      val occ = rs.sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
      assert(occ.forall(_ > 0), s"phrase $q emitted a zero-occurrence doc")
      assert(occ == occ.sorted(Ordering[Long].reverse),
        s"phrase $q counts not nonincreasing: $occ")
    }
  }

  test("q74c brute-force ground truth at sf0.001: store counts = string-level scan") {
    // Independent of BOTH engines' relational plans: recount each
    // phrase by walking the normalized token list per doc in Scala.
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+")
        .map(_.toLowerCase.replaceAll("[^a-zA-Z]", "")).filter(_.nonEmpty))
    val expect = (for {
      (qid, phrase) <- Q74cBm25PhraseStore.phraseSet
      (docId, toks) <- docs
      n = toks.indices.count(i => i + phrase.length <= toks.length &&
        phrase.indices.forall(j => toks(i + j) == phrase(j)))
      if n > 0
    } yield (qid, docId) -> n.toLong).toMap
    val got = Q74cBm25PhraseStore.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2)) -> r.getLong(3)).toMap
    // run() caps at top-10 per phrase; every returned row must match
    // the brute-force count, and no phrase may miss a doc that should
    // have ranked (fixture has < 10 matching docs per phrase at sf0.001
    // or the top-10 boundary is exact by count ordering anyway).
    got.foreach { case (k, n) =>
      assert(expect.get(k).contains(n),
        s"$k: store says $n, brute force says ${expect.get(k)}")
    }
    Q74cBm25PhraseStore.phraseSet.foreach { case (qid, _) =>
      // .toSeq BEFORE collect: collecting (n, d) pairs out of a Map
      // would rebuild a Map keyed by n and collapse equal counts.
      val want = expect.toSeq
        .collect { case ((q, d), n) if q == qid => (n, d) }
        .sortBy { case (n, d) => (-n, d) }.take(10).map(_._2).toSet
      val have = got.keys.collect { case (q, d) if q == qid => d }.toSet
      assert(have == want, s"phrase $qid ranked set diverges: $have vs $want")
    }
  }

  test("q74c admit: phrase serve after delta admission = full-corpus rebuild") {
    import graft.queries.Q40TrainTestSplit
    val dir = java.nio.file.Files.createTempDirectory("q74cadmit")
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
      val got = Q74cBm25PhraseStore.serveFrom(spark, postT)
        .collect().map(_.toString).toSeq
      // The full-corpus store over sf0.01 is the rebuild reference.
      val fullPostT = Q74bBm25Store.ensureStore(spark, sf01)._1
      val expect = Q74cBm25PhraseStore.serveFrom(spark, fullPostT)
        .collect().map(_.toString).toSeq
      assert(got == expect, s"admitted phrase serve diverges: " +
        s"${got.zip(expect).find { case (x, y) => x != y }}")
    } finally {
      tables.foreach(graft.plans.Stores.dropManaged(spark, _))
      graft.plans.Stores.gcMarkers(spark, "graft_bm25store")
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      val paths = try s.iterator().asScala.toVector finally s.close()
      paths.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def withTempCorpus[A](tag: String,
      rows: Seq[(Long, String)])(body: String => A): A = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(tag)
    try {
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("web"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      body(dir.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      val paths = try s.iterator().asScala.toVector finally s.close()
      paths.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q74d: phrase boost is exactly one extra virtual term — plan pruned, semantics pinned") {
    import graft.queries.Q74dBm25PhraseBoost
    val df = Q74dBm25PhraseBoost.run(spark, sf01)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Q74dBm25PhraseBoost.querySet.map(_._1).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"q$q ranks gap")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted(Ordering[Double].reverse),
        s"q$q scores not nonincreasing")
    }
    // The virtual term is REAL on the fixture: some ranked doc must
    // carry matched > |terms| (it matched the phrase too), and the
    // phrase's contribution must be positive — a phrase-matching doc
    // scores strictly above what its matched count implies otherwise.
    val nTerms = Q74dBm25PhraseBoost.querySet.map { case (q, ts, _) =>
      q -> ts.size }.toMap
    assert(rows.exists(r => r.getLong(4) > nTerms(r.getInt(0))),
      "no ranked doc matched the phrase — boost not exercised")
    // Plan: one bucket-pruned postings scan family — never the corpus.
    df.collect()
    val plan = flattenPlan(df.queryExecution.executedPlan)
    assert(!df.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "boost tier re-read the corpus")
    val postScans = plan.collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }
    assert(postScans.nonEmpty, "postings store scan missing")
    val allWords = Q74dBm25PhraseBoost.querySet
      .flatMap { case (_, ts, ph) => ts ++ ph }.distinct.size
    postScans.foreach { f =>
      assert(f.optionalBucketSet.exists(_.cardinality() <= allWords),
        s"postings scan not bucket-pruned: ${f.optionalBucketSet.map(_.cardinality())}")
    }
  }

  test("q74e: proximity boost — mindist sane, boost live, plan pruned and corpus-free") {
    import graft.queries.Q74eBm25ProximityBoost
    val df = Q74eBm25ProximityBoost.run(spark, sf01)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Q74Bm25.querySet.map(_._1).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"q$q ranks gap")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted(Ordering[Double].reverse),
        s"q$q scores not nonincreasing")
    }
    rows.foreach { r =>
      val (matched, mindist) = (r.getLong(4), r.getLong(5))
      // Two different terms never share a position: a real cross-term
      // distance is >= 1; 0 is strictly the <2-distinct-terms sentinel.
      if (matched >= 2) assert(mindist >= 1, s"mindist 0 with matched>=2: $r")
      else assert(mindist == 0, s"sentinel violated: $r")
    }
    // Liveness: some ranked doc is close enough that the quantized
    // boost is nonzero (ln(1+e^-d) quantizes to 0 only past d ~ 14).
    assert(rows.exists(r => r.getLong(5) >= 1 && r.getLong(5) <= 13),
      "no ranked doc in boost range — proximity feature not exercised")
    // Plan posture: store-only, bucket-pruned.
    df.collect()
    val plan = flattenPlan(df.queryExecution.executedPlan)
    assert(!df.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "proximity tier re-read the corpus")
    val nTerms = Q74Bm25.querySet.flatMap(_._2).distinct.size
    plan.collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }.foreach { f =>
      assert(f.optionalBucketSet.exists(_.cardinality() <= nTerms),
        s"postings scan not pruned: ${f.optionalBucketSet.map(_.cardinality())}")
    }
  }

  test("q75b: store-armed fusion — RRF arithmetic, pruned scans, determinism, recall floor vs exact fusion") {
    import graft.queries.{Q75HybridRrf, Q75bHybridRrfStore}
    val df = Q75bHybridRrfStore.run(spark, sf)
    val rows = df.collect()
    // RRF arithmetic + rank contiguity (the q75 contract).
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Q74Bm25.querySet.map(_._1).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"q$q ranks gap")
    }
    rows.foreach { r =>
      val (lex, sem, rrf) = (r.getInt(4), r.getInt(5), r.getDouble(3))
      val expect = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (sem > 0) 1.0 / (60 + sem) else 0.0)
      assert(rrf == expect && (lex > 0 || sem > 0), s"rrf mismatch: $r")
    }
    // Plan posture: the IVF lists scan is partition-pruned and the
    // BM25 postings scan is bucket-pruned — both arms read indexes.
    val plan = flattenPlan(df.queryExecution.executedPlan)
    val listsScan = plan.collectFirst {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_annstore_lists")) => f
    }
    assert(listsScan.exists(_.partitionFilters.nonEmpty),
      s"lists scan not partition-pruned: $listsScan")
    val postScan = plan.collectFirst {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }
    assert(postScan.flatMap(_.optionalBucketSet).exists(_.cardinality() <=
      Q74Bm25.querySet.flatMap(_._2).distinct.size),
      "postings scan not bucket-pruned in the fused plan")
    // Deterministic: seeded KMeans + total tie orders ⇒ re-run identical.
    val again = Q75bHybridRrfStore.run(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "store-armed fusion is not deterministic")
    // Recall floor vs the exact fusion: the lex arm is EXACT (store ≡
    // recompute, q74b's gate), so any fused-list miss is an IVF probe
    // miss — measured 0.6–1.0 per query across sf0.001/0.01/0.1 at
    // NProbe=4 of K=16; floor with margin.
    val exact = Q75HybridRrf.run(spark, sf).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = rows.groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exact.map { case (q, docs) =>
      got(q).intersect(docs).size.toDouble / docs.size }
    assert(recalls.forall(_ >= 0.5), s"per-query recall under 0.5: $recalls")
    assert(recalls.sum / recalls.size >= 0.55,
      s"mean recall under 0.55: $recalls")
  }

  test("s24: streamed-ingest fusion = one-shot batch ingest; both arms live") {
    import graft.queries.{Q19eAnnIvfStore, Q40TrainTestSplit}
    import graft.streaming.S24StreamHybridFusion
    val streamed = S24StreamHybridFusion.run(spark, sf01)
      .collect().map(_.toString).toSeq
    // One-shot twin: the same test-split delta appended in ONE batch
    // through the same frozen-quantizer assignment.
    val batch = S24StreamHybridFusion.withWorkingIndex(spark, sf01) {
      (centT, workT) =>
        Q19eAnnIvfStore.appendToLists(spark, workT,
          Q19eAnnIvfStore.assign(spark, centT,
            Tables.embeddings(spark, sf01)
              .filter(Q40TrainTestSplit.splitColOf("vec_id") === "test")))
    } { (centT, workT) =>
      S24StreamHybridFusion.fuseFrom(spark, sf01, centT, workT)
        .collect().map(_.toString).toSeq
    }
    assert(streamed == batch, s"epoch-split variance: " +
      s"${streamed.zip(batch).find { case (a, b) => a != b }}")
    val rows = S24StreamHybridFusion.run(spark, sf01).collect()
    val byQ = rows.groupBy(_.getInt(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"q$q ranks gap")
    }
    assert(rows.exists(_.getInt(4) > 0) && rows.exists(_.getInt(5) > 0),
      "both arms must contribute to the ingest-tier fusion")
  }

  test("q64l/q64m drift tiers: retrain is a LIVE decision (both verdicts) and signals are sane") {
    import graft.queries.{Q64lWordpieceDrift, Q64mUnigramDrift}
    val wp = Q64lWordpieceDrift.run(spark, sf01).collect()
    val verdictsWp = wp.map(_.getAs[Boolean]("retrain")).toSet
    assert(verdictsWp == Set(true, false),
      s"q64l retrain must split on the fixture: $verdictsWp")
    wp.foreach { r =>
      assert(r.getAs[Double]("train_fertility") >= 1.0 &&
        r.getAs[Double]("delta_fertility") >= 1.0,
        s"fertility < 1 is impossible: $r")
      assert(r.getAs[Double]("rel_drift") >= 0.0, s"negative drift: $r")
    }
    val uni = Q64mUnigramDrift.run(spark, sf01).collect()
    val verdictsU = uni.map(_.getAs[Boolean]("retrain")).toSet
    assert(verdictsU == Set(true, false),
      s"q64m retrain must split on the fixture: $verdictsU")
    uni.foreach { r =>
      // The fixture's splits share one alphabet: Unigram's only true
      // OOV (unseen char) must read 0 — the q64f posture the oracle
      // also pins.
      assert(r.getAs[Long]("oov_words") == 0L, s"unexpected OOV: $r")
      assert(r.getAs[Double]("train_fertility") >= 1.0, s"fertility: $r")
    }
  }

  test("q77 DSIR: top-K law holds, and target-like docs outweigh off-target docs on a crafted corpus") {
    import graft.queries.Q77DsirSelection
    // Top-K law on the fixture: exactly SelectK selected, and every
    // selected weight strictly dominates every unselected one under
    // the (weight desc, doc_id asc) tie rule.
    val rows = Q77DsirSelection.run(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(rows.count(_._3) == Q77DsirSelection.SelectK)
    val minSel = rows.filter(_._3).map(r => (r._2, -r._1)).min
    val maxUnsel = rows.filterNot(_._3).map(r => (r._2, -r._1)).max
    assert(Ordering[(Long, Long)].gt(minSel, maxUnsel),
      s"selection not a top-K cut: $minSel vs $maxUnsel")
    // Crafted corpus: the train split (the TARGET) speaks alpha-beta;
    // the test split speaks gamma-delta — except one test doc that
    // speaks the target's language. DSIR must weight that doc above
    // every off-target test doc: the whole point of the method.
    def isTrain(id: Long) = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(md5.charAt(31)) < 13
    }
    val ids = (1L to 40L)
    val targetLike = ids.find(!isTrain(_)).get // a test-split doc id
    withTempCorpus("dsir", ids.map { id =>
      val talk =
        if (isTrain(id) || id == targetLike) "alpha beta alpha beta alpha"
        else "gamma delta gamma delta gamma"
      id -> talk
    }) { dir =>
      val w = Q77DsirSelection.run(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val offTarget = ids.filter(id => !isTrain(id) && id != targetLike)
      assert(offTarget.nonEmpty, "crafted corpus needs off-target docs")
      offTarget.foreach { id =>
        assert(w(targetLike) > w(id),
          s"target-like test doc $targetLike (${w(targetLike)}) must " +
            s"outweigh off-target $id (${w(id)})")
      }
    }
  }

  test("q64n drift gate: below-threshold arrivals serve the stale vocab; a vocabulary shift retrains") {
    import graft.queries.Q64nBpeDriftGatedStore
    import spark.implicits._
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    def doc(id: Long, words: Seq[String]) =
      id -> (0 until 12).map(i => words((id + i).toInt % words.size)).mkString(" ")
    val corpusA = (1L to 20L).map(doc(_, vocabA))
    withTempCorpus("dgate", corpusA) { dir =>
      var tables = Seq.empty[String]
      try {
        val (vocabT, statsT) = Q64nBpeDriftGatedStore.ensureStore(spark, dir)
        tables = Seq(vocabT, statsT)
        val storedVocab = spark.table(vocabT).collect().map(_.toString).toSet
        // Arriving corpus B: same vocabulary, near-same mix (one extra
        // doc) — BOTH signals stay under threshold ⇒ serve stale.
        val corpusB = (corpusA :+ doc(21L, vocabA)).map { case (id, t) =>
          (id, t, "en", "web", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
        val calm = Q64nBpeDriftGatedStore.decide(spark, vocabT, statsT, corpusB)
          .collect()
        assert(calm.nonEmpty && calm.forall(!_.getAs[Boolean]("retrain")),
          s"calm arrival must serve stale: ${calm.mkString(";")}")
        assert(spark.table(vocabT).collect().map(_.toString).toSet == storedVocab,
          "serve-stale path must not touch the vocab store")
        // Arriving corpus C: a new dialect — OOV spikes ⇒ retrain.
        val vocabC = Seq("zulu", "xray", "yankee", "alpha", "beta")
        val corpusC = (1L to 20L).map(doc(_, vocabC))
        val shifted = Q64nBpeDriftGatedStore.decide(spark, vocabT, statsT,
            corpusC.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
              .toDF("doc_id", "text", "lang", "source", "n_chars"))
          .collect()
        assert(shifted.exists(_.getAs[Boolean]("retrain")),
          s"vocabulary shift must trip the gate: ${shifted.mkString(";")}")
        // Applying the verdict: retrain on C (its own snapshot) makes
        // the gate read clean again — drift-driven, not fp-driven.
        withTempCorpus("dgatec", corpusC) { dirC =>
          var tablesC = Seq.empty[String]
          try {
            val (vT, sT) = Q64nBpeDriftGatedStore.ensureStore(spark, dirC)
            tablesC = Seq(vT, sT)
            val after = Q64nBpeDriftGatedStore.decide(spark, vT, sT,
              Tables.documents(spark, dirC)).collect()
            assert(after.forall(!_.getAs[Boolean]("retrain")),
              s"post-retrain gate must be clean: ${after.mkString(";")}")
          } finally {
            tablesC.foreach(graft.plans.Stores.dropManaged(spark, _))
          }
        }
      } finally {
        tables.foreach(graft.plans.Stores.dropManaged(spark, _))
        graft.plans.Stores.gcMarkers(spark, "graft_dgvocab")
      }
    }
  }

  test("q74b admit crash injection: torn admission is scrubbed on next bind, then re-admits cleanly") {
    val base = Seq(1L -> "spark join fast table hash",
      2L -> "stream window agg join")
    val delta = Seq(10L -> "spark spark hash table", 11L -> "window stream")
    withTempCorpus("bm25crash", base) { dir =>
      var tables = Seq.empty[String]
      try {
        val (postT, lenT, metaT) = Q74bBm25Store.ensureStore(spark, dir)
        tables = Seq(postT, lenT, metaT,
          graft.plans.AdmitLog.logTableOf(postT))
        import spark.implicits._
        val baseline = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
          .collect().map(_.toString).toSeq
        val deltaDf = delta.toDF("doc_id", "text")
        // Crash point 1: postings appended, lengths/meta untouched.
        intercept[RuntimeException] {
          Q74bBm25Store.admit(spark, deltaDf, postT, lenT, metaT,
            injectCrashAfter = 1)
        }
        assert(graft.plans.AdmitLog.torn(spark,
          graft.plans.AdmitLog.logTableOf(postT)).nonEmpty, "no torn intent")
        // Recovery entry point (a): the BIND path — ensureStore on the
        // same dir must scrub and serve exactly the pre-crash answer.
        Q74bBm25Store.ensureStore(spark, dir)
        val afterScrub = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
          .collect().map(_.toString).toSeq
        assert(afterScrub == baseline,
          s"scrubbed serve diverges from pre-crash: $afterScrub vs $baseline")
        assert(spark.table(postT).filter(col("_adm") >= 0).isEmpty,
          "torn postings rows survived the scrub")
        // Crash point 2: both appends + meta done, marker missing.
        intercept[RuntimeException] {
          Q74bBm25Store.admit(spark, deltaDf, postT, lenT, metaT,
            injectCrashAfter = 2)
        }
        // Recovery entry point (b): admit's own scrub — the SAME delta
        // must re-admit cleanly (no replay trip on torn rows).
        Q74bBm25Store.admit(spark, deltaDf, postT, lenT, metaT)
        val admitted = Q74bBm25Store.serveFrom(spark, postT, lenT, metaT)
          .collect().map(_.toString).toSeq
        // Reference: a crash-free store over base ∪ delta.
        val full = withTempCorpus("bm25crashref", base ++ delta) { refDir =>
          val (p2, l2, m2) = Q74bBm25Store.ensureStore(spark, refDir)
          try Q74bBm25Store.serveFrom(spark, p2, l2, m2)
            .collect().map(_.toString).toSeq
          finally Seq(p2, l2, m2).foreach(
            graft.plans.Stores.dropManaged(spark, _))
        }
        assert(admitted == full,
          s"post-recovery admit diverges from rebuild: $admitted vs $full")
      } finally {
        tables.foreach(graft.plans.Stores.dropManaged(spark, _))
        graft.plans.Stores.gcMarkers(spark, "graft_bm25store")
      }
    }
  }

  test("q18g admit crash injection: torn labels are scrubbed, delta re-admits cleanly") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val base = Seq(1L -> s"$shared alpha", 2L -> s"$shared beta")
    withTempCorpus("lblcrash", base) { dir =>
      import graft.queries.Q18gDedupLabelsStore
      var tables = Seq.empty[String]
      try {
        val (labelsT, bandsT) = Q18gDedupLabelsStore.ensureStore(spark, dir)
        tables = Seq(labelsT, bandsT,
          graft.plans.AdmitLog.logTableOf(labelsT))
        import spark.implicits._
        val deltaDf = Seq(50L -> s"$shared gamma").toDF("doc_id", "text")
        // Crash between the labels and bands appends: labels row for 50
        // is in, its band rows are not — the worst torn state (a later
        // wave would miss 50 as an attach base while 50 looks labeled).
        intercept[RuntimeException] {
          Q18gDedupLabelsStore.admit(spark, deltaDf, labelsT, bandsT,
            injectCrashAfter = 1)
        }
        // Bind-path recovery: labels revert to the built closure only.
        Q18gDedupLabelsStore.ensureStore(spark, dir)
        val afterScrub = spark.table(labelsT).select("id", "lbl")
          .as[(Long, Long)].collect().toMap
        assert(afterScrub == Map(1L -> 1L, 2L -> 1L),
          s"scrub left torn labels: $afterScrub")
        // Clean re-admit of the SAME delta attaches as if never crashed.
        val w = Q18gDedupLabelsStore.admit(spark, deltaDf, labelsT, bandsT)
          .as[(Long, Long)].collect().toMap
        assert(w == Map(50L -> 1L), s"re-admit after scrub: $w")
        val bands50 = spark.table(bandsT).filter(col("doc_id") === 50L)
        assert(!bands50.isEmpty, "re-admit did not append the delta's bands")
      } finally {
        tables.foreach(graft.plans.Stores.dropManaged(spark, _))
        graft.plans.Stores.gcMarkers(spark, "graft_lblstore")
      }
    }
  }
}

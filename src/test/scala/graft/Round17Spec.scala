package graft

import org.apache.spark.sql.functions._
import graft.queries._

/** Round 17 (VERDICT r16 + ADVICE r16): consolidation gates.
  *
  *  - s24: the STREAMED fusion now serves caller query tables (q75d's
  *    parameterization — VERDICT r16 #3); both prunes must survive
  *    the streamed working index — the lex postings scan
  *    bucket-prunes from the dynamic term batch and the lists scan
  *    partition-prunes to the probed lists;
  *  - snapshot keying: oracle-bridge snapshot paths embed the corpus
  *    fingerprint, so interleaved corpora cannot cross-pair
  *    (ADVICE r16). */
class Round17Spec extends SparkSpec {

  test("s24: caller-table fusion over the ingested index — both prunes engage; both arms contribute") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.streaming.S24StreamHybridFusion
    // One-shot batch ingest twin (Round14Spec pins streamed ≡ batch);
    // the plan under inspection is EXACTLY the streamed serve's.
    val (rows, plan, probedLists) =
      S24StreamHybridFusion.withWorkingIndex(spark, sf01) {
      (centT, workT) =>
        Q19eAnnIvfStore.appendToLists(spark, workT,
          Q19eAnnIvfStore.assign(spark, centT,
            Tables.embeddings(spark, sf01)
              .filter(Q40TrainTestSplit.splitColOf("vec_id") === "test")))
    } { (centT, workT) =>
      val df = S24StreamHybridFusion.fuseFrom(spark, sf01, centT, workT)
      // The ACTUAL probed-list union for this corpus (the bound the
      // prune must meet — a worst-case |Q|·NProbe cap equals K here
      // and would let an unpruned scan pass; round-17 review).
      val probed = Q75bHybridRrfStore
        .probeTriples(spark, sf01, centT, S24StreamHybridFusion.queryPairs)
        .flatMap(_._3).distinct
      (df.collect(), df.queryExecution.executedPlan, probed)
    }
    assert(rows.nonEmpty, "caller-table streamed fusion returned nothing")
    assert(rows.map(_.getInt(0)).toSet ==
      S24StreamHybridFusion.termBatch.map(_._1).toSet,
      "a batch query vanished from the fused result")
    assert(rows.exists(_.getAs[Int]("lex_rank") > 0) &&
      rows.exists(_.getAs[Int]("sem_rank") > 0),
      "an arm never contributed to the ingest-tier fusion")
    // Lex prune: the postings scan's bucket set comes from the
    // DYNAMIC term batch (q74f's literal-prune path).
    val nTerms = S24StreamHybridFusion.termBatch.flatMap(_._2).distinct.size
    val postScans = flattenPlan(plan).collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_bm25store_postings")) => f
    }
    assert(postScans.nonEmpty, "no postings scan in the streamed serve")
    postScans.foreach { f =>
      assert(f.optionalBucketSet.exists(_.cardinality() <= nTerms),
        s"lex postings scan did not bucket-prune from the caller " +
          s"batch: ${f.optionalBucketSet.map(_.cardinality())} (want <= $nTerms)")
    }
    // Sem prune: the WORKING lists scan partition-prunes to the
    // probed lists — the pruned-scan posture survives ingest.
    val listScans = flattenPlan(plan).collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_s24_lists")) => f
    }
    assert(listScans.nonEmpty, "no working-lists scan in the streamed serve")
    assert(probedLists.size < Q19dAnnIvf.K,
      s"fixture degenerated: the probed union covers all ${Q19dAnnIvf.K} " +
        "lists, so the prune bound below would be vacuous")
    listScans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"list_id must be a partition filter, got: ${f.partitionFilters}")
      assert(f.selectedPartitions.partitionCount <= probedLists.size,
        s"working-lists scan read ${f.selectedPartitions.partitionCount} " +
          s"partitions, want <= ${probedLists.size} (the probed union " +
          s"${probedLists.sorted.mkString("[", ",", "]")})")
    }
  }

  test("q64q: the 1/16 sampled gate stays inside its envelope on both fixtures; verdict matches the full gate") {
    // The envelope constants are a GATED contract (the in-query
    // flags hash against the oracle); this spec additionally pins
    // that the sampled verdict AGREES with the full gate's on an
    // in-distribution corpus — the sampled tier must not be
    // trigger-happy where the full gate is calm.
    for (dir <- Seq(sf, sf01)) {
      val rows = Q64qSampledDriftGate.run(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("fertility_within_env"),
          s"$dir: sampled fertility left the envelope: $r")
        assert(r.getAs[Boolean]("unk_within_env"),
          s"$dir: sampled unk_rate left the envelope: $r")
        assert(!r.getAs[Boolean]("retrain"),
          s"$dir: sampled gate tripped on an in-distribution corpus: $r")
      }
      val (piecesT, statsT) =
        Q64oWordpieceDriftGatedStore.ensureStore(spark, dir)
      val full = Q64oWordpieceDriftGatedStore
        .decide(spark, piecesT, statsT, Tables.documents(spark, dir))
        .collect().map(r => r.getAs[String]("lang") ->
          r.getAs[Boolean]("retrain")).toMap
      rows.foreach { r =>
        assert(full(r.getAs[String]("lang")) == r.getAs[Boolean]("retrain"),
          s"$dir: sampled and full verdicts disagree for ${r.getAs[String]("lang")}")
      }
    }
  }

  test("q64q: a language with zero sampled documents reads retrain = true, never a silent null") {
    import spark.implicits._
    // Craft doc ids whose md5 nibble is NOT the sample nibble, so the
    // new language is present in the ARRIVAL but absent from the 1/16
    // sample — the family's missing-evidence rule must trip loudly.
    def nibble(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(31, 32), 16)
    }
    val unsampledIds = Iterator.from(1000000).map(_.toLong)
      .filter(id => nibble(id) != Q64qSampledDriftGate.SampleNibble)
      .take(3).toSeq
    val (piecesT, statsT) =
      Q64oWordpieceDriftGatedStore.ensureStore(spark, sf)
    val arriving = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .unionByName(unsampledIds
        .map(id => (id, "xx", "the table data spark"))
        .toDF("doc_id", "lang", "text"))
    val rows = Q64qSampledDriftGate
      .decideSampled(spark, piecesT, statsT, arriving).collect()
    val xx = rows.find(_.getAs[String]("lang") == "xx")
    assert(xx.isDefined, "the unsampled language vanished from the verdict frame")
    assert(!xx.get.isNullAt(xx.get.fieldIndex("retrain")) &&
      xx.get.getAs[Boolean]("retrain"),
      s"zero sampled evidence must read retrain = true: ${xx.get}")
    // The sampled languages still gate normally.
    assert(rows.filter(_.getAs[String]("lang") != "xx")
      .forall(!_.getAs[Boolean]("retrain")),
      "in-distribution languages must stay calm")
  }

  test("q64j: flattened store encode == literal-tier greedy on 300 randomized words (incl. the 64-char boundary)") {
    import spark.implicits._
    // Deterministic pseudo-random words: piece concatenations (fully
    // coverable), raw letter soup (mostly [UNK]), and boundary-length
    // words around MaxMeasuredWordLen — the flattening must agree
    // with q64g's per-word expression fold on EVERY one of them, not
    // just the fixture corpus the shared oracle hashes.
    val rnd = new scala.util.Random(42)
    val init = Seq("the", "tab", "table", "data", "spark", "cust", "a", "s")
    val cont = Seq("le", "ue", "olumn", "tream", "a", "t", "r")
    def pieceWord() =
      init(rnd.nextInt(init.size)) +
        Seq.fill(rnd.nextInt(8))(cont(rnd.nextInt(cont.size))).mkString
    def soup() = Seq.fill(1 + rnd.nextInt(12))(
      ('a' + rnd.nextInt(26)).toChar).mkString
    val boundary = Seq(
      "table" + "le" * 29,  // 63 chars, covered — must encode
      "table" + "le" * 30,  // 65 chars — [UNK] by the shared guard
      "t" * 64, "t" * 65)
    val words = (Seq.fill(150)(pieceWord()) ++ Seq.fill(150)(soup()) ++
      boundary).distinct
    val literal = Q64gWordpieceEncode
      .encode(words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("encoded")).toMap
    val piecesT = Q64jWordpieceEncodeStore.ensurePieces(spark, sf)
    val store = Q64jWordpieceEncodeStore
      .encodeDictOf(spark, words.toDF("w"), piecesT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(store(w) == literal(i.toLong),
        s"store/literal diverged on '$w': '${store(w)}' vs '${literal(i.toLong)}'")
    }
  }

  test("q64k: flattened store DP == literal viterbiExpr on randomized words under the shared bound") {
    import spark.implicits._
    // The unigram twin of the q64j parity test: the flattened DP
    // must reproduce the literal-tier fold word-for-word — same
    // scores, same tie order — on words ≤ MaxMeasuredWordLen (past
    // the bound the STORE tier drops the word by the depth contract
    // while the literal fold has no cap; that divergence is
    // documented and the classic tiers' corpora are spec-pinned far
    // below it).
    val piecesT = Q64kUnigramEncodeStore.ensureScores(spark, sf)
    val scores = spark.table(piecesT).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("q"))).toSeq
    val pieces = scores.map(_._1)
    val rnd = new scala.util.Random(7)
    def pieceWord() = Seq.fill(1 + rnd.nextInt(10))(
      pieces(rnd.nextInt(pieces.size))).mkString.take(64)
    def soup() = Seq.fill(1 + rnd.nextInt(12))(
      ('a' + rnd.nextInt(26)).toChar).mkString
    val words = (Seq.fill(150)(pieceWord()) ++ Seq.fill(100)(soup()))
      .filter(w => w.nonEmpty && w.length <= 64).distinct
    val literal = words.toDF("word")
      .select(col("word"), expr(graft.queries.NorthStar.let("w_", "word",
        Q64hUnigramVocab.viterbiExpr(scores))).as("enc"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val store = Q64kUnigramEncodeStore
      .encodeDictOf(spark, words.toDF("w"), piecesT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(store.get(w) == literal(w),
        s"store/literal DP diverged on '$w': ${store.get(w)} vs ${literal(w)}")
    }
  }

  test("snapshot paths are fingerprint-keyed per corpus (ADVICE r16)") {
    val a = graft.plans.Stores.snapPath(spark, "graft_t17_snap", sf)
    val b = graft.plans.Stores.snapPath(spark, "graft_t17_snap", sf01)
    assert(a != b, "two corpora resolved the SAME snapshot path")
    assert(a == graft.plans.Stores.snapPath(spark, "graft_t17_snap", sf),
      "snapshot path is not stable for an unchanged corpus")
  }
}

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
      tables = Seq(postT, lenT, metaT)
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
}

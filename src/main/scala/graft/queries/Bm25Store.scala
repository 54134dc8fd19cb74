package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Q74b — BM25 served from the PERSISTED inverted-index store: q74's
  * production shape. q74 re-tokenizes the corpus per query batch —
  * correct, but at 100 TB the index is built ONCE per corpus snapshot
  * and every query batch is index-sized work, which is exactly the
  * split a search service runs (and the same build/serve split the
  * repo's store column established: q57b signatures, q18g labels,
  * q19e ANN lists, q64e/q64j/q64k vocabularies).
  *
  * Store family (shared [[graft.plans.Stores]] lifecycle):
  *  - `postings` — (word, doc_id, tf), bucketed by `word` (16): the
  *    inverted index. A query batch reads only the buckets its terms
  *    hash to: the terms are driver-known literals, so the serve plan
  *    carries an `isin` filter on the bucket column — the shape
  *    Spark's static bucket pruning engages on (a broadcast join
  *    alone filters map-side but still SCANS every bucket; VERDICT
  *    r13 #1) — and Round13gSpec asserts the selected-bucket count.
  *    The broadcast term join stays, to attach query_ids.
  *  - `lengths` — (doc_id, dl), bucketed by `doc_id` (16): the BM25
  *    length normalizer.
  *  - `meta` — one row (n_docs, tot_tokens): the exact scalars; read
  *    with one O(1) head().
  *
  * Serve = [[Q74Bm25.rank]] — the SAME scoring/ranking plan as the
  * recompute tier (tiers cannot drift), fed from store scans instead
  * of a corpus tokenize. df for the ≤|Q| distinct terms falls out of
  * the scanned postings slice (already one row per (doc, word)), so
  * no df table is persisted — it is never corpus-scale work.
  *
  * SHARES q74's oracle: the two tiers must be row-identical, and the
  * driver hash-gate holds the store to the recompute semantics. */
object Q74bBm25Store extends GraftQuery {
  val name = "q74b_bm25_store"
  private val prefix = "graft_bm25store"

  /** Build (or bind) this corpus snapshot's (postings, lengths, meta). */
  private[graft] def ensureStore(spark: SparkSession,
      dir: String): (String, String, String) = {
    val names = graft.plans.Stores.ensure(
        spark, prefix, dir, Seq("postings", "lengths", "meta"),
        buckets = Map("postings" -> (("word", 16)),
          "lengths" -> (("doc_id", 16)))) { case Seq(postT, lenT, metaT) =>
      val ws = Q74Bm25.words(spark, dir)
      graft.plans.Bucketing.writeBucketed(
        ws.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf")),
        postT, "word", 16)
      graft.plans.Bucketing.writeBucketed(
        ws.groupBy(col("doc_id")).agg(count(lit(1)).as("dl")), lenT,
        "doc_id", 16)
      spark.sql(s"DROP TABLE IF EXISTS $metaT")
      graft.plans.Stores.deleteTree(
        graft.plans.Stores.warehouse(spark).resolve(metaT))
      spark.table(lenT)
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("dl")).cast("long").as("tot_tokens"))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(metaT)
    }
    (names(0), names(1), names(2))
  }

  /** Serve BM25 from a bound (postings, lengths, meta) family —
    * shared by `run` and the admission spec so the post-admit serve
    * is exactly the store serve. */
  private[graft] def serveFrom(spark: SparkSession, postT: String,
      lenT: String, metaT: String): DataFrame = {
    import spark.implicits._
    val meta = spark.table(metaT).head()
    val terms = Q74Bm25.querySet.flatMap(_._2).distinct
    val qwords = terms.toDF("word")
    // The literal isin on the bucket column is what engages static
    // bucket pruning (SelectedBucketsCount ≤ |terms|); the broadcast
    // join alone would scan all 16 buckets and filter map-side.
    val tf = spark.table(postT)
      .filter(col("word").isin(terms: _*))
      .join(broadcast(qwords), Seq("word"))
    Q74Bm25.rank(spark, tf, spark.table(lenT),
      meta.getLong(0), meta.getLong(1))
  }

  /** ADMIT a delta of arriving documents: append their postings and
    * length rows through the stores' bucket specs and rewrite the
    * meta scalars LAST (every BM25 statistic is additive — postings,
    * dl, N and Σdl — so admitted-serve equals a full rebuild over
    * corpus ∪ delta, which the spec pins row-for-row). Crash
    * posture matches q18g's admit: a crash between the appends and
    * the meta rewrite leaves a torn store for THIS fingerprint only;
    * the fingerprint-triggered rebuild is the recovery path (batch
    * admission is the convenience tier — the exactly-once ingest
    * path is s23's epoch guard). doc_ids must be new (the s23
    * invariant); re-admitting a doc would double its postings —
    * ENFORCED below (ADVICE r13): a replayed delta fails loudly
    * instead of silently corrupting scores. The check is delta ⋉
    * lengths — a doc_id-bucketed semi-join, delta-sized work. */
  private[graft] def admit(spark: SparkSession, docs: DataFrame,
      postT: String, lenT: String, metaT: String): Unit = {
    import org.apache.spark.sql.SaveMode
    val replayed = docs.select(col("doc_id"))
      .join(spark.table(lenT), Seq("doc_id"), "left_semi")
    require(replayed.isEmpty,
      s"admit(): delta re-admits doc_ids already in $lenT " +
        s"(e.g. ${replayed.limit(3).collect().mkString(", ")}) — " +
        "replaying a delta would double-count postings")
    val ws = Q74Bm25.wordsOf(docs).localCheckpoint(true)
    ws.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      .write.mode(SaveMode.Append).format("parquet")
      .bucketBy(16, "word").sortBy("word").saveAsTable(postT)
    ws.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .write.mode(SaveMode.Append).format("parquet")
      .bucketBy(16, "doc_id").sortBy("doc_id").saveAsTable(lenT)
    spark.catalog.refreshTable(postT)
    spark.catalog.refreshTable(lenT)
    spark.table(lenT)
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("dl")).cast("long").as("tot_tokens"))
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(metaT)
    spark.catalog.refreshTable(metaT)
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val (postT, lenT, metaT) = ensureStore(spark, dir)
    serveFrom(spark, postT, lenT, metaT)
  }

  /** SAME oracle as q74: the store must serve exactly the recompute. */
  val oracle: Option[String] = Q74Bm25.oracle
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Q65 — incrementally maintained corpus statistics: the materialized-
  * view-refresh shape of reporting at 100 TB. q23 prices the full
  * recompute (one corpus pass per refresh); a production corpus is
  * append-mostly, so the per-source statistics should be maintained as
  * a PERSISTED table of mergeable partials — refresh cost O(delta),
  * never O(corpus).
  *
  * The enabling algebra: every surfaced statistic decomposes into
  * partials with an associative, commutative merge —
  * count → sum, sum → sum, min → min, max → max — over exact BIGINTs,
  * so merge order (and therefore incremental vs full recompute) cannot
  * change a single bit. The derived mean is computed AFTER the merge
  * from the merged exact sums (`sum/count`, one IEEE division) — the
  * classic MV rule that an average is not mergeable but its numerator
  * and denominator are. Anything non-decomposable takes the sketch
  * path instead (q12c's mergeable HLL union — same lifecycle, bounded
  * error); this query keeps the exact-algebra tier so the oracle can
  * hash-match.
  *
  * Store lifecycle = q57b's (`plans/Stores`): partials for the
  * existing corpus (q40's train split) are built once per corpus
  * fingerprint and persisted; `run` scans ONLY the delta (test split)
  * and merges its partials with the store — the full-corpus GROUP BY
  * is the oracle, so "incremental equals recompute" IS the
  * correctness gate, hash-checked by the driver. `refresh` closes the
  * loop: merged partials overwrite the store, so the next delta
  * merges against an updated view (Round10cSpec drives a three-wave
  * ingest where per-wave refresh equals the three-wave recompute,
  * with min/max extremes split across waves).
  *
  * Reference anchor: generalizes the reference's reduce-side
  * word-count merge (src/main.cpp:97-138) from within-job partial
  * merges to ACROSS-ingest partial merges.
  */
object Q65IncrementalStats extends GraftQuery {
  val name = "q65_incremental_stats"
  private val prefix = "graft_aggstore"

  /** Mergeable per-source partials of `docs` — the store schema and
    * the delta-side aggregation are the same function, so the two
    * sides cannot drift. */
  private[graft] def partials(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        size(expr(NorthStar.toksExpr)).cast("long").as("ws"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("sum_ws_tokens"),
        sum(col("chars")).as("sum_chars"),
        min(col("chars")).as("min_chars"),
        max(col("chars")).as("max_chars"))

  /** The partial-merge algebra alone (one row per source, exact
    * BIGINTs) — shared by [[merge]], [[refresh]], [[refreshEpoch]]. */
  private def combine(parts: DataFrame): DataFrame =
    parts.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_ws_tokens")).as("sum_ws_tokens"),
        sum(col("sum_chars")).as("sum_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))

  /** Merge partial rows (store ∪ delta) to one row per source and
    * attach the derived mean — from the MERGED exact sums, never by
    * averaging per-side averages. */
  private[graft] def merge(parts: DataFrame): DataFrame =
    combine(parts)
      .withColumn("avg_ws_tokens",
        col("sum_ws_tokens").cast("double") / col("n_docs"))
      .orderBy(col("source"))

  private[graft] def ensureStore(spark: SparkSession, dir: String): String =
    graft.plans.Stores.ensure(spark, prefix, dir, Seq("stats")) {
      case Seq(statsT) =>
        partials(Tables.documents(spark, dir)
            .filter(Q40TrainTestSplit.splitCol === "train"))
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(statsT)
    }.head

  /** The REFRESH step: merge `deltaDocs`' partials into the store.
    * Delta-sized work; the store table stays one row per source. The
    * localCheckpoint cuts lineage so the overwrite does not read the
    * table it replaces mid-plan. */
  private[graft] def refresh(spark: SparkSession, statsT: String,
      deltaDocs: DataFrame): Unit = {
    val merged = spark.table(statsT)
      .unionByName(partials(deltaDocs))
      .transform(combine)
      .localCheckpoint()
    merged.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(statsT)
  }

  /** Reserved source key of the epoch-marker row an epoch-guarded
    * store carries (real sources are `src0…src19`; [[merge]] callers
    * on guarded tables filter it out). Its `n_docs` column holds the
    * last APPLIED foreachBatch epoch id. */
  private[graft] val EpochKey = "__epoch__"

  /** Last epoch recorded in `statsT`, −1 if the table is unguarded
    * (fresh working copy) — 1-row driver read, O(store) scan of a
    * sources-cardinality table. */
  private[graft] def lastEpoch(spark: SparkSession, statsT: String): Long =
    spark.table(statsT).filter(col("source") === EpochKey)
      .select(col("n_docs")).collect()
      .headOption.map(_.getLong(0)).getOrElse(-1L)

  /** EPOCH-IDEMPOTENT refresh — the foreachBatch exactly-once
    * contract made real, not just documented: the applied epoch id
    * rides in the SAME table overwrite as the merged partials (a
    * marker row under [[EpochKey]]), so "partials applied" and
    * "epoch recorded" are one commit — there is no window where a
    * crash leaves one without the other. A replayed micro-batch
    * (stream killed after the sink applied epoch N but before the
    * checkpoint commit; restart re-delivers N) is recognized by
    * `epochId <= lastEpoch` and SKIPPED, so at-least-once delivery +
    * this sink = exactly-once store contents. Returns whether the
    * refresh was applied (false = replay skipped). Round12Spec kills
    * the commit record of a finished epoch and restarts from the
    * checkpoint to pin the no-double-count guarantee. */
  private[graft] def refreshEpoch(spark: SparkSession, statsT: String,
      deltaDocs: DataFrame, epochId: Long): Boolean =
    if (epochId <= lastEpoch(spark, statsT)) false
    else {
      val data = spark.table(statsT).filter(col("source") =!= EpochKey)
      val sentinel = spark.range(1).select(
        lit(EpochKey).as("source"), lit(epochId).as("n_docs"),
        lit(0L).as("sum_ws_tokens"), lit(0L).as("sum_chars"),
        lit(0L).as("min_chars"), lit(0L).as("max_chars"))
      val merged = data.unionByName(partials(deltaDocs))
        .transform(combine)
        .unionByName(sentinel)
        .localCheckpoint()
      merged.write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(statsT)
      true
    }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val statsT = ensureStore(spark, dir)
    val delta = partials(Tables.documents(spark, dir)
      .filter(Q40TrainTestSplit.splitCol === "test"))
    merge(spark.table(statsT).unionByName(delta))
  }

  /** Full-corpus recompute: the incremental path must equal this. */
  val oracle = Some(raw"""
    WITH c AS (
      SELECT source,
        CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS ws,
        CAST(length(text) AS BIGINT) AS chars
      FROM documents)
    SELECT source,
      count(*) AS n_docs,
      CAST(SUM(ws) AS BIGINT) AS sum_ws_tokens,
      CAST(SUM(chars) AS BIGINT) AS sum_chars,
      CAST(MIN(chars) AS BIGINT) AS min_chars,
      CAST(MAX(chars) AS BIGINT) AS max_chars,
      CAST(SUM(ws) AS DOUBLE) / count(*) AS avg_ws_tokens
    FROM c GROUP BY source ORDER BY source
  """.trim)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Q58 — the assembly tail, end to end: everything the FULL cleaning
  * audit keeps (q42b's gates — dedup victims, DF-capped eval leakage,
  * length, repetition, cross-doc boilerplate, quality) flows through
  * context-window chunking (q56's W=32/S=24 tiling) and is packed
  * into fixed-token-budget training shards per language (q45's
  * exclusive-running-sum rule). This is the demonstration that the
  * engine's curation, scoring, and assembly operators COMPOSE into
  * one declarative program: the output is the shard manifest a
  * pretraining run would consume.
  *
  * Scale shape inherits the pieces' postures: every expensive signal
  * reads the corpus once and joins on doc_id (q42b), chunking is a
  * per-row explode, and the pack is windowed PER LANG (parallel
  * across the mix; never a global sort). All shard arithmetic is
  * integer (exclusive cum − token count, `div` budget), so the shard
  * boundaries are engine-exact.
  */
object Q58TrainingShards extends GraftQuery {
  val name = "q58_training_shards"
  // the tiling IS q56's — one definition (Scoring.scala), zero drift
  private def W = Q56ChunkWindows.W
  private def S = Q56ChunkWindows.S
  /** Tokens per shard. Tiny to exercise multi-shard packing at
    * fixture scale; a real run sets sequence-count × context. */
  private val Budget = 1024

  def run(spark: SparkSession, dir: String): DataFrame = {
    val kept = Q42CorpusClean.statusByDoc(spark, dir, withContamination = true)
      .filter(col("status") === "kept")
      .select(col("doc_id"), col("lang"))
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(NorthStar.toksExpr).as("t"))
      .filter(size(col("t")) >= 1)
      .join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        explode(expr(
          // ct arithmetically: k·S < size(t) for every generated k, so
          // the count is least(W, size(t) − k·S) — no W-element array
          // materialized per chunk just to take its size
          s"transform(${Q56ChunkWindows.chunkIdsExpr}, " +
            s"k -> named_struct('cid', cast(k as int), " +
            s"'ct', cast(least($W, size(t) - k * $S) as bigint)))")).as("c"))
      .select(col("doc_id"), col("lang"),
        col("c.cid").as("chunk_id"), col("c.ct").as("ct"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("doc_id"), col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum", sum(col("ct")).over(w))
      .withColumn("shard_id", expr(s"cast((cum - ct) div $Budget as int)"))
      .groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("ct")).cast("long").as("n_tokens"))
      .orderBy(col("lang"), col("shard_id"))
  }

  val oracle = Some(s"""
    ${Q42CorpusClean.duckTaggedCtes(withContamination = true)},
    kept8 AS (SELECT doc_id, lang FROM tagged WHERE status = 'kept'),
    cd8 AS (SELECT k.doc_id, k.lang, t.t, CAST(len(t.t) AS INT) AS n
           FROM kept8 k JOIN toks t ON k.doc_id = t.doc_id
           WHERE len(t.t) >= 1),
    ck8 AS (SELECT doc_id, lang, t, n,
           CAST(unnest(range(0, (greatest(n - $W, 0) + ${S - 1}) // $S + 1)) AS INT) AS chunk_id
           FROM cd8),
    cc8 AS (SELECT doc_id, lang, chunk_id,
           CAST(len(t[chunk_id * $S + 1 : least(chunk_id * $S + $W, n)]) AS BIGINT) AS ct
           FROM ck8),
    cum8 AS (SELECT lang, doc_id, chunk_id, ct,
            SUM(ct) OVER (PARTITION BY lang ORDER BY doc_id, chunk_id
              ROWS UNBOUNDED PRECEDING) AS cum
            FROM cc8),
    sh8 AS (SELECT lang, CAST((cum - ct) // $Budget AS INT) AS shard_id, ct FROM cum8)
    SELECT lang, shard_id, count(*) AS n_chunks,
      CAST(sum(ct) AS BIGINT) AS n_tokens
    FROM sh8 GROUP BY lang, shard_id ORDER BY lang, shard_id
  """.trim)
}

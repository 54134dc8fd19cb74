package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Q57 — DELTA dedup: dedupe an incoming shard against the existing
  * corpus — the incremental-ingest shape (a crawl refresh lands and
  * must not re-admit what the corpus already holds), which the q18
  * family doesn't cover: q18b/q18f dedupe a corpus against ITSELF.
  * The corpus is partitioned by q40's deterministic md5-nibble key
  * (train = existing corpus, test = incoming delta) so the operator
  * is reproducible without side state.
  *
  * Two tiers, one verdict per delta doc (exact wins over near):
  *  - `exact_dup`: md5(text) equi-join against the base — at scale a
  *    128-bit hash shuffle, never text;
  *  - `near_dup`: q18b's MinHash band pipeline over the WHOLE corpus
  *    once (signatures and band keys are side-agnostic — computing
  *    them per side would run the signature stage twice), then the
  *    undirected candidate pairs filtered to cross-split ones; best
  *    base per delta doc by (est_jaccard desc, base_id asc);
  *  - `new`: everything else, kept in the output (an ingest audit
  *    must account for every arriving doc).
  *
  * est_jaccard is k/32 — exactly representable binary, surfaced
  * UNROUNDED so both engines hash the identical double. Scale shape:
  * the band join is blocked (never all-pairs); the per-delta-doc
  * window ranks a candidate list bounded by band collisions, not by
  * corpus size.
  */
object Q57DeltaDedup extends GraftQuery {
  val name = "q57_delta_dedup"

  def run(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint is the materialization barrier: the hashed frame
    // feeds FIVE plan branches (both exact-tier sides, both split
    // attachments, the final delta frame) with different filters, so
    // exchange reuse can't apply (predicate pushdown would sink each
    // branch's filter below a repartition) and without a barrier the
    // documents scan + full-text md5 run five times. The checkpointed
    // frame is 3 narrow columns — corpus-count-sized, never text-sized.
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Q40TrainTestSplit.splitCol.as("split"),
        md5(col("text")).as("th"))
      .localCheckpoint()
    val exact = docs.filter(col("split") === "test").as("d")
      .join(docs.filter(col("split") === "train").as("b"),
        col("d.th") === col("b.th"))
      .groupBy(col("d.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("exact_base"))
    // undirected MinHash candidates (q18b's pipeline, signatures
    // computed once for both sides); the split labels ride INTO the
    // band join so within-split pairs die before the 32-term verify
    // and pair-dedup shuffle (~2/3 of candidates under the 13/16
    // split), and the surviving cross-split pairs are oriented
    // delta → base via the same narrow label frame
    val split = docs.select(col("doc_id"), col("split"))
    val pairs = Q18bDedupMinHash
      .pairsFrom(NorthStar.shingleSets(spark, dir), Some(split))
      .join(split.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(split.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        when(col("sa.split") === "test", col("doc_a")).otherwise(col("doc_b"))
          .as("delta_id"),
        when(col("sa.split") === "test", col("doc_b")).otherwise(col("doc_a"))
          .as("cand_base"),
        col("est_jaccard"))
    val near = pairs
      .withColumn("rk", row_number().over(Window.partitionBy(col("delta_id"))
        .orderBy(col("est_jaccard").desc, col("cand_base").asc)))
      .filter(col("rk") === 1)
      .select(col("delta_id").as("doc_id"), col("cand_base").as("near_base"),
        col("est_jaccard").as("near_jac"))
    docs.filter(col("split") === "test").select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_base").isNotNull, lit("exact_dup"))
          .when(col("near_base").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("exact_base"), col("near_base")).as("base_id"),
        when(col("exact_base").isNull, col("near_jac"))
          .otherwise(lit(null).cast("double")).as("est_jaccard"))
      .orderBy(col("doc_id"))
  }

  val oracle = Some(s"""
    WITH ${NorthStar.duckShingleCtes},
    ${NorthStar.duckMinhashPairCtes},
    hsx AS (SELECT doc_id, ${Q40TrainTestSplit.duckSplit} AS split, md5(text) AS th
            FROM documents),
    exact AS (SELECT d.doc_id, min(b.doc_id) AS exact_base
              FROM hsx d JOIN hsx b ON d.th = b.th
              WHERE d.split = 'test' AND b.split = 'train'
              GROUP BY d.doc_id),
    xp AS (SELECT p.doc_a, p.doc_b, p.est_jaccard, a.split AS split_a, b.split AS split_b
           FROM pairs p JOIN hsx a ON p.doc_a = a.doc_id JOIN hsx b ON p.doc_b = b.doc_id
           WHERE a.split <> b.split),
    oriented AS (SELECT
        CASE WHEN split_a = 'test' THEN doc_a ELSE doc_b END AS delta_id,
        CASE WHEN split_a = 'test' THEN doc_b ELSE doc_a END AS cand_base,
        est_jaccard
      FROM xp),
    near AS (SELECT delta_id AS doc_id, cand_base AS near_base, est_jaccard AS near_jac
             FROM (SELECT delta_id, cand_base, est_jaccard,
                   row_number() OVER (PARTITION BY delta_id
                     ORDER BY est_jaccard DESC, cand_base ASC) AS rk
                   FROM oriented)
             WHERE rk = 1)
    SELECT d.doc_id,
      CASE WHEN e.exact_base IS NOT NULL THEN 'exact_dup'
           WHEN n.near_base IS NOT NULL THEN 'near_dup'
           ELSE 'new' END AS verdict,
      coalesce(e.exact_base, n.near_base) AS base_id,
      CASE WHEN e.exact_base IS NULL THEN n.near_jac ELSE NULL END AS est_jaccard
    FROM hsx d LEFT JOIN exact e ON d.doc_id = e.doc_id
               LEFT JOIN near n ON d.doc_id = n.doc_id
    WHERE d.split = 'test'
    ORDER BY d.doc_id
  """.trim)
}

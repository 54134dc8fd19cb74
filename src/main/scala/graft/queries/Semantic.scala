package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Q70 — SEMANTIC deduplication (the SemDedup shape: cluster the
  * embedding space, then prune near-duplicate pairs WITHIN clusters
  * only — "Abbas et al. 2023, SemDedup" is the published recipe this
  * re-expresses; the reference engine has no embedding surface at
  * all, so this is part of the training-data pack, not a port).
  *
  * Where q18e answers "which PAIRS are near-dups" (sign-bucket LSH,
  * pair output), q70 answers the curation question a pipeline
  * actually asks: "which ROWS do I keep" — a per-document verdict
  * frame. Candidate generation is clustering instead of LSH: every
  * vector is assigned to its nearest centroid by cosine, and only
  * same-cluster pairs are compared, so the pair space is
  * Σ|cluster|²/2 instead of n²/2.
  *
  * Clustering tier: the centroids here are the K lowest-vec_id
  * embeddings — a deterministic seed assignment (Lloyd iteration 0
  * with first-K init) chosen because centroid QUALITY only affects
  * candidate RECALL, never verdict soundness (every surfaced drop is
  * verified by an exact cosine ≥ τ), and a deterministic assignment
  * is what lets DuckDB replay the whole operator hash-exact. The
  * production path swaps in trained centroids (q19d's KMeans store
  * builds them today) without touching the prune semantics — K is
  * the operating knob, sized so corpus/K stays a bounded cluster.
  *
  * Verdict semantics (deterministic, order-free): drop vector j iff
  * SOME same-cluster vector i < j has cos(i, j) ≥ τ; `dom_id` is the
  * smallest such i. The min-id of every near-dup group always
  * survives; a chain a~b, b~c (a≁c) drops BOTH b and c — documented
  * as slightly more aggressive than greedy-sequential SemDedup
  * (which would re-admit c), in exchange for a semantics a single
  * relational pass expresses identically in both engines.
  *
  * Cross-engine determinism: the per-pair cosine is the q18e recipe —
  * flat codegen'd 64-term dot in identical fold order, one IEEE
  * division by the product of sqrt'd HOF-fold norms ⇒ bit-equal; the
  * argmax assignment compares those bit-equal doubles with an
  * explicit min-cid tie-break.
  *
  * 100 TB posture: centroids are K rows — broadcast; assignment is a
  * map-only pass (one codegen'd cos per centroid, partial-agg argmax,
  * no shuffle of the embedding table beyond the final per-cluster
  * hash partition); the prune self-join shuffles on the cluster key
  * once, and within-cluster pairs stay bounded because K scales with
  * the corpus. No global sort anywhere but the driver-facing ORDER BY. */
object Q70SemanticDedup extends GraftQuery {
  import NorthStar.{embNorm2Expr, flatDotExpr}
  val name = "q70_semantic_dedup"
  /** Seed-centroid count (fixture-sized; corpus/K ≈ bounded cluster). */
  val K = 8
  /** Within-cluster near-dup cosine threshold. */
  val Tau = 0.3

  /** The operator over an arbitrary (vec_id, embedding) frame —
    * specs feed crafted fixtures through this. */
  private[graft] def semanticDedup(e: DataFrame, k: Int = K,
      tau: Double = Tau): DataFrame = {
    val n2 = e.select(col("vec_id"), col("embedding"),
      expr(embNorm2Expr).as("n2"))
    val cent = n2.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("n2").as("cn2"))
    // max(struct(cos, -cid)) = highest cosine, min cid on ties — a
    // partial-aggregating argmax (map-side combine), not a window sort.
    val assign = n2.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        (expr(flatDotExpr("embedding", "ce")) /
          (sqrt(col("n2")) * sqrt(col("cn2")))).as("cos"),
        col("cid"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vec_id"), (-col("m.ncid")).as("cluster"))
    val withVec = assign.join(n2, "vec_id")
    val a = withVec.select(col("cluster"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("n2").as("n2a"))
    val b = withVec.select(col("cluster"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("n2").as("n2b"))
    val doms = a.join(b, Seq("cluster"))
      .filter(col("va") < col("vb"))
      .select(col("vb"),
        col("va"),
        (expr(flatDotExpr("ea", "eb")) /
          (sqrt(col("n2a")) * sqrt(col("n2b")))).as("cos"))
      .filter(col("cos") >= tau)
      .groupBy(col("vb")).agg(min(col("va")).as("dom_id"))
    assign.join(doms, assign("vec_id") === doms("vb"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("dom_id").isNull, lit("keep")).otherwise(lit("drop"))
          .as("verdict"),
        col("dom_id"))
      .orderBy(col("vec_id"))
  }

  def run(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(Tables.embeddings(spark, dir))

  val oracle = Some(s"""
    WITH n2 AS (SELECT vec_id, embedding,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
          (acc, p) -> acc + p) AS n2 FROM embeddings),
    cent AS (SELECT vec_id AS cid, embedding AS ce, n2 AS cn2
             FROM n2 ORDER BY vec_id LIMIT $K),
    scored AS (SELECT v.vec_id, c.cid,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, len(v.embedding)+1),
            i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE))),
          (acc, p) -> acc + p) / (sqrt(v.n2) * sqrt(c.cn2)) AS cos
      FROM n2 v, cent c),
    assign AS (SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
          row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    pairs AS (SELECT a.vec_id AS va, b.vec_id AS vb,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, len(ea.embedding)+1),
            i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))),
          (acc, p) -> acc + p) / (sqrt(ea.n2) * sqrt(eb.n2)) AS cos
      FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN n2 ea ON ea.vec_id = a.vec_id
      JOIN n2 eb ON eb.vec_id = b.vec_id),
    doms AS (SELECT vb, min(va) AS dom_id FROM pairs
             WHERE cos >= $Tau GROUP BY vb)
    SELECT a.vec_id, a.cluster,
      CASE WHEN d.dom_id IS NULL THEN 'keep' ELSE 'drop' END AS verdict,
      d.dom_id
    FROM assign a LEFT JOIN doms d ON d.vb = a.vec_id
    ORDER BY a.vec_id
  """.trim)
}

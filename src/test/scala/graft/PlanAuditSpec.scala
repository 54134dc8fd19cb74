package graft

import graft.queries.GraftQueryAudit

/** Whole-surface plan audit: the scale-posture claims, asserted
  * mechanically for EVERY batch query rather than argued per query.
  * Runs on sf0.001 (planner output only — no execution), so a new
  * query that accidentally plans a cartesian product or an
  * unbounded nested-loop join fails CI the day it lands. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * all are 1-row broadcast attachments (q19's query vector, q54's
    * vocabulary scalar) — a constant, not a data-sized build side. */
  private val oneRowBroadcasts = Set(
    "q19_similarity_topk", "q19b_ann_lsh", "q19d_ann_ivf",
    "q54_lm_perplexity")

  test("no batch query plans a cartesian product") {
    GraftQueryAudit.batchQueries.foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product")
    }
  }

  test("nested-loop joins appear only as known 1-row broadcasts") {
    GraftQueryAudit.batchQueries
      .filterNot(q => oneRowBroadcasts(q.name))
      .foreach { q =>
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString()
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an unexpected nested-loop join")
      }
  }

  // NOTE deliberately no WholeStageCodegen assertion here: under AQE
  // the pre-execution plan hasn't run CollapseCodegenStages yet, so
  // the check would need to execute all 70+ queries. Codegen presence
  // is pinned per-operator where it matters (q55's map-only plan test,
  // q1c, SURVEY §8's measured HOF pitfalls).
}

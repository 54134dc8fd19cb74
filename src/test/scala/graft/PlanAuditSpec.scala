package graft

import graft.queries.GraftQueryAudit

/** Whole-surface plan audit: the scale-posture claims, asserted
  * mechanically for EVERY batch query rather than argued per query.
  * A new query that accidentally plans a cartesian product or an
  * unbounded nested-loop join fails the suite the day it lands.
  *
  * Plans are computed ONCE and shared across the assertions: run()
  * is not free — the q18f/q42 family drives its label-propagation
  * actions eagerly while building the frame, so per-test re-derivation
  * would execute those loops once per assertion.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val plans: Seq[(String, String)] =
    GraftQueryAudit.batchQueries.map { q =>
      q.name -> q.run(spark, dir).queryExecution.executedPlan.toString()
    }

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * all are 1-row broadcast attachments (q19's query vector, q54's
    * vocabulary scalar) — a constant, not a data-sized build side. */
  private val oneRowBroadcasts = Set(
    "q19_similarity_topk", "q19b_ann_lsh", "q19d_ann_ivf",
    "q54_lm_perplexity")

  test("query names are unique — the driver contract is a Map") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate query names shadow silently: $dups")
  }

  test("no batch query plans a cartesian product") {
    assert(plans.nonEmpty)
    plans.foreach { case (name, plan) =>
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("nested-loop joins appear only as known 1-row broadcasts") {
    plans.filterNot(p => oneRowBroadcasts(p._1)).foreach { case (name, plan) =>
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans an unexpected nested-loop join")
    }
  }

  // NOTE deliberately no WholeStageCodegen assertion here: under AQE
  // the pre-execution plan hasn't run CollapseCodegenStages yet, so
  // the check would need to execute all 70+ queries. Codegen presence
  // is pinned per-operator where it matters (q55's map-only plan test,
  // q1c, SURVEY §8's measured HOF pitfalls).
}

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

  private lazy val plans: Seq[(String, String, org.apache.spark.sql.types.StructType)] =
    GraftQueryAudit.batchQueries.map { q =>
      val df = q.run(spark, dir)
      (q.name, df.queryExecution.executedPlan.toString(), df.schema)
    }

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * all are constant-sized broadcast attachments (q19's 1-row query
    * vector, q54's vocabulary scalar, q70's K=8-row centroid table) —
    * a constant, never a data-sized build side. */
  private val oneRowBroadcasts = Set(
    "q19_similarity_topk", "q19b_ann_lsh", "q19d_ann_ivf",
    "q19e_ann_ivf_store", // q19d's shared exactCosineTopK: 1-row qn2
    "q19g_ann_pq",        // same shared exact re-rank tail: 1-row qn2
    "q54_lm_perplexity", "q70_semantic_dedup", "q70b_semantic_dedup_store",
    "q55b_classifier_trained") // 1-row broadcast intercept attach

  test("query names are unique — the driver contract is a Map") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate query names shadow silently: $dups")
  }

  test("no batch query plans a cartesian product") {
    assert(plans.nonEmpty)
    plans.foreach { case (name, plan, _) =>
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("nested-loop joins appear only as known 1-row broadcasts") {
    plans.filterNot(p => oneRowBroadcasts(p._1)).foreach { case (name, plan, _) =>
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans an unexpected nested-loop join")
    }
  }

  test("output schemas honor the driver-hash contract") {
    // GraftQuery doc: column names identical in run and oracle (the
    // compare sorts columns by NAME), lowercase snake_case so DuckDB
    // never case-folds them apart; no raw TIMESTAMP surfaces (engines
    // disagree on zone/precision rendering — render as string/epoch).
    val snake = "^[a-z][a-z0-9_]*$".r
    // q28's pivot columns derive from DATA values ("F"/"O"/"P" order
    // statuses → F_n, F_total, …); its oracle spells them identically
    // and case-sensitively, hash-green since round 3 — the only
    // sanctioned departure from lowercase.
    val dataDerived = "^[A-Z]_(n|total)$".r
    plans.foreach { case (name, _, schema) =>
      schema.fields.foreach { f =>
        assert(snake.pattern.matcher(f.name).matches() ||
          (name == "q28_pivot" && dataDerived.pattern.matcher(f.name).matches()),
          s"$name column '${f.name}' is not lowercase snake_case")
        assert(!f.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType],
          s"$name column '${f.name}' surfaces a raw TIMESTAMP")
      }
      assert(schema.fields.map(_.name).distinct.length === schema.fields.length,
        s"$name has duplicate column names — the sorted-by-name hash is ambiguous")
    }
  }

  // NOTE deliberately no WholeStageCodegen assertion here: under AQE
  // the pre-execution plan hasn't run CollapseCodegenStages yet, so
  // the check would need to execute all 70+ queries. Codegen presence
  // is pinned per-operator where it matters (q55's map-only plan test,
  // q1c, SURVEY §8's measured HOF pitfalls).
}

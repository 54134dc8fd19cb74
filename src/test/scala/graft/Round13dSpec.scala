package graft

import org.apache.spark.sql.functions._
import graft.queries.{Q64gWordpieceEncode, Q64jWordpieceEncodeStore}

/** Round 13: the WordPiece STORE tier (q64j) — q64g's vocabulary
  * moved from a constant-folded plan literal to a persisted store
  * table consumed by BROADCAST joins (VERDICT r12 missing #4). The
  * shared oracle pins output equality; these tests pin the POSTURE:
  * the vocab must arrive from the store scan via broadcast, not be
  * re-collected into a literal, and the two tiers must agree
  * row-for-row in one JVM. */
class Round13dSpec extends SparkSpec {

  test("q64j: each probe step is a broadcast join whose build side scans the piece store") {
    val piecesT = Q64jWordpieceEncodeStore.ensurePieces(spark, sf)
    // A 2-step unroll with no lineage barriers keeps the joins in ONE
    // inspectable plan (the real run checkpoints per step, hiding
    // earlier steps behind RDD scans).
    val df = Q64jWordpieceEncodeStore.encodeDict(spark, sf, piecesT,
      steps = 2, checkpoint = false)
    df.collect() // execute so AQE finalizes the join strategies
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = flattenPlan(df.queryExecution.executedPlan)
    val bcastWithStoreScan = plan.collect {
      case b: BroadcastHashJoinExec if flattenPlan(b).exists {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("graft_wpstore"))
        case _ => false
      } => b
    }
    assert(bcastWithStoreScan.size >= 2,
      s"expected >=2 broadcast piece-probe joins over the store scan, " +
        s"got ${bcastWithStoreScan.size}")
    // Not re-literalized: no piece-array literal anywhere in the plan
    // ('##' markers and probe substrings are computed, and the only
    // place piece TEXT could appear as data is the store scan).
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("array_contains"),
      "piece vocab leaked back into the plan as a literal array")
  }

  test("q64j: store tier is row-identical to the literal tier (q64g)") {
    val a = Q64gWordpieceEncode.run(spark, sf).collect().map(_.toString).toSeq
    val b = Q64jWordpieceEncodeStore.run(spark, sf).collect()
      .map(_.toString).toSeq
    assert(a == b, s"tiers diverged: ${a.zip(b).find { case (x, y) => x != y }}")
  }
}

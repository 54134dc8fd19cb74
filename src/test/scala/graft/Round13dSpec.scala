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

  test("q64j: the one-pass probe is a broadcast join whose build side scans the piece store") {
    val piecesT = Q64jWordpieceEncodeStore.ensurePieces(spark, sf)
    // Round 17: the greedy chain is FLATTENED — ml(w, pos) for every
    // position resolves in ONE broadcast join over the store scan,
    // and the greedy walk replays as a pure expression (no more
    // depth-many sequential join rounds). The posture pinned here is
    // unchanged: pieces arrive by broadcast FROM THE STORE SCAN.
    val df = Q64jWordpieceEncodeStore.encodeDict(spark, sf, piecesT)
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
    assert(bcastWithStoreScan.size >= 1,
      s"expected the flattened probe's broadcast join over the store " +
        s"scan, got ${bcastWithStoreScan.size}")
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

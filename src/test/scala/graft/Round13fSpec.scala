package graft

import org.apache.spark.sql.functions._
import graft.queries.{Q64iUnigramEncode, Q64kUnigramEncodeStore}

/** Round 13: the Unigram STORE tier (q64k) — trained scores persisted
  * once per corpus fingerprint, Viterbi DP as a broadcast-join
  * relational unroll. The shared oracle pins output correctness;
  * these tests pin the posture (scores arrive by broadcast from the
  * store scan) and in-JVM parity with the recompute tier. */
class Round13fSpec extends SparkSpec {

  test("q64k: the one-pass candidate probe is a broadcast join whose build side scans the score store") {
    graft.plans.Stores.evict(spark, "graft_unistore")
    try {
      val piecesT = Q64kUnigramEncodeStore.ensureScores(spark, sf)
      // Round 17: the DP is FLATTENED — candidate scores for every
      // (word, position, length) resolve in ONE broadcast join over
      // the store scan and the DP replays as a pure expression. The
      // posture pinned here is unchanged: scores arrive by broadcast
      // FROM THE STORE SCAN, never as a literal.
      val df = Q64kUnigramEncodeStore.encodeDict(spark, sf, piecesT)
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      val bcast = flattenPlan(df.queryExecution.executedPlan).collect {
        case b: BroadcastHashJoinExec if flattenPlan(b).exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table.startsWith("graft_unistore"))
          case _ => false
        } => b
      }
      assert(bcast.size >= 1,
        s"expected the flattened probe's broadcast join over the score " +
          s"store, got ${bcast.size}")
    } finally graft.plans.Stores.evict(spark, "graft_unistore")
  }

  test("q64k: store tier is row-identical to the recompute tier (q64i)") {
    graft.plans.Stores.evict(spark, "graft_unistore")
    try {
      val a = Q64iUnigramEncode.run(spark, sf).collect().map(_.toString).toSeq
      val b = Q64kUnigramEncodeStore.run(spark, sf).collect()
        .map(_.toString).toSeq
      assert(a == b,
        s"tiers diverged: ${a.zip(b).find { case (x, y) => x != y }}")
    } finally graft.plans.Stores.evict(spark, "graft_unistore")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries._

/** Oracle-independent invariants for the relational pack (VERDICT r1:
  * "Q2–Q24 lean entirely on the oracle") — algebraic identities that
  * must hold on any data, checked on the sf0.001 fixtures. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q5 semi + anti partition the customer table") {
    val out = Q5SemiAnti.run(spark, sf)
    val total = Tables.customer(spark, sf).count()
    assert(out.count() === total)
    // disjoint: no custkey appears under both tags
    val dup = out.groupBy("c_custkey").count().filter($"count" > 1).count()
    assert(dup === 0)
  }

  test("q9 rollup grand total equals the sum of leaf rows") {
    val out = Q9Rollup.run(spark, sf).collect()
    val maxGid = out.map(_.getAs[Long]("gid")).max
    val leaf = out.filter(_.getAs[Long]("gid") == 0)
    val grand = out.filter(_.getAs[Long]("gid") == maxGid)
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === leaf.map(_.getAs[Long]("n")).sum)
    assert(grand.head.getAs[Long]("n") === Tables.orders(spark, sf).count())
  }

  test("q10 cube contains all four grouping combinations and a correct grand total") {
    val out = Q10Cube.run(spark, sf).collect()
    val li = Tables.lineitem(spark, sf).count()
    val gids = out.map(_.getAs[Long]("gid")).distinct.sorted
    assert(gids.length === 4) // (flag,status), (flag), (status), ()
    val grand = out.filter(_.getAs[Long]("gid") == gids.max)
    assert(grand.map(_.getAs[Long]("n")).sum === li)
    // every grouping level must re-total to the full row count
    gids.foreach { g =>
      assert(out.filter(_.getAs[Long]("gid") == g).map(_.getAs[Long]("n")).sum === li)
    }
  }

  test("q11 set algebra identities over O- and F-status customers") {
    val m = Q11SetOps.run(spark, sf)
      .groupBy("op").count().as[(String, Long)].collect().toMap
    // |A| = |A ∩ B| + |A \ B| and A∩B, A\B ⊆ A∪B
    assert(m("union") >= m("intersect") && m("union") >= m("except"))
    assert(m("intersect") + m("except") <= m("union"))
  }

  test("q12 rollup distinct: global row bounds per-flag distincts") {
    val out = Q12DistinctAgg.run(spark, sf).collect()
    val global = out.filter(_.getAs[Long]("gid") == 1)
    val per = out.filter(_.getAs[Long]("gid") == 0)
    assert(global.length === 1)
    val g = global.head.getAs[Long]("n_parts")
    assert(per.forall(_.getAs[Long]("n_parts") <= g))
    assert(per.map(_.getAs[Long]("n_parts")).sum >= g)
    assert(global.head.getAs[Long]("n_rows") === per.map(_.getAs[Long]("n_rows")).sum)
  }

  test("q17 sessionization: session ids dense from 1 per user; events conserved") {
    val out = Q17Sessionize.run(spark, sf)
    val bad = out.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"),
           countDistinct("session_id").as("n"))
      .filter($"mn" =!= 1 || $"n" =!= $"mx")
      .count()
    assert(bad === 0)
    val totalEvents = out.agg(sum("n_events")).as[Long].head()
    assert(totalEvents === Tables.events(spark, sf).count())
  }

  test("q1 variants agree: built-in == udaf == native expression") {
    def rows(q: GraftQuery) = q.run(spark, sf).collect().map(_.toSeq).toSeq
    val base = rows(InvertedIndex)
    assert(base === rows(InvertedIndexUdaf))
    assert(base === rows(InvertedIndexNative))
    assert(base.nonEmpty)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Q32AsofJoin, Q32bAsofJoinNative}

/** The native as-of join operator (plans/AsofJoin.scala): plan shape,
  * edge semantics, and agreement with the composition tier. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asof(left: DataFrame, right: DataFrame): DataFrame =
    left.join(right,
      col("k") === col("rk") && expr("graft_asof_le(rt, t)"), "left")

  private def leftDf(rows: (Int, Long)*): DataFrame =
    rows.toSeq.toDF("k", "t")
  private def rightDf(rows: (Int, Long, String)*): DataFrame =
    rows.toSeq.toDF("rk", "rt", "v")

  test("the plan contains AsofJoinExec — the rewrite fired") {
    val plan = Q32bAsofJoinNative.run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    // the exec's nodeName strips the Exec suffix
    assert(plan.contains("AsofJoin "), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("WindowExec"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("native tier == composition tier on the fixture corpus") {
    val native = Q32bAsofJoinNative.run(spark, "/root/testdata/sf0.001").collect()
    val composed = Q32AsofJoin.run(spark, "/root/testdata/sf0.001").collect()
    assert(native.length === composed.length)
    native.zip(composed).foreach { case (n, c) => assert(n === c) }
  }

  test("exact-timestamp right row matches; later rows do not") {
    val out = asof(
      leftDf((1, 100L), (1, 150L)),
      rightDf((1, 100L, "at"), (1, 151L, "after")))
      .select(col("t"), col("v")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((100L, "at"), (150L, "at")))
  }

  test("left rows before any right row null-extend") {
    val out = asof(
      leftDf((1, 50L), (1, 200L)),
      rightDf((1, 100L, "x")))
      .select(col("t"), col("v")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(out.toSet === Set((50L, null), (200L, "x")))
  }

  test("keys never match across groups; interleaved keys walk correctly") {
    val out = asof(
      leftDf((1, 10L), (2, 10L), (3, 10L)),
      rightDf((1, 5L, "one"), (3, 5L, "three")))
      .select(col("k"), col("v")).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(out.toSet === Set((1, "one"), (2, null), (3, "three")))
  }

  test("null keys and null times never match") {
    val left = Seq(
      (Option(1), Option(100L)),
      (Option.empty[Int], Option(100L)),
      (Option(1), Option.empty[Long])).toDF("k", "t")
    val right = Seq(
      (Option(1), Option(50L), "ok"),
      (Option.empty[Int], Option(50L), "nullkey"),
      (Option(1), Option.empty[Long], "nulltime")).toDF("rk", "rt", "v")
    val out = left.join(right,
      col("k") === col("rk") && expr("graft_asof_le(rt, t)"), "left")
      .select(col("k"), col("t"), col("v")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(out.toSet === Set((1, 100L, "ok"), (null, 100L, null),
      (1, null, null)))
  }

  test("empty right side null-extends every left row") {
    val out = asof(leftDf((1, 10L), (2, 20L)),
      rightDf().limit(0))
      .select(col("v")).collect()
    assert(out.length === 2 && out.forall(_.isNullAt(0)))
  }

  test("latest-not-first: many right rows per key, each left gets its floor") {
    val rights = (1L to 100L).map(i => (7, i * 10, s"r$i"))
    val lefts = Seq((7, 5L), (7, 55L), (7, 1000L), (7, 999L))
    val out = asof(leftDf(lefts: _*), rightDf(rights: _*))
      .select(col("t"), col("v")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(out.toSet === Set((5L, null), (55L, "r5"), (1000L, "r100"),
      (999L, "r99")))
  }

  test("property: native operator == independent Scala reference on random data") {
    val rnd = new scala.util.Random(20260813L)
    // unique (key, time) pairs on the right so floor-match is unambiguous
    val rightRows = rnd.shuffle((1 to 40).flatMap(k =>
      rnd.shuffle((0L until 2000L).toVector).take(50).map(t => (k, t, s"v$k-$t"))))
    val leftRows = Seq.fill(3000)((rnd.nextInt(45) + 1, rnd.nextLong(2100)))
    val expected = {
      val byKey = rightRows.groupBy(_._1)
        .map { case (k, rs) => k -> rs.map(r => (r._2, r._3)).sortBy(_._1) }
      leftRows.map { case (k, t) =>
        val m = byKey.get(k).flatMap(_.takeWhile(_._1 <= t).lastOption)
        (k, t, m.map(_._2).orNull)
      }
    }
    val got = asof(leftDf(leftRows: _*), rightDf(rightRows: _*))
      .select(col("k"), col("t"), col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
    // both sides sorted (left rows are not unique → compare multisets)
    assert(got.sorted(Ordering.by((x: (Int, Long, String)) => (x._1, x._2, String.valueOf(x._3))))
      .toSeq === expected.sorted(Ordering.by((x: (Int, Long, String)) => (x._1, x._2, String.valueOf(x._3)))).toSeq)
  }

  test("an unsupported shape fails loudly instead of degrading") {
    // inner join with the marker: the rewrite only handles LeftOuter,
    // and the marker is Unevaluable — planning/execution must throw,
    // never silently produce range-join rows
    val ex = intercept[Throwable] {
      leftDf((1, 10L)).join(rightDf((1, 5L, "x")),
        col("k") === col("rk") && expr("graft_asof_le(rt, t)"), "inner")
        .collect()
    }
    // pin the INTENDED failure mode — the unevaluable marker surfacing
    // — not just "something threw"
    val msg = String.valueOf(ex.getMessage).toLowerCase
    assert(msg.contains("graft_asof_le") || msg.contains("unevaluable"),
      s"wrong failure mode: $ex")
  }

  test("float keys and float times are refused, not silently mis-joined") {
    // double KEY: the rewrite declines (no -0.0/NaN normalization runs
    // on the custom node) → Unevaluable marker fails loudly
    val keyEx = intercept[Throwable] {
      Seq((1.0d, 10L)).toDF("k", "t").join(
        Seq((1.0d, 5L, "x")).toDF("rk", "rt", "v"),
        col("k") === col("rk") && expr("graft_asof_le(rt, t)"), "left")
        .collect()
    }
    val keyMsg = String.valueOf(keyEx.getMessage).toLowerCase
    assert(keyMsg.contains("graft_asof_le") || keyMsg.contains("unevaluable"),
      s"wrong failure mode: $keyEx")
    // double TIME: the marker's own type check rejects at analysis
    val timeEx = intercept[Throwable] {
      Seq((1, 10.0d)).toDF("k", "t").join(
        Seq((1, 5.0d, "x")).toDF("rk", "rt", "v"),
        col("k") === col("rk") && expr("graft_asof_le(rt, t)"), "left")
        .collect()
    }
    assert(String.valueOf(timeEx.getMessage).toLowerCase.contains("graft_asof_le"),
      s"wrong failure mode: $timeEx")
  }

  test("mismatched time types are rejected at analysis, not mis-compared") {
    // int right time vs long left time: without the type check the
    // exec would read the int's unsafe word with a long ordering
    val ex = intercept[Throwable] {
      leftDf((1, 10L)).join(
        Seq((1, 5, "x")).toDF("rk", "rt", "v"), // rt is INT
        col("k") === col("rk") && expr("graft_asof_le(rt, t)"), "left")
        .collect()
    }
    assert(String.valueOf(ex.getMessage).toLowerCase.contains("graft_asof_le"),
      s"wrong failure mode: $ex")
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries._
import graft.streaming.Streams

/** Oracle-independent invariants for the round-5 operators (q33
  * grouping sets, q34 salted skew join, s8 stream-stream join). */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  test("q33 grouping sets: three grouping levels tie out to the same total") {
    val rows = Q33GroupingSets.run(spark, sf01).collect()
    val total = Tables.orders(spark, sf01).count()
    val grand = rows.filter(r =>
      r.getAs[Int]("g_status") == 1 && r.getAs[Int]("g_priority") == 1)
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === total)
    // each one-dimension slice partitions the full table
    val byStatus = rows.filter(r =>
      r.getAs[Int]("g_status") == 0 && r.getAs[Int]("g_priority") == 1)
    val byPriority = rows.filter(r =>
      r.getAs[Int]("g_status") == 1 && r.getAs[Int]("g_priority") == 0)
    assert(byStatus.map(_.getAs[Long]("n")).sum === total)
    assert(byPriority.map(_.getAs[Long]("n")).sum === total)
    // no (status, priority) cross rows — the set is not a rollup/cube
    assert(rows.length === byStatus.length + byPriority.length + 1)
    // grouped-out columns are null exactly when their flag says so
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("o_orderstatus")) ===
        (r.getAs[Int]("g_status") == 1))
      assert(r.isNullAt(r.fieldIndex("o_orderpriority")) ===
        (r.getAs[Int]("g_priority") == 1))
    }
  }

  test("q34 salted join == plain unsalted join, salt spreads the probe side") {
    val salted = Q34SaltedJoin.run(spark, sf01).collect()
    val plain = Tables.orders(spark, sf01)
      .join(Tables.customer(spark, sf01), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf01), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("revenue"))
      .orderBy(col("n_name")).collect()
    assert(salted.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
    // the salt really fans out: every bucket receives orders rows
    val buckets = Tables.orders(spark, sf01)
      .select(pmod(hash(col("o_orderkey")), lit(16)).as("salt"))
      .groupBy(col("salt")).count().collect()
    assert(buckets.length === 16)
  }

  test("s8 stream-stream join matches across MemoryStream batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val name = "s8_two_batches"
    val q = Streams.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: clicks only — nothing can join yet
      clicks.addData(
        Ev(1, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.0),
        Ev(2, Timestamp.valueOf("2024-01-01 00:05:00"), 2, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0)
      // batch 2: purchases — user 1 inside the 30-min bound joins the
      // buffered click; user 2's lands outside the bound and does not
      purchases.addData(
        Ev(10, Timestamp.valueOf("2024-01-01 00:20:00"), 1, "purchase", 2.0),
        Ev(11, Timestamp.valueOf("2024-01-01 00:50:00"), 2, "purchase", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select(col("click_id"), col("purchase_id"), col("user_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 10L, 1L)))
  }

  test("s10 outer join emits unmatched clicks only after watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val name = "s10_two_batches"
    val q = Streams.clickPurchaseJoin(clicks.toDF(), purchases.toDF(), "leftOuter")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: one click, no purchase — nothing emits (window open)
      clicks.addData(Ev(1, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.0))
      purchases.addData(Ev(90, Timestamp.valueOf("2024-01-01 00:00:00"), 9, "purchase", 0.0))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0)
      // batch 2: both watermarks jump 2h ahead; click 1's 30-min
      // window is now strictly below the global watermark → the
      // cleanup batch emits it null-extended
      clicks.addData(Ev(2, Timestamp.valueOf("2024-01-01 02:00:00"), 1, "click", 1.0))
      purchases.addData(Ev(91, Timestamp.valueOf("2024-01-01 02:00:00"), 9, "purchase", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select(col("click_id"), col("purchase_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got === Set((1L, -1L)))
  }

  test("s9 stream-static join across two batches == batch join+agg") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "SEG_A"), (2L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
    val in = MemoryStream[Ev]
    val name = "s9_two_batches"
    val q = Streams.enrichedSegmentAgg(in.toDF(), dim)
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      in.addData(
        Ev(1, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.5),
        Ev(2, Timestamp.valueOf("2024-01-01 00:01:00"), 3, "click", 9.0)) // no dim row
      q.processAllAvailable()
      in.addData(
        Ev(3, Timestamp.valueOf("2024-01-01 00:02:00"), 1, "click", 2.5),
        Ev(4, Timestamp.valueOf("2024-01-01 00:03:00"), 2, "view", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select(col("c_mktsegment"), col("event_type"),
        col("n"), col("sum_value").cast("double"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(("SEG_A", "click", 2L, 4.0), ("SEG_B", "view", 1L, 4.0)))
  }

  test("q43/q44/q45 pipeline-op invariants hold") {
    // q43: exactly top-5 per lang, counts non-increasing within lang
    val bi = Q43TopBigrams.run(spark, sf01).collect()
    bi.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to 5))
      val ns = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
    // q44: cap respected, kept list sized to the cap
    val cap = Q44SourceCap.run(spark, sf01).collect()
    cap.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept === math.min(r.getAs[Long]("n_total"), 20L))
      assert(r.getAs[String]("kept_ids").split(" ").length.toLong === kept)
    }
    // q45: shards contiguous from 0 per lang, token totals conserved
    val sh = Q45TokenPacking.run(spark, sf01).collect()
    sh.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("shard")).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq, "shards not contiguous")
      rows.foreach(r => assert(
        r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc")))
    }
    val packed = sh.map(_.getAs[Long]("total_tokens")).sum
    // same tokenizer as the query (empties filtered) — a raw split
    // counts the empty token of leading/trailing-whitespace docs
    val direct = Tables.documents(spark, sf01)
      .select(size(expr("filter(split(text, '\\\\s+'), t -> t != '')"))
        .cast("long").as("t"))
      .agg(sum(col("t"))).head().getLong(0)
    assert(packed === direct, "token totals not conserved")
  }

  test("q42 statuses partition the corpus; duplicates = cluster members minus keepers") {
    val out = Q42CorpusClean.run(spark, sf01).collect()
    val total = Tables.documents(spark, sf01).count()
    assert(out.map(_.getAs[Long]("n")).sum === total)
    val nDup = out.filter(_.getAs[String]("status") == "duplicate")
      .map(_.getAs[Long]("n")).sum
    // every resolved cluster drops exactly (n_docs - 1) members
    val expectDup = Q18fDedupClusters.run(spark, sf01).collect()
      .map(r => r.getAs[Long]("n_docs") - 1).sum
    assert(nDup === expectDup && nDup > 0)
    val statuses = out.map(_.getAs[String]("status")).toSet
    assert(statuses === Set("kept", "duplicate", "too_short", "repetitive",
      "low_quality"))
  }

  test("q7b bounded-heap top-k == q7 window ranking, row for row") {
    val agg = Q7bTopKAgg.run(spark, sf01).collect().map(_.toSeq).toSeq
    val win = Q7WindowRank.run(spark, sf01).collect().map(_.toSeq).toSeq
    assert(agg === win && agg.nonEmpty)
  }

  test("TopKOrdersAgg property: any input, any partition split == sorted.take(k)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.functions.{RankedOrder, TopKOrdersAgg}
    val rowGen = for {
      id <- Gen.chooseNum(1L, 40L)
      price <- Gen.oneOf(1.0, 2.5, 2.5, 7.0, 7.0, 9.75) // ties likely
    } yield RankedOrder(id, price)
    val inputGen = for {
      n <- Gen.chooseNum(0, 25)
      rows <- Gen.listOfN(n, rowGen)
      cut <- Gen.chooseNum(0, n)
    } yield (rows, cut)
    val agg = new TopKOrdersAgg(3)
    (0 until 200).foreach { i =>
      val (rows, cut) = inputGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val distinctRows = rows.distinct // duplicate ids collapse in expectation
      val expect = distinctRows
        .sortBy(r => (-r.o_totalprice, r.o_orderkey)).take(3)
      val (l, r) = distinctRows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === expect, s"seed $i")
    }
  }

  test("TopKOrdersAgg: insert order never changes the result, size bounded") {
    val agg = new graft.functions.TopKOrdersAgg(3)
    val rows = Seq(
      graft.functions.RankedOrder(1, 10.0), graft.functions.RankedOrder(2, 30.0),
      graft.functions.RankedOrder(3, 20.0), graft.functions.RankedOrder(4, 30.0),
      graft.functions.RankedOrder(5, 5.0))
    val expect = Seq(
      graft.functions.RankedOrder(2, 30.0), graft.functions.RankedOrder(4, 30.0),
      graft.functions.RankedOrder(3, 20.0))
    rows.permutations.take(30).foreach { perm =>
      // any reduce order and any split into merged partials agree
      val whole = perm.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(whole) === expect)
      val (l, r) = perm.splitAt(2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === expect)
      assert(merged.size <= 3)
    }
  }

  test("q37 date spine zero-fills a missing month") {
    val dir = java.nio.file.Files.createTempDirectory("q37_gap").toString
    // three orders in Jan and Mar 2024 — Feb must appear with zeros
    Seq((1L, 1L, "O", 10.0, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), "1-URGENT"),
        (2L, 1L, "O", 20.0, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), "1-URGENT"),
        (3L, 2L, "F", 30.0, java.sql.Timestamp.valueOf("2024-03-05 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = Q37DateSpine.run(spark, dir).collect()
    assert(out.map(r => (r.getAs[String]("month"), r.getAs[Long]("n_orders"),
      r.getAs[Double]("revenue"))).toSeq ===
      Seq(("2024-01", 2L, 30.0), ("2024-02", 0L, 0.0), ("2024-03", 1L, 30.0)))
  }

  test("q36 built-in stats agree with decimal-exact moments on the fixture") {
    val rows = Q36StatsMoments.run(spark, sf01).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("builtin_std_ok"), s"stddev drift: $r")
      assert(r.getAs[Boolean]("builtin_corr_ok"), s"corr drift: $r")
      assert(r.getAs[Double]("var_qty") >= 0)
      val c = r.getAs[Double]("corr_qty_price")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("s8 fixture output: bounds hold and row count matches the batch join") {
    val out = graft.streaming.S8StreamStreamJoin.run(spark, sf01).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val gap = r.getAs[Long]("gap_us")
      assert(gap >= 0 && gap <= 30L * 60 * 1000 * 1000, s"gap out of bounds: $r")
    }
    val ev = Tables.events(spark, sf01)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("us").as("cus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("us").as("pus"))
    val batch = c.join(p, col("cu") === col("pu") &&
      col("pus") >= col("cus") && col("pus") <= col("cus") + 1800000000L)
    assert(out.length.toLong === batch.count())
  }
}

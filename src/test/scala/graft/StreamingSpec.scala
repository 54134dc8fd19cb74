package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamQueries, Streams}

/** SURVEY §5.2 item 5 — streaming ≡ batch on the same data.
  *
  * The Streams transforms are source-agnostic; here they run on
  * MemoryStream inputs (no files involved) and must agree with the
  * equivalent batch plans. S4 must agree with Q17's sessionization and
  * S6 with Q1's inverted index (the reference's program).
  */
/** Top-level so Spark's case-class Encoder can instantiate it. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val evs = Seq(
    // user 1: a gap of EXACTLY 30 min (00:10 -> 00:40) merges — new
    // session only when the gap strictly exceeds the gap duration
    Ev(1, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.0),
    Ev(2, Timestamp.valueOf("2024-01-01 00:10:00"), 1, "view", 2.0),
    Ev(3, Timestamp.valueOf("2024-01-01 00:40:00"), 1, "click", 3.0),
    Ev(4, Timestamp.valueOf("2024-01-01 02:00:00"), 1, "purchase", 4.0),
    // user 2: one session spanning an hour boundary
    Ev(5, Timestamp.valueOf("2024-01-01 00:55:00"), 2, "view", 5.0),
    Ev(6, Timestamp.valueOf("2024-01-01 01:05:00"), 2, "view", 6.0))

  private def runStream(mkStream: DataFrame => DataFrame, mode: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(evs)
    StreamQueries.runToBatch(spark, mkStream(in.toDF()), mode)
  }

  test("S1 tumbling counts == batch groupBy on the same rows") {
    val out = runStream(Streams.tumblingCounts, "complete")
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = evs.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(out === batch && out.nonEmpty)
  }

  test("S4 session windows == Q17-style lag/sum sessionization") {
    val out = runStream(Streams.sessionWindows, "complete")
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n_events"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    // expected sessions: (user, start, end = last + 30 min, n)
    val expect = Set(
      (1L, ts("00:00:00"), ts("01:10:00"), 3L),
      (1L, ts("02:00:00"), ts("02:30:00"), 1L),
      (2L, ts("00:55:00"), ts("01:35:00"), 2L))
    assert(out === expect)
  }

  test("S5 dedup collapses a doubled stream to unique event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(evs ++ evs) // every event twice
    val out = StreamQueries.runToBatch(spark,
      Streams.dedupByEventId(in.toDF()), "append")
    assert(out.select("event_id").as[Long].collect().sorted ===
      evs.map(_.event_id).sorted)
  }

  test("S6 incremental inverted index == batch Q1 on fixture documents") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    in.addData(docs)
    val out = StreamQueries.runToBatch(spark,
      Streams.incrementalInvertedIndex(
        in.toDF().toDF("doc_id", "text")), "update")
      .as[(String, Seq[Long])].collect().toSet
    val batch = queries.InvertedIndex.index(Tables.documents(spark, sf))
      .select(col("word"), col("doc_ids"))
      .as[(String, Seq[Long])].collect().toSet
    assert(out === batch && out.nonEmpty)
  }

  test("S6 letter-file sink == batch TextCorpus sink on the same docs") {
    val outS = java.nio.file.Files.createTempDirectory("s6_sink").toString
    val outB = java.nio.file.Files.createTempDirectory("s6_batch").toString
    val docs = graft.streaming.StreamQueries.docsStream(spark, sf)
    val q = Streams.writeIndexLetterFiles(docs, outS)
    try { q.processAllAvailable() } finally { q.stop() }
    sources.TextCorpus.writeLetterFilesFromIndex(
      queries.InvertedIndex.index(
        Tables.documents(spark, sf).select(col("doc_id"), col("text"))), outB)
    for (l <- 'a' to 'z') {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(outS, s"$l.txt"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(outB, s"$l.txt"))
      assert(java.util.Arrays.equals(a, b), s"letter $l differs")
    }
  }

  test("S7 stateful profiles across two batches == one batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val name = "s7_two_batches"
    val q = Streams.userProfiles(in.toDF()).toDF()
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      // chronological split: batch 2's earliest event is >= batch 1's
      // latest, so nothing is late relative to the 10-min watermark
      val sorted = evs.sortBy(_.ts.getTime)
      in.addData(sorted.take(3))
      q.processAllAvailable()
      in.addData(sorted.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    // update mode appends one profile per user per batch — the final
    // state is the row with the largest n_events per user
    val got = spark.table(name).as[graft.streaming.UserProfile].collect()
      .groupBy(_.user_id).values.map(_.maxBy(_.n_events))
      .map(p => (p.user_id, p.n_events, p.n_types, p.types,
        p.first_us, p.last_us, p.vmin, p.vmax)).toSet
    val expect = evs.toDF()
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        size(collect_set(col("event_type"))).as("nt"),
        array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
        min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .as[(Long, Long, Int, String, Long, Long, Double, Double)]
      .collect().toSet
    assert(got === expect && got.nonEmpty)
  }

  test("checkpointed restart: half the corpus arrives after a stop; state survives") {
    // batch 1 processes the even docs; the stream stops (simulated
    // crash); the odd docs arrive while it is down; the restarted
    // query must combine checkpointed state with the new file and
    // reach exactly the batch result over the full corpus.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val srcDir = Files.createTempDirectory("ckpt_src")
    val stage = Files.createTempDirectory("ckpt_stage")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$stage/f0")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$stage/f1")
    def deliver(part: String): Unit = {
      val src = Files.list(Paths.get(s"$stage/$part")).iterator()
      while (src.hasNext) {
        val f = src.next()
        if (f.getFileName.toString.startsWith("part-"))
          Files.copy(f, srcDir.resolve(s"$part.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def start(name: String) =
      Streams.incrementalInvertedIndex(
        spark.readStream.schema(docs.schema).parquet(s"$srcDir/*.parquet"))
        .writeStream.format("memory").queryName(name).outputMode("complete")
        .option("checkpointLocation", ckpt).start()
    deliver("f0")
    val q1 = start("ckpt_run1")
    try { q1.processAllAvailable() } finally { q1.stop() }
    deliver("f1") // arrives while the stream is down
    val q2 = start("ckpt_run2")
    try { q2.processAllAvailable() } finally { q2.stop() }
    val got = spark.table("ckpt_run2")
      .as[(String, Seq[Long])].collect().toMap
    val expect = queries.InvertedIndex.index(docs)
      .select(col("word"), col("doc_ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got === expect && got.nonEmpty)
  }

  private def ts(hms: String) = Timestamp.valueOf(s"2024-01-01 $hms")
}

package graft

import org.apache.spark.sql.Row
import graft.queries.Q72bWarcExtract

/** Round 12: the WARC container front end (q72b). The sf-corpus path
  * is oracle-gated end to end (the oracle replays what a correct
  * parser must emit, so one mis-framed offset breaks the hash); these
  * tests pin the parser alone on hand-written archives — above all
  * that framing is LENGTH-driven: payloads containing literal WARC
  * header lines must not split a record. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val CRLF = "\r\n"

  private def record(uri: String, body: String,
      status: String = "HTTP/1.1 200 OK"): String = {
    val http = s"$status${CRLF}Content-Type: text/html$CRLF$CRLF$body"
    s"WARC/1.0${CRLF}WARC-Type: response${CRLF}WARC-Target-URI: $uri$CRLF" +
      s"Content-Length: ${http.length}$CRLF$CRLF$http$CRLF$CRLF"
  }

  private def parse(archives: String*): Seq[Row] =
    Q72bWarcExtract.parseArchives(archives.toDF("warc"))
      .orderBy("uri").collect().toSeq

  test("q72b: two records parse to exactly their own uri/status/html") {
    val rows = parse(
      record("http://a.example/1", "<p>first body</p>") +
        record("http://b.example/2", "<p>second body</p>"))
    assert(rows.map(_.getString(0)) ===
      Seq("http://a.example/1", "http://b.example/2"))
    assert(rows.map(_.getInt(1)) === Seq(200, 200))
    assert(rows.map(_.getString(2)) ===
      Seq("<p>first body</p>", "<p>second body</p>"))
  }

  test("q72b: a payload containing WARC header lines never splits a record") {
    // The decoy is a byte-exact WARC header INSIDE record 1's body;
    // a delimiter-split parser would frame 3 records and corrupt
    // record 2. Length-driven framing sails past it.
    val decoy = s"WARC/1.0${CRLF}Content-Length: 3$CRLF${CRLF}xyz"
    val rows = parse(
      record("http://a.example/1", s"<p>before $decoy after</p>") +
        record("http://b.example/2", "<p>intact</p>"))
    assert(rows.size === 2)
    assert(rows(0).getString(2) === s"<p>before $decoy after</p>")
    assert(rows(1).getString(2) === "<p>intact</p>")
  }

  test("q72b: malformed tails stop the walk without corrupting parsed records") {
    val rows = parse(
      record("http://a.example/1", "<p>good</p>") +
        s"WARC/1.0${CRLF}no content length header$CRLF$CRLF")
    assert(rows.size === 1)
    assert(rows(0).getString(0) === "http://a.example/1")
  }

  test("q72b: non-WARC garbage parses to zero records") {
    assert(parse("just some text with no records").isEmpty)
    assert(parse("").isEmpty)
  }

  test("q72b: a non-200 status is surfaced, not assumed") {
    val rows = parse(
      record("http://a.example/1", "<p>gone</p>", "HTTP/1.1 404 Not Found"))
    assert(rows(0).getInt(1) === 404)
  }

  test("s21: multi-record archives frame correctly per file-trigger epoch") {
    val dir = java.nio.file.Files.createTempDirectory("s21_warc").toString
    try {
      // Two archive FILES, two records each, a decoy in the first
      // record of each — one file per trigger, so each micro-batch
      // must length-frame a multi-record blob.
      val decoy = s"WARC/1.0${CRLF}Content-Length: 5$CRLF${CRLF}decoy"
      def body(i: Int) =
        s"<p>the honest prose of record number $i carries along</p>"
      val files = Seq(
        record("http://example.org/doc/1", s"<p>x $decoy</p>" ) +
          record("http://example.org/doc/2", body(2)),
        record("http://example.org/doc/3", body(3)) +
          record("http://example.org/doc/4", body(4)))
      files.zipWithIndex.foreach { case (warc, i) =>
        Seq(warc).toDF("warc").repartition(1)
          .write.parquet(s"$dir/arch/f$i.parquet")
      }
      val sch = spark.read.parquet(s"$dir/arch/f0.parquet").schema
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/arch/*.parquet")
      val out = graft.streaming.StreamQueries.runToBatch(spark,
          graft.streaming.S21StreamWarc.warcStream(stream), "append")
        .orderBy("doc_id").collect()
      assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
      // records 2..4 pass the gates; record 1's decoy block fails them
      assert(out.drop(1).forall(_.getLong(
        out(1).fieldIndex("n_kept")) === 1L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }
}

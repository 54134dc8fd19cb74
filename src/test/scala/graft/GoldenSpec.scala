package graft

import java.nio.file.{Files, Paths}

import graft.sources.TextCorpus

/** SURVEY §5.2 item 3 — byte-exact golden tests against the compiled
  * reference binary (g++ -O2 src/main.cpp, run on the committed
  * corpora in src/test/resources/golden/<case>/). Each case compares
  * all 26 letter files of TextCorpus.buildIndex against the binary's
  * own a.txt…z.txt.
  *
  * `empty` (N=0 manifest) is the one hand-made golden: the reference
  * binary segfaults on an empty manifest, so the expected output is
  * pinned to the documented contract (26 empty files,
  * main.cpp:148-162) rather than to the crash.
  */
class GoldenSpec extends SparkSpec {
  private val root = Paths.get("src/test/resources/golden")
  private val cases = Seq("tiny", "dupes", "skew", "empty", "blank")

  for (c <- cases) test(s"golden case '$c': 26 letter files byte-match the reference") {
    val caseDir = root.resolve(c)
    val outDir = Files.createTempDirectory(s"golden_$c").toString
    TextCorpus.buildIndex(spark, caseDir.resolve("manifest.txt").toString, outDir)
    assertMatchesExpected(caseDir, outDir, c)
  }

  test("all golden cases byte-match through the DSv2 graft-corpus source") {
    // Same five corpora, routed through the connector instead of the
    // text-source + path-join read: one partition per manifest file,
    // ids carried by the partitions. Byte-equality against the same
    // reference outputs proves the two read paths are interchangeable.
    withConfs("spark.graft.corpus.dsv2" -> "true") {
      for (c <- cases) {
        val caseDir = root.resolve(c)
        val outDir = Files.createTempDirectory(s"golden_dsv2_$c").toString
        TextCorpus.buildIndex(spark, caseDir.resolve("manifest.txt").toString, outDir)
        assertMatchesExpected(caseDir, outDir, s"$c-via-dsv2")
      }
    }
  }

  test("all golden cases byte-match through the classic driver-rename writer") {
    // The DSv2 V2-committer sink is the DEFAULT write path (round 15);
    // the classic partitioned-text + driver-rename writer stays as the
    // flagged fallback. Byte equality against the same reference
    // outputs proves the two write paths remain interchangeable.
    withConfs("spark.graft.letters.dsv2" -> "false") {
      for (c <- cases) {
        val caseDir = root.resolve(c)
        val outDir = Files.createTempDirectory(s"golden_sink_$c").toString
        TextCorpus.buildIndex(spark, caseDir.resolve("manifest.txt").toString, outDir)
        assertMatchesExpected(caseDir, outDir, s"$c-via-classic-writer")
      }
    }
  }

  test("growing manifest streamed through the connector converges to the golden files") {
    // End-to-end marriage of the two extension rungs: the DSv2
    // connector's micro-batch stream feeds the incremental inverted
    // index, whose foreachBatch sink republishes the reference's
    // 26-file output. Half the corpus arrives first, the manifest
    // then grows to full — the final letter files must byte-match the
    // reference binary's output for the whole corpus (ids are
    // manifest positions, so the staged prefixes assign the same ids
    // the full manifest does).
    val caseDir = root.resolve("tiny")
    val entries = TextCorpus.manifestEntries(
      caseDir.resolve("manifest.txt").toString)
    assert(entries.size >= 2)
    val stage = Files.createTempDirectory("golden_stream")
    // Write-temp + ATOMIC_MOVE: the streaming source polls this file
    // on its own thread, so an in-place write could expose a torn
    // snapshot (count line ahead of the paths) mid-poll.
    def writeManifest(n: Int): Unit = {
      val tmp = stage.resolve("manifest.txt.tmp")
      Files.write(tmp,
        (s"$n\n" + entries.take(n).map(_._1).mkString("\n") + "\n")
          .getBytes("UTF-8"))
      Files.move(tmp, stage.resolve("manifest.txt"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeManifest(entries.size / 2)
    val outDir = Files.createTempDirectory("golden_stream_out").toString
    val stream = spark.readStream.format("graft-corpus")
      .option("manifest", stage.resolve("manifest.txt").toString).load()
    val q = graft.streaming.Streams.writeIndexLetterFiles(stream, outDir)
    try {
      q.processAllAvailable()
      writeManifest(entries.size) // the rest of the corpus arrives
      q.processAllAvailable()
    } finally q.stop()
    assertMatchesExpected(caseDir, outDir, "tiny-via-streaming-connector")
  }

  test("reference CLI contract: Cli.main(M, R, manifest, outDir) end-to-end") {
    val caseDir = root.resolve("tiny")
    val outDir = Files.createTempDirectory("golden_cli").toString
    // Same arg shape as `./tema1 4 4 manifest.txt` (README.md:16); the
    // 4th arg redirects output away from the CWD. getOrCreate reuses
    // the suite session, so this exercises the full main body.
    Cli.main(Array("4", "4", caseDir.resolve("manifest.txt").toString, outDir))
    assertMatchesExpected(caseDir, outDir, "tiny-via-cli")
  }

  test("manifest join survives spaces and pluses in file names") {
    // input_file_name() reports percent-encoded URIs; without the
    // url_decode in TextCorpus.documents these files silently vanish
    // from the join (no error, just missing doc_ids). A literal '+'
    // additionally probes the form-decoding hazard ('+' → ' '). The
    // container JVM's file.encoding is ASCII, so non-ASCII names are
    // untestable here; percent-escapes are byte-wise, covered by the
    // same decode path.
    val dir = Files.createTempDirectory("golden_enc")
    Files.write(dir.resolve("with space.txt"), "alpha bravo".getBytes("UTF-8"))
    Files.write(dir.resolve("a+b.txt"), "charlie delta".getBytes("UTF-8"))
    Files.write(dir.resolve("manifest.txt"),
      "2\nwith space.txt\na+b.txt\n".getBytes("UTF-8"))
    val docs = TextCorpus.documents(spark, dir.resolve("manifest.txt").toString)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((1L, "alpha bravo"), (2L, "charlie delta")))
  }

  private def assertMatchesExpected(caseDir: java.nio.file.Path,
                                    outDir: String, label: String): Unit = {
    for (letter <- 'a' to 'z') {
      val ours = Paths.get(outDir, s"$letter.txt")
      val theirs = caseDir.resolve("expected").resolve(s"$letter.txt")
      assert(Files.exists(ours), s"missing $letter.txt")
      val a = new String(Files.readAllBytes(ours), "UTF-8")
      val b = new String(Files.readAllBytes(theirs), "UTF-8")
      assert(a === b, s"case $label letter $letter differs")
    }
  }
}

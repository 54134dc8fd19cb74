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
    for (letter <- 'a' to 'z') {
      val ours = Paths.get(outDir, s"$letter.txt")
      val theirs = caseDir.resolve("expected").resolve(s"$letter.txt")
      assert(Files.exists(ours), s"missing $letter.txt")
      val a = new String(Files.readAllBytes(ours), "UTF-8")
      val b = new String(Files.readAllBytes(theirs), "UTF-8")
      assert(a === b, s"case $c letter $letter differs")
    }
  }
}

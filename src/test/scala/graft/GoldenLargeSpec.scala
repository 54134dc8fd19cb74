package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import graft.sources.TextCorpus

/** FIXTURES §B `vocab50k` — the BASELINE.md-shaped corpus (32 files,
  * 50k-word vocabulary, deterministic seed) byte-compared against the
  * reference binary COMPILED AND RUN at test time. This is the
  * at-size counterpart of GoldenSpec's handwritten cases; it cancels
  * (rather than fails) if no C++ toolchain is present. */
class GoldenLargeSpec extends SparkSpec {

  test("vocab50k: 26 letter files byte-match the compiled reference at size") {
    val gpp = Process(Seq("which", "g++")).!(ProcessLogger(_ => ()))
    assume(gpp == 0, "g++ not available — skipping at-size golden test")

    val work = Files.createTempDirectory("vocab50k")
    val corpus = Files.createDirectory(work.resolve("corpus"))
    // deterministic corpus: 50k letter-only words, 32 files
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val vocab = Array.fill(50000)(
      (0 until (3 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(26))).mkString)
    for (f <- 0 until 32) {
      val sb = new StringBuilder
      for (_ <- 0 until 1500)
        sb.append((0 until 10).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString("", " ", "\n"))
      Files.writeString(corpus.resolve(f"file_$f%02d.txt"), sb.toString)
    }
    val manifest = work.resolve("manifest.txt")
    Files.writeString(manifest,
      "32\n" + (0 until 32).map(f => f"corpus/file_$f%02d.txt").mkString("", "\n", "\n"))

    // compile + run the reference in its own CWD (it writes a.txt..z.txt there)
    val bin = work.resolve("ref_bin").toString
    val cc = Process(Seq("g++", "-O2", "-o", bin,
      "/root/reference/src/main.cpp", "-lpthread")).!(ProcessLogger(_ => ()))
    assume(cc == 0, "reference failed to compile — skipping")
    val refDir = Files.createDirectory(work.resolve("ref_out"))
    Files.copy(manifest, refDir.resolve("manifest.txt"))
    Files.createSymbolicLink(refDir.resolve("corpus"), corpus)
    val run = Process(Seq(bin, "8", "8", "manifest.txt"),
      refDir.toFile).!(ProcessLogger(_ => ()))
    assert(run == 0, "reference binary failed")

    val ourDir = work.resolve("our_out").toString
    TextCorpus.buildIndex(spark, manifest.toString, ourDir)

    for (l <- 'a' to 'z') {
      val ours = Files.readAllBytes(Paths.get(ourDir, s"$l.txt"))
      val theirs = Files.readAllBytes(refDir.resolve(s"$l.txt"))
      assert(java.util.Arrays.equals(ours, theirs), s"letter $l differs at size")
    }
  }
}

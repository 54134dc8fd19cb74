package graft

import org.apache.spark.sql.functions._
import graft.queries.{Q64BpeMerges, Q64bBpeEncode}

/** Round-10 continuation: q64 BPE merge learning — hand-pinned merge
  * trajectory, the identical-symbol run-parity case, exhaustion on a
  * fully-merged vocabulary, and a seeded random cross-check against an
  * in-memory reference implementation of the Sennrich et al. (2016)
  * algorithm. */
class Round10bSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r10bpe").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  /** Reference BPE: pair counts over every adjacent position, argmax
    * by (count desc, left asc, right asc), greedy left-to-right
    * NON-overlapping merge — transcribed from the published algorithm
    * independently of the query's fold/relational formulations. */
  private def refBpeFull(freq: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, String, Long)], Map[String, Int]) = {
    var words = freq.toSeq.map { case (w, c) => (w, w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (i <- 1 to k) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, syms, c) <- words; j <- 0 until syms.length - 1)
        pc((syms(j), syms(j + 1))) = pc.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (pc.nonEmpty && out.length == i - 1) {
        val ((l, r), n) = pc.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.head
        out += ((i, l, r, l + r, n))
        words = words.map { case (w, syms, c) =>
          val b = Vector.newBuilder[String]; var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              b += (l + r); j += 2
            } else { b += syms(j); j += 1 }
          }
          (w, b.result(), c)
        }
      }
    }
    (out.toSeq, words.map { case (w, syms, _) => w -> syms.length }.toMap)
  }

  private def refBpe(freq: Map[String, Long], k: Int): Seq[(Int, String, String, String, Long)] =
    refBpeFull(freq, k)._1

  private def runRows(dir: String): Seq[(Int, String, String, String, Long)] =
    Q64BpeMerges.run(spark, dir).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))

  test("q64: hand-derived merge trajectory on the Sennrich-style vocabulary") {
    // low:5 lower:2 newest:6 widest:3 — the canonical worked example.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val dir = writeDocs(Seq((1L, text)))
    try {
      // Round 1: es=9 ties st=9, left-asc tie-break picks (e,s);
      // round 2 (es,t)=9; round 3 lo=7 ties ow=7 -> (l,o); round 4
      // (lo,w)=7; round 5 three-way 6-tie -> (e,w); round 6 (ew,est).
      assert(runRows(dir) == Seq(
        (1, "e", "s", "es", 9L),
        (2, "es", "t", "est", 9L),
        (3, "l", "o", "lo", 7L),
        (4, "lo", "w", "low", 7L),
        (5, "e", "w", "ew", 6L),
        (6, "ew", "est", "ewest", 6L)))
    } finally cleanup(dir)
  }

  test("q64: identical-symbol runs pair off non-overlapping, and learning exhausts cleanly") {
    // aaaa:3 aaa:2 — counting sees every adjacent position (aa = 13),
    // but the merge is non-overlapping: aaaa -> [aa,aa] (so rank 2 is
    // (aa,aa)=3, NOT a leftover (aa,a) from an overlapped merge) and
    // aaa -> [aa,a]. After 3 merges every word is one symbol: the
    // output stops at 3 rows instead of erroring on an empty argmax.
    val text = (Seq.fill(3)("aaaa") ++ Seq.fill(2)("aaa")).mkString(" ")
    val dir = writeDocs(Seq((1L, text)))
    try {
      assert(runRows(dir) == Seq(
        (1, "a", "a", "aa", 13L),
        (2, "aa", "aa", "aaaa", 3L),
        (3, "aa", "a", "aaa", 2L)))
    } finally cleanup(dir)
  }

  test("q64b: hand-derived fertility on the Sennrich vocabulary") {
    // After the 6 learned merges: low→[low](1), lower→[low,e,r](3),
    // newest→[n,ewest](2), widest→[w,i,d,est](4).
    // words = 5+2+6+3 = 16; tokens = 5·1+2·3+6·2+3·4 = 35.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val dir = writeDocs(Seq((1L, text)))
    try {
      val rows = Q64bBpeEncode.run(spark, dir).collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)) == (("en", 1L, 16L, 35L, 35.0 / 16)))
    } finally cleanup(dir)
  }

  test("q64b: multi-language corpora match the in-memory encode") {
    val rnd = new scala.util.Random(7)
    val langs = Seq("de", "en", "ro")
    // Learning is corpus-global; fertility is per-language. Build
    // per-doc word lists, derive the combined frequency table, and
    // aggregate the reference encode per language.
    val docs = (1 to 12).map { i =>
      val words = (1 to (3 + rnd.nextInt(8))).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (1 to len).map(_ => "abc" (rnd.nextInt(3))).mkString
      }
      (i.toLong, langs(rnd.nextInt(3)), words)
    }
    val freq = docs.flatMap(_._3).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val ntok = refBpeFull(freq, Q64BpeMerges.Merges)._2
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val allWords = ds.flatMap(_._3)
      val toks = allWords.map(w => ntok(w).toLong).sum
      (lang, ds.map(_._1).distinct.size.toLong, allWords.size.toLong, toks,
        toks.toDouble / allWords.size)
    }
    // writeDocs pins lang="en"; write directly to carry real langs.
    val dir2 = java.nio.file.Files.createTempDirectory("r10bpe").toString
    docs.map { case (id, lang, ws) =>
      val text = ws.mkString(" ")
      (id, text, lang, "s", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    try {
      val got = Q64bBpeEncode.run(spark, dir2).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      assert(got == want, s"got $got, want $want")
    } finally cleanup(dir2)
  }

  test("q64: random corpora match the in-memory reference implementation") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val alphabet = "abc"
      val vocab = (1 to 25).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct
      val freq = vocab.map(w => w -> (1L + rnd.nextInt(9))).toMap
      val text = freq.toSeq.sortBy(_._1)
        .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
      val dir = writeDocs(Seq((1L, text)))
      try {
        val got = runRows(dir)
        val want = refBpe(freq, Q64BpeMerges.Merges)
        assert(got == want, s"trial $trial: got $got, want $want")
      } finally cleanup(dir)
    }
  }
}

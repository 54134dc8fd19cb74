package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.InvertedIndex

/** SURVEY §5.2 item 2 — property-based agreement between the
  * distributed Q1 pipeline and a naive in-memory Scala reference on
  * random corpora, plus the structural invariants of §1.4.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest
  * bridge artifact is not in the offline cache.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample stream from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val token: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaChar),
    Gen.stringOfN(2, Gen.alphaLowerChar),
    Gen.oneOf("word-count", "index2", "123", "?!?", "HeLLo", "a", "Zz"))
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, docGen))

  /** The reference's semantics, naively: normalize per §1.4, distinct
    * per doc, group, postings ascending. */
  private def naive(corpus: List[String]): Map[String, List[Long]] =
    corpus.zipWithIndex.flatMap { case (text, i) =>
      text.split("\\s+").toList
        .map(_.toLowerCase.filter(c => c >= 'a' && c <= 'z'))
        .filter(_.nonEmpty).distinct
        .map(w => (w, (i + 1).toLong))
    }.groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2).distinct.sorted }

  test("Q1 pipeline == naive in-memory reference on random corpora") {
    samples(corpusGen, 15).foreach { corpus =>
      val df = corpus.zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }.toDF("doc_id", "text")
      val got = InvertedIndex.index(df)
        .select($"word", $"doc_ids")
        .as[(String, List[Long])].collect().toMap
      assert(got === naive(corpus))
    }
  }

  test("Q1 invariants: postings ascending, ids in range, letter = first char") {
    samples(corpusGen, 10).foreach { corpus =>
      val df = corpus.zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }.toDF("doc_id", "text")
      val rows = InvertedIndex.index(df).collect()
      rows.foreach { r =>
        val word = r.getString(0)
        val ids = r.getSeq[Long](3)
        assert(ids == ids.sorted && ids.distinct == ids)
        assert(ids.forall(id => id >= 1 && id <= corpus.length))
        assert(r.getString(1) == word.substring(0, 1))
        assert(r.getLong(2) == ids.length)
        assert(word.nonEmpty && word.forall(c => c >= 'a' && c <= 'z'))
      }
    }
  }

  test("typed Aggregator merge == sort_array(collect_set) on random inputs") {
    import graft.functions.PostingList.PostingListAgg
    samples(Gen.listOf(Gen.chooseNum(1L, 20L)), 30).foreach { ids =>
      val viaAgg = PostingListAgg.finish(
        ids.foldLeft(PostingListAgg.zero)(PostingListAgg.reduce))
      // also exercise merge: split in two halves, fold each, merge
      val (l, r) = ids.splitAt(ids.length / 2)
      val merged = PostingListAgg.finish(PostingListAgg.merge(
        l.foldLeft(PostingListAgg.zero)(PostingListAgg.reduce),
        r.foldLeft(PostingListAgg.zero)(PostingListAgg.reduce)))
      val expect = ids.distinct.sorted
      assert(viaAgg == expect && merged == expect)
    }
  }

  test("graft_dot == in-memory left fold on random float vectors (incl. empty)") {
    // The native expression's contract: ascending-index
    // left-associative double accumulation — raw-bits equality
    // against a driver-side loop over the same floats, across random
    // lengths 0..80 and magnitudes spanning denormal-adjacent to 1e6.
    val fGen: Gen[Float] = Gen.oneOf(
      Gen.chooseNum(-1e6f, 1e6f),
      Gen.chooseNum(-1e-6f, 1e-6f),
      Gen.oneOf(0.0f, -0.0f, 1.0f, -1.0f, 3.4e38f, -3.4e38f))
    val pairGen: Gen[(List[Float], List[Float])] =
      Gen.chooseNum(0, 80).flatMap(n =>
        for { a <- Gen.listOfN(n, fGen); b <- Gen.listOfN(n, fGen) } yield (a, b))
    val ps = samples(pairGen, 60).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val got = ps.toDF("id", "a", "b")
      .selectExpr("id", "graft_dot(a, b) AS dot")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ps.foreach { case (id, a, b) =>
      var sum = 0.0; var i = 0
      while (i < a.length) { sum += a(i).toDouble * b(i).toDouble; i += 1 }
      assert(java.lang.Double.doubleToRawLongBits(got(id)) ==
        java.lang.Double.doubleToRawLongBits(sum),
        s"pair $id (len ${a.length}): native ${got(id)} != fold $sum")
    }
  }
}

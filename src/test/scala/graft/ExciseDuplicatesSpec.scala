package graft

import org.apache.spark.sql.Row
import graft.queries.Q60cExciseDuplicates

/** Round 12: duplicate-span excision (q60c). The sf-corpus rewrite is
  * oracle-gated end to end (cleaned_text hashes); these tests pin the
  * contract's decision points on crafted corpora: who the keeper is,
  * that intra-doc repeats are excised (where q60/q60b count only
  * cross-doc sharing), that a fully-duplicated document excises to
  * empty, and that sub-width docs are never touched. */
class ExciseDuplicatesSpec extends SparkSpec {
  import spark.implicits._

  private def excise(docs: Seq[(Long, String)]): Map[Long, Row] =
    Q60cExciseDuplicates.excise(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  private def cleaned(r: Row) = r.getString(r.fieldIndex("cleaned_text"))
  private def removed(r: Row) = r.getLong(r.fieldIndex("n_removed"))

  test("q60c: the first occurrence keeps, the later doc is excised") {
    val footer = (1 to 8).map(i => s"f$i").mkString(" ")
    val m = excise(Seq(
      0L -> s"$footer a1 a2",
      1L -> s"b1 b2 $footer"))
    assert(removed(m(0L)) === 0L)
    assert(cleaned(m(0L)) === s"$footer a1 a2")
    assert(removed(m(1L)) === 8L)
    assert(cleaned(m(1L)) === "b1 b2")
  }

  test("q60c: intra-doc repeats are excised too (unlike q60/q60b)") {
    val run = (1 to 8).map(i => s"g$i").mkString(" ")
    val m = excise(Seq(0L -> s"$run z1 $run"))
    assert(removed(m(0L)) === 8L)
    assert(cleaned(m(0L)) === s"$run z1")
  }

  test("q60c: a fully-duplicated document excises to empty") {
    val body = (1 to 12).map(i => s"h$i").mkString(" ")
    val m = excise(Seq(0L -> body, 1L -> body))
    assert(removed(m(0L)) === 0L)
    assert(removed(m(1L)) === 12L)
    assert(cleaned(m(1L)) === "")
    assert(m(1L).getDouble(m(1L).fieldIndex("removed_frac")) === 1.0)
  }

  test("q60c: docs under the window width are never touched") {
    val tiny = "t1 t2 t3 t4 t5"
    val m = excise(Seq(0L -> tiny, 1L -> tiny))
    assert(removed(m(0L)) === 0L && removed(m(1L)) === 0L)
    assert(cleaned(m(1L)) === tiny)
  }

  test("q60c: overlapping removals never double-count a token") {
    // doc1 repeats a 10-token region of doc0: its 3 shared windows
    // overlap; the mask removes exactly the 10 region tokens once.
    val region = (1 to 10).map(i => s"r$i").mkString(" ")
    val m = excise(Seq(0L -> s"$region x1 x2", 1L -> s"y1 $region"))
    assert(removed(m(1L)) === 10L)
    assert(cleaned(m(1L)) === "y1")
  }
}

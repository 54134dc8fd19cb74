package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.Q61bGopherRepetition

/** Round 12: the Gopher repetition filter bank (q61b). The fixture
  * corpus is single-line with no duplicated ≥5-grams, so the oracle
  * hash gate exercises only the top-n-gram tiers there; these tests
  * pin the line, paragraph, and duplicate-n-gram tiers on crafted
  * corpora with hand-computed expectations, plus the two contract
  * subtleties the hash can't isolate: the position-coverage mask
  * (overlapping duplicates never double-count a token) and the
  * lexicographic tie-break of the top-gram argmax (observable when
  * tied grams differ in char length). */
class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): Row =
    Q61bGopherRepetition.signals(Seq((0L, text)).toDF("doc_id", "text"))
      .head()

  private def f(r: Row, col: String): Double =
    r.getDouble(r.fieldIndex(col))
  private def status(r: Row): String =
    r.getString(r.fieldIndex("status"))

  test("q61b: duplicate-line fraction and char fraction, by hand") {
    // 5 lines, "alpha beta" x3 -> 2 repeat occurrences of 10 chars each;
    // totals: 3*10 + 11 + 7 = 48 chars.
    val r = one("alpha beta\ngamma delta\nalpha beta\nepsilon\nalpha beta")
    assert(r.getInt(r.fieldIndex("n_lines")) === 5)
    assert(f(r, "dup_line_frac") === 2.0 / 5)
    assert(f(r, "dup_line_char_frac") === 20.0 / 48)
    assert(status(r) === "dup_lines")
  }

  test("q61b: paragraph tier fires independently of the line tier") {
    // One short paragraph repeated + one 6-line paragraph of unique
    // lines: 8 line occurrences with 1 repeat (0.125 <= 0.30) but 3
    // paragraph occurrences with 1 repeat (0.333 > 0.30).
    val big = (1 to 6).map(i => s"unique line number $i of the big block")
      .mkString("\n")
    val r = one(s"dup\n\n$big\n\ndup")
    assert(r.getInt(r.fieldIndex("n_lines")) === 8)
    assert(r.getInt(r.fieldIndex("n_paras")) === 3)
    assert(f(r, "dup_line_frac") === 1.0 / 8)
    assert(f(r, "dup_para_frac") === 1.0 / 3)
    assert(status(r) === "dup_paragraphs")
  }

  test("q61b: duplicate 5-gram coverage, by hand, below the top-gram bars") {
    // 45 unique 2-char fillers + one 5-token run placed twice = 55
    // tokens, wch = 110. The repeated run's sub-grams stay under the
    // top-{2,3,4} bars (top4 = 2*8/110 = 0.145 <= 0.16) while the dup-5
    // coverage is 10 tokens = 20/110 = 0.18 > 0.15.
    val run = Seq("ra", "rb", "rc", "rd", "re")
    val fillers = (0 until 45).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val toks = (run ++ fillers.slice(0, 20) ++ run ++ fillers.slice(20, 45))
    assert(toks.size === 55 && toks.forall(_.length == 2))
    val r = one(toks.mkString(" "))
    assert(f(r, "top4_char_frac") === 2.0 * 8 / 110)
    assert(f(r, "dup5_char_frac") === 20.0 / 110)
    assert(f(r, "dup6_char_frac") === 0.0)
    assert(status(r) === "dup_5gram")
  }

  test("q61b: coverage mask never double-counts overlapping duplicates") {
    // 7 x "aa": three identical 5-grams overlap across all 7 positions
    // -> coverage is exactly 1.0, not 15/7; the single 7-gram has no
    // duplicate. Top-gram occurrences DO count fully (documented):
    // "aa aa" x6, 4 chars each over wch 14.
    val r = one(Seq.fill(7)("aa").mkString(" "))
    assert(f(r, "dup5_char_frac") === 1.0)
    assert(f(r, "dup6_char_frac") === 1.0)
    assert(f(r, "dup7_char_frac") === 0.0)
    assert(f(r, "top2_char_frac") === 6.0 * 4 / 14)
    assert(status(r) === "top_2gram")
  }

  test("q61b: top-gram ties break to the lexicographically smallest") {
    // "a b" and "ccc ddd" both occur twice; the winner's char length
    // decides the fraction: smallest is "a b" -> 2*2/16, not 2*6/16.
    val r = one("a b a b ccc ddd ccc ddd")
    assert(f(r, "top2_char_frac") === 2.0 * 2 / 16)
  }

  test("q61b: empty and whitespace-only docs are kept with zero signals") {
    for (t <- Seq("", "   ", "\n\n\n")) {
      val r = one(t)
      assert(r.getInt(r.fieldIndex("n_lines")) === 0)
      assert(f(r, "dup_line_frac") === 0.0)
      assert(f(r, "dup10_char_frac") === 0.0)
      assert(status(r) === "kept", s"text=${t.replace("\n", "\\n")}")
    }
  }

  test("q61b: status cascade follows the published table order") {
    // Repeated lines AND a repeated paragraph: the line rule is listed
    // first and wins.
    val r = one("x\n\nx\n\nx\n\ny y y y y y")
    assert(f(r, "dup_line_frac") > 0.30 && f(r, "dup_para_frac") > 0.30)
    assert(status(r) === "dup_lines")
  }
}

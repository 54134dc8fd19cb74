package graft

import org.apache.spark.sql.Row
import graft.queries.Q64gWordpieceEncode

/** Round 12: WordPiece encode (q64g). The corpus path is oracle-gated
  * (the relational unrolled greedy loop must reproduce the fold); these
  * tests pin the algorithm's decision points on single crafted docs. */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): Row =
    Q64gWordpieceEncode.encode(Seq((0L, text)).toDF("doc_id", "text"))
      .head()

  private def enc(text: String): String =
    one(text).getString(one(text).fieldIndex("encoded"))

  test("q64g: longest match wins — 'table' is one piece despite tab+##le") {
    assert(enc("table") === "table")
    assert(enc("the") === "the")
  }

  test("q64g: multi-piece splits through multi-char and single-char continuations") {
    assert(enc("customer") === "cust ##omer")
    assert(enc("window") === "win ##dow")
    assert(enc("value") === "val ##ue")
    assert(enc("filter") === "f ##i ##l ##t ##e ##r")
    assert(enc("stream") === "s ##tream")
  }

  test("q64g: [UNK] is whole-word — a matched prefix does not leak pieces") {
    val r = one("dup table dup")
    assert(r.getString(r.fieldIndex("encoded")) === "[UNK] table [UNK]")
    assert(r.getLong(r.fieldIndex("n_unk")) === 2L)
    assert(r.getLong(r.fieldIndex("n_pieces")) === 3L)
    // a word with no matching initial piece at all is also [UNK]
    assert(enc("zzz") === "[UNK]")
  }

  test("q64g: the shared depth contract — ≤MaxMeasuredWordLen encodes exactly, beyond is [UNK]") {
    // Round 17 (ADVICE r16): every WP tier and every WP oracle chain
    // share ONE depth bound, Bpe.MaxMeasuredWordLen — no more
    // fixture-pinned "max token ≤ OracleSteps" invariant. A fully
    // covered word of 11–64 chars (the old silent-divergence range)
    // must encode EXACTLY; past the bound it is [UNK] by explicit
    // guard even though greedy multi-char pieces could finish it.
    val maxLen = graft.queries.Bpe.MaxMeasuredWordLen
    // "table" + k × "le" — 'table' init, 'le' continuation pieces.
    def covered(k: Int) = "table" + "le" * k
    val in = covered((maxLen - 5) / 2)         // 63 chars: inside
    assert(in.length <= maxLen)
    assert(enc(in) === "table" + " ##le" * ((maxLen - 5) / 2))
    val out = covered((maxLen - 5) / 2 + 1)    // 65 chars: past it
    assert(out.length > maxLen)
    assert(enc(out) === "[UNK]")
  }

  test("q64g: counts — words, pieces, unks; empty doc is all zeros") {
    val r = one("customer filter dup")
    assert(r.getLong(r.fieldIndex("n_words")) === 3L)
    assert(r.getLong(r.fieldIndex("n_pieces")) === 2L + 6L + 1L)
    assert(r.getLong(r.fieldIndex("n_unk")) === 1L)
    val e = one("   ")
    assert(e.getLong(e.fieldIndex("n_words")) === 0L)
    assert(e.getLong(e.fieldIndex("n_pieces")) === 0L)
    assert(e.getString(e.fieldIndex("encoded")) === "")
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** The engine's user-extension surface (SURVEY §2.B end): a typed
  * `Aggregator` for the reference's posting-list merge (R11,
  * main.cpp:119-128 — concat + sort, dedup guaranteed upstream by the
  * per-file distinct R7), registrable as a `udaf`, plus the scalar
  * normalizer (R5) as a `udf`.
  *
  * These are deliberately the ONLY extension points that drop out of
  * whole-stage codegen: the hot Q1 path stays on built-in Catalyst
  * expressions (`sort_array(collect_set)` — see InvertedIndex), and
  * InvertedIndexUdafSpec pins the two paths to identical results.
  * The buffer is a sorted-unique Seq (product-encoded, not kryo) so
  * partial aggregates stay compact on the shuffle wire — the same
  * map-side-combine shape the reference hand-codes with per-thread
  * maps (main.cpp:234-258).
  */
object PostingList {

  /** Merge doc ids into an ascending, distinct posting list. */
  object PostingListAgg extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)
    def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = {
      // linear merge of two sorted runs — what the reference's
      // sort-after-concat (main.cpp:126) should have been
      val out = Vector.newBuilder[Long]
      var (i, j) = (0, 0)
      while (i < b1.length && j < b2.length) {
        val c = java.lang.Long.compare(b1(i), b2(j))
        if (c < 0) { out += b1(i); i += 1 }
        else if (c > 0) { out += b2(j); j += 1 }
        else { out += b1(i); i += 1; j += 1 }
      }
      while (i < b1.length) { out += b1(i); i += 1 }
      while (j < b2.length) { out += b2(j); j += 1 }
      out.result()
    }
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

    private def insert(b: Seq[Long], a: Long): Seq[Long] = {
      val idx = search(b, a)
      if (idx >= 0) b else b.patch(-idx - 1, Seq(a), 0)
    }
    private def search(b: Seq[Long], a: Long): Int = {
      var lo = 0; var hi = b.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compare(b(mid), a)
        if (c < 0) lo = mid + 1 else if (c > 0) hi = mid - 1 else return mid
      }
      -(lo + 1)
    }
  }

  /** R5 as a scalar udf: delete non-[A-Za-z] (ASCII only, like the
    * reference's filterWord, main.cpp:191-208), lowercase. */
  val normalizeWord: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((w: String) => if (w == null) "" else
      w.filter(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLowerCase)

  /** Register the surface on a session: `graft_posting_list` (udaf)
    * and `graft_normalize` (udf), usable from spark.sql(...). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_posting_list",
      org.apache.spark.sql.functions.udaf(PostingListAgg))
    spark.udf.register("graft_normalize", normalizeWord)
  }
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (orderkey, price) candidate for a per-key top-k. Top level so
  * Spark's case-class Encoder can instantiate it. */
case class RankedOrder(o_orderkey: Long, o_totalprice: Double)

/** Bounded per-key top-k as a typed `Aggregator` — the scale-correct
  * alternative to `row_number().over(Window.partitionBy(key))` +
  * `filter(rn <= k)` (q7). The window plan must shuffle EVERY row of
  * a key to one task and sort them all to rank the top 3; this
  * aggregator keeps at most k rows of state per key, combines
  * map-side (each map task ships at most k rows per key into the
  * shuffle), and merges partial top-k lists associatively. At 100 TB
  * with hot keys that is the difference between a spilling sort and
  * constant memory. The buffer is product-encoded (a k-element
  * struct list on the shuffle wire, not kryo blobs).
  *
  * Order: price DESC, orderkey ASC — a total order, so the result is
  * deterministic and identical to q7's window ranking.
  */
class TopKOrdersAgg(k: Int)
    extends Aggregator[RankedOrder, List[RankedOrder], Seq[RankedOrder]] {
  /** a ranks strictly ahead of b. */
  private def ahead(a: RankedOrder, b: RankedOrder): Boolean =
    a.o_totalprice > b.o_totalprice ||
      (a.o_totalprice == b.o_totalprice && a.o_orderkey < b.o_orderkey)

  /** O(k) insert into a descending-sorted ≤k-element list. */
  private def insert(buf: List[RankedOrder], r: RankedOrder): List[RankedOrder] = {
    val (pre, post) = buf.span(ahead(_, r))
    val merged = pre ::: (r :: post)
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  def zero: List[RankedOrder] = Nil
  def reduce(buf: List[RankedOrder], r: RankedOrder): List[RankedOrder] =
    insert(buf, r)
  def merge(a: List[RankedOrder], b: List[RankedOrder]): List[RankedOrder] =
    b.foldLeft(a)(insert)
  def finish(buf: List[RankedOrder]): Seq[RankedOrder] = buf
  def bufferEncoder: Encoder[List[RankedOrder]] =
    ExpressionEncoder[List[RankedOrder]]()
  def outputEncoder: Encoder[Seq[RankedOrder]] =
    ExpressionEncoder[Seq[RankedOrder]]()
}

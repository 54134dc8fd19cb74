package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BinaryExpression, EqualTo, Expression, GenericInternalRow,
  JoinedRow, SortOrder, Unevaluable, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** The AS-OF join as a first-class operator — the (c)-tier rung of the
  * custom-operator ladder (compose built-ins > custom `Expression` >
  * custom plan/strategy), demonstrated end to end:
  *
  *   marker expression → optimizer rewrite → custom logical node →
  *   injected planner strategy → custom physical operator.
  *
  * Q32 implements as-of by composition (union + ignoreNulls last()
  * window) — one shuffle, but the window materializes BOTH sides into
  * one sorted stream and carries the forward-fill columns through it.
  * This operator is the shape a native engine gives the same query:
  * co-partition both sides on the key, sort each by (key, time), and
  * emit matches in ONE streaming merge pass — no union row blow-up,
  * no window buffer, no carried fill columns; per-task memory is O(1)
  * beyond the sorts (which Spark spills). At 100 TB that difference
  * is the operator's whole value, so the exec declares its needs
  * declaratively (`ClusteredDistribution` + `SortOrder`) and lets
  * EnsureRequirements insert exactly the shuffles and sorts the
  * contract requires — the same machinery SortMergeJoinExec rides.
  *
  * Semantics (pinned by Q32's DuckDB `ASOF LEFT JOIN` oracle): for
  * each left row, the single right row with equal keys and the
  * LARGEST right-time <= left-time; unmatched left rows null-extend.
  * Null keys and null times never match (SQL join semantics). Ties on
  * right-time should be pre-reduced by the caller (q32 takes max
  * value per (user, ts)); if present, the LAST right row in (key,
  * time) order wins — deterministic because the sort is total.
  *
  * Usage is the public DataFrame API — no internal constructors: write
  * a LEFT join whose condition is `<equi-keys> AND graft_asof_le(lt,
  * rt)`. The marker is `Unevaluable`, so a plan that dodges the
  * rewrite fails loudly at planning rather than silently degrading to
  * a (wrong) range join.
  */
case class AsofLessEqual(left: Expression, right: Expression)
    extends BinaryExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_asof_le"
  // The analyzer inserts no coercion for an opaque function, and the
  // exec compares both times with an ordering built from the LEFT
  // type — an int right time read as a long would silently corrupt
  // the merge. Require identical, orderable, NON-FLOAT types: float
  // times would also need -0.0/NaN normalization (see the rewrite's
  // key-type gate), so they are rejected here rather than mis-joined.
  override def checkInputDataTypes(): TypeCheckResult =
    // == not sameType: times are atomic (orderability enforced below),
    // so nested-nullability tolerance has nothing to tolerate
    if (left.dataType != right.dataType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_asof_le requires identical time types, got " +
          s"${left.dataType.sql} vs ${right.dataType.sql}")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_asof_le requires an orderable time type, got ${left.dataType.sql}")
    else if (AsofJoinRewrite.isFloat(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        "graft_asof_le does not support float/double times " +
          "(-0.0/NaN ordering diverges from SQL equality) — use an " +
          "integral or decimal time column")
    else TypeCheckResult.TypeCheckSuccess
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofLessEqual =
    copy(left = newLeft, right = newRight)
}

/** Logical as-of join. Output mirrors a left-outer join: right side
  * becomes nullable. */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Rewrites `l LEFT JOIN r ON k1 = k2 [AND ...] AND graft_asof_le(lt, rt)`
  * into the custom logical node. Runs in the operator-optimization
  * batch; only fires on the exact supported shape (left-outer, every
  * conjunct an equi-key or the single marker), so ordinary joins are
  * untouched. */
object AsofJoinRewrite extends Rule[LogicalPlan] {
  /** Float/double anywhere in a key or time would need the
    * -0.0/NaN normalization Spark's NormalizeFloatingNumbers rule
    * applies to nodes it knows about (Join, Aggregate, Window) — it
    * runs in a later batch and never sees AsofJoinPlan, so a double
    * key 0.0 on one side and -0.0 on the other would hash-partition
    * apart and compare unequal, silently diverging from SQL join
    * semantics. Such joins are left unrewritten → the Unevaluable
    * marker fails planning loudly instead. */
  private[plans] def isFloat(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.FloatType ||
      dt == org.apache.spark.sql.types.DoubleType

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, LeftOuter, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsofLessEqual]) =>
      val conjuncts = splitConjuncts(cond)
      val (markers, rest) = conjuncts.partition(_.isInstanceOf[AsofLessEqual])
      val fromLeft = (e: Expression) => e.references.subsetOf(l.outputSet)
      val fromRight = (e: Expression) => e.references.subsetOf(r.outputSet)
      val keyPairs = rest.flatMap {
        case EqualTo(a, b) if fromLeft(a) && fromRight(b) => Some((a, b))
        case EqualTo(a, b) if fromLeft(b) && fromRight(a) => Some((b, a))
        case _ => None
      }
      markers match {
        // exactly graft_asof_le(rightTime, leftTime) — "rt <= lt", the
        // literal reading of the arguments. The reversed order would be
        // a next-after join (earliest right >= left time), which this
        // operator does not implement: left unrewritten → Unevaluable
        // fails planning loudly instead of silently flipping semantics.
        case Seq(AsofLessEqual(rt, lt))
            if keyPairs.length == rest.length && keyPairs.nonEmpty &&
              fromRight(rt) && fromLeft(lt) &&
              keyPairs.forall(p => !isFloat(p._1.dataType)) =>
          AsofJoinPlan(l, r, keyPairs.map(_._1), keyPairs.map(_._2), lt, rt)
        case _ => j // unsupported shape: leave it; Unevaluable will fail loudly
      }
  }
}

/** Plans the logical node onto the physical operator. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join (left outer).
  *
  * Declares `ClusteredDistribution` on the keys for both children (so
  * EnsureRequirements co-partitions them — the SortMergeJoinExec
  * contract) and (key..., time) ascending ordering, then runs one
  * merge walk per partition pair:
  *
  *   for each left row (ascending key, time):
  *     consume right rows while rightKey < leftKey   (stale key)
  *       or rightKey == leftKey && rightTime <= leftTime
  *       (remember the last such row — the as-of candidate)
  *     emit left ++ candidate (or nulls)
  *
  * Right rows are consumed exactly once per task; the only buffered
  * state is ONE candidate row. Rows are copied only when buffered
  * (iterator rows are reused mutable UnsafeRows).
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Custom SQL metrics — at 100 TB an operator is debugged from the
    * UI, not from a rerun: match rate (matched vs null-extended) says
    * whether the right stream actually covers the left keys, and
    * pruned-vs-candidate says how much of the right side the merge
    * walk discarded as stale versus buffered as an as-of candidate —
    * a pruned-heavy profile means the right side should be
    * pre-reduced before the join. Like every accumulator-backed
    * SQLMetric, counts sum over EXECUTIONS of this node: under a
    * trailing global sort (q32b's orderBy), range-partition sampling
    * runs the join once more and absolute counts read 2×; the RATIOS
    * (match rate, pruned share) are execution-invariant. */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext,
      "left rows with an as-of match"),
    "numNullExtended" -> SQLMetrics.createMetric(sparkContext,
      "left rows null-extended (no match)"),
    "numPrunedRightRows" -> SQLMetrics.createMetric(sparkContext,
      "right rows pruned (stale key / null time)"),
    "numCandidateRightRows" -> SQLMetrics.createMetric(sparkContext,
      "right rows buffered as as-of candidates"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeysExprs = leftKeys
    val rKeysExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val numOutput = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedRows")
    val numNullExt = longMetric("numNullExtended")
    val numPruned = longMetric("numPrunedRightRows")
    val numCandidates = longMetric("numCandidateRightRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = new LazilyGeneratedOrdering(
        keyTypes.zipWithIndex.map { case (dt, i) =>
          SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(i, dt, nullable = true),
            org.apache.spark.sql.catalyst.expressions.Ascending)
        })
      val timeOrd = new LazilyGeneratedOrdering(Seq(
        SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(0, timeType, nullable = true),
          org.apache.spark.sql.catalyst.expressions.Ascending)))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var candKey: UnsafeRow = null
      var candRow: InternalRow = null

      lIter.map { l =>
        numOutput += 1
        val lk = lKeyProj(l)
        if (lk.anyNull) {
          numNullExt += 1
          resultProj(joined(l, nullRight))
        } else {
          val ltRow = lTimeProj(l)
          if (ltRow.isNullAt(0)) {
            numNullExt += 1
            resultProj(joined(l, nullRight))
          } else {
            var done = false
            while (!done && rBuf.hasNext) {
              val r = rBuf.head
              val rk = rKeyProj(r)
              val cmp = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
              if (cmp < 0) {
                numPruned += 1
                rBuf.next() // stale key (or null-keyed): discard
              } else if (cmp == 0) {
                val rtRow = rTimeProj(r)
                if (rtRow.isNullAt(0)) {
                  numPruned += 1
                  rBuf.next() // null time never matches; nulls sort first
                } else if (timeOrd.compare(rtRow, ltRow) <= 0) {
                  candKey = rk.copy()
                  candRow = r.copy()
                  numCandidates += 1
                  rBuf.next()
                } else done = true // future right row: stop
              } else done = true // right is past the left key
            }
            val hit = candRow != null && !candKey.anyNull &&
              keyOrd.compare(candKey, lk) == 0
            if (hit) numMatched += 1 else numNullExt += 1
            resultProj(joined(l, if (hit) candRow else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

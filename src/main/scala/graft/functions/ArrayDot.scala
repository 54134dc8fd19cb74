package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `graft_dot(a, b)` — the per-pair embedding dot product as a native
  * Catalyst expression with a LOOPED doGenCode.
  *
  * Why this exists (the q70 plan audit): the previous spelling was a
  * flat 64-term `element_at` chain. Catalyst pushes a `cosine >= τ`
  * predicate into the JOIN CONDITION of the pair join (correct — it
  * prunes pairs before the aggregation), but the unrolled chain
  * generates a condition method far past the JVM's ~8 KB JIT limit:
  * C2 refuses to compile it, every candidate pair pays interpreted
  * bytecode, and the measured cost was ~10 µs/pair (absurd for 64
  * multiply-adds). A loop is ~40 bytecodes, JITs to vectorizable
  * machine code, and keeps the whole join condition inside
  * whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the chain it replaces (and to the
  * DuckDB oracles' `list_reduce` folds): ascending-index,
  * left-associative `sum += (double) a[i] * (double) b[i]` — same
  * IEEE products added in the same order; float elements widen
  * exactly. Null semantics mirror the chain too: null array → null;
  * mismatched lengths → null (the chain's `element_at` past the end
  * nulls the sum); any null ELEMENT → null. Round11eSpec pins
  * expression-vs-chain equality on the fixture plus the edge cases.
  *
  * Accepts float and double element types independently per side
  * (embeddings are `array<float>`; q70c's trained centroids are
  * `array<double>`). */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  @inline private def get(a: ArrayData, et: DataType, i: Int): Double =
    if (et == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += get(a, lt, i) * get(b, rt, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(et: DataType, arr: String, i: String): String =
      if (et == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${getter(lt, a, i)} * ${getter(rt, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

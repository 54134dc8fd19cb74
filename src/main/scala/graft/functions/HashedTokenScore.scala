package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-feature linear scorer over a document's tokens, in ONE pass
  * over the raw string — the b-tier Expression rung applied to the
  * quality-classifier shape every large corpus pipeline runs (a
  * fastText-style linear model over hashed bag-of-words; CCNet/Gopher
  * lineage). The trained weights are the stubbed part (this container
  * has no model); the hashing-trick feature map, the integer-exact
  * scoring contract, and the Spark plumbing are real:
  *
  *  - tokens are maximal runs between ASCII whitespace
  *    (space, \t, \n, \x0B, \f, \r — exactly Java `\s`; NOTE RE2's
  *    `\s` — DuckDB — excludes \x0B, so the shared-oracle parity
  *    holds only while no fixture text carries a vertical tab, an
  *    invariant Round9cSpec pins loudly for the corpora);
  *  - within a token only letters count, lowercased (the corpus
  *    normalization every text query here shares); a token with no
  *    letters vanishes, other bytes never split a token;
  *  - feature id  h = fold over the normalized bytes of
  *    (acc·31 + b) mod 1000003  (the q24 rolling hash, bucketed);
  *  - weight     w(h) = (h·2654435761) mod 1001 − 500   ∈ [−500, 500]
  *    (Knuth multiplicative scramble standing in for a weight table —
  *    swap in a real `element_at(weights, h)` lookup to deploy);
  *  - result = struct(score_num = Σ w, n_toks) — both LONG, so the
  *    cross-engine contract is pure integer arithmetic; the only
  *    float is the caller's final score_num / (500·n_toks) division.
  *
  * Versus the equivalent HOF pipeline (split → transform → filter →
  * aggregate per token — see `Round9bSpec`'s parity test), this never
  * materializes the token array or the per-token strings, and it
  * whole-stage-codegens: at 100 TB the classifier pass is a pure
  * map over every byte of the corpus, so the scan loop IS the cost.
  */
case class HashedTokenScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("score_num", LongType, nullable = false),
    StructField("n_toks", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_score requires STRING, got ${child.dataType.sql}")
  override def prettyName: String = "graft_token_score"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].getBytes
    var sum = 0L; var n = 0L; var h = 0L; var has = false
    var i = 0
    while (i < s.length) {
      val b = s(i)
      if (b == ' ' || (b >= '\t' && b <= '\r')) { // \t \n \x0B \f \r
        if (has) { sum += h * 2654435761L % 1001 - 500; n += 1 }
        h = 0; has = false
      } else if (b >= 'a' && b <= 'z') { h = (h * 31 + b) % 1000003; has = true }
      else if (b >= 'A' && b <= 'Z') { h = (h * 31 + b + 32) % 1000003; has = true }
      i += 1
    }
    if (has) { sum += h * 2654435761L % 1001 - 500; n += 1 }
    new GenericInternalRow(Array[Any](sum, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val sum = ctx.freshName("sum")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val has = ctx.freshName("has")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $sum = 0L; long $n = 0L; long $h = 0L; boolean $has = false;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  if ($b == ' ' || ($b >= '\\t' && $b <= '\\r')) {
         |    if ($has) { $sum += $h * 2654435761L % 1001L - 500L; $n++; }
         |    $h = 0L; $has = false;
         |  } else if ($b >= 'a' && $b <= 'z') { $h = ($h * 31L + $b) % 1000003L; $has = true; }
         |  else if ($b >= 'A' && $b <= 'Z') { $h = ($h * 31L + $b + 32L) % 1000003L; $has = true; }
         |}
         |if ($has) { $sum += $h * 2654435761L % 1001L - 500L; $n++; }
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $sum, $n });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedTokenScore =
    copy(child = newChild)
}

package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFKC) as a native Catalyst expression
  * — the operator the engine's tokenize/normalize stages
  * (`/root/reference/src/main.cpp:191-208` is byte-ASCII) need before
  * any real multiscript corpus: canonical composition folds the two
  * encodings of "café" to one spelling (exact dedup, q18's hash,
  * q57's signatures all depend on it), and compatibility composition
  * (NFKC) additionally folds fullwidth forms and ligatures — the
  * variant tokenizer pipelines run before counting.
  *
  * (b)-tier extension: Spark ships no unicode-normalization function,
  * and a Scala UDF would leave whole-stage codegen; this expression
  * stays inside it, delegating to the JDK's `java.text.Normalizer`
  * (public platform API, same tables ICU publishes) in both the
  * interpreted and generated paths — Round12Spec pins their parity.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.sql}")
  override def prettyName: String = s"graft_${form.name.toLowerCase}"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.${form.name}));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

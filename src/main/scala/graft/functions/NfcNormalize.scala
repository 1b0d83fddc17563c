package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — Spark
  * ships no normalization builtin, yet canonical composition is the
  * first step of any text-dedup pipeline (the same visible string in
  * NFD vs NFC hashes differently, splitting exact-dup groups and
  * double-counting vocabulary). The JDK's `java.text.Normalizer` is
  * the reference implementation of UAX #15, so wrapping it as an
  * `Expression` with `doGenCode` keeps the per-row call inside
  * whole-stage codegen — no UDF serialization boundary, null handling
  * for free via nullSafeCodeGen (cf. the `aggregate()` HOF fallback
  * that motivated [[DotProduct]]).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize($c.toString(),
          java.text.Normalizer.Form.NFC));
    """)

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Fused squared-L2 distance of two 64-dim vectors as a native
  * Catalyst expression with whole-stage codegen — the assignment
  * kernel of the IVF / k-means / semantic-dedup operators. Same
  * motivation and discipline as [[DotProduct]]: the
  * `aggregate(sequence(0, 63), ...)` higher-order-function
  * formulation interprets the lambda per element (64 interpreted
  * evals per pair), which dominated the coarse-quantizer assignment
  * stages at bench scale.
  *
  * Semantics match the HOF formulation (`graft.ops.Similarity.
  * l2Between`) and the DuckDB oracle exactly: a strict left-to-right
  * fold over indices 0..63 of `acc + d*d` with
  * `d = (double) a[i] - (double) b[i]` — the identical IEEE op
  * sequence, so distances are bit-identical across engines. Like the
  * HOF, a null element among the first 64 nulls the result, and an
  * array shorter than 64 FAILS LOUDLY (under Spark 4's default ANSI
  * mode the HOF's `element_at` throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT
  * past the end — a ragged corpus must not silently become nulls).
  * Note (r14 advice): with `spark.sql.ansi.enabled=false` the HOF
  * would return null past the end instead of throwing — this kernel
  * throws unconditionally; the repo pins Spark 4's ANSI default, so
  * that divergence is unreachable in any declared configuration.
  *
  * Element types: each side may be array<float> or array<double>
  * (centroid frames are double, embeddings float) — widened to
  * double exactly like the HOF's cast.
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Dim = 64

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("graft_l2 requires two array<float|double> " +
        s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // the HOF result is null on null elements, so the expression must
  // stay nullable regardless of child nullability (same lesson as
  // DotProduct's elementsNullable note)
  override def nullable: Boolean = true

  private def tooShort(n: Int): Nothing =
    throw new IllegalArgumentException(
      s"graft_l2: array has $n elements, needs $Dim (matching the " +
        "HOF element_at ANSI out-of-bounds failure)")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() < Dim) tooShort(x.numElements())
    if (y.numElements() < Dim) tooShort(y.numElements())
    val xf = isFloat(left)
    val yf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < Dim) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
        if ($a.numElements() < $Dim || $b.numElements() < $Dim) {
          throw new IllegalArgumentException(
            "graft_l2: array has " +
            java.lang.Math.min($a.numElements(), $b.numElements()) +
            " elements, needs $Dim (matching the HOF element_at ANSI " +
            "out-of-bounds failure)");
        }
        double $acc = 0.0;
        for (int $i = 0; $i < $Dim; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) {
            ${ev.isNull} = true; break;
          }
          double $d = ${get(a, left)} - ${get(b, right)};
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

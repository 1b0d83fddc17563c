package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Cast, EqualTo, Expression, If, LambdaFunction, Multiply,
  NamedLambdaVariable, Size, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  *   DOUBLE)), 0.0D, (acc, v) -> acc + v)
  *
  * into the fused codegen kernel [[DotProduct]] — users who write the
  * idiomatic SQL formulation get the ~50× native kernel without
  * knowing it exists. The rewrite is SEMANTICS-PRESERVING, not merely
  * plausible:
  *
  *  - A null ELEMENT nulls the kernel's result exactly like the HOF
  *    fold does (DotProduct checks isNullAt per element), so nullable
  *    array elements — the parquet default — are safe to rewrite.
  *  - zip_with's null-padding of unequal lengths is excluded at
  *    runtime by wrapping in `If(size(a) = size(b), graft_dot(a, b),
  *    <original HOF>)`: on unequal lengths (or a null array, where
  *    the condition is null) the original expression still evaluates,
  *    preserving its null-propagation exactly.
  *  - It only matches the double-cast multiply form. The float-
  *    multiply variant (`(x, y) -> x * y`) rounds each product to
  *    float first and is NOT bit-equal to the kernel's double
  *    products, so it is deliberately left alone.
  *
  * Installed via [[graft.GraftExtensions]] (injectOptimizerRule) or
  * imperatively through `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean =
    e.dataType == DoubleType && e.foldable && {
      e.eval() match {
        case d: java.lang.Double => d.doubleValue() == 0.0
        case _ => false
      }
    }

  // bottom-up: the guard expression embeds the ORIGINAL aggregate as
  // its fallback branch, so a top-down transform would match the
  // embedded copy forever; transformExpressionsUp visits each node
  // once and never revisits the replacement
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp { case node => node.transformExpressionsUp {
      case agg @ ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            Multiply(Cast(x, DoubleType, _, _),
              Cast(y, DoubleType, _, _), _),
            Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), false)),
          zero,
          LambdaFunction(Add(accE, vE, _),
            Seq(accV: NamedLambdaVariable, vV: NamedLambdaVariable),
            false),
          LambdaFunction(fin, Seq(finV: NamedLambdaVariable), false))
          if sameVar(x, xv) && sameVar(y, yv) &&
            sameVar(accE, accV) && sameVar(vE, vV) &&
            sameVar(fin, finV) && isZeroDouble(zero) &&
            floatArray(l) && floatArray(r) &&
            // the rewrite duplicates l and r into Size(l), Size(r) and
            // the fallback branch — only safe when re-evaluation is
            // consistent
            l.deterministic && r.deterministic =>
        If(EqualTo(Size(l, legacySizeOfNull = false),
          Size(r, legacySizeOfNull = false)), DotProduct(l, r), agg)
    } }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Fused float-vector dot product as a native Catalyst expression with
  * whole-stage codegen — the hot kernel of the similarity-search and
  * embedding-dedup operators (SURVEY.md §7.3 anticipated exactly this:
  * the `aggregate(zip_with(...))` higher-order-function formulation is
  * interpreted per element and fell ~50× short at bench scale).
  *
  * Semantics match the HOF formulation and the DuckDB oracle exactly:
  * a strict left-to-right fold of `(double) a[i] * (double) b[i]`, so
  * results are bit-identical across engines.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  // each side may independently be array<float> or array<double>
  // (embeddings are float; centroid/weight frames are double) —
  // widened to double exactly like the HOF's explicit cast, so the
  // fold is the identical IEEE sequence either way (r15: widened from
  // float-only for the q_embed_confusion vector×centroid kernel)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("graft_dot requires two array<float|double> " +
        s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elementsNullable: Boolean = Seq(left, right).exists(
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  // a null ELEMENT nulls the whole product even when both ARRAYS are
  // known non-null, so nullability must include containsNull — the
  // BinaryExpression default (children only) would let constraint
  // propagation mark the result non-nullable, miscompiling downstream
  // consumers AND handing codegen a constant-false isNull slot that
  // the element check then tries to assign (janino: "isNull_x is not
  // an rvalue", which silently knocked the whole stage out of codegen
  // on exactly the hot embedding plans this kernel exists for)
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  // a null ELEMENT nulls the whole product, exactly like the
  // aggregate(zip_with(...)) HOF formulation — required for the
  // DotProductRewrite rule to be semantics-preserving on the common
  // parquet schema (array elements nullable by default)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = isFloat(left)
    val yf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // only emit the element-null branch when elements CAN be null:
      // for containsNull=false inputs `ev.isNull` is the constant
      // `false` and an assignment to it would not compile — and the
      // branch-free loop is also the faster kernel
      val elemCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
                ${ev.isNull} = true; break;
              }"""
        else ""
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $elemCheck
          $acc += ${get(a, left)} * ${get(b, right)};
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register graft_dot and graft_might_contain in the session's
    * function registry (idempotent per session).
    */
  def register(spark: SparkSession): Unit = synchronized {
    val id = FunctionIdentifier("graft_dot")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))
    }
    val l2 = FunctionIdentifier("graft_l2")
    if (!spark.sessionState.functionRegistry.functionExists(l2)) {
      spark.sessionState.functionRegistry.registerFunction(
        l2,
        new ExpressionInfo(classOf[L2Distance].getName, "graft_l2"),
        (exprs: Seq[Expression]) => L2Distance(exprs(0), exprs(1)))
    }
    val nfc = FunctionIdentifier("graft_nfc")
    if (!spark.sessionState.functionRegistry.functionExists(nfc)) {
      spark.sessionState.functionRegistry.registerFunction(
        nfc,
        new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
        (exprs: Seq[Expression]) => NfcNormalize(exprs.head))
    }
    val hll = FunctionIdentifier("graft_hll")
    if (!spark.sessionState.functionRegistry.functionExists(hll)) {
      spark.sessionState.functionRegistry.registerFunction(
        hll,
        new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
        (exprs: Seq[Expression]) =>
          HllSketch(exprs.head).toAggregateExpression())
    }
    val mh = FunctionIdentifier("graft_minhash")
    if (!spark.sessionState.functionRegistry.functionExists(mh)) {
      spark.sessionState.functionRegistry.registerFunction(
        mh,
        new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
        (exprs: Seq[Expression]) =>
          MinHashAgg(exprs.head).toAggregateExpression())
    }
    val mc = FunctionIdentifier("graft_might_contain")
    if (!spark.sessionState.functionRegistry.functionExists(mc)) {
      spark.sessionState.functionRegistry.registerFunction(
        mc,
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions
            .BloomFilterMightContain].getName, "graft_might_contain"),
        (exprs: Seq[Expression]) => org.apache.spark.sql.catalyst
          .expressions.BloomFilterMightContain(exprs(0), exprs(1)))
    }
  }

  /** Fused dot product column; requires register(spark) first. */
  def dotp(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Fused squared-L2 distance column (64-dim, HOF-bit-identical);
    * requires register(spark) first.
    */
  def l2(a: Column, b: Column): Column = call_function("graft_l2", a, b)

  /** Unicode NFC normalization column; requires register(spark) first. */
  def nfc(s: Column): Column = call_function("graft_nfc", s)

  /** Native HLL distinct-count estimate aggregate; requires
    * register(spark) first. Idempotent — no upstream distinct needed.
    */
  def hll(c: Column): Column = call_function("graft_hll", c)

  /** Native K=16 MinHash signature aggregate over 60-bit shingle
    * hashes; requires register(spark) first.
    */
  def minhash(c: Column): Column = call_function("graft_minhash", c)

  /** Bloom membership probe over a serialized
    * `org.apache.spark.util.sketch.BloomFilter` — the same expression
    * Spark's InjectRuntimeFilter plants, exposed so operators can
    * build the filter explicitly (e.g. from a dim-key aggregate) and
    * pin it on a fact scan. `v` must be a LONG column (the sketch
    * hashes it internally); requires register(spark) first.
    */
  def mightContain(bloomBytes: Column, v: Column): Column =
    call_function("graft_might_contain", bloomBytes, v)
}

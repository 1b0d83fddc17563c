package graft

import org.scalatest.funsuite.AnyFunSuite

/** DotProductRewrite: the HOF dot-product formulation must plan to the
  * fused kernel when (and only when) the rewrite is provably
  * semantics-preserving, and the runtime size guard must keep HOF
  * null-propagation for ragged inputs.
  */
class RewriteSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  private val hof = "aggregate(zip_with(a, b, (x, y) -> " +
    "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), " +
    "(acc, v) -> acc + v)"

  private def withRule[T](f: => T): T = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before :+ graft.functions.DotProductRewrite
    try f finally spark.experimental.extraOptimizations = before
  }

  test("the double-cast HOF form rewrites to graft_dot and stays " +
      "bit-equal on the embeddings fixture") {
    import org.apache.spark.sql.functions.col
    val emb = graft.ops.Tables
      .t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").as("a"),
        col("embedding").as("b"))
    val plain = emb.selectExpr("vec_id", s"$hof AS dot")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (rewritten, planStr) = withRule {
      val df = emb.selectExpr("vec_id", s"$hof AS dot")
      (df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap,
        df.queryExecution.executedPlan.toString)
    }
    assert(planStr.contains("dotproduct"),
      s"rewrite did not fire:\n$planStr")
    assert(rewritten == plain, "rewritten results must be bit-equal")
  }

  test("ragged arrays fall back to the original HOF null semantics " +
      "through the size guard") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f)))
      .toDF("a", "b")
    val expected = df.selectExpr(s"$hof AS dot").head.isNullAt(0)
    val got = withRule {
      df.selectExpr(s"$hof AS dot").head.isNullAt(0)
    }
    assert(expected && got, "unequal lengths must stay null on both")
  }

  test("the float-multiply variant is NOT rewritten (it rounds " +
      "products to float; the kernel does not)") {
    import spark.implicits._
    val df = Seq((Array(1.1f, 2.2f), Array(3.3f, 4.4f))).toDF("a", "b")
    val p = withRule {
      df.selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS dot")
        .queryExecution.executedPlan.toString
    }
    assert(!p.contains("dotproduct"),
      "float-product form must be left alone")
  }

  test("graft_dot codegen compiles with NON-NULLABLE inputs (the " +
      "constraint-propagation shape that used to throw 'isNull is " +
      "not an rvalue' and knock stages out of codegen)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}

    // containsNull=false + non-nullable refs: ev.isNull is constant
    // false, so any generated assignment to it fails janino compile
    val tight = ArrayType(FloatType, containsNull = false)
    val dotTight = graft.functions.DotProduct(
      BoundReference(0, tight, nullable = false),
      BoundReference(1, tight, nullable = false))
    assert(!dotTight.nullable)
    val projTight = GenerateUnsafeProjection.generate(Seq(dotTight))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f)),
      ArrayData.toArrayData(Array(3.0f, 4.0f)))
    assert(projTight(row).getDouble(0) === 11.0)

    // containsNull=true with non-nullable arrays must stay NULLABLE
    // (a null element nulls the product even when the arrays can't
    // be null) and must compile + return null
    val loose = ArrayType(FloatType, containsNull = true)
    val dotLoose = graft.functions.DotProduct(
      BoundReference(0, loose, nullable = false),
      BoundReference(1, loose, nullable = false))
    assert(dotLoose.nullable)
    val projLoose = GenerateUnsafeProjection.generate(Seq(dotLoose))
    val rowNull = InternalRow(
      ArrayData.toArrayData(Array[java.lang.Float](1.0f, null)),
      ArrayData.toArrayData(Array[java.lang.Float](3.0f, 4.0f)))
    assert(projLoose(rowNull).isNullAt(0))
    assert(projLoose(row).getDouble(0) === 11.0)
  }

  // ---- graft_dot widened element types (r15: q_embed_confusion's
  // vector×centroid dot runs float-embedding × double-sarr)

  test("graft_dot is bit-equal to the zip_with HOF fold on mixed " +
      "float/double inputs (the q_embed_confusion kernel)") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.ops.Tables
      .t(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(col("vec_id"), col("embedding").as("a"))
      .selectExpr("vec_id", "a",
        // a bigint 'quantized sum' side cast to double, like sarrd
        "transform(reverse(a), x -> CAST(CAST(round(x * 1048576.0) " +
          "AS BIGINT) AS DOUBLE)) AS b")
    val hof = df.selectExpr("vec_id",
      "aggregate(zip_with(a, b, (v, s) -> CAST(v AS DOUBLE) * s), " +
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS d")
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    val fused = df.selectExpr("vec_id", "graft_dot(a, b) AS d")
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    assert(hof == fused,
      "graft_dot(float, double) must be bit-identical to the HOF fold")
  }

  // ---- graft_l2 (r14: the fused L2 kernel replacing the interpreted
  // aggregate(sequence(0,63),...) HOF in Similarity.l2Between)

  private val l2Hof = "aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE), " +
    "(acc, j) -> acc + (CAST(element_at(a, j + 1) AS DOUBLE) - " +
    "element_at(b, j + 1)) * (CAST(element_at(a, j + 1) AS DOUBLE) - " +
    "element_at(b, j + 1)))"

  test("graft_l2 is bit-equal to the HOF L2 fold on the embeddings " +
      "fixture (float left, double right)") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.ops.Tables
      .t(spark, "/root/testdata/sf0.001", "embeddings")
    // double-side centroid: the reversed embedding, cast — exercises
    // the mixed float/double accessor path the real queries use
    val df = emb.select(col("vec_id"), col("embedding").as("a"))
      .selectExpr("vec_id", "a",
        "transform(reverse(a), x -> CAST(x AS DOUBLE)) AS b")
    val hofRes = df.selectExpr("vec_id", s"$l2Hof AS d")
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    val fused = df.selectExpr("vec_id", "graft_l2(a, b) AS d")
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    assert(hofRes == fused,
      "graft_l2 must be bit-identical to the HOF fold")
  }

  test("graft_l2 matches HOF failure semantics: short arrays fail " +
      "loudly, null elements yield null") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // short array (< 64 elements): under Spark 4 ANSI the HOF's
    // element_at throws out-of-bounds — graft_l2 must also fail loud,
    // never silently null a ragged corpus
    val short = Seq((Array.fill(10)(1.0f), Array.fill(64)(0.0)))
      .toDF("a", "b")
    intercept[Exception] {
      short.selectExpr(s"$l2Hof AS d").head
    }
    val e = intercept[Exception] {
      short.selectExpr("graft_l2(a, b) AS d").head
    }
    assert(e.getMessage != null)
    // null element among the first 64
    val withNull = Seq((
      Array.tabulate[java.lang.Float](64)(i => if (i == 7) null else 1.0f),
      Array.fill[java.lang.Double](64)(0.0))).toDF("a", "b")
    assert(withNull.selectExpr(s"$l2Hof AS d").head.isNullAt(0))
    assert(withNull.selectExpr("graft_l2(a, b) AS d").head.isNullAt(0))
    // happy path value check
    val ok = Seq((Array.fill(64)(2.0f), Array.fill(64)(0.5)))
      .toDF("a", "b")
    assert(ok.selectExpr("graft_l2(a, b) AS d").head.getDouble(0)
      === 64 * 1.5 * 1.5)
  }

  test("graft_l2 codegen compiles with NON-NULLABLE inputs (same " +
      "constant-isNull hazard as graft_dot)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val f = ArrayType(FloatType, containsNull = false)
    val d = ArrayType(DoubleType, containsNull = false)
    val l2 = graft.functions.L2Distance(
      BoundReference(0, f, nullable = false),
      BoundReference(1, d, nullable = false))
    val proj = GenerateUnsafeProjection.generate(Seq(l2))
    val row = InternalRow(
      ArrayData.toArrayData(Array.fill(64)(2.0f)),
      ArrayData.toArrayData(Array.fill(64)(0.5)))
    assert(proj(row).getDouble(0) === 64 * 1.5 * 1.5)
    // short array → loud failure, even with non-nullable refs
    val rowShort = InternalRow(
      ArrayData.toArrayData(Array.fill(10)(2.0f)),
      ArrayData.toArrayData(Array.fill(64)(0.5)))
    intercept[Exception] { proj(rowShort) }
  }
}

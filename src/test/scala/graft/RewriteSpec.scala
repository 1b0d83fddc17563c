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
}

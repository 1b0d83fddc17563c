package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** File-format sources (SURVEY.md §2B scan row): the reference never
  * wires DataFusion's CSV/JSON readers to an endpoint; Spark gives
  * them for free — prove the claim by round-tripping fixture data
  * through each format and reading it back bit-equal.
  */
class SourcesSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private def spark = SparkFixture.spark

  test("csv source round-trips the nation table") {
    val src = graft.ops.Tables.t(spark, dir, "nation")
    val out = Files.createTempDirectory("csv-src").toFile.getPath + "/n"
    // the CSV writer trims field whitespace by default — disable for
    // a true bit-equal round-trip
    src.write.option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    val back = spark.read.option("header", "true")
      .schema(src.schema) // explicit schema: no inference surprises
      .csv(out)
    assert(back.count() == src.count())
    val a = src.collect().map(_.toSeq).sortBy(_.toString)
    val b = back.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
  }

  test("orc source round-trips the customer table bit-for-bit") {
    val src = graft.ops.Tables.t(spark, dir, "customer")
    val out = Files.createTempDirectory("orc-src").toFile.getPath + "/c"
    src.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == src.schema)
    val a = src.collect().map(_.toSeq).sortBy(_.toString)
    val b = back.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
    // predicate pushdown reaches the ORC scan like it does parquet
    val p = spark.read.orc(out).filter("c_nationkey = 3")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters:") && p.contains("c_nationkey"),
      s"ORC scan must push the filter:\n$p")
  }

  test("json-lines source round-trips the supplier table") {
    val src = graft.ops.Tables.t(spark, dir, "supplier")
    val out = Files.createTempDirectory("json-src").toFile.getPath + "/s"
    src.write.json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.count() == src.count())
    val a = src.collect().map(_.toSeq).sortBy(_.toString)
    val b = back.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
  }

  test("csv source feeds the same aggregation as parquet") {
    val src = graft.ops.Tables.t(spark, dir, "lineitem")
      .select("l_returnflag", "l_quantity")
    val out = Files.createTempDirectory("csv-agg").toFile.getPath + "/l"
    src.write.option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    import org.apache.spark.sql.functions._
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(graft.ops.Parity.dsum(col("l_quantity")).as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val back = spark.read.option("header", "true").schema(src.schema)
      .csv(out)
    assert(agg(back) == agg(src))
  }
}

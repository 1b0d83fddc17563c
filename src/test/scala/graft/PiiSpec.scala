package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pii

/** Positive-detection evidence for the PII surface: the synthetic
  * documents corpus contains no PII (q_text_pii's oracle-checked
  * counts are legitimately zero there), so this spec proves the SAME
  * published patterns detect and redact real PII shapes.
  */
class PiiSpec extends AnyFunSuite {
  private def spark = SparkFixture.spark

  private val fixtures = Seq(
    ("contact me at jane.doe+spam@example.co.uk for details",
      Map("email" -> 1)),
    ("server 10.0.255.3 responded, fallback 192.168.1.1 did not",
      Map("ipv4" -> 2)),
    ("call 555-867-5309 or 555 123 4567 after hours",
      Map("phone" -> 2)),
    ("card 4111111111111111 on file; order 12345 unaffected",
      Map("long_digits" -> 1)),
    ("plain text with no identifiers at all", Map.empty[String, Int]))

  test("each PII class detects its fixture and nothing else") {
    val s = spark
    import s.implicits._
    val df = fixtures.map(_._1).toDF("text")
    val counted = df.select(
      col("text") +: Pii.All.map { case (name, p) =>
        size(regexp_extract_all(col("text"), lit(p), lit(0))).as(name)
      }: _*).collect()
    fixtures.zip(counted).foreach { case ((text, want), row) =>
      Pii.All.foreach { case (name, _) =>
        assert(row.getAs[Int](name) == want.getOrElse(name, 0),
          s"class $name on: $text")
      }
    }
  }

  test("redact replaces every match with its class tag and leaves " +
    "clean text untouched") {
    val s = spark
    import s.implicits._
    val df = fixtures.map(_._1).toDF("text")
      .select(Pii.redact(col("text")).as("red"))
    val red = df.collect().map(_.getString(0))
    assert(red(0) == "contact me at [email] for details")
    assert(red(1) == "server [ipv4] responded, fallback [ipv4] did not")
    assert(red(2) == "call [phone] or [phone] after hours")
    assert(red(3) == "card [long_digits] on file; order 12345 unaffected")
    assert(red(4) == "plain text with no identifiers at all")
    // nothing PII-shaped survives redaction
    val counts = df.select(Pii.All.map { case (name, p) =>
      size(regexp_extract_all(col("red"), lit(p), lit(0))).as(name)
    }: _*).agg(Pii.All.map { case (name, _) =>
      sum(col(name)).as(name) }.head,
      Pii.All.map { case (name, _) => sum(col(name)).as(name) }.tail: _*)
      .collect()(0)
    Pii.All.foreach { case (name, _) =>
      assert(counts.getAs[Long](name) == 0L, s"residual $name")
    }
  }

  test("q_text_pii runs over the fixture corpus with all-zero counts " +
    "(synthetic word-salad) and a full per-source breakdown") {
    val rows = graft.ops.TextOps.qPii
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_with_pii") == 0L)
      assert(r.getAs[Long]("n_docs") > 0L)
    }
  }
}

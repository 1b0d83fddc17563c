package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Skew handling: AQE's automatic skew-join split on a hot key, and
  * the explicit salting utilities for the cases AQE can't rewrite.
  */
class SkewSpec extends AnyFunSuite {

  test("AQE splits the skewed partition of a hot-key join") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on one hot key, 100 rows spread over 100 keys
      val big = (1 to 50000).map(i => (1L, s"payload-$i")) ++
        (1 to 100).map(i => (i.toLong % 100 + 2, s"p$i"))
      val dim = (1 to 200).map(i => (i.toLong, s"dim-$i"))
      val joined = big.toDF("k", "v").join(dim.toDF("k", "d"), "k")
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // Spark 4 wraps the final plan in query stages whose inner plan
      // is not a `children` member, so assert on the rendered plan
      val p = finalPlan.toString
      assert(p.contains("skew=true") && p.contains("skewed"),
        s"AQE should mark the hot-key join as a skew join, got:\n$p")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted join equals the plain join on skewed data") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val big = ((1 to 5000).map(i => (7L, s"hot-$i")) ++
      (1 to 50).map(i => (i.toLong, s"cold-$i"))).toDF("k", "v")
    val dim = (1 to 60).map(i => (i.toLong, s"d$i")).toDF("dk", "d")
    val plain = big.join(dim, big("k") === dim("dk"))
      .select("k", "v", "d").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, dim, "k", "dk", saltBuckets = 8)
      .select("k", "v", "d").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted count equals the plain count per key") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val df = ((1 to 9000).map(_ => 1L) ++ (1 to 30).map(_.toLong))
      .toDF("k")
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", saltBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}

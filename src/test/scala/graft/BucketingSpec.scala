package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join building block for the 100 TB
  * design — both sides pre-bucketed on the join key join WITHOUT a
  * shuffle exchange (each task reads matching bucket files). This is
  * the storage-layout lever the engine would use for recurring joins
  * on the same key at scale.
  */
class BucketingSpec extends AnyFunSuite {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val spark = SparkFixture.spark
    import org.apache.spark.sql.functions._
    val warehouse = Files.createTempDirectory("bucket-wh").toFile
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      graft.ops.Tables.t(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouse/li").saveAsTable("li_bucketed")
      graft.ops.Tables.t(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouse/ord").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_extendedprice")).as("s"))
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = finalPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // one shuffle MAY remain for the final aggregation exchange —
      // but the join itself must consume bucket-provided distribution.
      // With groupBy on the join key, even the aggregation reuses the
      // bucketing: expect zero shuffles end to end.
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found: $shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}

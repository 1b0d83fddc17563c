package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** Accuracy bounds for the approximate sketches in q_stats_sketch.
  *
  * The sketch query is rows-only in the driver gate by design (Spark's
  * HLL++/GK and DuckDB's HLL/t-digest are different estimators, so no
  * cross-engine hash exists) — this spec is the missing accuracy check:
  * it fails if Spark's estimators ever drift from the exact answers
  * computed by the oracle-checked q_count_distinct / q_percentile.
  */
class SketchSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private def spark = SparkFixture.spark

  test("approx_count_distinct lands within 5% of the exact count") {
    val exact = Relational.qCountDistinct.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.qStatsSketch.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, ex) =>
      val ap = approx(flag)
      val rel = math.abs(ap - ex).toDouble / ex
      assert(rel <= 0.05,
        s"approx_count_distinct($flag) = $ap vs exact $ex " +
          f"(${rel * 100}%.1f%% > 5%%)")
    }
  }

  test("approx_percentile(0.5) lands inside the exact P25–P90 envelope") {
    val envelope = Relational.qPercentile.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val approx = Relational.qStatsSketch.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(envelope.keySet == approx.keySet)
    envelope.foreach { case (flag, (p25, p90)) =>
      val med = approx(flag)
      assert(med >= p25 && med <= p90,
        s"approx median($flag) = $med outside exact [$p25, $p90]")
    }
  }
}

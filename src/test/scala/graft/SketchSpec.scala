package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Accuracy bounds for the approximate sketches behind q_stats_sketch.
  *
  * The driver gate hashes q_stats_sketch's within-bounds BOOLEANS (the
  * raw HLL++/GK estimates can't hash-match DuckDB's HLL/t-digest) —
  * this spec keeps the tighter numeric assertions on the estimates
  * themselves, against the exact answers computed by the oracle-checked
  * q_count_distinct / q_percentile.
  */
class SketchSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private def spark = SparkFixture.spark

  private def sketches = spark.read
    .parquet(s"$dir/lineitem.parquet")
    .groupBy(col("l_returnflag"))
    .agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      expr("approx_percentile(l_quantity, 0.5)").as("approx_med"))
    .collect()

  test("count-min sketch never underestimates, and stays tight at " +
    "3x1024 cells on the fixture vocabulary") {
    val rows = SparkEntry.queries("q_sketch_cms")(
      SparkFixture.spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("n_exact"))
      val est = r.getLong(r.fieldIndex("cms_est"))
      assert(est >= exact, s"CMS underestimated: $r")
    }
    // the epsilon bound: over_by <= e/width * total stream length is
    // loose; assert the practical one — within 2x of exact for words
    // that actually occur
    rows.filter(_.getLong(1) > 100).foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) * 2,
        s"CMS overestimate implausibly large: $r")
    }
  }

  test("approx_count_distinct lands within 5% of the exact count") {
    val exact = Relational.qCountDistinct.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = sketches
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
    val approx = sketches
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(envelope.keySet == approx.keySet)
    envelope.foreach { case (flag, (p25, p90)) =>
      val med = approx(flag)
      assert(med >= p25 && med <= p90,
        s"approx median($flag) = $med outside exact [$p25, $p90]")
    }
  }

  test("q_stats_sketch reports every accuracy bound as satisfied") {
    val rows = Relational.qStatsSketch.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"cd_ok false for ${r.getString(0)}")
      assert(r.getBoolean(3), s"med_ok false for ${r.getString(0)}")
    }
  }

  test("native graft_minhash signatures are bit-equal to the composed " +
    "16-column aggregate, for every doc") {
    val d = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val composed = graft.ops.Dedup.minHashSignatures(spark, d)
      .collect()
      .map(r => r.getLong(0) ->
        (1 to graft.functions.MinHashAgg.K).map(i => r.getLong(i)).toSeq)
      .toMap
    val nativeSig = graft.ops.Dedup.shingles(spark, d)
      .groupBy(col("doc_id"))
      .agg(graft.functions.GraftFunctions.minhash(col("sh")).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap
    assert(nativeSig.keySet == composed.keySet)
    assert(nativeSig.nonEmpty)
    nativeSig.foreach { case (doc, sig) =>
      assert(sig == composed(doc),
        s"doc $doc: native $sig != composed ${composed(doc)}")
    }
  }

  test("q_dedup_minhash_native emits exactly q_dedup_minhash_lsh's " +
    "pairs") {
    val d = "/root/testdata/sf0.001"
    val native = SparkEntry.queries("q_dedup_minhash_native")(spark, d)
      .collect().map(_.toSeq).toSeq
    val sql = SparkEntry.queries("q_dedup_minhash_lsh")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty && native == sql)
  }

  test("bottom-64 quantile sample lands near the exact rank " +
    "statistic (the error readout the operator deliberately does " +
    "not compute at scale)") {
    val spark = SparkFixture.spark
    val dir = "/root/testdata/sf0.001"
    // the operator's production shape: sample-only, no corpus window
    val samp = graft.ops.DataQuality.qQuantileSample.run(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // fixture-scale truth harness: exact discrete-ceil ranks per
    // group, computed here (spec-only) instead of inside the operator
    // — a 100 TB run never pays the full-corpus rank windows
    val groups = graft.ops.Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2),
        r.getAs[Number](3).longValue())))
      .groupBy(_._1)
    assert(samp.keySet == groups.keySet)
    groups.foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sortBy(identity)
      val n = sorted.length.toLong
      def exact(p: Long): Double =
        sorted(((p * n + 99L) / 100L).toInt - 1)._1
      val (kUsed, p50, p90, p99) = samp(g)
      assert(kUsed == math.min(64L, n))
      // the right error metric for a rank sketch is POSITION, not
      // value: a 64-point uniform sample pins the p-th quantile's
      // rank to within ~3·sqrt(p(1-p)/64) ≈ 0.19 of the corpus
      // (binomial), regardless of the value distribution's shape
      for ((p, v) <- Seq((50L, p50), (90L, p90), (99L, p99))) {
        val pos = sorted.count(_._1 <= v).toDouble / n
        assert(math.abs(pos - p / 100.0) <= 0.20,
          s"group $g p$p sample=$v sits at corpus position $pos — " +
            "outside the binomial bound for a 64-point sample")
      }
    }
  }
}

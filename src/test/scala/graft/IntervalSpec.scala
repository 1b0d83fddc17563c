package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom interval join operator (IntervalJoin logical node +
  * strategy + active-interval sweep exec): point-in-range semantics
  * (half-open [start, end)), multi-overlap fan-out, null handling,
  * plan shape, and a randomized cross-check against the equivalent
  * composed equi-join + residual filter.
  */
class IntervalSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def ij(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    graft.plans.GraftInterval.intervalJoin(
      l, r, "k", "rk", "t", "rs", "re")

  test("point-in-range matches are half-open [start, end) and " +
    "fan out over every overlapping interval") {
    val l = Seq(("a", 10L, "p10"), ("a", 20L, "p20"), ("a", 30L, "p30"))
      .toDF("k", "t", "lv")
    val r = Seq(("a", 5L, 15L, "i5_15"), ("a", 10L, 21L, "i10_21"),
      ("a", 20L, 25L, "i20_25"), ("a", 31L, 40L, "i31_40"))
      .toDF("rk", "rs", "re", "rv")
    val got = ij(l, r).select("lv", "rv").collect().toSet
    // p10 ∈ [5,15) and [10,21); p20 ∈ [10,21) and [20,25);
    // p30 matches nothing (25 <= 30 < 31) — inner join drops it
    assert(got == Set(
      Row("p10", "i5_15"), Row("p10", "i10_21"),
      Row("p20", "i10_21"), Row("p20", "i20_25")), s"got $got")
  }

  test("boundary semantics: start inclusive, end exclusive") {
    val l = Seq(("a", 10L, "at_start"), ("a", 15L, "at_end"))
      .toDF("k", "t", "lv")
    val r = Seq(("a", 10L, 15L, "iv")).toDF("rk", "rs", "re", "rv")
    val got = ij(l, r).select("lv", "rv").collect().toSet
    assert(got == Set(Row("at_start", "iv")))
  }

  test("null keys/times never match and never crash the sweep") {
    val l = Seq((Option("a"), Option(10L), "l1"),
      (Option.empty[String], Option(10L), "l2"),
      (Option("a"), Option.empty[Long], "l3")).toDF("k", "t", "lv")
    val r = Seq((Option("a"), Option(5L), Option(15L), "r1"),
      (Option.empty[String], Option(0L), Option(99L), "rX"),
      (Option("a"), Option.empty[Long], Option(99L), "rY"))
      .toDF("rk", "rs", "re", "rv")
    val got = ij(l, r).select("lv", "rv").collect().toSet
    assert(got == Set(Row("l1", "r1")))
  }

  test("the custom node plans (IntervalJoinExec in the physical plan)") {
    val l = Seq(("a", 1L, "x")).toDF("k", "t", "lv")
    val r = Seq(("a", 0L, 2L, "y")).toDF("rk", "rs", "re", "rv")
    val p = ij(l, r).queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(p.contains("IntervalJoin "), p)
  }

  test("randomized cross-check vs the composed equi-join + residual " +
    "filter, string keys, many partitions") {
    val rnd = new scala.util.Random(42)
    val keys = (0 until 17).map(i => s"user_$i")
    val points = (0 until 2000).map { i =>
      (keys(rnd.nextInt(keys.length)), rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("k", "t", "pid")
    val ivs = (0 until 600).map { i =>
      val s = rnd.nextInt(1000).toLong
      (keys(rnd.nextInt(keys.length)), s, s + 1 + rnd.nextInt(60),
        i.toLong)
    }.toDF("rk", "rs", "re", "iid")
    val native = graft.plans.GraftInterval
      .intervalJoin(points, ivs, "k", "rk", "t", "rs", "re")
      .select("pid", "iid").collect()
    val composed = points.join(ivs,
        col("k") === col("rk") && col("t") >= col("rs") &&
          col("t") < col("re"))
      .select("pid", "iid").collect()
    assert(native.length == composed.length,
      s"${native.length} vs ${composed.length}")
    assert(native.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      composed.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }
}

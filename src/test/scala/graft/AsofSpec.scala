package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of join operator (AsofJoin logical node + strategy +
  * streaming-merge exec): semantics (latest right ≤ left, tolerance,
  * unmatched null-extension, null keys), plan shape (the custom node
  * actually plans; exchanges/sorts come from EnsureRequirements), and
  * a whole-fixture cross-check against the composed window+filter
  * formulation.
  */
class AsofSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def asof(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame, tolUs: Long = 0L) =
    graft.plans.GraftAsof.asofJoin(l, r, "k", "rk", "t", "rt", tolUs)

  test("latest right <= left wins; unmatched rows null-extend") {
    val l = Seq(("a", 10L, "l1"), ("a", 20L, "l2"), ("b", 5L, "l3"))
      .toDF("k", "t", "lv")
    val r = Seq(("a", 5L, "r5"), ("a", 10L, "r10"), ("a", 15L, "r15"),
      ("b", 6L, "r6")).toDF("rk", "rt", "rv")
    val got = asof(l, r).select("lv", "rv").collect().toSet
    // l1@10 → r10 (ties allowed: rt <= t); l2@20 → r15; l3@5 → none
    assert(got == Set(Row("l1", "r10"), Row("l2", "r15"),
      Row("l3", null)))
  }

  test("tolerance bounds the lookback window") {
    val l = Seq(("a", 100L, "l1"), ("a", 200L, "l2")).toDF("k", "t", "lv")
    val r = Seq(("a", 10L, "r10"), ("a", 95L, "r95")).toDF("rk", "rt", "rv")
    val got = asof(l, r, tolUs = 20L).select("lv", "rv").collect().toSet
    // l1@100: r95 within 20; l2@200: r95 is 105 away → null
    assert(got == Set(Row("l1", "r95"), Row("l2", null)))
  }

  test("null keys and null times never match and never crash the merge") {
    val l = Seq((Option("a"), Option(10L), "l1"),
      (Option.empty[String], Option(10L), "l2"),
      (Option("a"), Option.empty[Long], "l3")).toDF("k", "t", "lv")
    val r = Seq((Option("a"), Option(5L), "r5"),
      (Option.empty[String], Option(1L), "rX"),
      (Option("a"), Option.empty[Long], "rY")).toDF("rk", "rt", "rv")
    val got = asof(l, r).select("lv", "rv").collect().toSet
    assert(got == Set(Row("l1", "r5"), Row("l2", null), Row("l3", null)))
  }

  test("string keys work through the interpreted ordering") {
    val l = Seq(("zz", 10L, 1), ("aa", 10L, 2)).toDF("k", "t", "lv")
    val r = Seq(("aa", 9L, 20), ("zz", 9L, 10)).toDF("rk", "rt", "rv")
    val got = asof(l, r).select("lv", "rv").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (2, 20)))
  }

  test("the custom node plans as AsofJoin with EnsureRequirements-" +
      "provided exchanges and sorts") {
    val l = Seq(("a", 10L, "x")).toDF("k", "t", "lv")
    val r = Seq(("a", 5L, "y")).toDF("rk", "rt", "rv")
    val p = asof(l, r).queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"custom exec missing:\n$p")
    assert(p.contains("Sort"), "merge requires child sorts")
  }

  test("a session built with GraftExtensions resolves graft SQL " +
      "functions and plans AsofJoin without imperative registration") {
    val base = SparkFixture.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      assert(s2 ne base, "builder must create a fresh session")
      assert(s2.sql("SELECT graft_nfc('abc') AS x").head.getString(0)
        == "abc")
      assert(s2.sql(
        "SELECT graft_dot(array(CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT))) AS d").head.getDouble(0) == 6.0)
      // the strategy must come from the extension, not extraStrategies
      assert(s2.experimental.extraStrategies.isEmpty)
      import s2.implicits._
      val l = Seq(("a", 10L)).toDF("k", "t")
      val r = Seq(("a", 5L, 7)).toDF("rk", "rt", "v")
      def att(df: org.apache.spark.sql.DataFrame, n: String) =
        df.queryExecution.analyzed.output.find(_.name == n).get
      val node = graft.plans.AsofJoin(
        l.queryExecution.analyzed, r.queryExecution.analyzed,
        att(l, "k"), att(r, "rk"), att(l, "t"), att(r, "rt"), 0L)
      val df = org.apache.spark.sql.GraftSqlBridge.ofRows(s2, node)
      assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"))
      assert(df.select("v").head.getInt(0) == 7)
      // the interval strategy is injected too
      val ri = Seq(("a", 5L, 20L, 9)).toDF("rk", "rs", "re", "v")
      val inode = graft.plans.IntervalJoin(
        l.queryExecution.analyzed, ri.queryExecution.analyzed,
        att(l, "k"), att(ri, "rk"), att(l, "t"), att(ri, "rs"),
        att(ri, "re"))
      val idf = org.apache.spark.sql.GraftSqlBridge.ofRows(s2, inode)
      assert(idf.queryExecution.executedPlan.toString
        .contains("IntervalJoin"))
      assert(idf.select("v").head.getInt(0) == 9)
      assert(s2.experimental.extraStrategies.isEmpty)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }

  test("the custom as-of operator composes with Structured Streaming " +
    "via foreachBatch: stream-vs-static attribution equals batch") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // static right side: (user, view time, view id)
    val views = Seq((1L, 100L, 900L), (1L, 250L, 901L), (2L, 50L, 902L))
      .toDF("v_user", "v_us", "view_event_id")
    // purchases (event_id, user_id, p_us) arriving over three batches
    val ps = Seq((1L, 1L, 120L), (2L, 1L, 260L), (3L, 2L, 40L),
      (4L, 2L, 70L), (5L, 3L, 10L))

    val expected = graft.plans.GraftAsof.asofJoin(
      ps.toDF("event_id", "user_id", "p_us"), views,
      "user_id", "v_user", "p_us", "v_us")
      .select("event_id", "view_event_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val got = scala.collection.concurrent.TrieMap[Long, Long]()
    val mem = MemoryStream[(Long, Long, Long)]
    val q = mem.toDS().toDF("event_id", "user_id", "p_us").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.plans.GraftAsof.asofJoin(
          batch, views, "user_id", "v_user", "p_us", "v_us")
          .select("event_id", "view_event_id").collect()
          .foreach(r => got.put(r.getLong(0),
            if (r.isNullAt(1)) -1L else r.getLong(1)))
      }
      .start()
    Seq(ps.take(2), ps.slice(2, 4), ps.drop(4)).foreach { s =>
      mem.addData(s)
      q.processAllAvailable()
    }
    q.stop()
    assert(got.toMap == expected)
  }

  test("custom operator reproduces the composed window formulation " +
      "on the full sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val composed = SparkEntry.queries("q_ts_asof_join")(spark, dir)
      .collect().toSet
    val native = SparkEntry.queries("q_ts_asof_native")(spark, dir)
      .collect().toSet
    assert(native == composed)
  }
}

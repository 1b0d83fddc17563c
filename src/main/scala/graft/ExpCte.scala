package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch A/B harness for q_cte_recursive physical-layout experiments
  * (optimization-round instrumentation, not part of the driver
  * contract): runs the query's exact declared SQL under a CLONED
  * session with the conf overrides given on the command line, and
  * reports min-of-3 wall plus job/stage counts.
  *
  *   sbt "runMain graft.ExpCte <sfDir> [k=v ...]"
  */
object ExpCte {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench's session shape (byte-sized AQE coalescing)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        synchronized { stages += 1; tasks += st.stageInfo.numTasks }
    })
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => }
    graft.ops.Tables.views(spark, sfDir)
    val overrides = args.drop(1).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val s2 = spark.newSession()
    graft.ops.Tables.views(s2, sfDir)
    s2.conf.set("spark.sql.cteRecursionLevelLimit", "400")
    overrides.foreach { case (k, v) => s2.conf.set(k, v) }
    val sql = """
        WITH RECURSIVE c(n0, n, steps) AS (
          SELECT DISTINCT CAST(n_chars AS BIGINT),
                 CAST(n_chars AS BIGINT), CAST(0 AS BIGINT)
          FROM documents
          UNION ALL
          SELECT n0, CASE WHEN n % 2 = 0 THEN n DIV 2
                          ELSE 3 * n + 1 END, steps + 1
          FROM c WHERE n > 1 AND steps < 40)
        SELECT n0 AS n_chars, max(steps) AS collatz_steps
        FROM c GROUP BY n0 ORDER BY n0"""
    val times = (1 to 3).map { _ =>
      Thread.sleep(200)
      synchronized { jobs = 0; stages = 0; tasks = 0 }
      val t0 = System.nanoTime()
      val n = s2.sql(sql).queryExecution.toRdd.count()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"rep: wall=$w%.3f rows=$n jobs=$jobs stages=$stages tasks=$tasks")
      w
    }
    println(f"min: ${times.min}%.3f  overrides: ${overrides.mkString(",")}")
    spark.stop()
  }
}

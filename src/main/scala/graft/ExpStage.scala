package graft

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch per-stage profiler (optimization-round instrumentation):
  * runs one named query warm and prints every stage's task count,
  * executor run/cpu time, GC time and shuffle bytes — attributes a
  * query's task time to operators via the stage name/callsite.
  *
  *   sbt "runMain graft.ExpStage <sfDir> <query> [k=v ...]"
  */
object ExpStage {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
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
    args.drop(2).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    @volatile var on = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = if (on) {
        val si = s.stageInfo
        val tm = si.taskMetrics
        rows += f"stage=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"run_ms=${tm.executorRunTime}%7d cpu_ms=${tm.executorCpuTime / 1000000}%7d " +
          f"gc_ms=${tm.jvmGCTime}%6d " +
          f"sread=${tm.shuffleReadMetrics.totalBytesRead}%9d " +
          f"swrite=${tm.shuffleWriteMetrics.bytesWritten}%9d  ${si.name.take(90)}"
      }
    })
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => }
    // warm rep (family caches)
    try SparkEntry.queries(qname)(spark, sfDir).queryExecution.toRdd.count()
    catch { case e: Throwable => System.err.println(s"warm failed: $e") }
    val walls = (1 to 3).map { r =>
      Thread.sleep(400)
      rows.clear()
      on = true
      val c0 = {
        val os = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        os.getProcessCpuTime
      }
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, sfDir).queryExecution.toRdd.count()
      val w = (System.nanoTime() - t0) / 1e9
      val cpu = ({
        val os = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        os.getProcessCpuTime
      } - c0) / 1e9
      Thread.sleep(400)
      on = false
      println(f"rep $r wall: $w%.3f s cpu: $cpu%.2f s stages: ${rows.size}")
      w
    }
    rows.foreach(println)
    println(f"min wall: ${walls.min}%.3f s")
    spark.stop()
  }
}

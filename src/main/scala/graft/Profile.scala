package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution profiler (optimization-round instrumentation;
  * not part of the driver contract). For each named query — default:
  * every registered query — runs it once warm and reports jobs,
  * stages, tasks, shuffle read/write bytes, spill, and wall seconds,
  * so "where is the time" is a table instead of a guess (guide §1).
  *
  *   sbt "runMain graft.Profile [sfDir] [query ...]"
  *
  * Output: one `{"q":...,"jobs":N,...}` JSON line per query plus a
  * TSV summary sorted by wall time to /tmp/profile_out.tsv.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.defs.map(_.name)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench's session shape (byte-sized AQE coalescing)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ONE lock shared by the listener callbacks and main's reset/read
    // (r14 advice: the previous version synchronized on two different
    // monitors, so only the drain sleeps protected the window)
    val lock = new Object
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var spillDisk = 0L
    @volatile var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        lock.synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          tasks += s.stageInfo.numTasks
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        lock.synchronized {
          val m = t.taskMetrics
          if (m != null) {
            shufRead += m.shuffleReadMetrics.totalBytesRead
            shufWrite += m.shuffleWriteMetrics.bytesWritten
            spillDisk += m.diskBytesSpilled
            taskTimeMs += m.executorRunTime
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm-up: session/codegen init outside the measured loop
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => }

    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Int, Int, Long, Long, Long, Long, Double)]
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    // run in family order (shared family caches behave as in Bench)
    val ordered = SparkEntry.families.flatMap(_._2)
      .filter(d => names.contains(d.name))
    ordered.foreach { d =>
      // rep 1 warms family caches; rep 2 is the measured one (matches
      // the bench's min-of-N warm-cache read)
      try { d.run(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        System.err.println(s"[profile] ${d.name} warm rep failed: $e") }
      Thread.sleep(300) // let listener events drain (bus is private)
      lock.synchronized {
        jobs = 0; stages = 0; tasks = 0
        shufRead = 0L; shufWrite = 0L; spillDisk = 0L; taskTimeMs = 0L
      }
      // record a failed measured rep instead of silently emitting a
      // near-zero timing row (r14 advice)
      var err: Option[String] = None
      val t0 = System.nanoTime()
      try { d.run(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        err = Some(e.toString.replace('"', '\'').take(120)) }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain (bus is private)
      rows += ((d.name, jobs, stages, tasks, shufRead, shufWrite,
        spillDisk, taskTimeMs, wall))
      val errJson = err.map(m => s""","err":"$m"""").getOrElse("")
      println(f"""{"q":"${d.name}","jobs":$jobs,"stages":$stages,""" +
        f""""tasks":$tasks,"shuf_read":$shufRead,""" +
        f""""shuf_write":$shufWrite,"spill":$spillDisk,""" +
        f""""task_ms":$taskTimeMs,"wall":$wall%.3f$errJson}""")
    }
    val out = new StringBuilder
    out.append("q\tjobs\tstages\ttasks\tshuf_read\tshuf_write\tspill\ttask_ms\twall\n")
    rows.sortBy(-_._9).foreach { case (n, j, s, t, sr, sw, sp, tm, w) =>
      out.append(f"$n\t$j\t$s\t$t\t$sr\t$sw\t$sp\t$tm\t$w%.3f\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/profile_out.tsv"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[profile] wrote /tmp/profile_out.tsv (${rows.size} queries)")
    spark.stop()
  }
}

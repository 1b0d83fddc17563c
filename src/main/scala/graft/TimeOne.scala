package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench's session shape (byte-sized AQE coalescing)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).queryExecution.toRdd.count() catch { case _: Throwable => }
    for (n <- args.drop(1)) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, args(0)).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n: ${times.min}%.3f")
    }
    spark.stop()
  }
}

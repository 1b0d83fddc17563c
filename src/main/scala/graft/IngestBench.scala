package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.{TagString, WriteRequest}
import graft.engine.LynxEngine

/** Write-path throughput: WAL-append + buffer-insert rate, the
  * data-plane metric the reference's architecture is judged on
  * (per-record flush, no fsync — same policy both sides).
  *
  *   sbt "runMain graft.IngestBench [nWrites]"
  * prints one JSON line {"metric":"ingest_writes_per_sec",...}.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("ingest-bench").toFile
    // LYNX_WAL_GROUP_COMMIT_MS > 0 benches the group-commit flush
    // policy against the default per-record flush
    val groupCommitMs = sys.env.get("LYNX_WAL_GROUP_COMMIT_MS")
      .map(_.toLong).getOrElse(0L)
    // LYNX_WAL_FSYNC=1 benches the power-loss-durable top rung
    val walFsync = sys.env.get("LYNX_WAL_FSYNC").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))
    val engine = new LynxEngine(spark, dir, 50L * 1024 * 1024,
      walGroupCommitMillis = groupCommitMs, walFsync = walFsync)
    val tags = Map("host" -> TagString("h1"), "region" -> TagString("eu"))
    // warm-up
    (0 until 1000).foreach(i =>
      engine.write(WriteRequest("warm", "w", i.toString, tags, i.toLong)))
    // LYNX_BATCH_SIZE > 1 benches the batch write path (one WAL
    // flush per batch — the HTTP JSON-array body shape)
    val batchSize = sys.env.get("LYNX_BATCH_SIZE").map(_.toInt)
      .getOrElse(1)
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      if (batchSize <= 1) {
        engine.write(WriteRequest("bench", "cpu", i.toString, tags,
          i.toLong * 1000L))
        i += 1
      } else {
        val end = math.min(i + batchSize, n)
        engine.writeBatch((i until end).map(j =>
          WriteRequest("bench", "cpu", j.toString, tags,
            j.toLong * 1000L)))
        i = end
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    // sanity: everything queryable
    val rows = engine.query("bench", "SELECT count(*) AS n FROM cpu")
      .get.rows.head.getLong(0)
    require(rows == n, s"lost writes: $rows != $n")
    println(f"""{"metric":"ingest_writes_per_sec","value":${n / secs}%.0f,"unit":"writes/sec","n":$n,"wal_segments":${engine.wal.activeSegmentId + 1},"group_commit_ms":$groupCommitMs,"batch_size":$batchSize}""")
    engine.wal.close()
    spark.stop()
  }
}

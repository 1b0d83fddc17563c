package graft.tier

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Columnar tier for sealed buffer data — the 100 TB path the
  * reference lacks (it keeps the whole dataset in RAM and the WAL
  * grows forever; SURVEY.md §3.3, §7.1 step 8).
  *
  * Layout: `root/<namespace>/<table>/day=YYYY-MM-DD/part-*.parquet`.
  * Day directory partitioning restores the partition pruning the
  * reference's query path throws away (it concatenates every daily
  * partition before the SQL engine sees a `WHERE timestamp` filter,
  * reference lynx.rs:86-91): a time-bounded query reads only matching
  * `day=` directories (Catalyst `PartitionFilters`).
  *
  * Schema evolution: tag columns appear over time, so sealed segments
  * are read with `mergeSchema=true` and the engine NULL-fills via
  * `unionByName(allowMissingColumns)` — preserving the reference's
  * widening-schema semantics (lynx.rs:93-116) on columnar storage.
  */
final class ParquetTier(root: File) {

  private def tableDir(ns: String, table: String) =
    new File(new File(root, ns), table)

  def tables(ns: String): Set[String] = {
    val d = new File(root, ns)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet
  }

  /** Append one sealed batch (must carry a `day` string column). */
  def seal(spark: SparkSession, ns: String, table: String,
      df: DataFrame): Unit =
    df.write.mode("append").partitionBy("day")
      .parquet(tableDir(ns, table).getPath)

  def read(spark: SparkSession, ns: String, table: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(tableDir(ns, table).getPath)
      .drop("day") // partition dir column; `timestamp` carries the data

  /** Data files of a table, for pinning a consistent snapshot: the
    * engine lists these under its write lock so a concurrent seal
    * can't make rows visible twice (once from the RAM snapshot, once
    * from a newly sealed file).
    */
  def dataFiles(ns: String, table: String): Seq[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(tableDir(ns, table)).map(_.getPath)
  }

  /** Read a pinned file set; `basePath` keeps the `day=` directory
    * parsing so `dayBounds` (inclusive yyyy-MM-dd strings) prunes
    * partitions before any file I/O.
    */
  def readFiles(spark: SparkSession, ns: String, table: String,
      files: Seq[String],
      dayBounds: Option[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df = spark.read
      .option("mergeSchema", "true")
      .option("basePath", tableDir(ns, table).getPath)
      .parquet(files: _*)
    val pruned = dayBounds match {
      case Some((lo, hi)) =>
        df.filter(col("day").cast("string") >= lo &&
          col("day").cast("string") <= hi)
      case None => df
    }
    pruned.drop("day")
  }

  /** Compact a table's day partitions: every `seal` appends a new
    * file per partition, and at 100 TB the small-file count (not
    * data volume) becomes the scan bottleneck — compaction rewrites
    * each day to a single file (hash-clustered on `day`, so each
    * output task owns whole days). Writes to a temp dir first, then
    * swaps. Call through LynxEngine.compact, which serializes against
    * seals via the write lock; queries that pinned the pre-compaction
    * file list must finish before the old files are removed (a full
    * manifest/MVCC layer is the next step at real scale).
    */
  def compact(spark: SparkSession, ns: String, table: String): Unit = {
    val dir = tableDir(ns, table)
    if (dir.isDirectory) {
      val tmp = new File(dir.getParentFile, dir.getName + ".compacting")
      spark.read.option("mergeSchema", "true").parquet(dir.getPath)
        .repartition(org.apache.spark.sql.functions.col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(tmp.getPath)
      val old = new File(dir.getParentFile, dir.getName + ".old")
      if (!dir.renameTo(old))
        throw new IllegalStateException(s"compact: cannot move $dir")
      if (!tmp.renameTo(dir)) {
        old.renameTo(dir) // roll back
        throw new IllegalStateException(s"compact: cannot publish $tmp")
      }
      def rm(f: File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(old)
    }
  }
}

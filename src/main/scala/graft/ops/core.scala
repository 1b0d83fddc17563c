package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One operator from SURVEY.md §2, exposed through the driver contract:
  * a Spark-first implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle query over the same parquet tables.
  *
  * Parity discipline (see `Parity`): every floating aggregate goes
  * through exact decimal sums, every engine-dependent integer width is
  * cast to BIGINT on both sides, every result has a total ORDER BY.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // `spark.read.parquet` lists files and reads footers every call;
  // cache the resolved DataFrame per (session, dir, table) so the
  // bench/verify queries don't pay that fixed cost 10× each. Plans
  // are immutable, so sharing is safe. A DataFrame strongly
  // references its SparkSession, so weak session keys would never
  // collect (the classic WeakHashMap value→key pitfall); a bounded
  // access-order LRU instead guarantees discarded sessions age out
  // of this JVM-global cache within MaxCachedFrames insertions.
  private val MaxCachedFrames = 64
  private val dfCache =
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](
      MaxCachedFrames, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame])
          : Boolean = size() > MaxCachedFrames
    }

  // view registration markers hold no session reference in their
  // values, so weak session keys work here
  private val viewsDone =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Unit]]()

  /** Get-or-create the per-session sub-map of a weak-keyed cache —
    * shared by every session-scoped cache whose values do NOT
    * reference the session (see dfCache above for the other case).
    */
  private[graft] def perSession[K, V](
      cache: java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[K, V]],
      s: SparkSession): scala.collection.concurrent.TrieMap[K, V] =
    cache.synchronized {
      var m = cache.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[K, V]
        cache.put(s, m)
      }
      m
    }

  /** events.parquet's `ts` physical type has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (which Spark's reader
    * rejects; read as raw nanos and truncate to micros, matching
    * DuckDB's ns→us truncation, verified on fixture event_id 0:
    * …549829 ns → …549 us) and plain timestamp[us] (which Spark
    * reads as TIMESTAMP_NTZ). The loader inspects the footer schema
    * and normalizes both to session-TZ TIMESTAMP (session is pinned
    * UTC everywhere, so NTZ→LTZ is value-preserving and matches
    * DuckDB's naive-timestamp arithmetic bit-for-bit).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    dfCache.synchronized {
      val key = (spark, dir, name)
      val hit = dfCache.get(key)
      if (hit != null) hit
      else {
        val df = load(spark, dir, name)
        dfCache.put(key, df)
        df
      }
    }

  private def load(spark: SparkSession, dir: String,
      name: String): DataFrame =
    {
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$dir/events.parquet")
        val ts = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => // legacy nanos
            timestamp_micros(expr("ts DIV 1000"))
          case _ => col("ts").cast("timestamp") // micros (NTZ or LTZ)
        }
        raw.withColumn("ts", ts)
          .select("event_id", "ts", "user_id", "event_type", "value",
            "props")
      } else {
        spark.read.parquet(s"$dir/$name.parquet")
      }
    }

  /** Round-robin repartition to the session's default parallelism —
    * the guide-§2.5 "input skew" fix for heavy per-row compute above
    * an unsplittable scan. The fixture tables are single-file,
    * SINGLE-ROW-GROUP parquet, so every scan is ONE task no matter
    * the split config; any expensive kernel directly above the scan
    * (shingling, media decode, per-token hashing) runs serially
    * unless an exchange intervenes. Cost: one exchange of the small
    * payload. Scale-adaptive (defaultParallelism, i.e. the cluster's
    * core count), not a local[32] constant; on a real multi-row-group
    * table the same call still just normalizes scan parallelism to
    * the cluster width.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Achievable scan parallelism for a parquet table, from footer
    * metadata only (no Spark job): tasks are byte-range splits of at
    * most maxPartitionBytes, but a split only carries rows when it
    * owns ≥1 row-group midpoint — so the achievable task count is
    * min(row groups, ceil(bytes / maxPartitionBytes)). Cached per
    * path (fixtures are immutable).
    */
  private val scanParCache =
    scala.collection.concurrent.TrieMap.empty[String, Int]
  def scanParallelism(spark: SparkSession, dir: String,
      name: String): Int =
    scanParCache.getOrElseUpdate(s"$dir/$name", {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = root.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).toSeq
        else Seq(root)
      val maxSplit = spark.conf
        .get("spark.sql.files.maxPartitionBytes", "134217728")
        .takeWhile(_.isDigit).toLong max 1L
      files.map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(p, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val groups =
          try r.getRowGroups.size finally r.close()
        val splits =
          ((fs.getFileStatus(p).getLen + maxSplit - 1) / maxSplit).toInt
        math.min(groups, math.max(splits, 1))
      }.sum
    })

  /** [[spread]] gated on the input's MEASURED scan parallelism (r14
    * verdict item: the unconditional round-robin exchange is only
    * correct policy when the scan is provably near-serial — on a
    * multi-row-group 100 TB table it would be a full-data exchange
    * bought for nothing). Fires only when the parquet layout cannot
    * reach half the cluster's width on its own; the fixture tables
    * (single file, single row group → 1 task) always qualify, a
    * production table never does.
    */
  def spreadIfNarrow(spark: SparkSession, dir: String, name: String)(
      df: DataFrame): DataFrame = {
    val achievable = scanParallelism(spark, dir, name)
    if (achievable * 2 <= spark.sparkContext.defaultParallelism)
      spread(df)
    else df
  }

  /** `.cache()` that keeps the plan's EXECUTION-WIDTH partitioning
    * instead of the session's AQE byte-coalesced cached layout (r15:
    * the session enables canChangeCachedPlanOutputPartitioning so
    * tiny cached frames stop pinning 32 one-KB partitions — but a
    * compute-dense cache, e.g. md5-shingle frames feeding pair
    * equi-joins, is small in BYTES and heavy in downstream CPU, and
    * byte-sized coalescing serializes every consumer's map side:
    * q_dedup_containment measured 1.4 → 2.2 s. At corpus scale both
    * layouts are wide, so this only changes fixture-scale behavior.)
    * The conf is captured at cache registration, scoped set/restore.
    */
  def cacheWide(df: DataFrame): DataFrame =
    Confs.scoped(df.sparkSession,
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
        -> "false") {
      df.cache()
    }

  /** Row count straight from parquet footer metadata — a driver-side
    * read of a few KB, no Spark job. Used by fixture-scale gates
    * (q_embed_cosine_pairs) so the guard doesn't cost an extra job on
    * every execution. Cached per path: the fixtures are immutable.
    */
  private val countCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.getOrElseUpdate(s"$dir/$name", {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = root.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).toSeq
        else Seq(root)
      files.map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(p, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    })

  /** Register every fixture table as a temp view (for spark.sql
    * paths); once per (session, dir).
    */
  def views(spark: SparkSession, dir: String): Unit =
    perSession(viewsDone, spark).getOrElseUpdate(dir,
      all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n)))
}

/** Scoped session-conf override for operators that run their actions
  * INSIDE the QueryDef.run body (iterative loops: GD training,
  * connected components, HITS). The conf is set for the duration of
  * the body and restored in a finally, so nothing leaks into the
  * session the bench shares across queries. Only usable when the
  * body itself executes the jobs the conf should affect — a lazily
  * returned DataFrame would execute after the restore.
  */
object Confs {
  def scoped[T](s: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) =>
      k -> (try Some(s.conf.get(k)) catch { case _: Exception => None })
    }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}

/** Eager lineage cut for iterative loops (label propagation, HITS,
  * k-center, MMR): re-deriving loop state lazily unrolls the lineage
  * exponentially (measured 18 s vs 1.3 s on q_graph_hits), so loop
  * frames are checkpointed eagerly each round.
  *
  * `localCheckpoint` by default — fast, but blocks are pinned to
  * executors and are NOT fault-tolerant: on a real cluster a lost
  * executor mid-loop kills the job. When the SparkContext has a
  * checkpoint dir configured (`sc.setCheckpointDir(<job scratch on
  * shared storage>)` — the standard Spark knob, no graft-specific
  * config), every iterative op here upgrades automatically to a
  * RELIABLE checkpoint, which a 100 TB run should set.
  */
object Lineage {
  def cut[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint(eager = true)
    else ds.localCheckpoint(eager = true)
}

/** Cross-engine determinism helpers.
  *
  * Double summation is order-dependent and Spark's partial-aggregate
  * merge order is nondeterministic across runs, so oracle-checked
  * aggregates of doubles are computed as exact DECIMAL(28,10) sums and
  * only then cast back to double — bit-identical in Spark and DuckDB
  * regardless of execution order.
  */
object Parity {
  val Dec: DecimalType = DecimalType(28, 10)

  /** Order-independent exact sum of a double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent mean (exact sum / count), as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB-side equivalents. DuckDB's DECIMAL→DOUBLE cast is not
    * correctly rounded (off by 1 ulp for e.g. 252916181.39); routing
    * through VARCHAR gives the correctly-rounded parse, matching
    * Spark's BigDecimal.doubleValue.
    */
  def dsumSql(e: String): String =
    s"CAST(CAST(sum(CAST(($e) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
  def davgSql(e: String): String = s"${dsumSql(e)} / count(*)"

  /** Spark SQL-side equivalents (Spark's decimal→double cast is
    * correctly rounded; VARCHAR needs a length in Spark SQL).
    */
  def dsumSparkSql(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(28,10))) AS DOUBLE)"
  def davgSparkSql(e: String): String = s"${dsumSparkSql(e)} / count(*)"
}

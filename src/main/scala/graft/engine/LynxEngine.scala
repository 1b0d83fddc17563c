package graft.engine

import java.io.File
import java.sql.Timestamp
import scala.collection.immutable.TreeMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement,
  LogicalPlan}
import org.apache.spark.sql.types._

import graft.buffer.{MemBuffer, MeasurementsView}
import graft.core.WriteRequest
import graft.tier.ParquetTier
import graft.wal.Wal

/** Query result: schema + rows, ready for a sink adapter. */
final case class QueryResult(schema: StructType, rows: Seq[Row])

/** The engine: Spark-native rebuild of the reference's `Lynx` struct
  * (reference lynx.rs:28-150).
  *
  * Write path (reference lynx.rs:63-68): WAL append FIRST — "Data MUST
  * be appended to the WAL before making its way into the in-memory
  * buffer" (lynx.rs:32-33) — then buffer insert.
  *
  * Query path (reference lynx.rs:70-148): gatekeeper-parse the SQL,
  * snapshot the namespace, build DataFrames with the dynamically
  * inferred schema, register temp views, delegate to spark.sql —
  * Catalyst plays the role DataFusion plays behind lynx.rs:141.
  *
  * Improvements over the reference, by design (SURVEY.md §3.4):
  *  - per-query `SparkSession.newSession()` gives each request an
  *    isolated temp-view catalog, fixing the shared-SessionContext
  *    race between concurrent queries on the same table name;
  *  - every table referenced by the query is registered (multi-table
  *    joins work instead of depending on stale registrations);
  *  - CTEs and derived tables pass the gatekeeper;
  *  - tag columns appear in deterministic sorted order (the reference
  *    iterates a HashSet — nondeterministic across runs, lynx.rs:110).
  *
  * At scale the buffer tiers to day-partitioned parquet via
  * [[graft.tier.ParquetTier]]; queries union the sealed segments with
  * the in-RAM tail, and Catalyst prunes `day=` partitions the
  * reference always scans (SURVEY.md §4.1).
  */
class LynxEngine(
    val spark: SparkSession,
    walDir: File,
    maxSegmentSize: Long = 50L * 1024 * 1024,
    tier: Option[ParquetTier] = None,
    maxBufferedRows: Int = Int.MaxValue,
    maxResultRows: Int = Int.MaxValue,
    walGroupCommitMillis: Long = 0L,
    walFsync: Boolean = false,
    resultCacheEntries: Int = 64,
    autoCompactFileThreshold: Int = 0,
    autoBloomColumns: Seq[String] = Nil,
    annRebuildThreshold: Option[Double] = None,
    walForceTailTruncate: Boolean = false,
    annPlacement: Option[(String, Seq[(String, String)])] = None) {

  val buffer = new MemBuffer

  // MVCC-keyed result cache: key = (ns, sql, per-referenced-table
  // (buffer revision, tier manifest version)). Revisions strictly
  // increase on every write/seal and the manifest version on every
  // seal/compaction, so a stale entry can never be served — no TTLs,
  // no explicit invalidation hooks. Bounded LRU of small results only
  // (the cap keeps a cached SELECT * from pinning heap).
  private val MaxCachedResultRows = 10000
  private[graft] val resultCacheHits =
    new java.util.concurrent.atomic.AtomicLong
  private val resultCache =
    new java.util.LinkedHashMap[AnyRef, QueryResult](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, QueryResult]): Boolean =
        size > resultCacheEntries
    }
  // Per-sink streaming high-water marks, DERIVED FROM THE WAL: replay
  // surfaces the highest committed stream-batch id per sink
  // (graft.core.StreamBatch brackets + hwm checkpoint records), and
  // writeStreamBatch advances it in the same writeLock hold that made
  // the batch durable. Guarded by writeLock after construction.
  private val streamHwm =
    scala.collection.mutable.Map.empty[String, Long]
  // Per-sink streaming-QUERY identity of the lane's committed
  // brackets (StreamBatch.QidTag; "" never stored). Replay surfaces
  // it in WAL order (last committed bracket wins); writeStreamBatch
  // records the writer's id. A batch at-or-below the hwm from a
  // DIFFERENT query id is a checkpoint RESET — fail loudly, never
  // silently skip (the one silent-data-loss path round 12 documented).
  // Guarded by writeLock after construction.
  private val streamQid =
    scala.collection.mutable.Map.empty[String, String]
  // tail repairs replay performed (torn-tail truncation, forced
  // frame-corrupt recovery, zombie-bracket removal) — surfaced in
  // /metrics so an operator sees data-affecting startup events
  // without grepping stderr (the ADVICE r13 visibility gap)
  private val walRecoveryLog =
    scala.collection.mutable.ArrayBuffer.empty[Wal.WalRecovery]
  def walRecoveries: Seq[Wal.WalRecovery] = walRecoveryLog.toSeq
  private val (replayedHighest, replayedIds) =
    Wal.replay(walDir, buffer, m => {
      // a BULK marker's staged files never came from the buffer:
      // draining here would lose acknowledged plain writes buffered
      // before the marker (they were never part of the bulk seal)
      if (!graft.core.SealMarker.isBulk(m))
        buffer.drainTable(m.value, m.measurement)
      // re-drive the tier publish recorded in the marker: idempotent,
      // so a crash anywhere between marker and publish converges here
      for {
        t <- tier
        sid <- m.metadata.get(graft.core.SealMarker.StagingTag)
      } {
        val files = m.metadata.get(graft.core.SealMarker.FilesTag)
          .map(_.render.split("\n").toSeq.filter(_.nonEmpty))
          .getOrElse(Nil)
        t.publish(m.value, m.measurement, sid.render, files)
      }
    }, (sink, bid, qid) => {
      val cur = streamHwm.getOrElse(sink, -1L)
      if (bid > cur) streamHwm(sink) = bid
      if (qid.nonEmpty) streamQid(sink) = qid // WAL order: last wins
    }, walForceTailTruncate, walRecoveryLog += _)
  // staging dirs whose marker never became durable: their rows just
  // replayed into the buffer, so the staged copies must be dropped
  tier.foreach(_.cleanStaging())
  val wal = new Wal(walDir, replayedHighest + 1, maxSegmentSize,
    groupCommitMillis = walGroupCommitMillis, fsyncOnFlush = walFsync)
  def replayedSegments: Seq[Long] = replayedIds

  /** Incremental per-segment rollup maintenance over tiered tables —
    * see [[RollupStore]]; present only when a tier is configured
    * (the RAM tail has no immutable segments to cache against).
    */
  lazy val rollups: Option[RollupStore] =
    tier.map(new RollupStore(spark, _))

  /** Engine-plane IVF ANN serving — see [[AnnStore]]; like rollups,
    * present only when a tier is configured (indexes persist under
    * the tier root).
    */
  lazy val ann: Option[AnnStore] =
    tier.map(new AnnStore(spark, _, annRebuildThreshold,
      placement = annPlacement))

  /** Per-file value blooms for equality-predicate file skipping —
    * see [[BloomStore]]; tier-only like rollups/ann. Once a column is
    * indexed (`valueBlooms.get.index(ns, table, col)`), the query
    * path consults it automatically for `col = 'literal'` conjuncts.
    */
  lazy val valueBlooms: Option[BloomStore] =
    tier.map(new BloomStore(spark, _))

  private val writeLock = new Object
  // Write-FENCED namespaces: every ingest door (row, batch, stream,
  // bulk) refuses them with NamespaceFencedException → HTTP 422 +
  // Retry-After. The fence is the drain barrier of namespace
  // migration (fence → checkpoint → export → import → router flip):
  // it must survive an engine restart mid-migration, or writes would
  // resume on the old owner after the copy and vanish at cutover —
  // so each fence is ALSO a marker file under the WAL dir (non-*.wal
  // names are invisible to replay), loaded here at startup.
  private val fencedNs: scala.collection.mutable.Set[String] = {
    val s = scala.collection.mutable.Set.empty[String]
    Option(walDir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isFile && f.getName.startsWith("fence-"))
        s += java.net.URLDecoder.decode(
          f.getName.stripPrefix("fence-"), "UTF-8")
    }
    s
  }
  private def fenceFile(ns: String) = new File(walDir,
    "fence-" + java.net.URLEncoder.encode(ns, "UTF-8"))

  /** Fence a namespace: all writes to it fail with
    * [[LynxEngine.NamespaceFencedException]] until [[unfence]].
    * Durable across restarts (marker file beside the WAL) AND across
    * power loss: the marker and its directory entry are fsynced
    * before fence() acks — a migration fences, copies, and flips on
    * the strength of this ack, so a fence living only in the page
    * cache could reopen the old owner to writes that then vanish at
    * cutover (the same power-loss class the WAL's fsync rung
    * covers). Reads are unaffected — a fenced namespace still
    * serves queries.
    */
  def fence(namespace: String): Unit = writeLock.synchronized {
    fencedNs += namespace
    val f = fenceFile(namespace)
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try ch.force(true) finally ch.close()
    fsyncDir(f.getParentFile)
  }

  /** Lift a namespace's write fence (migration rollback, or operator
    * cleanup of a decommissioned copy). The removal is fsynced too —
    * a resurrected fence after a crash would only refuse writes
    * (safe), but silently flip-flopping state is worse to operate.
    */
  def unfence(namespace: String): Unit = writeLock.synchronized {
    fencedNs -= namespace
    fenceFile(namespace).delete()
    fsyncDir(walDir)
  }

  private def fsyncDir(dir: File): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(dir.toPath,
        java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: java.io.IOException => () } // non-POSIX FS

  def isFenced(namespace: String): Boolean =
    writeLock.synchronized(fencedNs(namespace))

  /** Caller holds writeLock. */
  private def checkFence(ns: String): Unit =
    if (fencedNs(ns))
      throw new LynxEngine.NamespaceFencedException(ns)
  // RAM-tail row counts per (namespace, table), seeded from the
  // replayed buffer so a restarted engine still honors the threshold
  private val bufferedPerTable = {
    val m = scala.collection.mutable.Map.empty[(String, String), Int]
    m ++= buffer.rowCounts
    m
  }
  // replayed tables may already exceed the threshold — seal them now
  if (tier.isDefined && maxBufferedRows != Int.MaxValue)
    bufferedPerTable.filter(_._2 >= maxBufferedRows).keys.toSeq
      .foreach { case (ns, t) =>
        seal(ns, t)
        bufferedPerTable.remove((ns, t))
      }

  /** Batch ingest: validate EVERY request up-front (any invalid row
    * rejects the whole batch before a single side effect — no partial
    * batches to reconcile), then append all to the WAL with one
    * flush/fsync (Wal.writeAll — the group-commit rung: N records,
    * one durability round-trip) and buffer them. Auto-seal runs once
    * per affected table at the end, not per row.
    */
  def writeBatch(ws: Seq[WriteRequest]): Unit = writeLock.synchronized {
    ws.foreach(w => checkFence(w.namespace))
    validateTags(ws)
    wal.writeAll(ws) // WAL-first invariant, batch-wide
    buffer.insertAll(ws) // one lock hold + memoized day keys
    autoSealAfter(ws)
  }

  /** Namespace/table names materialize as tier path segments at seal
    * time; a pathy name ("..", "a/b") accepted at ingest would later
    * make the seal throw with the rows already acknowledged — so the
    * ingest doors reject them up front (ParquetTier.safeSeg is the
    * storage-side choke point; this keeps acknowledged rows always
    * sealable). Documented deviation: the RAM-only reference accepts
    * any name (lynx.rs stores them as map keys only).
    */
  private def isStorableName(s: String): Boolean =
    s.nonEmpty && s != "." && s != ".." &&
      !s.contains('/') && !s.contains('\\')

  private def requireStorableName(s: String, what: String): Unit =
    require(isStorableName(s),
      s"$what is not a storable name (path separators and '..' are " +
        s"not allowed): '$s'")

  private def validateTags(ws: Seq[WriteRequest]): Unit =
    ws.foreach { w =>
      // the NUL prefix is the WAL marker class (seal markers, stream
      // brackets, hwm records): a data row carrying it would replay
      // as a marker — poisoning a sink's high-water mark or opening
      // a phantom bracket — so it is rejected at every ingest door
      // (the HTTP layer rejects it too; this guards embedded callers)
      require(!w.namespace.startsWith("\u0000"),
        "reserved namespace")
      requireStorableName(w.namespace, "namespace")
      requireStorableName(w.measurement, "measurement")
      w.metadata.keys.foreach(k => require(
        k != "timestamp" && k != "value" && !k.startsWith("__lynx"),
        s"reserved tag key: $k"))
    }

  /** Caller holds writeLock and has already buffered `ws`. */
  private def autoSealAfter(ws: Seq[WriteRequest]): Unit =
    if (tier.isDefined && maxBufferedRows != Int.MaxValue) {
      ws.groupBy(w => (w.namespace, w.measurement)).foreach {
        case (key, rows) =>
          val n = bufferedPerTable.getOrElse(key, 0) + rows.size
          if (n >= maxBufferedRows) {
            seal(key._1, key._2)
            bufferedPerTable.remove(key)
          } else bufferedPerTable.update(key, n)
      }
    }

  /** EXACTLY-ONCE streaming ingest: apply micro-batch `batchId` of
    * stream `sinkId` unless the WAL-derived high-water mark proves it
    * already landed. The rows are bracketed between
    * [[graft.core.StreamBatch]] BEGIN/COMMIT markers inside ONE WAL
    * group commit (then force-flushed, so durability precedes the
    * caller's offset commit): replay inserts the rows only when the
    * commit marker survived, so a crash at ANY point either keeps the
    * whole batch (hwm advanced — the re-delivery is a no-op) or none
    * of it (hwm unchanged — the re-delivery applies it fresh). No
    * separate mark file, no window between "applied" and "marked".
    *
    * Returns true when applied, false when the hwm proves `batchId`
    * was already committed. Empty batches still commit their bracket
    * (the hwm must advance, or the source re-delivers forever).
    */
  def writeStreamBatch(sinkId: String, batchId: Long,
      ws: Seq[WriteRequest], queryId: String = ""): Boolean =
    writeLock.synchronized {
      require(sinkId.nonEmpty, "sinkId must be non-empty")
      if (batchId <= streamHwm.getOrElse(sinkId, -1L)) {
        checkStreamReset(sinkId, batchId, queryId)
        false
      } else {
        ws.foreach(w => checkFence(w.namespace))
        validateTags(ws)
        wal.writeAll(
          graft.core.StreamBatch.begin(sinkId, batchId, queryId) +:
            ws :+
            graft.core.StreamBatch.commit(sinkId, batchId, queryId))
        // under group commit writeAll only buffers — force the bracket
        // durable BEFORE advancing the hwm / acking the batch, or a
        // crash could lose rows the streaming checkpoint thinks landed
        wal.flush()
        buffer.insertAll(ws)
        streamHwm(sinkId) = batchId
        if (queryId.nonEmpty) streamQid(sinkId) = queryId
        autoSealAfter(ws)
        true
      }
    }

  /** Caller holds writeLock and has established batchId <= hwm. A
    * batch at-or-below the mark from a DIFFERENT streaming query than
    * the one whose brackets set it means the checkpoint was wiped and
    * recreated at the same path (batch ids restarted at 0 while the
    * WAL kept the lane's mark): Spark is NOT re-delivering — it is
    * replaying the source from scratch. Skipping would silently drop
    * the restarted batches; applying would duplicate already-landed
    * rows. Fail loudly instead — detection degrades gracefully when
    * either id is unknown (pre-qid WALs, callers without a checkpoint
    * identity).
    */
  private def checkStreamReset(sinkId: String, batchId: Long,
      queryId: String): Unit =
    if (queryId.nonEmpty) {
      val laneQid = streamQid.getOrElse(sinkId, "")
      if (laneQid.nonEmpty && laneQid != queryId)
        throw new IllegalStateException(
          s"stream reset detected for sink '$sinkId': batch " +
            s"$batchId is at-or-below the lane's high-water mark " +
            s"${streamHwm.getOrElse(sinkId, -1L)}, but it comes " +
            s"from streaming query '$queryId' while the lane's " +
            s"committed batches came from '$laneQid' — the " +
            "checkpoint was deleted and recreated at the same " +
            "path, so this is a restart-from-scratch, not a " +
            "re-delivery. Skipping would silently drop the " +
            "restarted batches; restart the stream with a fresh " +
            "checkpoint directory (or a new explicit sinkId) " +
            "instead.")
    }

  /** The reset probe behind the sink's cheap already-applied check —
    * same contract as the check inside [[writeStreamBatch]], exposed
    * so the caller's fast path (skip before collecting the batch)
    * cannot skip a reset silently.
    */
  private[graft] def assertNoStreamReset(sinkId: String, batchId: Long,
      queryId: String): Unit = writeLock.synchronized {
    if (batchId <= streamHwm.getOrElse(sinkId, -1L))
      checkStreamReset(sinkId, batchId, queryId)
  }

  /** The lane's recorded streaming-query id; "" before any
    * qid-carrying bracket committed (observability + specs).
    */
  private[graft] def streamQueryId(sinkId: String): String =
    writeLock.synchronized(streamQid.getOrElse(sinkId, ""))

  /** Highest committed stream-batch id for `sinkId`; -1 before the
    * first commit. Derived from the WAL at construction (replay) and
    * advanced under the write lock.
    */
  def streamHighWaterMark(sinkId: String): Long =
    writeLock.synchronized(streamHwm.getOrElse(sinkId, -1L))

  /** Every sink's high-water mark — the /metrics observability face
    * (a stalled stream shows as a mark that stops advancing).
    */
  def streamHighWaterMarks: Map[String, Long] =
    writeLock.synchronized(streamHwm.toMap)

  def write(w: WriteRequest): Unit = writeLock.synchronized {
    // tag keys may not shadow the fixed engine columns or the reserved
    // `__lynx` namespace (the tier's partition column): a tag named
    // `timestamp`/`value` would collide in the inferred schema, and a
    // `__lynx_day` tag would be silently overwritten at seal time.
    // The namespace NUL-prefix guard mirrors validateTags (a data row
    // in the marker namespace would replay as a marker).
    require(!w.namespace.startsWith("\u0000"), "reserved namespace")
    requireStorableName(w.namespace, "namespace")
    requireStorableName(w.measurement, "measurement")
    checkFence(w.namespace)
    w.metadata.keys.foreach(k => require(
      k != "timestamp" && k != "value" && !k.startsWith("__lynx"),
      s"reserved tag key: $k"))
    wal.write(w) // WAL-first invariant (reference lynx.rs:32-33,64)
    buffer.insert(w)
    // auto-seal: once a table's RAM tail exceeds the threshold, spill
    // it to the day-partitioned parquet tier (the 100 TB path; the
    // reference keeps everything in RAM forever, SURVEY.md §3.3)
    if (tier.isDefined && maxBufferedRows != Int.MaxValue) {
      val key = (w.namespace, w.measurement)
      val n = bufferedPerTable.getOrElse(key, 0) + 1
      if (n >= maxBufferedRows) {
        seal(w.namespace, w.measurement)
        bufferedPerTable.remove(key)
      } else bufferedPerTable.update(key, n)
    }
  }

  /** Seal a table's buffered partitions to the parquet tier (absent
    * in the reference, which keeps all data in RAM forever —
    * SURVEY.md §3.3; this is the 100 TB path). Runs under the write
    * lock — query snapshots also synchronize on it, so a query sees
    * either the pre-seal RAM tail or the post-seal tier, never the
    * in-between.
    *
    * Crash-atomic commit order: stage the parquet (invisible to
    * readers), make the seal durable with a WAL marker carrying the
    * staged file list, then publish. Replay completes a marked-but-
    * unpublished seal (publish is idempotent) and discards markerless
    * staging — so a crash at any point neither loses nor
    * double-counts the sealed rows.
    */
  def seal(namespace: String, table: String): Unit =
    writeLock.synchronized {
      tier.foreach { t =>
        buffer.drainTable(namespace, table).foreach { parts =>
          val df = LynxEngine.toDataFrame(spark, parts).withColumn(
            ParquetTier.DayCol,
            org.apache.spark.sql.functions.date_format(
              org.apache.spark.sql.functions.col("timestamp"),
              "yyyy-MM-dd"))
          val (stagingId, files) = t.stage(spark, namespace, table, df)
          wal.write(
            graft.core.SealMarker(namespace, table, stagingId, files))
          // under group commit the marker is only buffered — force it
          // durable BEFORE publish, or a crash in between leaves
          // published files with no marker and replay double-counts
          wal.flush()
          t.publish(namespace, table, stagingId, files)
          // every seal appends a file per day; at 100 TB the
          // small-file count, not data volume, becomes the scan
          // bottleneck. With a threshold configured, compact inline
          // once the manifest holds `threshold` files BEYOND
          // compaction's floor of one per day — thresholding on the
          // total would fire on every seal once the table spans that
          // many days (a full rewrite per seal). Amortized one
          // rewrite per `threshold` seals, under the same write lock
          // every compaction already requires; in-flight queries
          // keep reading their pinned pre-compaction manifest.
          if (autoCompactFileThreshold > 0 &&
              t.redundantFileCount(namespace, table) >=
                autoCompactFileThreshold) {
            t.compact(spark, namespace, table)
            // same hygiene as explicit compact(): the rewrite
            // orphaned the originals' index entries — drop them now
            // (amortized: once per `threshold` seals, the same class
            // as the rewrite itself; scoped to THIS table)
            pruneIndexes(namespace, table)
          }
          // keep the configured bloom/zone indexes current: one
          // incremental build over JUST the files this seal (or its
          // inline compaction) published — O(new files), same cost
          // class as the staging write above, so pruning never lags
          // the data it should be pruning
          maintainBloomIndexes(namespace, table)
        }
      }
    }

  /** Executor-side BULK-INGEST lane — the backfill door. The HTTP /
    * streaming write plane is driver-side by design (WAL-first, RAM
    * tail, trigger-bounded batches); loading 100 TB of history
    * through it would serialize the whole corpus through one
    * driver's collect. This lane writes the dataset as
    * day-partitioned parquet DISTRIBUTED (tier staging — the same
    * executor-side write every seal uses), then commits it with ONE
    * WAL seal marker + ONE manifest flip: no row ever touches the
    * driver, the buffer, or the WAL. Visibility is atomic at the new
    * manifest version (time travel sees the pre/post versions), and
    * the crash contract is the seal's: marker-before-publish, replay
    * re-drives an unpublished marker, a markerless staging dir is
    * discarded at startup — so a caller whose ingestDataset returned
    * has durable data, and one that crashed mid-call retries the
    * whole dataset (nothing partial ever becomes visible).
    *
    * `df` must carry `timestamp` (castable to TIMESTAMP) and `value`
    * columns; every other column becomes a string tag (cast), same
    * dynamic-schema rules as the row plane (no `__lynx*` names, no
    * `timestamp`/`value` shadowing — enforced here like
    * validateTags). Rows keep the caller's partitioning: files per
    * day = input partitions that hold that day (repartition by a
    * day expression upstream for fewer, larger files; the auto-
    * compaction threshold also applies, same as seal). Returns the
    * number of data files published.
    */
  def ingestDataset(namespace: String, table: String,
      df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.functions.{col, date_format, expr}
    require(!namespace.startsWith("\u0000"), "reserved namespace")
    requireStorableName(namespace, "namespace")
    requireStorableName(table, "table")
    writeLock.synchronized(checkFence(namespace))
    val t = tier.getOrElse(throw new IllegalStateException(
      "bulk ingest requires a parquet tier"))
    val cols = df.columns
    require(cols.exists(_ == "timestamp") && cols.exists(_ == "value"),
      "bulk-ingest datasets must carry timestamp and value columns")
    val tagCols = cols.filterNot(c => c == "timestamp" || c == "value")
    tagCols.foreach(k => require(!k.startsWith("__lynx"),
      s"reserved tag key: $k"))
    val norm = df.select(
      (expr("try_cast(`timestamp` AS timestamp)").as("timestamp") +:
        col("value").cast("string").as("value") +:
        tagCols.sorted.map(c => col(c).cast("string").as(c))): _*)
      .withColumn(ParquetTier.DayCol,
        date_format(col("timestamp"), "yyyy-MM-dd"))
    // validateTags' fail-loud contract for the bulk lane's VALUES.
    // The normalization is try_cast BY DESIGN: a plain cast is
    // config-dependent — under ANSI it aborts the distributed stage
    // with an opaque SparkDateTimeException naming no rows, and with
    // ANSI off an unparseable timestamp silently becomes NULL and
    // lands in the null __lynx_day partition (invisible to every
    // day-pruned/time-range query but visible to full scans, a row
    // shape the row plane's i64-micros/non-null contract can never
    // produce). try_cast makes the bad rows OBSERVABLE, and this
    // validation count rejects the dataset whole BEFORE any side
    // effect — one extra source pass, never a corrupt commit.
    val bad = norm.filter(col("timestamp").isNull ||
      col("value").isNull).count()
    require(bad == 0,
      s"bulk ingest rejected: $bad row(s) with a null/unparseable " +
        "timestamp or null value — the row plane cannot represent " +
        "them (they would land in the null __lynx_day partition, " +
        "invisible to day-pruned queries); filter or fix them " +
        "before ingestDataset")
    // the heavy distributed write runs OUTSIDE the engine lock:
    // staging is invisible to readers, so concurrent writes/queries
    // proceed; only the metadata commit below serializes
    val (stagingId, files) = t.stage(spark, namespace, table, norm)
    writeLock.synchronized {
      // re-check at the commit point: a fence that arrived during
      // the distributed staging write must still win (the staged
      // files are invisible and cleaned at next startup)
      checkFence(namespace)
      wal.write(graft.core.SealMarker(namespace, table, stagingId,
        files, bulk = true))
      wal.flush() // marker durable BEFORE publish (the seal ordering)
      t.publish(namespace, table, stagingId, files)
      if (autoCompactFileThreshold > 0 &&
          t.redundantFileCount(namespace, table) >=
            autoCompactFileThreshold) {
        t.compact(spark, namespace, table)
        pruneIndexes(namespace, table)
      }
      maintainBloomIndexes(namespace, table)
    }
    files.size
  }

  /** Incrementally (re)index the configured bloom columns for a
    * table whose manifest just changed. ANY failure is logged and
    * swallowed (NonFatal): by the time this runs the rows are already
    * durably committed — a transient IO/Spark error in index
    * maintenance must never fail the write/seal it trails, or a
    * streaming caller would re-deliver an already-landed batch. The
    * index is conservative by design: an unindexed file is simply
    * read, so a skipped build costs a scan, never correctness.
    * (Misconfigured columns — non-string types under the dynamic
    * schema — surface here too, as warnings.)
    */
  private def maintainBloomIndexes(ns: String, table: String): Unit =
    for (bs <- valueBlooms; c <- autoBloomColumns)
      try bs.index(ns, table, c)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[bloom-auto] skipping $table.$c: ${e.getMessage}")
      }

  /** Seal every buffered table, then truncate the WAL: once the
    * buffer is empty all closed segments are redundant (their data is
    * in the tier; replaying nothing reproduces the same empty
    * buffer), so they are deleted — bounding the WAL growth the
    * reference never addresses (SURVEY.md §3.3). No-op without a
    * tier.
    */
  def checkpoint(): Unit =
    if (tier.isDefined) {
      // seal table-by-table — each seal is individually atomic and
      // marker-protected — so writes/queries only block per table,
      // not for the whole multi-table flush
      buffer.rowCounts.keys.toSeq.foreach { case (ns, t) => seal(ns, t) }
      writeLock.synchronized {
        bufferedPerTable.filterInPlace((k, _) =>
          buffer.partitions(k._1, k._2) > 0)
        // truncate only if no new writes landed since the seals. The
        // sinks' high-water marks ride as carry-over records: the WAL
        // writes AND FLUSHES them into the fresh segment BEFORE any
        // bracket-carrying old segment is deleted — a crash anywhere
        // leaves either the old brackets (replay re-derives the same
        // marks) or the durable hwm records, never neither.
        if (buffer.isEmpty)
          wal.truncateClosed(streamHwm.toSeq.sortBy(_._1).map {
            case (sink, bid) => graft.core.StreamBatch.hwm(sink, bid,
              streamQid.getOrElse(sink, ""))
          })
      }
    }

  /** Compact the table's tier files (one file per day) while holding
    * the write lock, so no concurrent seal can append files that the
    * rewrite would drop. `clusterBy` sorts rows within each day on the
    * given tag columns so row-group stats prune selective tag
    * predicates (see ParquetTier.compact).
    */
  def compact(namespace: String, table: String,
      clusterBy: Seq[String] = Nil): Unit =
    writeLock.synchronized {
      tier.foreach(_.compact(spark, namespace, table, clusterBy))
      // the compacted files are new to the index; re-cover them now
      // so file skipping has no post-compaction blind window
      maintainBloomIndexes(namespace, table)
      // ...and drop the rewritten originals' entries from the
      // persisted index (memory + jsonl), so the index tracks the
      // manifest instead of accumulating dead files forever
      pruneIndexes(namespace, table)
    }

  /** Expire tier day-partitions older than `beforeDay` (exclusive,
    * "yyyy-MM-dd") under the write lock — no concurrent seal can
    * publish into a manifest the expiry is about to flip. Buffered
    * (unsealed) rows are untouched: retention is a tier policy, and
    * sealing still ages them out on the next pass. Returns files
    * dropped (0 without a tier).
    */
  def expire(namespace: String, table: String, beforeDay: String): Int =
    writeLock.synchronized {
      val dropped =
        tier.map(_.expire(namespace, table, beforeDay)).getOrElse(0)
      // retention GC'd whole day partitions: drop their bloom/zone
      // and rollup partials from the persisted indexes too, or the
      // jsonl grows forever with entries for files that no longer
      // exist (the same hygiene compaction gets)
      if (dropped > 0) pruneIndexes(namespace, table)
      dropped
    }

  /** Post-GC index hygiene: drop bloom/zone and rollup partials for
    * the table's files no longer in its live manifest (memory +
    * persisted jsonl). SCOPED to the table whose manifest changed:
    * the seal path must never stall ingest on a whole-index disk
    * sweep whose useful work is one table's dead entries (the global
    * store.prune() remains for explicit maintenance). Failures are
    * logged, never propagated — pruning is maintenance; a skipped
    * prune costs disk bytes, not correctness (dead entries key files
    * no query will ever list).
    */
  private def pruneIndexes(ns: String, table: String): Unit = {
    for (bs <- valueBlooms)
      try bs.prune(ns, table)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bloom-prune] skipped: ${e.getMessage}") }
    for (rs <- rollups)
      try rs.prune(ns, table)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[rollup-prune] skipped: ${e.getMessage}") }
  }

  /** Published tier manifest versions for a table, oldest first, with
    * file counts — the discovery call behind `version:`-pinned
    * (time-travel) queries. Empty without a tier or before the first
    * seal. Read-only: no write lock (manifest publishes are atomic
    * renames, so a concurrent seal yields either the old or the new
    * list, never a torn one).
    */
  def tierVersions(namespace: String, table: String): Seq[(Long, Int)] =
    tier.map(_.versions(namespace, table)).getOrElse(Nil)

  /** Export a table's pinned manifest version (None = current) as a
    * self-contained snapshot directory (see
    * [[graft.tier.ParquetTier.exportSnapshot]]). Buffered (unsealed)
    * rows are NOT included — a snapshot is of the durable tier; run
    * [[checkpoint]] first when the RAM tail must ride along. No
    * engine lock: the pin makes the copy consistent against
    * concurrent seals/compactions.
    */
  def exportSnapshot(namespace: String, table: String,
      version: Option[Long], dest: File): Int =
    tier.getOrElse(throw new IllegalStateException(
      "snapshot export requires a parquet tier"))
      .exportSnapshot(namespace, table, version, dest)

  /** Import a snapshot directory as (namespace, table) — fresh-table
    * strict, CRC-verified, one atomic manifest flip (see
    * [[graft.tier.ParquetTier.importSnapshot]]). Under the write
    * lock: no concurrent seal may create the table mid-import. The
    * configured bloom/zone indexes are rebuilt over the imported
    * files (derived artifacts travel as data, never as state).
    * Returns the published manifest version.
    */
  def importSnapshot(namespace: String, table: String,
      src: File): Long = writeLock.synchronized {
    val t = tier.getOrElse(throw new IllegalStateException(
      "snapshot import requires a parquet tier"))
    require(buffer.partitions(namespace, table) == 0,
      s"import target $namespace/$table already holds buffered rows")
    val v = t.importSnapshot(namespace, table, src)
    maintainBloomIndexes(namespace, table)
    v
  }

  /** Export EVERY tier table of a namespace (current versions) into
    * `dest/<table>/` — the migration/backup unit. Returns
    * (table, files) per table, alphabetical.
    */
  def exportNamespace(namespace: String,
      dest: File): Seq[(String, Int)] = {
    val t = tier.getOrElse(throw new IllegalStateException(
      "snapshot export requires a parquet tier"))
    t.tables(namespace).toSeq.sorted.map { table =>
      table -> exportSnapshot(namespace, table, None,
        new File(dest, table))
    }
  }

  /** Import every table snapshot under `src/<table>/` (the
    * [[exportNamespace]] layout) into this engine's namespace.
    * Each table import is individually atomic; a failure part-way
    * leaves already-imported tables published (re-running after
    * fixing the snapshot refuses them as non-fresh — drop and redo,
    * or import the missing tables one by one). Returns
    * (table, version) per imported table.
    */
  def importNamespace(namespace: String,
      src: File): Seq[(String, Long)] = {
    val subdirs = Option(src.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        new File(d, "_snapshot.json").isFile)
      .sortBy(_.getName)
    require(subdirs.nonEmpty, s"no table snapshots under $src")
    subdirs.toSeq.map(d =>
      d.getName -> importSnapshot(namespace, d.getName, d))
  }

  /** Run `sql` against namespace `namespace`. None = unknown
    * namespace/table → HTTP 404 (reference lynx.rs:144-148).
    *
    * `asOfVersion` = time travel (engine extension): every referenced
    * table reads exactly as its tier manifest `version` published it —
    * buffered (unsealed) rows are excluded by definition, the result
    * cache is bypassed, and a version that was never published for a
    * referenced table (or whose data files GC already removed) fails
    * with IllegalArgumentException rather than serving a partial scan
    * (the [[graft.tier.ParquetTier.readAt]] contract, lifted to SQL).
    */
  def query(namespace: String, sql: String,
      asOfVersion: Option[Long] = None): Option[QueryResult] = {
    val parsed = LynxEngine.parse(spark, sql)
    // EXPLAIN <select> is allowed as an ops nicety (improvement over
    // the reference's SELECT-only surface): every gate below runs on
    // the EXPLAINED plan, so EXPLAIN cannot smuggle DML/banned
    // functions past the checks, and plan text is never cached
    val (plan, isExplain) = parsed match {
      case ec: org.apache.spark.sql.execution.command.ExplainCommand =>
        (ec.logicalPlan, true)
      case p => (p, false)
    }
    // expression-level escape hatches: reflect()/java_method() invoke
    // arbitrary public static JVM methods (env/property exfiltration)
    // — a wider surface than the reference's DataFusion exposes; deny
    // them up front (untrusted SQL reaches this path over HTTP)
    val banned = LynxEngine.forbiddenCalls(plan)
    if (banned.nonEmpty)
      throw new IllegalArgumentException(
        s"function not allowed: ${banned.head}")
    val tables = LynxEngine.referencedTables(plan)
    // day-partition pruning: derive per-table UTC-day bounds from the
    // WHERE clause and read only matching day= directories of each
    // table's tier (the pruning the reference lacks, SURVEY.md §4.1).
    // Single-table queries use the richer single-relation analysis
    // (Project pass-through); joins prune each side independently.
    val dayBoundsByTable: Map[String, (String, String)] =
      if (tables.size == 1)
        LynxEngine.dayBounds(plan) match {
          case Some(b) => Map(tables.head.toLowerCase -> b)
          case None => Map.empty
        }
      else LynxEngine.dayBoundsPerTable(plan)
    // string-equality literals per table: feeds BloomStore file
    // skipping when an index exists for the (table, column)
    val bloomsActive =
      tier.isDefined && valueBlooms.exists(_.hasAnyIndex)
    val eqByTable: Map[String, Seq[(String, Seq[String])]] =
      if (bloomsActive) LynxEngine.eqLiteralsPerTable(plan) else Map.empty
    // string-range bounds per table: feeds the zone-map half of the
    // same per-file index
    val rangesByTable
        : Map[String, Seq[(String, Option[String], Option[String])]] =
      if (bloomsActive) LynxEngine.strRangesPerTable(plan) else Map.empty
    // typed numeric zone bounds (try_cast comparisons only — see
    // numRangesPerTable's soundness note)
    val (longRangesByTable, dblRangesByTable) =
      if (bloomsActive) LynxEngine.numRangesPerTable(plan)
      else (Map.empty[String,
        Seq[(String, Option[Long], Option[Long])]],
        Map.empty[String, Seq[(String, Option[Double], Option[Double])]])
    // as-of reads bypass the cache: they are rare ops reads over
    // immutable manifests, not worth a key-shape extension
    val cacheable = resultCacheEntries > 0 && !isExplain &&
      asOfVersion.isEmpty && !LynxEngine.cacheUnsafe(plan)
    // buffer snapshot + pinned tier snapshots under the write lock:
    // atomic vs seal(), so rows are visible exactly once — and the
    // pins (not just the trash grace period) keep a concurrent
    // compaction from deleting the files this query is reading.
    // Only the tables the SQL references are pinned (a namespace can
    // hold hundreds of tables; pinning them all made every query's
    // lock hold time and release-side GC scan linear in namespace
    // size), and the acquisition loop releases what it already pinned
    // if a later snapshotPinned() throws — otherwise those pins would
    // leak for the life of the process and block trash GC forever.
    // Only the in-memory pin is taken under the lock; the lease FILE
    // (a disk write) happens after the lock is dropped — the pin
    // already blocks in-process GC, and a foreign compactor owes the
    // trash grace period across the sub-millisecond gap.
    val (snapshot, pinned, tierHasNs, cacheKey) = writeLock.synchronized {
      // a time-travel read sees ONLY what the pinned manifest version
      // published: unsealed buffer rows are by definition newer
      val bufTables = buffer.tables(namespace)
      val mem = if (asOfVersion.isDefined) None else bufTables
      val (acq, hasNs) = tier match {
        case None =>
          if (asOfVersion.isDefined)
            throw new IllegalArgumentException(
              "time travel requires a parquet tier")
          (Map.empty[String, graft.tier.TierSnapshot], false)
        case Some(t) =>
          // a pathy "namespace" must never reach the tier as a path
          // (it would list arbitrary host dirs); it can only exist as
          // a buffer key, so the tier simply does not have it
          val present =
            if (isStorableName(namespace)) t.tables(namespace)
            else Set.empty[String]
          val acquired =
            scala.collection.mutable.Map.empty[String, graft.tier.TierSnapshot]
          try
            for (name <- tables) asOfVersion match {
              case None if present(name) =>
                acquired(name) = t.snapshotPinned(namespace, name)
              case Some(v) if present(name) =>
                acquired(name) = t.snapshotPinnedAt(namespace, name, v)
                  .getOrElse(throw new IllegalArgumentException(
                    s"version $v was never published for table $name"))
              case Some(v)
                  if bufTables.exists(_.contains(name)) =>
                // the table exists (buffered, never sealed) — an
                // as-of read must say "no such version", not 404 as
                // if the table itself were unknown
                throw new IllegalArgumentException(
                  s"version $v was never published for table $name")
              case _ => // fully unknown table → the 404 path below
            }
          catch {
            case e: Throwable =>
              acquired.values.foreach(t.release)
              throw e
          }
          (acquired.toMap, present.nonEmpty)
      }
      // the cache key reads buffer revisions INSIDE the lock, atomic
      // with the snapshot — a write racing this query either bumps the
      // revision before the key is built (miss, fresh read) or lands
      // after the snapshot (invisible to this query AND this key).
      // `cacheable` was computed before the lock: the plan walk is a
      // pure function and must not extend the write-lock hold time
      val key: AnyRef =
        if (!cacheable) null
        else (namespace, sql, tables.toSeq.sorted.map(t =>
          (t, buffer.revision(namespace, t),
            acq.get(t).map(_.version).getOrElse(-1L))))
      (mem, acq, hasNs, key)
    }
    if (cacheKey != null) {
      val hit = resultCache.synchronized(Option(resultCache.get(cacheKey)))
      hit match {
        case Some(r) =>
          tier.foreach(t => pinned.values.foreach(t.release))
          resultCacheHits.incrementAndGet()
          return Some(r)
        case None =>
      }
    }
    // lease() is documented never-throwing, but anything escaping this
    // loop (OOM, runtime bug) would otherwise leak every pin until the
    // pin-age backstop — release defensively, and release the LEASED
    // snapshot for entries already leased (releasing the pre-lease pin
    // would strand their lease files on disk until lease expiry)
    val tierSnaps = tier match {
      case None => pinned
      case Some(t) =>
        val leased = scala.collection.mutable.Map.empty[String,
          graft.tier.TierSnapshot]
        try {
          pinned.foreach { case (k, v) => leased(k) = t.lease(v) }
          leased.toMap
        } catch {
          case e: Throwable =>
            pinned.foreach { case (k, v) =>
              t.release(leased.getOrElse(k, v))
            }
            throw e
        }
    }
    try {
      if (snapshot.isEmpty && !tierHasNs) return None
      // the readAt contract at the SQL layer: files superseded before
      // this query pinned the version may be physically gone — fail
      // whole, never serve a partial scan
      for (v <- asOfVersion; (name, snap) <- tierSnaps)
        if (!snap.files.forall(p => new File(p).isFile))
          throw new IllegalArgumentException(
            s"version $v of table $name is past the GC window")

      val session = spark.newSession()
      // no file-path relations for untrusted SQL (SELECT * FROM
      // parquet.`/path` would read arbitrary host files)
      session.conf.set("spark.sql.runSQLOnFiles", "false")
      // per-query sessions get a fresh function registry; re-register
      // the native graft functions so the SQL surface always has them
      // (sessions built with GraftExtensions inherit them anyway —
      // this covers engines hosted on a plain session)
      graft.functions.GraftFunctions.register(session)
      val inMem = snapshot.getOrElse(
        TreeMap.empty[String, TreeMap[String, MeasurementsView]])
      for (t <- tables) {
        val mem: Option[DataFrame] =
          inMem.get(t).map(LynxEngine.toDataFrame(session, _))
        val sealedDf: Option[DataFrame] =
          tierSnaps.get(t).filter(_.files.nonEmpty).flatMap { snap =>
            // bloom file skipping: drop manifest files whose value
            // blooms exclude every harvested `col = 'literal'`
            // conjunct for this table. If everything is skipped, keep
            // one file so the read still yields the schema — its rows
            // provably fail the predicate and the SQL filter removes
            // them (the ParquetTier.readFiles day-prune convention).
            val bloomed = valueBlooms match {
              case Some(bs) =>
                val afterEq = eqByTable.getOrElse(t.toLowerCase, Nil)
                  .foldLeft(snap.files) { case (fs, (c, vs)) =>
                    bs.skipFilesAny(namespace, t, c, vs, fs)
                  }
                val afterStr = rangesByTable.getOrElse(t.toLowerCase, Nil)
                  .foldLeft(afterEq) { case (fs, (c, lo, hi)) =>
                    bs.skipFilesRange(namespace, t, c, lo, hi, fs)
                  }
                val afterLong = longRangesByTable
                  .getOrElse(t.toLowerCase, Nil)
                  .foldLeft(afterStr) { case (fs, (c, lo, hi)) =>
                    bs.skipFilesLongRange(namespace, t, c, lo, hi, fs)
                  }
                dblRangesByTable.getOrElse(t.toLowerCase, Nil)
                  .foldLeft(afterLong) { case (fs, (c, lo, hi)) =>
                    bs.skipFilesDoubleRange(namespace, t, c, lo, hi, fs)
                  }
              case None => snap.files
            }
            val toRead =
              if (bloomed.nonEmpty) bloomed else snap.files.take(1)
            tier.map(_.readFiles(session, namespace, t, toRead,
              dayBoundsByTable.get(t.toLowerCase)))
          }
        val df = (mem, sealedDf) match {
          case (Some(m), Some(sd)) =>
            m.unionByName(sd, allowMissingColumns = true)
          case (Some(m), None) => m
          case (None, Some(sd)) => sd
          case (None, None) => return None // table unknown → 404
        }
        // Deterministic column order regardless of tier/buffer mix:
        // timestamp, value, then tags sorted (SURVEY.md §1.4 deviation).
        val ordered = Seq("timestamp", "value") ++
          df.columns.filterNot(Set("timestamp", "value")).sorted
        df.select(ordered.map(org.apache.spark.sql.functions.col): _*)
          .createOrReplaceTempView(t)
      }
      val df = session.sql(sql)
      // The reference collects unboundedly (lynx.rs:142); at scale a
      // `SELECT * FROM big` over the tier would OOM the driver, so the
      // engine can cap the materialized result (documented deviation:
      // an over-limit query fails cleanly instead of ballooning).
      val rows =
        if (maxResultRows == Int.MaxValue) df.collect().toSeq
        else {
          val r = df.limit(maxResultRows + 1).collect()
          if (r.length > maxResultRows)
            throw new IllegalStateException(
              s"query result exceeds the $maxResultRows-row cap; " +
                "add a LIMIT or raise LYNX_MAX_RESULT_ROWS")
          r.toSeq
        }
      // EXPLAIN text embeds absolute scan locations (tier/WAL roots) —
      // host filesystem layout must not cross the untrusted HTTP
      // boundary, so redact the roots (namespace/table-relative layout
      // under them is the caller's own data and stays visible)
      val outRows =
        if (!isExplain) rows
        else {
          val roots = tier.map(_.rootPath).toSeq :+ walDir.getAbsolutePath
          rows.map { r =>
            Row.fromSeq(r.toSeq.map {
              case s: String =>
                roots.foldLeft(s)((acc, p) => acc.replace(p, "<data-dir>"))
              case v => v
            })
          }
        }
      val result = QueryResult(df.schema, outRows)
      if (cacheKey != null && rows.length <= MaxCachedResultRows)
        resultCache.synchronized { resultCache.put(cacheKey, result); () }
      Some(result)
    } finally tier.foreach(t => tierSnaps.values.foreach(t.release))
  }
}

object LynxEngine {

  /** A write refused because its namespace is migration-fenced — the
    * HTTP layer maps this to 422 + Retry-After (transient for a
    * racing writer: retry lands on the new owner once the router
    * flips), never a generic 500.
    */
  final class NamespaceFencedException(val namespace: String)
      extends IllegalStateException(
        s"namespace '$namespace' is write-fenced (migration in " +
          "progress) — retry shortly")

  /** Gatekeeper (reference parse_table_name, lynx.rs:153-172): parse
    * the SQL with Spark's parser, reject DML/DDL, and collect every
    * base relation the query reads. The reference takes only the
    * first FROM table and rejects CTEs/derived tables; we accept them
    * (documented improvement, SURVEY.md §2B).
    */
  def parse(spark: SparkSession, sql: String): LogicalPlan =
    try spark.sessionState.sqlParser.parsePlan(sql)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"failed to parse query: ${e.getMessage}")
    }

  def referencedTables(spark: SparkSession, sql: String): Seq[String] =
    referencedTables(parse(spark, sql))

  def referencedTables(plan: LogicalPlan): Seq[String] = {
    // Reject anything that is not a pure query. The Command trait
    // covers DDL including CREATE TABLE ... AS SELECT (which contains
    // an UnresolvedRelation and would slip past a node-name
    // blacklist); ParsedStatement covers INSERT and other unresolved
    // DML statements.
    if (plan.exists {
        case _: org.apache.spark.sql.catalyst.plans.logical.Command => true
        case _: org.apache.spark.sql.catalyst.plans.logical.ParsedStatement
          => true
        case _: InsertIntoStatement => true
        case _ => false
      })
      throw new IllegalArgumentException(
        "only SELECT queries are supported")
    // CTE definitions live in UnresolvedWith.cteRelations, which are
    // not `children` — walk them explicitly. CTE aliases themselves
    // are not base tables.
    def walk(p: LogicalPlan): (Seq[String], Seq[String]) = {
      val withs = p.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith => w
      }
      val cteNames = withs.flatMap(_.cteRelations.map(_._1))
      // descend into CTE definitions (not `children`) and into
      // subquery expressions (IN/EXISTS/scalar subqueries live inside
      // expressions, invisible to plan.collect)
      val nested = (withs.flatMap(_.cteRelations.map(_._2)) ++
        p.flatMap(_.expressions.flatMap(_.collect {
          case sub: org.apache.spark.sql.catalyst.expressions
            .SubqueryExpression => sub.plan
        }))).map(walk)
      val rels = p.collect {
        case r: UnresolvedRelation => r.multipartIdentifier.last
      }
      (rels ++ nested.flatMap(_._1), cteNames ++ nested.flatMap(_._2))
    }
    val (rels, cteNames) = walk(plan)
    val tables = rels.distinct.filterNot(cteNames.toSet.contains)
    if (tables.isEmpty)
      throw new IllegalArgumentException(
        "only basic 'SELECT .. FROM' style queries are supported")
    tables
  }

  /** Expression-level deny list for the untrusted-SQL path. Spark's
    * reflect/java_method call arbitrary public static JVM methods —
    * System.getenv, System.getProperty, … — which the reference's
    * DataFusion surface simply doesn't have; a gatekeeper that only
    * blocks DDL/DML would let them through inside a SELECT.
    */
  private val BannedFunctions = Set("reflect", "java_method")

  /** Functions whose value depends on when/where the query runs —
    * caching a result containing one would freeze it. The engine's
    * result cache skips any query calling these (conservative
    * name-based check on the unresolved plan).
    */
  private val NondeterministicFunctions = Set(
    "now", "current_timestamp", "current_date", "current_timezone",
    "localtimestamp", "curdate", "current_localdatetime", "unix_timestamp",
    "rand", "random", "randn", "uuid", "shuffle", "monotonically_increasing_id",
    "spark_partition_id", "input_file_name", "rand_str", "uniform",
    "session_user", "current_user", "user", "version")

  /** Names of banned function calls anywhere in the plan, including
    * inside CTE definitions and subquery expressions (both invisible
    * to a plain plan traversal).
    */
  def forbiddenCalls(plan: LogicalPlan): Seq[String] =
    callsMatching(plan, BannedFunctions, matchAttributes = false)

  /** True when the query calls any time/run-dependent function — such
    * results must not enter the result cache. Paren-less temporal
    * keywords (`current_date`, `current_timestamp`, ...) do NOT parse
    * as UnresolvedFunction: under the default parser conf they arrive
    * as UnresolvedAttribute (resolved later by literal-function
    * resolution), under ANSI-reserved-keywords as CurrentDate/
    * CurrentTimestamp expression nodes — both are matched here too. A
    * tag column literally named `current_date` loses caching, which is
    * the safe direction.
    */
  def cacheUnsafe(plan: LogicalPlan): Boolean =
    callsMatching(plan, NondeterministicFunctions,
      matchAttributes = true).nonEmpty

  private def callsMatching(plan: LogicalPlan, names: Set[String],
      matchAttributes: Boolean): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{Expression,
      SubqueryExpression}
    def fromExpr(e: Expression): Seq[String] = {
      val here = e match {
        case f: UnresolvedFunction
          if names(f.nameParts.last.toLowerCase) =>
          Seq(f.nameParts.last.toLowerCase)
        // paren-less temporal keywords: UnresolvedAttribute under the
        // default parser conf (literal-function resolution happens
        // post-parse), direct expression nodes (CurrentDate, Now, ...)
        // under ANSI reserved keywords. ONLY for the cache-safety
        // check: the banned-function gate must not reject a user
        // column that merely shares a banned function's name (the
        // attribute case would turn `SELECT reflect FROM t` into a
        // 400 for data already written with a `reflect` tag)
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if matchAttributes && names(a.nameParts.last.toLowerCase) =>
          Seq(a.nameParts.last.toLowerCase)
        case other if matchAttributes && {
          val cls = other.getClass.getSimpleName.toLowerCase.stripSuffix("$")
          names.exists(n => n.replace("_", "") == cls)
        } =>
          Seq(other.getClass.getSimpleName.toLowerCase.stripSuffix("$"))
        case _ => Nil
      }
      val nested = e match {
        case s: SubqueryExpression => fromPlan(s.plan)
        case _ => Nil
      }
      here ++ nested ++ e.children.flatMap(fromExpr)
    }
    def fromPlan(p: LogicalPlan): Seq[String] = {
      val ctePlans = p.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
          w.cteRelations.map(_._2)
      }.flatten
      p.flatMap(_.expressions.flatMap(fromExpr)) ++
        ctePlans.flatMap(fromPlan)
    }
    fromPlan(plan).distinct
  }

  /** Inline (non-recursive) WITH definitions so a CTE-wrapped
    * time-range query still exposes its Filter-over-scan shape to
    * [[dayBounds]]. Later CTEs may reference earlier ones; a CTE
    * name shadows an engine table within the substituted scope,
    * which matches SQL resolution order.
    */
  private def inlineCtes(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith
    def substitute(p: LogicalPlan,
        defs: Map[String, LogicalPlan]): LogicalPlan =
      if (defs.isEmpty) p
      else p.transformUp {
        case r: UnresolvedRelation if r.multipartIdentifier.size == 1 &&
            defs.contains(r.multipartIdentifier.head.toLowerCase) =>
          defs(r.multipartIdentifier.head.toLowerCase)
      }
    plan.transformUp {
      case w: UnresolvedWith if !w.allowRecursion =>
        var defs = Map.empty[String, LogicalPlan]
        w.cteRelations.foreach { case (name, sub, _) =>
          defs += name.toLowerCase -> substitute(sub.child, defs)
        }
        substitute(w.child, defs)
    }
  }

  /** Conservative UTC-day bounds for tier partition pruning: applies
    * ONLY to a single-relation query (after CTE inlining) with no
    * subquery expressions. Bounds come from the conjuncts of every
    * Filter whose path down to the scan provably preserves the raw
    * `timestamp` column (aliases, other Filters, Distinct, Sort,
    * and Projects that pass `timestamp` through unrenamed) —
    * so `WITH t AS (... WHERE timestamp >= X) SELECT ... FROM t`
    * and filters split across a derived table still prune. Returns
    * inclusive (loDay, hiDay); a bound that can't be derived falls
    * back to the open range. Never over-prunes: the SQL re-applies
    * the full predicate after the day filter, and any shape this
    * analysis can't prove is left unpruned.
    */
  def dayBounds(rawPlan: LogicalPlan): Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical
    import org.apache.spark.sql.types.{StringType, TimestampType}
    val plan = inlineCtes(rawPlan)
    val simple =
      plan.collect { case r: UnresolvedRelation => r }.size == 1 &&
      !plan.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[SubqueryExpression])))
    if (!simple) return None
    // `timestamp` below this node is still the scan's raw column iff
    // every node on the path to the relation passes it through
    // untransformed and nothing else is renamed to `timestamp`
    def isTsName(s: String): Boolean = s.equalsIgnoreCase("timestamp")
    def preservesTs(p: LogicalPlan): Boolean = p match {
      case _: UnresolvedRelation => true
      case a: logical.SubqueryAlias => preservesTs(a.child)
      case f: logical.Filter => preservesTs(f.child)
      // NOT Limit: a filter above a LIMIT can't push below it —
      // pruning the scan would change which rows the limit keeps.
      // Distinct/Sort commute with a row-level predicate, so rows a
      // pruned scan drops are exactly rows the filter drops anyway.
      case d: logical.Distinct => preservesTs(d.child)
      case s: logical.Sort => preservesTs(s.child)
      case pr: logical.Project =>
        val passesThrough = pr.projectList.exists {
          case _: org.apache.spark.sql.catalyst.analysis.UnresolvedStar =>
            true
          case a: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute => isTsName(a.nameParts.last)
          case Alias(c: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute, name) =>
            isTsName(name) && isTsName(c.nameParts.last)
          case _ => false
        }
        val renamesOther = pr.projectList.exists {
          case Alias(c, name) if isTsName(name) => c match {
            case u: org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute => !isTsName(u.nameParts.last)
            case _ => true
          }
          case _ => false
        }
        passesThrough && !renamesOther && preservesTs(pr.child)
      case _ => false
    }
    val scanFilters = plan.collect {
      case f: logical.Filter if preservesTs(f.child) => f.condition
    }
    if (scanFilters.isEmpty) return None
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def isTs(e: Expression): Boolean = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.last.equalsIgnoreCase("timestamp")
      case Cast(c, _, _, _) => isTs(c)
      case _ => false
    }
    def micros(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case Literal(s, StringType) =>
        val str = String.valueOf(s)
        val full = if (str.length == 10) str + " 00:00:00" else str
        try Some(java.time.LocalDateTime.parse(full.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
        catch { case _: Exception => None }
      case Cast(c, _, _, _) => micros(c)
      case _ => None
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tighten(b: Option[Long], v: Long, isLo: Boolean): Option[Long] =
      Some(b.fold(v)(prev => if (isLo) math.max(prev, v)
        else math.min(prev, v)))
    scanFilters.flatMap(conjuncts).foreach {
      case GreaterThanOrEqual(a, l) if isTs(a) =>
        micros(l).foreach(v => lo = tighten(lo, v, isLo = true))
      case GreaterThan(a, l) if isTs(a) =>
        micros(l).foreach(v => lo = tighten(lo, v, isLo = true))
      case LessThanOrEqual(a, l) if isTs(a) =>
        micros(l).foreach(v => hi = tighten(hi, v, isLo = false))
      case LessThan(a, l) if isTs(a) =>
        micros(l).foreach(v => hi = tighten(hi, v, isLo = false))
      case EqualTo(a, l) if isTs(a) =>
        micros(l).foreach { v =>
          lo = tighten(lo, v, isLo = true)
          hi = tighten(hi, v, isLo = false)
        }
      // literal-first orientation
      case GreaterThanOrEqual(l, a) if isTs(a) =>
        micros(l).foreach(v => hi = tighten(hi, v, isLo = false))
      case GreaterThan(l, a) if isTs(a) =>
        micros(l).foreach(v => hi = tighten(hi, v, isLo = false))
      case LessThanOrEqual(l, a) if isTs(a) =>
        micros(l).foreach(v => lo = tighten(lo, v, isLo = true))
      case LessThan(l, a) if isTs(a) =>
        micros(l).foreach(v => lo = tighten(lo, v, isLo = true))
      case _ =>
    }
    if (lo.isEmpty && hi.isEmpty) None
    else Some((
      lo.map(graft.buffer.PartitionKey.fromMicros).getOrElse("0000-01-01"),
      hi.map(graft.buffer.PartitionKey.fromMicros).getOrElse("9999-12-31")))
  }

  /** Shared conservative Filter-conjunct walk behind the per-table
    * pruning harvests ([[dayBoundsPerTable]], [[eqLiteralsPerTable]],
    * [[strRangesPerTable]]) — ONE copy of the soundness-critical
    * attribution logic. For every Filter of the CTE-inlined plan it
    * invokes `visit(conjunct, resolveParts)`, where `resolveParts`
    * maps an attribute's lowercased name parts to (table, column)
    * only when the attribute provably reads that table's raw scan
    * column:
    *  - unqualified name: only when the Filter's subtree holds
    *    exactly one base relation reachable through row-preserving
    *    nodes (a derived table's inner WHERE, after CTE inlining);
    *  - qualified `a.col`: when binding `a` resolves to exactly one
    *    relation reachable from the Filter through row-preserving
    *    nodes only — Join, Filter, Sort, Distinct, and SubqueryAlias
    *    directly over a relation. NOT Project / Aggregate / Window /
    *    Generate / Limit: their outputs may not be the scan column,
    *    or their row sets are cardinality-sensitive (the
    *    [[dayBounds]] Limit rule).
    *
    * Join ON conditions are never harvested: an outer join's ON
    * predicate on the PRESERVED side must not drop scan rows (the
    * row survives null-extended). Filter conjuncts above any join
    * type are safe as long as the caller harvests only
    * null-rejecting predicates — a null-extended row fails the
    * post-join predicate exactly like the pruned scan row would.
    *
    * Returns None when the plan is gated (any subquery expression —
    * correlation could smuggle outer references past the walk);
    * otherwise the per-table relation reference counts. Callers MUST
    * drop tables referenced more than once (self-joins, UNION arms:
    * all references share one registered view, so per-reference
    * predicates could over-prune the shared scan).
    */
  private def harvestConjuncts(rawPlan: LogicalPlan)(
      visit: (org.apache.spark.sql.catalyst.expressions.Expression,
        Seq[String] => Option[(String, String)]) => Unit)
      : Option[Map[String, Int]] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical
    val plan = inlineCtes(rawPlan)
    if (plan.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[SubqueryExpression])))) return None
    def relName(r: UnresolvedRelation): Option[String] =
      if (r.multipartIdentifier.size == 1)
        Some(r.multipartIdentifier.head.toLowerCase)
      else None
    // (binding → table) pairs reachable from p through row-preserving
    // nodes only; anything else ends the walk (conservative)
    def safeRels(p: LogicalPlan): Seq[(String, String)] = p match {
      case r: UnresolvedRelation =>
        relName(r).map(n => n -> n).toSeq
      case sa: logical.SubqueryAlias => sa.child match {
        case r: UnresolvedRelation =>
          relName(r).map(n => sa.alias.toLowerCase -> n).toSeq
        case _ => Nil // derived table: its inner Filters prune themselves
      }
      case j: logical.Join => safeRels(j.left) ++ safeRels(j.right)
      case f: logical.Filter => safeRels(f.child)
      case s: logical.Sort => safeRels(s.child)
      case d: logical.Distinct => safeRels(d.child)
      case _ => Nil
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    plan.foreach {
      case f: logical.Filter =>
        val rels = safeRels(f.child)
        val nRels = f.child.collect {
          case r: UnresolvedRelation => r }.size
        def resolveParts(parts: Seq[String])
            : Option[(String, String)] = {
          val colName = parts.last
          if (parts.size == 1)
            // unqualified: unambiguous only with ONE relation below
            if (nRels == 1 && rels.size == 1)
              Some(rels.head._2 -> colName)
            else None
          else if (parts.size == 2) {
            val hits = rels.filter(_._1 == parts.head)
            if (hits.size == 1) Some(hits.head._2 -> colName)
            else None
          } else None
        }
        conjuncts(f.condition).foreach(c => visit(c, resolveParts))
      case _ =>
    }
    Some(plan.collect {
      case r: UnresolvedRelation => relName(r) }
      .flatten.groupBy(identity).view.mapValues(_.size).toMap)
  }

  /** Lowercased name parts of a bare column attribute. No Cast
    * unwrap: the bloom/zone index hashed and bounded the column's
    * RAW string form, and a cast changes what the predicate compares.
    */
  private def colParts(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[Seq[String]] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(a.nameParts.map(_.toLowerCase))
    case _ => None
  }

  /** A plain non-null string literal. Typed comparisons (`value = 3`)
    * never qualify: type coercion can match rows whose string form
    * differs from the literal, so pruning on them would be unsound.
    */
  private def strLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[String] = e match {
    case org.apache.spark.sql.catalyst.expressions
      .Literal(s, StringType) if s != null => Some(String.valueOf(s))
    case _ => None
  }

  /** PER-TABLE conservative day bounds — [[dayBounds]] extended past
    * single-relation queries: without it a join query scans ALL day
    * partitions of EVERY table however tight its per-table timestamp
    * predicates, and multi-table queries are exactly where full-tier
    * scans hurt most (fact-to-fact joins over years of days).
    * Attribution, ON-clause, and shared-view rules all live in
    * [[harvestConjuncts]]; this visitor only recognizes the
    * timestamp comparison shapes (all null-rejecting).
    */
  def dayBoundsPerTable(rawPlan: LogicalPlan)
      : Map[String, (String, String)] = {
    import org.apache.spark.sql.catalyst.expressions._
    def tsParts(e: Expression): Option[Seq[String]] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.last.equalsIgnoreCase("timestamp") =>
        Some(a.nameParts.map(_.toLowerCase))
      case Cast(c, _, _, _) => tsParts(c)
      case _ => None
    }
    def micros(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case Literal(s, StringType) =>
        val str = String.valueOf(s)
        val full = if (str.length == 10) str + " 00:00:00" else str
        try Some(java.time.LocalDateTime.parse(full.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
        catch { case _: Exception => None }
      case Cast(c, _, _, _) => micros(c)
      case _ => None
    }
    val lo = scala.collection.mutable.Map.empty[String, Long]
    val hi = scala.collection.mutable.Map.empty[String, Long]
    def tighten(m: scala.collection.mutable.Map[String, Long],
        t: String, v: Long, isLo: Boolean): Unit =
      m(t) = m.get(t).fold(v)(prev =>
        if (isLo) math.max(prev, v) else math.min(prev, v))
    val refCounts = harvestConjuncts(rawPlan) { (c, resolveParts) =>
      def resolve(e: Expression): Option[String] =
        tsParts(e).flatMap(resolveParts).map(_._1)
      c match {
        case GreaterThanOrEqual(a, l) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(lo, t, v, isLo = true)
        case GreaterThan(a, l) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(lo, t, v, isLo = true)
        case LessThanOrEqual(a, l) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(hi, t, v, isLo = false)
        case LessThan(a, l) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(hi, t, v, isLo = false)
        case EqualTo(a, l) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l)) {
            tighten(lo, t, v, isLo = true)
            tighten(hi, t, v, isLo = false)
          }
        // literal-first orientation flips the bound direction
        case GreaterThanOrEqual(l, a) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(hi, t, v, isLo = false)
        case GreaterThan(l, a) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(hi, t, v, isLo = false)
        case LessThanOrEqual(l, a) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(lo, t, v, isLo = true)
        case LessThan(l, a) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l))
            tighten(lo, t, v, isLo = true)
        case EqualTo(l, a) if resolve(a).isDefined =>
          for (t <- resolve(a); v <- micros(l)) {
            tighten(lo, t, v, isLo = true)
            tighten(hi, t, v, isLo = false)
          }
        case _ =>
      }
    }
    refCounts match {
      case None => Map.empty
      case Some(rc) =>
        (lo.keySet ++ hi.keySet).iterator
          .filter(t => rc.getOrElse(t, 0) == 1)
          .map { t =>
            t -> ((
              lo.get(t).map(graft.buffer.PartitionKey.fromMicros)
                .getOrElse("0000-01-01"),
              hi.get(t).map(graft.buffer.PartitionKey.fromMicros)
                .getOrElse("9999-12-31")))
          }.toMap
    }
  }

  /** Per-table string-equality/IN literals from WHERE conjuncts —
    * `host = 'web-17'` → ("events" → Seq(("host", Seq("web-17")))),
    * `host IN ('a','b')` → ("events" → Seq(("host", Seq("a","b"))))
    * — the predicate harvest behind [[BloomStore]] file skipping
    * (an IN keeps a file when ANY listed value hits its bloom).
    * Attribution and gating rules live in [[harvestConjuncts]];
    * EqualTo/In are null-rejecting, so Filter conjuncts above outer
    * joins remain safe. Only plain string literals qualify — the
    * blooms hash the column's STRING cast, and a typed comparison
    * (`value = 3`) may match rows whose string form differs; an IN
    * with even one non-string element is dropped whole.
    *
    * A conjunct that is an OR of equalities/INs on ONE column —
    * `host = 'a' OR host = 'b'` — harvests as the IN it is
    * semantically (every disjunct is null-rejecting, and a file
    * excluded for all listed values can satisfy no disjunct); a
    * disjunct on a different column, or any non-equality disjunct,
    * voids the whole OR.
    */
  def eqLiteralsPerTable(rawPlan: LogicalPlan)
      : Map[String, Seq[(String, Seq[String])]] = {
    import org.apache.spark.sql.catalyst.expressions._
    val out = scala.collection.mutable
      .Map.empty[String, Vector[(String, Seq[String])]]
    val refCounts = harvestConjuncts(rawPlan) { (c, resolveParts) =>
      def resolve(e: Expression): Option[(String, String)] =
        colParts(e).flatMap(resolveParts)
      def add(t: String, col: String, vs: Seq[String]): Unit =
        out(t) = out.getOrElse(t, Vector.empty) :+ (col -> vs)
      // (table, column, values) of one equality-shaped expression
      def eqShape(e: Expression)
          : Option[((String, String), Seq[String])] = e match {
        case EqualTo(x, y) =>
          (for (tc <- resolve(x); v <- strLit(y)) yield (tc, Seq(v)))
            .orElse(
              for (tc <- resolve(y); v <- strLit(x)) yield (tc, Seq(v)))
        case In(x, list) if list.nonEmpty =>
          // all-or-nothing: one non-string element voids the harvest
          val lits = list.map(strLit)
          if (lits.forall(_.isDefined))
            resolve(x).map(tc => (tc, lits.flatten))
          else None
        case _ => None
      }
      def disjuncts(e: Expression): Seq[Expression] = e match {
        case Or(l, r) => disjuncts(l) ++ disjuncts(r)
        case other => Seq(other)
      }
      c match {
        case o: Or =>
          val shapes = disjuncts(o).map(eqShape)
          if (shapes.forall(_.isDefined)) {
            val ps = shapes.flatten
            val tcs = ps.map(_._1).distinct
            if (tcs.size == 1)
              add(tcs.head._1, tcs.head._2,
                ps.flatMap(_._2).distinct)
          }
        case other =>
          eqShape(other).foreach { case ((t, col), vs) =>
            add(t, col, vs)
          }
      }
    }
    refCounts match {
      case None => Map.empty
      case Some(rc) =>
        out.iterator
          .filter { case (t, _) => rc.getOrElse(t, 0) == 1 }
          .map { case (t, v) => t -> v.distinct.toSeq }
          .toMap
    }
  }

  /** Per-table string-RANGE bounds from WHERE conjuncts —
    * `v >= 'b' AND v < 'c'` → ("t" → Seq(("v", Some("b"), Some("c"))))
    * — the zone-map harvest behind [[BloomStore.skipFilesRange]].
    * Attribution rules and string-literal-only soundness exactly as
    * [[eqLiteralsPerTable]] (both via [[harvestConjuncts]]); `>`/`<`
    * conservatively widen to their inclusive forms (the boundary file
    * is kept), and bounds on the same (table, column) tighten by
    * intersection (max of lows, min of highs), matching AND
    * semantics.
    */
  def strRangesPerTable(rawPlan: LogicalPlan)
      : Map[String, Seq[(String, Option[String], Option[String])]] = {
    import org.apache.spark.sql.catalyst.expressions._
    val lo = scala.collection.mutable.Map.empty[(String, String), String]
    val hi = scala.collection.mutable.Map.empty[(String, String), String]
    val refCounts = harvestConjuncts(rawPlan) { (c, resolveParts) =>
      def resolve(e: Expression): Option[(String, String)] =
        colParts(e).flatMap(resolveParts)
      def low(k: (String, String), v: String): Unit =
        lo(k) = lo.get(k).fold(v)(p => if (v > p) v else p)
      def high(k: (String, String), v: String): Unit =
        hi(k) = hi.get(k).fold(v)(p => if (v < p) v else p)
      c match {
        case GreaterThanOrEqual(a, l) =>
          for (k <- resolve(a); v <- strLit(l)) low(k, v)
          for (k <- resolve(l); v <- strLit(a)) high(k, v)
        case GreaterThan(a, l) =>
          for (k <- resolve(a); v <- strLit(l)) low(k, v)
          for (k <- resolve(l); v <- strLit(a)) high(k, v)
        case LessThanOrEqual(a, l) =>
          for (k <- resolve(a); v <- strLit(l)) high(k, v)
          for (k <- resolve(l); v <- strLit(a)) low(k, v)
        case LessThan(a, l) =>
          for (k <- resolve(a); v <- strLit(l)) high(k, v)
          for (k <- resolve(l); v <- strLit(a)) low(k, v)
        case _ =>
      }
    }
    refCounts match {
      case None => Map.empty
      case Some(rc) =>
        (lo.keySet ++ hi.keySet).iterator
          .filter { case (t, _) => rc.getOrElse(t, 0) == 1 }
          .toSeq
          .groupBy(_._1)
          .map { case (t, ks) =>
            t -> ks.sorted.map { k =>
              (k._2, lo.get(k), hi.get(k))
            }
          }
    }
  }

  /** Per-table TYPED numeric range bounds from WHERE conjuncts —
    * `try_cast(c AS BIGINT) >= 5` → long zone, `try_cast(c AS
    * DOUBLE) < 1.5` → double zone — the harvest behind
    * [[BloomStore.skipFilesLongRange]]/[[BloomStore.skipFilesDoubleRange]].
    * Returns (longRanges, doubleRanges), each per-table like
    * [[strRangesPerTable]].
    *
    * ONLY `try_cast` qualifies, by the same no-coercion soundness
    * discipline that keeps the string harvest literal-typed:
    *  - a bare coercing comparison (`col = 5`) and a plain CAST both
    *    error at runtime on uncastable rows under ANSI — pruning a
    *    file would silently suppress an error the scan would have
    *    raised;
    *  - `try_cast` is total (null on failure), and the zone records
    *    min/max of EXACTLY that projection, so skip decisions match
    *    the predicate's row-level semantics.
    * Narrower integral casts (AS INT/SMALLINT/TINYINT) check against
    * the BIGINT zone — widening is exact, the zone is only ever
    * wider. Long-zone literals must be integral; double-zone
    * literals may be integral, float/double, or decimal (all convert
    * to the same double the coerced comparison uses). `>`/`<` widen
    * to their inclusive forms; bounds on one (table, column)
    * intersect, matching AND semantics.
    */
  def numRangesPerTable(rawPlan: LogicalPlan): (
      Map[String, Seq[(String, Option[Long], Option[Long])]],
      Map[String, Seq[(String, Option[Double], Option[Double])]]) = {
    import org.apache.spark.sql.catalyst.expressions._
    def tryCastParts(e: Expression, long: Boolean)
        : Option[Seq[String]] = e match {
      case c: Cast if c.evalMode == EvalMode.TRY =>
        val okType =
          if (long) c.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }
          else c.dataType == DoubleType
        if (okType) colParts(c.child) else None
      case _ => None
    }
    def longLit(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    def dblLit(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) if !v.isNaN => Some(v)
      case Literal(v: Float, FloatType) if !v.isNaN => Some(v.toDouble)
      case Literal(d: org.apache.spark.sql.types.Decimal, _) =>
        Some(d.toDouble)
      case other => longLit(other).map(_.toDouble)
    }
    val lLo = scala.collection.mutable.Map.empty[(String, String), Long]
    val lHi = scala.collection.mutable.Map.empty[(String, String), Long]
    val dLo = scala.collection.mutable.Map.empty[(String, String), Double]
    val dHi = scala.collection.mutable.Map.empty[(String, String), Double]
    val refCounts = harvestConjuncts(rawPlan) { (c, resolveParts) =>
      def rl(e: Expression): Option[(String, String)] =
        tryCastParts(e, long = true).flatMap(resolveParts)
      def rd(e: Expression): Option[(String, String)] =
        tryCastParts(e, long = false).flatMap(resolveParts)
      def low[T](m: scala.collection.mutable.Map[(String, String), T],
          k: (String, String), v: T)(implicit o: Ordering[T]): Unit =
        m(k) = m.get(k).fold(v)(p => if (o.gt(v, p)) v else p)
      def high[T](m: scala.collection.mutable.Map[(String, String), T],
          k: (String, String), v: T)(implicit o: Ordering[T]): Unit =
        m(k) = m.get(k).fold(v)(p => if (o.lt(v, p)) v else p)
      // double ordering must be Spark's total order (NaN greatest) —
      // NaN literals are filtered at the source, so IEEE vs total
      // order cannot diverge here, but stay explicit
      implicit val dOrd: Ordering[Double] =
        (a, b) => java.lang.Double.compare(a, b)
      def visitSide(a: Expression, l: Expression,
          aIsLowBound: Boolean): Unit = {
        for (k <- rl(a); v <- longLit(l))
          if (aIsLowBound) low(lLo, k, v) else high(lHi, k, v)
        for (k <- rd(a); v <- dblLit(l))
          if (aIsLowBound) low(dLo, k, v) else high(dHi, k, v)
      }
      c match {
        case GreaterThanOrEqual(a, l) =>
          visitSide(a, l, aIsLowBound = true)
          visitSide(l, a, aIsLowBound = false)
        case GreaterThan(a, l) =>
          visitSide(a, l, aIsLowBound = true)
          visitSide(l, a, aIsLowBound = false)
        case LessThanOrEqual(a, l) =>
          visitSide(a, l, aIsLowBound = false)
          visitSide(l, a, aIsLowBound = true)
        case LessThan(a, l) =>
          visitSide(a, l, aIsLowBound = false)
          visitSide(l, a, aIsLowBound = true)
        case EqualTo(a, l) =>
          visitSide(a, l, aIsLowBound = true)
          visitSide(a, l, aIsLowBound = false)
          visitSide(l, a, aIsLowBound = true)
          visitSide(l, a, aIsLowBound = false)
        case _ =>
      }
    }
    refCounts match {
      case None => (Map.empty, Map.empty)
      case Some(rc) =>
        def collect[T](
            lo: scala.collection.mutable.Map[(String, String), T],
            hi: scala.collection.mutable.Map[(String, String), T])
            : Map[String, Seq[(String, Option[T], Option[T])]] =
          (lo.keySet ++ hi.keySet).iterator
            .filter { case (t, _) => rc.getOrElse(t, 0) == 1 }
            .toSeq
            .groupBy(_._1)
            .map { case (t, ks) =>
              t -> ks.sorted.map(k => (k._2, lo.get(k), hi.get(k)))
            }
        (collect(lLo, lHi), collect(dLo, dHi))
    }
  }

  /** Dynamic schema inference + row→columnar conversion (reference
    * lynx.rs:93-134): fixed non-nullable `timestamp`/`value` columns,
    * one nullable string column per tag key in the union of all tag
    * keys; rows missing a tag get NULL; numeric tags stringify.
    */
  def inferSchema(parts: TreeMap[String, MeasurementsView]): StructType = {
    val tagKeys = parts.valuesIterator
      .flatMap(_.metadata.iterator.flatMap(_.keysIterator))
      .toSeq.distinct.sorted
    StructType(
      StructField("timestamp", TimestampType, nullable = false) +:
      StructField("value", StringType, nullable = false) +:
      tagKeys.map(k => StructField(k, StringType, nullable = true)))
  }

  def toDataFrame(spark: SparkSession,
      parts: TreeMap[String, MeasurementsView]): DataFrame = {
    val schema = inferSchema(parts)
    val tagKeys = schema.fields.drop(2).map(_.name)
    val rows = new java.util.ArrayList[Row]()
    parts.valuesIterator.foreach { m =>
      var i = 0
      while (i < m.timestamps.length) {
        val micros = m.timestamps(i)
        val ts = new Timestamp(Math.floorDiv(micros, 1000L))
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        val tags = m.metadata(i)
        val cells = new Array[Any](2 + tagKeys.length)
        cells(0) = ts
        cells(1) = m.values(i)
        var j = 0
        while (j < tagKeys.length) {
          cells(2 + j) = tags.get(tagKeys(j)).map(_.render).orNull
          j += 1
        }
        rows.add(Row.fromSeq(cells.toIndexedSeq))
        i += 1
      }
    }
    spark.createDataFrame(rows, schema)
  }
}

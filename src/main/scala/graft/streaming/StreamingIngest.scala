package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** Structured Streaming write path — the streaming extension of the
  * reference's synchronous HTTP ingest (reference main.rs:55-66 is
  * request/response; SURVEY.md §2B marks streaming "absent", §7.1
  * step 8 plans it as the scale extension).
  *
  * Flow: a stream of measurement rows (any streaming source — rate,
  * Kafka-shaped, MemoryStream in tests) → event-time watermark →
  * either (a) append to the day-partitioned parquet tier (the same
  * layout ParquetTier seals, so the batch query path reads streamed
  * data with partition pruning for free), or (b) windowed/stateful
  * aggregation.
  *
  * Rows use event-time microsecond timestamps like the reference
  * (buffer.rs:24-25); `eventTime` is the TimestampType projection.
  */
object StreamingIngest {

  /** One streamed measurement (the WriteRequest shape, flattened:
    * dynamic tags ride as a map column).
    */
  final case class StreamRow(
      namespace: String,
      measurement: String,
      value: String,
      tags: Map[String, String],
      timestampUs: Long)

  /** Event-time projection: micros → TimestampType + the tier's
    * reserved day partition column.
    */
  def withEventTime(rows: DataFrame): DataFrame =
    rows
      .withColumn("eventTime", timestamp_micros(col("timestampUs")))
      .withColumn(graft.tier.ParquetTier.DayCol,
        date_format(col("eventTime"), "yyyy-MM-dd"))

  /** (a) Durable ingest: append the stream to day-partitioned parquet
    * — streamed data lands in the exact layout the batch engine
    * reads (`…/__lynx_day=YYYY-MM-DD/`), so time-bounded queries
    * prune partitions. Checkpointing gives exactly-once file sink
    * semantics, replacing the reference's WAL on the stream path.
    */
  def toParquetTier(rows: DataFrame, tableDir: String,
      checkpointDir: String): StreamingQuery =
    withEventTime(rows).writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(graft.tier.ParquetTier.DayCol)
      .outputMode(OutputMode.Append)
      .start()

  /** (a'') ENGINE-integrated durable ingest: each micro-batch lands
    * through [[graft.engine.LynxEngine.writeBatch]] — WAL-first
    * durability with one group commit per batch, immediate
    * visibility to concurrent queries (RAM tail), auto-seal past the
    * row threshold, auto-compaction, auto bloom/zone indexing — so
    * streamed rows get the FULL engine contract (manifest MVCC, time
    * travel, rollups, file skipping) rather than the loose parquet
    * files [[toParquetTier]] appends. That distinction matters on a
    * MIXED table: once any seal publishes a manifest, the engine's
    * query path reads the manifest's file list, and side-loaded
    * parquet becomes invisible — toParquetTier is for stream-only
    * tables read by path, engineSink for tables the engine owns.
    *
    * Exactly-once, WAL-atomic: foreachBatch re-delivers the last
    * uncommitted batch after a restart, and
    * [[graft.engine.LynxEngine.writeStreamBatch]] brackets each
    * batch's rows between BEGIN/COMMIT marker records inside ONE WAL
    * group commit (graft.core.StreamBatch). The engine's replay
    * inserts a bracket's rows only when its commit marker survived
    * and derives the per-sink high-water mark from the committed
    * brackets — so a crash at ANY point either kept the whole batch
    * (the re-delivery is a no-op against the hwm) or none of it (the
    * re-delivery applies it fresh). There is no separate mark file
    * and no window between "applied" and "marked": apply IS mark.
    *
    * Scale shape: the engine's write plane (WAL + buffer) is
    * driver-side by design — the same plane HTTP ingest uses — so
    * the micro-batch collects to the driver; the batch size is
    * bounded by the trigger interval, and horizontal scale comes
    * from sharding namespaces across engines, not from parallelizing
    * one WAL. `sinkId` names the stream's hwm lane inside the
    * engine's WAL; it DEFAULTS to the canonical checkpoint path —
    * Spark already requires that to be unique per query, so two
    * streams feeding one engine are isolated without the caller
    * thinking about it (batch ids are per-checkpoint, not global;
    * one shared lane would silently drop the younger stream's
    * batches as already-applied). Pass an explicit id only to keep
    * the lane stable across a checkpoint-dir move.
    *
    * RESETTING a stream (deleting its checkpoint so batch ids restart
    * at 0) must use a NEW checkpoint directory (or a new explicit
    * sinkId): the engine's WAL remembers the old lane's high-water
    * mark, so the restarted batch ids arrive at-or-below it. This is
    * MACHINE-DETECTED, not just documented: every bracket records the
    * streaming query's stable identity (the id Spark persists in the
    * checkpoint's metadata file — wiped and regenerated with the
    * checkpoint), and a below-hwm batch from a different query id
    * fails the stream loudly instead of being silently skipped as a
    * replay (LynxEngine.writeStreamBatch's reset contract).
    */
  def engineSink(rows: Dataset[StreamRow],
      engine: graft.engine.LynxEngine,
      checkpointDir: String,
      sinkId: String = ""): StreamingQuery = {
    val sid =
      if (sinkId.nonEmpty) sinkId
      else {
        val canonical = canonicalSinkId(checkpointDir)
        // lane-name migration: pre-round-13 default lanes were keyed
        // by whatever absolute-path SPELLING the caller used. When no
        // canonical lane exists yet, adopt any recorded lane whose
        // spelling canonicalizes to this checkpoint (symlinked,
        // relative, differently-spelled — all one dir): renaming the
        // lane would read hwm -1 and re-apply Spark's restart
        // re-delivery. Ties (several legacy spellings of one dir)
        // resolve to the highest mark — the lane that saw the most
        // committed batches is the one re-delivery is measured
        // against.
        if (engine.streamHighWaterMark(canonical) >= 0) canonical
        else {
          val legacyLanes = engine.streamHighWaterMarks.iterator
            .filter { case (lane, hwm) =>
              hwm >= 0 && lane != canonical &&
                (try canonicalSinkId(lane) == canonical
                catch { case scala.util.control.NonFatal(_) => false })
            }.toSeq
          if (legacyLanes.isEmpty) canonical
          else legacyLanes.maxBy(_._2)._1
        }
      }
    // the query id exists once the stream starts (Spark writes the
    // metadata file before batch 0 runs); read it on the first batch
    // and keep it for the query's lifetime
    var qid: String = null
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (ds: Dataset[StreamRow], batchId: Long) =>
        if (qid == null) qid = readQueryId(checkpointDir).getOrElse("")
        applyEngineBatch(engine, sid, ds, batchId, qid)
        ()
      }
      .start()
  }

  /** The default hwm-lane name for a checkpoint location. Local paths
    * canonicalize (relative vs absolute, trailing slash, symlinks, a
    * different cwd — all one lane), so restarting the same query with
    * a differently-SPELLED but equivalent checkpoint path cannot
    * silently open a fresh lane at hwm -1 and double-apply the last
    * uncommitted batch. URI locations (s3://…) must not go through
    * java.io.File (which would mangle the scheme): they normalize as
    * URIs instead.
    */
  private[graft] def canonicalSinkId(checkpointDir: String): String =
    if (checkpointDir.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
      try new java.net.URI(checkpointDir).normalize().toString
        .stripSuffix("/")
      catch { case _: java.net.URISyntaxException =>
        checkpointDir.stripSuffix("/") }
    else
      try new java.io.File(checkpointDir).getCanonicalPath
      catch { case _: java.io.IOException =>
        new java.io.File(checkpointDir).getAbsolutePath }

  /** The streaming query's stable identity: the `id` field of the
    * checkpoint's metadata file, which Spark creates at query start
    * and preserves across restarts — deleting the checkpoint deletes
    * it, so a regenerated id IS the signature of a reset. None when
    * unreadable (URI checkpoint on a remote store, torn file):
    * reset detection then degrades to the documented discipline.
    */
  private[graft] def readQueryId(checkpointDir: String)
      : Option[String] =
    try {
      // file:-scheme spellings are local too (Spark accepts and docs
      // commonly show them) — resolve through the URI, or reset
      // detection would silently never engage for them
      val base: Option[java.io.File] =
        if (checkpointDir.startsWith("file:"))
          try Some(new java.io.File(
            new java.net.URI(checkpointDir.replace(" ", "%20"))))
          catch { case scala.util.control.NonFatal(_) =>
            Some(new java.io.File(checkpointDir.stripPrefix("file:")))
          }
        else if (checkpointDir.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
          None // remote store: unreadable from here
        else Some(new java.io.File(checkpointDir))
      val f = base.map(b => new java.io.File(b, "metadata"))
      f.filter(_.isFile) match {
        case None =>
          System.err.println("[engineSink] WARNING: cannot read the " +
            s"checkpoint metadata at '$checkpointDir' — checkpoint-" +
            "reset detection is DEGRADED for this stream (a wiped-" +
            "and-reused checkpoint path will be silently skipped as " +
            "re-delivery; use fresh checkpoint dirs on reset)")
          None
        case Some(mf) =>
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          Option(mapper.readTree(
            java.nio.file.Files.readAllBytes(mf.toPath)).get("id"))
            .map(_.asText()).filter(_.nonEmpty)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The idempotent micro-batch applier behind [[engineSink]] —
    * package-visible so the replay contract is directly testable.
    * Returns true when the batch was applied, false when the
    * engine's WAL-derived high-water mark proves it already was.
    * `queryId` (when known) is the reset sentinel: an already-applied
    * batch id from a DIFFERENT query than the lane's recorded one
    * throws instead of skipping (see [[engineSink]]).
    */
  private[graft] def applyEngineBatch(engine: graft.engine.LynxEngine,
      sinkId: String, ds: Dataset[StreamRow],
      batchId: Long, queryId: String = ""): Boolean = {
    if (batchId <= engine.streamHighWaterMark(sinkId)) {
      // fast path skips the collect — but it must never skip a RESET
      engine.assertNoStreamReset(sinkId, batchId, queryId)
      false
    } else {
      val reqs = ds.collect().toSeq.map { r =>
        graft.core.WriteRequest(r.namespace, r.measurement, r.value,
          r.tags.map { case (k, v) => k -> graft.core.TagString(v) },
          r.timestampUs)
      }
      engine.writeStreamBatch(sinkId, batchId, reqs, queryId)
    }
  }

  /** (b) Watermarked tumbling-window aggregation: per (namespace,
    * measurement, window) count + numeric sum. Late rows beyond the
    * watermark are dropped; state is bounded, so this runs forever at
    * any scale.
    */
  def windowedCounts(rows: DataFrame, watermark: String = "1 minute",
      window_ : String = "1 minute"): DataFrame =
    withEventTime(rows)
      .withWatermark("eventTime", watermark)
      .groupBy(col("namespace"), col("measurement"),
        window(col("eventTime"), window_))
      .agg(count(lit(1)).as("n"),
        sum(expr("try_cast(value AS double)")).as("sum_value"))
      .select(col("namespace"), col("measurement"),
        col("window.start").as("window_start"), col("n"), col("sum_value"))

  /** (e) Session windows: activity sessions per (namespace,
    * measurement) closed by a 30-second gap — `session_window` keeps
    * state per open session only, bounded by the watermark.
    */
  def sessionCounts(rows: DataFrame, watermark: String = "1 minute",
      gap: String = "30 seconds"): DataFrame =
    withEventTime(rows)
      .withWatermark("eventTime", watermark)
      .groupBy(col("namespace"), col("measurement"),
        session_window(col("eventTime"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("namespace"), col("measurement"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))

  /** Content hash of a stream row. Length-prefixed fields: no
    * separator-collision between e.g. ("a","b c") and ("a b","c")
    * for arbitrary document content.
    */
  private def contentDigest(r: StreamRow): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq(r.namespace, r.measurement, r.value).foreach { f =>
      val b = f.getBytes("UTF-8")
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length)
        .array())
      md.update(b)
    }
    md.digest()
  }

  private def contentHash(r: StreamRow): String =
    java.util.Base64.getEncoder.encodeToString(contentDigest(r))

  /** A content-hashed stream row with its event-time projection —
    * the internal shape of the TTL-bounded dedup path.
    */
  final case class HashedRow(key: String, ts: Timestamp,
      row: StreamRow)

  /** (d) Streaming exact dedup: drop rows whose content hash was
    * already seen, keeping state per hash via flatMapGroupsWithState —
    * the streaming counterpart of q_dedup_exact for a training-data
    * ingest pipeline. State is one empty record per distinct hash.
    *
    * With the default `stateTtl = ""` the dedup is EXACT over the
    * stream's whole lifetime — and state is O(all-time distinct
    * hashes), acceptable only for bounded runs. For a forever-running
    * 100 TB ingest pass `stateTtl` (e.g. "7 days"): every hash key
    * then carries an event-time TTL enforced against the watermark,
    * refreshed on traffic, and idle keys are evicted — state becomes
    * O(hashes active within the TTL window), the same bounded-state
    * design as [[nearDupCandidates]]. The documented trade of any
    * windowed dedup applies: a duplicate arriving AFTER its
    * original's key expired is re-emitted (spec-asserted both ways —
    * dups inside the window are dropped, a post-expiry replay
    * surfaces again, which also proves the eviction really happened).
    * Event-time (not processing-time) timeout keeps replays/backfills
    * identical to live runs.
    */
  def dedupExact(rows: Dataset[StreamRow], stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[StreamRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    if (stateTtl.isEmpty) {
      rows
        .groupByKey(contentHash)
        .flatMapGroupsWithState[Boolean, StreamRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          case (_, batch, state: GroupState[Boolean]) =>
            if (state.exists) Iterator.empty // hash already emitted
            else {
              state.update(true)
              // deterministic pick of the batch's first row
              batch.toSeq.sortBy(r => (r.timestampUs, r.value))
                .headOption.iterator
            }
        }
    } else {
      rows
        .map(r => HashedRow(contentHash(r),
          new Timestamp(r.timestampUs / 1000L), r))
        .withWatermark("ts", watermarkDelay)
        .groupByKey(_.key)
        .flatMapGroupsWithState[Boolean, StreamRow](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          case (_, batch, state: GroupState[Boolean]) =>
            if (state.hasTimedOut) {
              // idle past TTL: evict — a later duplicate re-emits
              state.remove()
              Iterator.empty
            } else {
              val rowsSeq = batch.toSeq
              var maxEvtMs = Long.MinValue
              rowsSeq.foreach { h =>
                if (h.ts.getTime > maxEvtMs) maxEvtMs = h.ts.getTime
              }
              val out =
                if (state.exists) Iterator.empty
                else {
                  state.update(true)
                  rowsSeq.map(_.row)
                    .sortBy(r => (r.timestampUs, r.value))
                    .headOption.iterator
                }
              // refresh the TTL on traffic (sliding expiry), but never
              // at-or-below the watermark (late data can put maxEvt
              // behind it, which Spark rejects)
              state.setTimeoutTimestamp(
                math.max(maxEvtMs, state.getCurrentWatermarkMs() + 1),
                stateTtl)
              out
            }
        }
    }
  }

  /** A stream row annotated with the bloom verdict: `maybe_dup` means
    * its content hash MAY have been seen before (bloom semantics —
    * no false negatives, tunable false positives).
    */
  final case class BloomFlag(namespace: String, measurement: String,
      value: String, timestampUs: Long, maybe_dup: Boolean)

  /** (d') Streaming bloom dedup: the CONSTANT-MEMORY counterpart of
    * [[dedupExact]] and the streaming face of q_dedup_bloom. Rows are
    * sharded by content hash; each shard keeps ONE fixed-size bloom
    * bitmap (`mBits` bits, k=3 md5-slice positions) and flags a row
    * `maybe_dup` when all its bits were already set, then sets them.
    * Total state is `nShards × mBits/8` bytes FOREVER — 1 MB at the
    * defaults — regardless of how many distinct documents the stream
    * ever carries, where dedupExact's state grows O(distinct keys)
    * (TTL-bounded at best). The trade is the bloom trade, measured by
    * the batch audit query: zero false negatives structurally (a
    * duplicate's bits are set by its original in the same shard —
    * sharding by the full content hash makes a doc's bloom
    * deterministic), and a false-positive rate that grows with fill;
    * production either sizes mBits for the expected distinct count or
    * rotates generations. Emitted flags feed a downstream exact check
    * on the flagged subset only (the q_dedup_bloom contract).
    *
    * Per micro-batch, rows in a shard are processed in (timestampUs,
    * value) order, so flags are batch-split-invariant (spec-asserted).
    *
    * `rotatePeriodUs > 0` enables GENERATIONAL rotation — the
    * forgetting mechanism: each shard keeps the current period's
    * bitmap plus the previous one; when event time crosses a period
    * boundary the previous generation is dropped and the current one
    * retires into its place. A duplicate is then remembered for at
    * least one and less than two periods after its original (the
    * classic rotating-bloom window), the fill — and with it the FP
    * rate — stops ratcheting on an infinite stream, and memory stays
    * at exactly two bitmaps per shard. Event-time-driven (rotation
    * advances with the data, so replays behave like live runs);
    * late rows behind the current generation probe both bitmaps like
    * everyone else and never rewind it.
    */
  def bloomDedup(rows: Dataset[StreamRow], mBits: Int = 1 << 18,
      nShards: Int = 32, rotatePeriodUs: Long = 0L)
      : Dataset[BloomFlag] = {
    import rows.sparkSession.implicits._
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a multiple of 64")
    val words = mBits / 64
    rows
      .groupByKey { r =>
        val d = contentDigest(r)
        math.floorMod(
          java.nio.ByteBuffer.wrap(d, 12, 4).getInt, nShards)
      }
      .flatMapGroupsWithState[(Long, Array[Long], Array[Long]), BloomFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[(Long, Array[Long], Array[Long])]) =>
          var (genStart, cur, prev) = state.getOption
            .getOrElse((Long.MinValue,
              new Array[Long](words), new Array[Long](words)))
          val out = batch.toSeq
            .sortBy(r => (r.timestampUs, r.value))
            .map { r =>
              if (rotatePeriodUs > 0L) {
                val gen = Math.floorDiv(r.timestampUs, rotatePeriodUs) *
                  rotatePeriodUs
                if (genStart == Long.MinValue) genStart = gen
                else if (gen == genStart + rotatePeriodUs) {
                  prev = cur; cur = new Array[Long](words); genStart = gen
                } else if (gen > genStart + rotatePeriodUs) {
                  prev = new Array[Long](words)
                  cur = new Array[Long](words); genStart = gen
                } // gen <= genStart: late row, current generation probes
              }
              val d = contentDigest(r)
              val bb = java.nio.ByteBuffer.wrap(d)
              val ps = Array(
                math.floorMod(bb.getInt(0), mBits),
                math.floorMod(bb.getInt(4), mBits),
                math.floorMod(bb.getInt(8), mBits))
              val hit =
                ps.forall(p => (cur(p >>> 6) & (1L << (p & 63))) != 0L) ||
                (rotatePeriodUs > 0L &&
                  ps.forall(p => (prev(p >>> 6) & (1L << (p & 63))) != 0L))
              ps.foreach(p => cur(p >>> 6) |= (1L << (p & 63)))
              BloomFlag(r.namespace, r.measurement, r.value,
                r.timestampUs, hit)
            }
          state.update((genStart, cur, prev))
          out.iterator
      }
  }

  /** A streamed document (the training-data ingest shape). */
  final case class DocRow(doc_id: Long, text: String)

  /** A streamed document with its ingest event time — the shape the
    * TTL-bounded near-dup op consumes (`tsUs` = event-time micros).
    */
  final case class TimedDoc(doc_id: Long, text: String, tsUs: Long)

  /** One band row of a timed doc, post-watermark. */
  final case class BandEvt(bucket: String, doc_id: Long,
      sig: Array[Long], ts: java.sql.Timestamp)

  /** A near-dup candidate: `doc_id` collided with the earlier-kept
    * `dup_of` in some band bucket; `est_jaccard` is the minhash
    * agreement (an unbiased Jaccard estimate). The same pair can
    * surface from multiple buckets — downstream dedups/verifies
    * (exactly like the batch candidate→verify split).
    */
  final case class NearDupCand(doc_id: Long, dup_of: Long,
      est_jaccard: Double)

  final case class BandRow(bucket: String, doc_id: Long,
      sig: Array[Long])

  /** (f) Streaming near-dup candidate generation: MinHash banding
    * with per-bucket signature state — the streaming face of
    * q_dedup_minhash_lsh. Each arriving doc is banded with the SAME
    * hash math as the batch operator (Dedup.jvmMinHash mirrors the
    * SQL bit-for-bit, spec-asserted), compared against the
    * signatures kept in its bucket, and collisions with ≥ minAgree
    * signature agreement emit candidates for downstream exact
    * verification. State per bucket is a ring of the most recent
    * maxPerBucket signatures, AND every bucket key carries an
    * event-time TTL (`stateTtl`, enforced against the stream's
    * watermark): a bucket that sees no traffic for that long past the
    * watermark is evicted, so total state is bounded by the
    * recent-window key cardinality rather than growing with every
    * bucket the stream has ever touched (the difference between
    * O(active buckets) and O(all-time buckets) at 100 TB of ingest).
    * Event-time (not processing-time) timeout is deliberate: eviction
    * is driven by the data's own clock, so replays/backfills behave
    * identically to live runs, and batches only fire when the
    * watermark actually advances (a processing-time timer forces the
    * engine into a permanent batch-construction loop). Semantics
    * under eviction: a dup arriving AFTER its original's bucket
    * expired is missed — the documented trade of any windowed dedup —
    * but duplicates that co-occur within the TTL window are still
    * caught, including in a bucket that expired and then reappeared
    * (state restarts empty and catches pairs among the new arrivals;
    * spec-asserted).
    */
  def nearDupCandidates(docs: Dataset[TimedDoc], maxPerBucket: Int = 64,
      minAgree: Double = 0.5, stateTtl: String = "30 minutes",
      watermarkDelay: String = "10 seconds"): Dataset[NearDupCand] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { d =>
      graft.ops.Dedup.jvmMinHash(d.text) match {
        case Some(sig) =>
          graft.ops.Dedup.jvmBands(sig).toSeq.map { case (b, v) =>
            BandEvt(s"$b:$v", d.doc_id, sig,
              new java.sql.Timestamp(d.tsUs / 1000L))
          }
        case None => Seq.empty[BandEvt]
      }
    }
    banded.withWatermark("ts", watermarkDelay)
      .as[BandEvt]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Array[Long])], NearDupCand](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, batch, state: GroupState[List[(Long, Array[Long])]]) =>
          if (state.hasTimedOut) {
            // idle past TTL: evict the bucket's ring entirely
            state.remove()
            Iterator.empty
          } else {
            var kept = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[NearDupCand]
            var maxEvtMs = Long.MinValue
            // deterministic order within a micro-batch
            batch.toSeq.sortBy(_.doc_id).foreach { r =>
              if (r.ts.getTime > maxEvtMs) maxEvtMs = r.ts.getTime
              kept.foreach { case (prevId, prevSig) =>
                if (prevId != r.doc_id) {
                  val agree = prevSig.zip(r.sig).count(t => t._1 == t._2)
                    .toDouble / prevSig.length
                  if (agree >= minAgree)
                    out += NearDupCand(r.doc_id, prevId, agree)
                }
              }
              kept = ((r.doc_id, r.sig) :: kept).take(maxPerBucket)
            }
            state.update(kept)
            // expire stateTtl past this bucket's newest event, but
            // never at-or-below the current watermark (late data can
            // put maxEvt behind it, which Spark rejects)
            state.setTimeoutTimestamp(
              math.max(maxEvtMs, state.getCurrentWatermarkMs() + 1),
              stateTtl)
            out.result().iterator
          }
      }
  }

  /** A streamed doc's band collision with the static corpus index. */
  final case class CorpusHit(doc_id: Long, corpus_doc: Long,
      bucket: String)

  /** (bucket, doc_id) band rows for one document — the single
    * definition of the bucket key both the corpus index and the
    * stream side use, so they cannot drift apart and stop colliding.
    */
  private def bandRows(docId: Long, text: String): Seq[(String, Long)] =
    graft.ops.Dedup.jvmMinHash(text) match {
      case Some(sig) =>
        graft.ops.Dedup.jvmBands(sig).toSeq
          .map { case (b, v) => (s"$b:$v", docId) }
      case None => Seq.empty
    }

  /** The standing corpus as a band index: one (bucket, corpus_doc)
    * row per MinHash band — built ONCE from the frozen corpus with
    * the same jvm hash math as the batch operator, then reused by
    * every micro-batch. The returned frame is cache()d: Spark
    * re-executes the static side of a stream-static join per
    * micro-batch, and without the persist that would re-hash the
    * whole corpus every batch. At 100 TB this index lives
    * bucket-partitioned on disk and the stream-static join co-locates
    * on the bucket key.
    */
  def corpusBandIndex(docs: Dataset[DocRow]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => bandRows(d.doc_id, d.text))
      .toDF("bucket", "corpus_doc")
      .cache()
  }

  /** (g) Stream-vs-static incremental dedup: every arriving doc is
    * banded (same math as q_dedup_incremental's batch side) and
    * probed against the FROZEN corpus band index via a stream-static
    * equi-join — completely STATELESS, no state store, no watermark,
    * no TTL trade-off: the streaming face of the incremental-ingest
    * dedup pattern, where the standing corpus never re-pairs with
    * itself and a restart loses nothing. Emits one row per band
    * collision; downstream dedups pairs and verifies exact Jaccard
    * (the same candidate→verify split as every batch dedup here).
    */
  def incrementalDedup(docs: Dataset[TimedDoc],
      corpusIndex: DataFrame): Dataset[CorpusHit] = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => bandRows(d.doc_id, d.text))
      .toDF("bucket", "doc_id")
      .join(corpusIndex, "bucket")
      .select(col("doc_id"), col("corpus_doc"), col("bucket"))
      .as[CorpusHit]
  }

  /** Per-series running state for (c): monotonic count + last value +
    * min/max over the series lifetime.
    */
  final case class SeriesState(
      n: Long, lastValue: String, minTs: Long, maxTs: Long)
  final case class SeriesUpdate(
      namespace: String, measurement: String,
      n: Long, lastValue: String, spanUs: Long)

  /** (c) Custom stateful op via mapGroupsWithState: per-series
    * lifetime stats — the `KeyValueGroupedDataset` path for semantics
    * windows can't express. State is per (namespace, measurement):
    * thousands of keys, not rows — bounded at 100 TB.
    */
  /** Shared event-time-TTL harness for the per-key stateful ops: maps
    * each input to `(event-time Timestamp, row)`, watermarks it, and
    * runs `fold` under `EventTimeTimeout` with the [[dedupExact]]
    * eviction idiom — sliding expiry refreshed on traffic, clamped
    * strictly above the watermark (late data can put the batch max
    * behind it, which Spark rejects), `onTimeout` invoked with the
    * dying state before removal (so an op can flush, e.g.
    * [[sessionize]] closes the open session). Every per-key op's
    * non-empty-`stateTtl` path routes here: without a TTL their state
    * is fixed-size PER KEY but the key population (users, series) is
    * unbounded on a forever-running ingest — the exact class the
    * Update-mode views' TTLs already bound.
    */
  private def withKeyTtl[I, K, S, O](
      src: Dataset[I], evtUs: I => Long, key: I => K,
      stateTtl: String, watermarkDelay: String, mode: OutputMode)(
      fold: (K, Seq[I], GroupState[S]) => Iterator[O])(
      onTimeout: (K, GroupState[S]) => Iterator[O])(
      implicit ti: Encoder[(Timestamp, I)], ke: Encoder[K],
      se: Encoder[S], oe: Encoder[O]): Dataset[O] = {
    src.map(i => (new Timestamp(evtUs(i) / 1000L), i))
      .withWatermark("_1", watermarkDelay)
      .groupByKey(t => key(t._2))
      .flatMapGroupsWithState[S, O](mode,
        GroupStateTimeout.EventTimeTimeout) {
        case (k, batch, state: GroupState[S]) =>
          if (state.hasTimedOut) {
            // materialize BEFORE remove: a lazy iterator would read
            // dead state
            val out = onTimeout(k, state).toSeq
            state.remove()
            out.iterator
          } else {
            val rows = batch.toSeq
            if (rows.isEmpty) Iterator.empty
            else {
              val out = fold(k, rows.map(_._2), state).toSeq
              // a fold may leave a fresh key stateless (e.g. a batch
              // of empty docs); a timeout cannot be set without state
              if (state.exists)
                state.setTimeoutTimestamp(
                  math.max(rows.iterator.map(_._1.getTime).max,
                    state.getCurrentWatermarkMs() + 1), stateTtl)
              out.iterator
            }
          }
      }
  }

  // --------------------------------------------------- streaming EWMA

  final case class EwmaPoint(series: String, bucketUs: Long, x: Double)
  final case class EwmaOut(series: String, bucketUs: Long, x: Double,
      ewma: Double)
  final case class EwmaState(ewma: Double)

  /** (d) The q_ts_ewma recurrence as a stateful streaming op — the
    * unbounded-stream formulation the batch docstring points to.
    * State is ONE double per series (O(series) memory, not O(buckets))
    * and each bucket emits its smoothed value exactly once. The fold
    * is the same `0.5·x + 0.5·prev` double arithmetic in the same
    * order, so a stream fed the batch query's buckets in order
    * produces bit-identical EWMAs regardless of how the stream is
    * micro-batched (StreamingSpec asserts parity across splits).
    * Contract: buckets arrive in per-series bucket order — i.e. this
    * consumes the output of the watermarked windowed aggregation
    * upstream, which closes windows in event-time order per key.
    *
    * With the default `stateTtl = ""` state lives forever — one
    * double per ALL-TIME series, unbounded key population on a
    * forever-running ingest. Pass `stateTtl` (e.g. "30 days") to
    * evict series idle past the TTL against the event-time watermark
    * ([[withKeyTtl]]); the documented trade: an evicted series
    * re-initializes its recurrence (first bucket after expiry seeds
    * ewma = x, like a brand-new series). Same trade for the cusum /
    * holt / rate / anomaly siblings.
    */
  def ewma(points: Dataset[EwmaPoint], alpha: Double = 0.5,
      stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[EwmaOut] = {
    import points.sparkSession.implicits._
    def fold(series: String, rows: Seq[EwmaPoint],
        state: GroupState[EwmaState]): Iterator[EwmaOut] = {
      var acc = state.getOption.map(_.ewma)
      val out = rows.sortBy(_.bucketUs).map { p =>
        val e = acc match {
          case None => p.x
          case Some(prev) => alpha * p.x + (1 - alpha) * prev
        }
        acc = Some(e)
        EwmaOut(series, p.bucketUs, p.x, e)
      }
      acc.foreach(e => state.update(EwmaState(e)))
      out.iterator
    }
    if (stateTtl.isEmpty)
      points.groupByKey(_.series)
        .flatMapGroupsWithState[EwmaState, EwmaOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state)
        }
    else
      withKeyTtl[EwmaPoint, String, EwmaState, EwmaOut](
        points, _.bucketUs, _.series, stateTtl, watermarkDelay,
        OutputMode.Append())(fold)((_, _) => Iterator.empty)
  }

  final case class CusumOut(series: String, bucketUs: Long, x: Double,
      cusumPos: Double, cusumNeg: Double, isShift: Boolean)
  final case class CusumState(cp: Double, cn: Double)

  /** q_ts_cusum as a stateful op: the two-sided clamped recurrence
    * with two doubles of state per series. The per-series calibration
    * (μ, σ) is STATIC input — a stream cannot see its own future, so
    * the batch operator's whole-series estimate becomes a trained
    * profile here, exactly how a production monitor deploys CUSUM.
    * Given the batch μ/σ, emitted values are bit-identical to
    * q_ts_cusum for the same bucket sequence, however micro-batched
    * (StreamingSpec asserts it): same k = 0.5σ slack, h = 4σ
    * decision interval, clamp order, and strict >. Same
    * ordered-upstream contract as [[ewma]].
    */
  def cusum(points: Dataset[EwmaPoint],
      profile: Map[String, (Double, Double)],
      stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[CusumOut] = {
    import points.sparkSession.implicits._
    def fold(series: String, rows: Seq[EwmaPoint],
        state: GroupState[CusumState]): Iterator[CusumOut] =
      profile.get(series) match {
        // an untrained series must NOT default to (μ=0, σ=0) —
        // that flags every positive sample forever; skip it until
        // a profile exists (the monitor's train-before-watch
        // contract)
        case None => Iterator.empty
        case Some((mu, sigma)) =>
          var cp = state.getOption.map(_.cp).getOrElse(0.0)
          var cn = state.getOption.map(_.cn).getOrElse(0.0)
          val out = rows.sortBy(_.bucketUs).map { p =>
            cp = math.max(0.0, cp + (p.x - mu - 0.5 * sigma))
            cn = math.max(0.0, cn + (mu - 0.5 * sigma - p.x))
            CusumOut(series, p.bucketUs, p.x, cp, cn,
              cp > 4.0 * sigma || cn > 4.0 * sigma)
          }
          state.update(CusumState(cp, cn))
          out.iterator
      }
    if (stateTtl.isEmpty)
      points.groupByKey(_.series)
        .flatMapGroupsWithState[CusumState, CusumOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state)
        }
    else
      withKeyTtl[EwmaPoint, String, CusumState, CusumOut](
        points, _.bucketUs, _.series, stateTtl, watermarkDelay,
        OutputMode.Append())(fold)((_, _) => Iterator.empty)
  }

  final case class HoltOut(series: String, bucketUs: Long, x: Double,
      level: Double, trend: Double, forecast: Double)
  final case class HoltState(level: Double, trend: Double)

  /** q_ts_holt as a stateful op: the level+trend recurrence with two
    * doubles of state per series. Same coefficients (0.5/0.25/0.75,
    * exact binary doubles), same l₁=x₁ b₁=0 init, same fold order as
    * the batch operator — so the emitted (level, trend, forecast) are
    * bit-identical to q_ts_holt for the same bucket sequence, however
    * the stream is micro-batched (StreamingSpec asserts it). Same
    * ordered-upstream contract as [[ewma]].
    */
  def holt(points: Dataset[EwmaPoint], alpha: Double = 0.5,
      beta: Double = 0.25, stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[HoltOut] = {
    import points.sparkSession.implicits._
    def fold(series: String, rows: Seq[EwmaPoint],
        state: GroupState[HoltState]): Iterator[HoltOut] = {
      var st = state.getOption
      val out = rows.sortBy(_.bucketUs).map { p =>
        val next = st match {
          case None => HoltState(p.x, 0.0)
          case Some(HoltState(lp, bp)) =>
            val l = alpha * p.x + (1 - alpha) * (lp + bp)
            HoltState(l, beta * (l - lp) + (1 - beta) * bp)
        }
        st = Some(next)
        HoltOut(series, p.bucketUs, p.x, next.level, next.trend,
          next.level + next.trend)
      }
      st.foreach(state.update)
      out.iterator
    }
    if (stateTtl.isEmpty)
      points.groupByKey(_.series)
        .flatMapGroupsWithState[HoltState, HoltOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state)
        }
    else
      withKeyTtl[EwmaPoint, String, HoltState, HoltOut](
        points, _.bucketUs, _.series, stateTtl, watermarkDelay,
        OutputMode.Append())(fold)((_, _) => Iterator.empty)
  }

  final case class RateOut(series: String, bucketUs: Long, x: Double,
      delta: Double, ratePerS: Double)
  final case class RateState(bucketUs: Long, x: Double)

  /** q_ts_rate as a stateful op: per-series delta vs the previous
    * bucket, normalized by the actual elapsed seconds. State is the
    * last (bucketUs, sum) pair per series. The first bucket of a
    * series emits nothing (no predecessor — the batch query's NULL
    * lag row), so output arithmetic is exactly the batch query's:
    * identical-double subtraction and exact-integer elapsed micros
    * divided by 1e6.
    */
  def rate(points: Dataset[EwmaPoint], stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[RateOut] = {
    import points.sparkSession.implicits._
    def fold(series: String, rows: Seq[EwmaPoint],
        state: GroupState[RateState]): Iterator[RateOut] = {
      var prev = state.getOption
      val out = rows.sortBy(_.bucketUs).flatMap { p =>
        val o = prev.map { q =>
          val delta = p.x - q.x
          RateOut(series, p.bucketUs, p.x, delta,
            delta / ((p.bucketUs - q.bucketUs) / 1e6))
        }
        prev = Some(RateState(p.bucketUs, p.x))
        o
      }
      prev.foreach(state.update)
      out.iterator
    }
    if (stateTtl.isEmpty)
      points.groupByKey(_.series)
        .flatMapGroupsWithState[RateState, RateOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state)
        }
    else
      withKeyTtl[EwmaPoint, String, RateState, RateOut](
        points, _.bucketUs, _.series, stateTtl, watermarkDelay,
        OutputMode.Append())(fold)((_, _) => Iterator.empty)
  }

  final case class MarkovEvent(userId: Long, tsUs: Long, eventId: Long,
      eventType: String)
  final case class MarkovLast(tsUs: Long, eventId: Long,
      eventType: String)
  final case class MarkovTransition(userId: Long, src: String,
      dst: String, tsUs: Long)

  /** Streaming twin of q_markov_transitions' pair extraction: emit one
    * (src → dst) transition per consecutive event pair within a user's
    * stream, across micro-batch boundaries. State is ONE MarkovLast
    * record per user — bounded by the user population like the
    * per-series smoothers, not by stream length. Same ordered-upstream
    * contract as [[ewma]]: a user's events arrive in (ts, event_id)
    * order across batches; within a batch any order is tolerated.
    * Downstream, `groupBy(src, dst).count()` over the emitted pairs
    * reproduces the batch operator's transition counts exactly
    * (StreamingSpec proves split-invariance). Pass `stateTtl` on a
    * forever-running ingest: the user population is unbounded, and
    * idle users' last-event records evict against the watermark
    * ([[withKeyTtl]]).
    */
  def markovTransitions(ev: Dataset[MarkovEvent], stateTtl: String = "",
      watermarkDelay: String = "10 seconds")
      : Dataset[MarkovTransition] = {
    import ev.sparkSession.implicits._
    def fold(u: Long, rows: Seq[MarkovEvent],
        state: GroupState[MarkovLast]): Iterator[MarkovTransition] = {
      var last = state.getOption
      val out = rows.sortBy(e => (e.tsUs, e.eventId))
        .flatMap { e =>
          val t = last.map(l =>
            MarkovTransition(u, l.eventType, e.eventType, e.tsUs))
          last = Some(MarkovLast(e.tsUs, e.eventId, e.eventType))
          t
        }
      last.foreach(state.update)
      out.iterator
    }
    if (stateTtl.isEmpty)
      ev.groupByKey(_.userId)
        .flatMapGroupsWithState[MarkovLast, MarkovTransition](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state)
        }
    else
      // evicting a user forgets their last event: the first event
      // after expiry emits no transition across the idle gap — for a
      // behavioral stream that is usually the RIGHT semantics (a
      // months-idle user's "next" action isn't a transition)
      withKeyTtl[MarkovEvent, Long, MarkovLast, MarkovTransition](
        ev, _.tsUs, _.userId, stateTtl, watermarkDelay,
        OutputMode.Append())(fold)((_, _) => Iterator.empty)
  }

  final case class NoveltyFlag(userId: Long, src: String, dst: String,
      tsUs: Long, n: Long, rare: Boolean)

  /** The frozen transition dictionary a batch pass trains for
    * [[seqNovelty]]: global (src, dst) counts over a static event
    * frame (same extraction as q_markov_transitions) plus the total,
    * cache()d because a stream-static join re-executes the static
    * side per micro-batch. At 100 TB the dictionary is ≤ |event
    * types|² rows — it broadcasts.
    */
  def transitionDict(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy("user_id").orderBy("ts", "event_id")
    val g = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    g.crossJoin(broadcast(g.agg(sum("n").cast("long").as("tot"))))
      .cache()
  }

  /** Real-time rare-transition flagging — the streaming face of
    * q_seq_novelty: transitions come from [[markovTransitions]]'s
    * one-record-per-user state, and each is scored against the
    * FROZEN batch-trained [[transitionDict]] by the same exact
    * integer rule (rare ⇔ n·1000 < total; a transition the training
    * corpus never saw scores n = 0, maximally rare). Model trains
    * batch-side, scoring adds no state beyond the per-user last-event
    * record — the broadcast stream-static join is how a behavioral
    * anomaly screen actually deploys.
    */
  def seqNovelty(ev: Dataset[MarkovEvent], dict: DataFrame,
      stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[NoveltyFlag] = {
    import ev.sparkSession.implicits._
    markovTransitions(ev, stateTtl, watermarkDelay).toDF()
      .join(broadcast(dict), Seq("src", "dst"), "left")
      .select(col("userId"), col("src"), col("dst"), col("tsUs"),
        coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(col("n"), lit(0L)) * 1000L <
          coalesce(col("tot"),
            lit(Long.MaxValue))).as("rare"))
      .as[NoveltyFlag]
  }

  final case class AnomalyOut(series: String, bucketUs: Long, x: Double,
      nHist: Long, mean: Double, z: Double, isAnomaly: Boolean)
  final case class AnomalyState(hist: List[Double])

  /** q_ts_anomaly as a stateful op: each bucket scored against the
    * previous ≤`window` buckets of its series (mean / sample stddev,
    * flagged at |z| > `zThresh`), state a bounded list per series —
    * O(window) memory per key at any corpus size. The history fold
    * runs ascending left-to-right, the same order as the batch
    * query's collect_list window frame, so mean/z are bit-identical
    * to q_ts_anomaly for the same bucket sequence (StreamingSpec
    * feeds the batch buckets through and compares exactly).
    */
  def anomaly(points: Dataset[EwmaPoint], window: Int = 24,
      minHist: Int = 12, zThresh: Double = 2.5, stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[AnomalyOut] = {
    import points.sparkSession.implicits._
    def fold(series: String, rows: Seq[EwmaPoint],
        state: GroupState[AnomalyState]): Iterator[AnomalyOut] = {
      var hist = state.getOption.map(_.hist).getOrElse(Nil)
      val out = Seq.newBuilder[AnomalyOut]
      rows.sortBy(_.bucketUs).foreach { p =>
        val n = hist.length
        if (n >= minHist) {
          val s1 = hist.foldLeft(0.0)(_ + _)
          val s2 = hist.foldLeft(0.0)((a, x) => a + x * x)
          val mean = s1 / n
          val variance = (s2 - s1 * s1 / n) / (n - 1)
          if (variance > 0) {
            val z = (p.x - mean) / math.sqrt(variance)
            out += AnomalyOut(series, p.bucketUs, p.x, n.toLong,
              mean, z, math.abs(z) > zThresh)
          }
        }
        hist = (hist :+ p.x).takeRight(window)
      }
      state.update(AnomalyState(hist))
      out.result().iterator
    }
    if (stateTtl.isEmpty)
      points.groupByKey(_.series)
        .flatMapGroupsWithState[AnomalyState, AnomalyOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state)
        }
    else
      withKeyTtl[EwmaPoint, String, AnomalyState, AnomalyOut](
        points, _.bucketUs, _.series, stateTtl, watermarkDelay,
        OutputMode.Append())(fold)((_, _) => Iterator.empty)
  }

  /** Per-doc contamination tallies for the streaming gate. */
  final case class ContamOut(doc_id: Long, n_grams: Long, n_hit: Long,
      contam_frac: Double, is_contaminated: Boolean)
  final case class ContamState(nGrams: Long, nHit: Long)
  final case class GramHit(doc_id: Long, hit: Boolean)

  /** (g) Streaming benchmark decontamination: the batch
    * q_contamination gate applied to documents as they arrive. Each
    * doc explodes into the SAME hashed 5-gram keys as the batch
    * operator (TextOps.contamGrams — shared Column expressions, so
    * stream and batch verdicts are bit-identical), a stream-static
    * LEFT OUTER join marks grams present in the static benchmark-gram
    * set (broadcast, like the batch plan), and a per-doc stateful
    * tally emits the updated contamination fraction. Totals
    * accumulate across micro-batches, so a doc re-scored after its
    * grams arrive in separate batches converges to the batch answer.
    *
    * State is two counters per doc — bounded by corpus size, not
    * stream length; production adds TTL once a doc's grams are known
    * complete.
    */
  def contamination(docs: Dataset[DocRow], benchGrams: DataFrame,
      threshold: Double = 0.1): Dataset[ContamOut] = {
    import docs.sparkSession.implicits._
    val grams = graft.ops.TextOps.contamGrams(docs.toDF)
    val marked = grams
      .join(broadcast(benchGrams.select(col("g"), lit(true).as("hit"))),
        Seq("g"), "left_outer")
      .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("hit"))
      .as[GramHit]
    marked.groupByKey(_.doc_id)
      .mapGroupsWithState[ContamState, ContamOut](
        GroupStateTimeout.NoTimeout) {
        case (docId, batch, state: GroupState[ContamState]) =>
          val prev = state.getOption.getOrElse(ContamState(0L, 0L))
          val next = batch.foldLeft(prev)((st, g) =>
            ContamState(st.nGrams + 1, st.nHit + (if (g.hit) 1 else 0)))
          state.update(next)
          val frac = next.nHit.toDouble / next.nGrams
          ContamOut(docId, next.nGrams, next.nHit, frac,
            frac >= threshold)
      }
  }

  /** Per-doc winnow-decontamination verdict for the streaming gate. */
  final case class WinnowContamOut(doc_id: Long, n_fp: Long, n_hit: Long,
      is_contaminated: Boolean)

  /** (g2) Streaming winnow decontamination: the batch
    * q_winnow_contamination gate applied per arriving document.
    * Unlike the gram tally (which accumulates state across batches),
    * a document's winnow fingerprint set is a pure function of its
    * complete text — TextOps.jvmWinnow, spec-proven identical to the
    * SQL selection — so the op is a STATELESS map against the bench
    * fingerprint set (broadcast once via the closure; at corpus
    * scale, ship it as a bloom + exact re-check or a stream-static
    * join). Stateless ⇒ append-mode safe, no watermark, and verdicts
    * are bit-identical to the batch operator regardless of
    * micro-batch splits.
    */
  def winnowContamination(docs: Dataset[DocRow], benchFp: Set[Long],
      minShared: Int = 2): Dataset[WinnowContamOut] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      // null text drops silently, like the batch twin's size filter
      // (Spark split(null) → null → filter false) — a poisoned row
      // must not kill the stream
      val fps = Option(d.text).toSeq
        .flatMap(t => graft.ops.TextOps.jvmWinnow(t).map(_._2)).distinct
      if (fps.isEmpty) None
      else {
        val hits = fps.count(benchFp.contains)
        Some(WinnowContamOut(d.doc_id, fps.size.toLong, hits.toLong,
          hits >= minShared))
      }
    }
  }

  // ------------------------------------------- streaming sessionization

  final case class SessEvent(userId: Long, us: Long, eventId: Long,
      eventType: String)
  final case class SessionOut(userId: Long, sessionId: Long, nEvents: Long,
      startUs: Long, endUs: Long, durationUs: Long, nPurchases: Long)
  final case class SessState(sessionId: Long, nEvents: Long, startUs: Long,
      endUs: Long, nPurchases: Long)

  /** q_ts_sessionize as a stateful streaming op: per-user gap-based
    * sessions (a > `gapUs` silence starts the next session), emitted
    * when CLOSED by the first event of the following session. State is
    * one open session per user — five longs, O(users) total, at any
    * stream length; compare the batch query, which windows over every
    * event.
    *
    * Session numbering, membership, and the per-session aggregates use
    * the same (us, event_id) order and the same gap comparison as the
    * batch operator, so for the same events a closed session here
    * equals the batch row exactly (StreamingSpec asserts equality
    * across micro-batch splits). Contract: per-user event-time order
    * across batches (consume a watermark-ordered upstream); the last
    * session of each user stays open — callers close tails by sending
    * a past-gap sentinel event, or pass `stateTtl` for the timeout
    * flush.
    *
    * With `stateTtl` set (choose it ≥ the gap, so a flush can never
    * fire while a live event could still have extended the session),
    * a user idle past the TTL against the event-time watermark has
    * their open session EMITTED as closed and their state evicted —
    * the flush the NoTimeout form documents as the caller's job, plus
    * the bounded-state guarantee: O(users active inside the TTL
    * window), not O(all-time users). A returning user restarts at
    * session 1 (the documented windowed trade — the all-time session
    * ordinal needs all-time state).
    */
  def sessionize(events: Dataset[SessEvent],
      gapUs: Long = 1800000000L, stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    def fold(user: Long, rows: Seq[SessEvent],
        state: GroupState[SessState]): Iterator[SessionOut] = {
      var cur = state.getOption
      val closed = Seq.newBuilder[SessionOut]
      rows.sortBy(e => (e.us, e.eventId)).foreach { e =>
        val purchase = if (e.eventType == "purchase") 1L else 0L
        cur match {
          case Some(s) if e.us - s.endUs > gapUs =>
            closed += SessionOut(user, s.sessionId, s.nEvents,
              s.startUs, s.endUs, s.endUs - s.startUs, s.nPurchases)
            cur = Some(SessState(s.sessionId + 1, 1L, e.us, e.us,
              purchase))
          case Some(s) =>
            cur = Some(SessState(s.sessionId, s.nEvents + 1, s.startUs,
              e.us, s.nPurchases + purchase))
          case None =>
            cur = Some(SessState(1L, 1L, e.us, e.us, purchase))
        }
      }
      cur.foreach(state.update)
      closed.result().iterator
    }
    if (stateTtl.isEmpty)
      events.groupByKey(_.userId)
        .flatMapGroupsWithState[SessState, SessionOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state)
        }
    else
      withKeyTtl[SessEvent, Long, SessState, SessionOut](
        events, _.us, _.userId, stateTtl, watermarkDelay,
        OutputMode.Append())(fold) { (user, state) =>
        // timeout flush: the open session closes exactly as a
        // past-gap event would have closed it
        state.getOption.iterator.map(s =>
          SessionOut(user, s.sessionId, s.nEvents, s.startUs, s.endUs,
            s.endUs - s.startUs, s.nPurchases))
      }
  }

  /** With `stateTtl` set, a series idle past the TTL against the
    * event-time watermark drops its lifetime counters — the next row
    * restarts them (the windowed trade; series population is
    * unbounded on a forever-running ingest, the TTL bounds it).
    */
  def seriesStats(rows: Dataset[StreamRow], stateTtl: String = "",
      watermarkDelay: String = "10 seconds"): Dataset[SeriesUpdate] = {
    import rows.sparkSession.implicits._
    def fold(key: (String, String), rowsSeq: Seq[StreamRow],
        state: GroupState[SeriesState]): Iterator[SeriesUpdate] = {
      val prev = state.getOption.getOrElse(
        SeriesState(0L, "", Long.MaxValue, Long.MinValue))
      // deterministic fold: order within a batch by (ts, value)
      val sorted = rowsSeq.sortBy(r => (r.timestampUs, r.value))
      val next = sorted.foldLeft(prev) { (st, r) =>
        SeriesState(st.n + 1, r.value,
          math.min(st.minTs, r.timestampUs),
          math.max(st.maxTs, r.timestampUs))
      }
      state.update(next)
      Iterator.single(SeriesUpdate(key._1, key._2, next.n,
        next.lastValue, if (next.n == 0) 0L else next.maxTs - next.minTs))
    }
    if (stateTtl.isEmpty)
      rows.groupByKey(r => (r.namespace, r.measurement))
        .mapGroupsWithState[SeriesState, SeriesUpdate](
          GroupStateTimeout.NoTimeout) {
          (k, batch, state) => fold(k, batch.toSeq, state).next()
        }
    else
      withKeyTtl[StreamRow, (String, String), SeriesState, SeriesUpdate](
        rows, _.timestampUs, r => (r.namespace, r.measurement),
        stateTtl, watermarkDelay, OutputMode.Update())(fold)(
        (_, _) => Iterator.empty)
  }

  /** A keyed change event (the CDC shape q_dedup_latest compacts). */
  final case class KeyedEvent(user_id: Long, event_type: String,
      event_id: Long, tsUs: Long, value: Double)

  /** The current materialized row for one key. */
  final case class LatestOut(user_id: Long, event_type: String,
      latest_event_id: Long, latest_us: Long, latest_value: Double,
      n_versions: Long)

  // public like the other state shapes: the state encoder's generated
  // code needs a visible constructor
  final case class LatestState(eventId: Long, tsUs: Long,
      value: Double, n: Long)

  // the (ts, event_id)-max fold shared by the lifetime and TTL paths
  // — the batch tie-break exactly
  private def latestFold(rows: Seq[KeyedEvent],
      prev: Option[LatestState]): LatestState = {
    val cand = rows.maxBy(e => (e.tsUs, e.event_id))
    prev match {
      case Some(p) if p.tsUs > cand.tsUs ||
          (p.tsUs == cand.tsUs && p.eventId >= cand.event_id) =>
        p.copy(n = p.n + rows.size)
      case Some(p) =>
        LatestState(cand.event_id, cand.tsUs, cand.value,
          p.n + rows.size)
      case None =>
        LatestState(cand.event_id, cand.tsUs, cand.value,
          rows.size.toLong)
    }
  }

  /** Event-time projection of a keyed event — the TTL path's input
    * (a watermark needs a Timestamp column).
    */
  final case class TimedKeyed(ts: Timestamp, e: KeyedEvent)

  /** (k) Streaming keep-latest-per-key — the materialized-view twin
    * of q_dedup_latest: state holds the newest (ts, event_id)-max row
    * per key and every micro-batch re-emits the keys it touched with
    * their current latest row + lifetime version count (Update-mode
    * upsert semantics; a downstream sink overwrites by key). The last
    * emission per key is spec-proven identical to the batch
    * compaction however the stream is micro-batched.
    *
    * With the default `stateTtl = ""` state is ONE fixed-size record
    * per ALL-TIME key — the same cardinality as the compacted table
    * being maintained, which is the right default when the key space
    * is the product (at scale the state store backend, e.g. RocksDB,
    * is the sizing knob, not a timeout). On a forever-running
    * changelog whose key population churns (sessions, ephemeral ids),
    * pass `stateTtl` (e.g. "30 days"): keys idle past the TTL against
    * the event-time watermark are evicted — the same design as
    * [[dedupExact]]. The documented trade: an evicted key forgets its
    * current value AND its version count, so a later event for it
    * restarts n_versions at the new batch's count (events behind the
    * watermark are dropped entirely by the standard late-data rule,
    * so a forgotten value can never be resurrected by data older
    * than the watermark). Spec-asserted both ways — in-window
    * convergence parity holds, and a post-expiry event restarting
    * the count proves the eviction fired.
    *
    * Eviction is STATE-only by default: an Update-mode sink keeps the
    * evicted key's last upsert until the key is next written — the
    * view's state forgets, the materialization doesn't. Pass
    * `emitTombstones = true` to emit a delete marker on timeout — the
    * key's identity columns with `n_versions = 0` (impossible for a
    * real upsert, which always counts ≥ 1) — which an upsert sink
    * treats as "delete this key", the standard changelog-compaction
    * convention. Same contract on the heavyHittersTtl / kmvTtl /
    * quantileSampleTtl siblings (sentinel: n_seen = 0 / k_used = 0).
    */
  def latest(events: Dataset[KeyedEvent], stateTtl: String = "",
      watermarkDelay: String = "10 seconds",
      emitTombstones: Boolean = false): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    if (stateTtl.isEmpty) {
      events.groupByKey(e => (e.user_id, e.event_type))
        .flatMapGroupsWithState[LatestState, LatestOut](
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
          case ((uid, et), batch, state: GroupState[LatestState]) =>
            val rows = batch.toSeq
            if (rows.isEmpty) Iterator.empty
            else {
              val next = latestFold(rows, state.getOption)
              state.update(next)
              Iterator.single(LatestOut(uid, et, next.eventId,
                next.tsUs, next.value, next.n))
            }
        }
    } else {
      events.map(e => TimedKeyed(new Timestamp(e.tsUs / 1000L), e))
        .withWatermark("ts", watermarkDelay)
        .groupByKey(t => (t.e.user_id, t.e.event_type))
        .flatMapGroupsWithState[LatestState, LatestOut](
          OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
          case ((uid, et), batch, state: GroupState[LatestState]) =>
            if (state.hasTimedOut) {
              state.remove() // idle past TTL: the view forgets the key
              if (emitTombstones)
                Iterator.single(LatestOut(uid, et, 0L, 0L, 0.0, 0L))
              else Iterator.empty
            } else {
              val rows = batch.map(_.e).toSeq
              if (rows.isEmpty) Iterator.empty
              else {
                val next = latestFold(rows, state.getOption)
                state.update(next)
                // sliding expiry, clamped above the watermark (late
                // data can land behind it, which Spark rejects)
                val maxEvtMs = rows.iterator.map(_.tsUs / 1000L).max
                state.setTimeoutTimestamp(
                  math.max(maxEvtMs, state.getCurrentWatermarkMs() + 1),
                  stateTtl)
                Iterator.single(LatestOut(uid, et, next.eventId,
                  next.tsUs, next.value, next.n))
              }
            }
        }
    }
  }

  /** A streamed document tagged with its source (mixture key). */
  final case class SourcedDoc(source: String, doc_id: Long, text: String)

  /** One Misra–Gries summary entry for a source, as of `n_seen`
    * processed tokens: `mg_n` underestimates the true count by at
    * most n_seen/k (the classic MG bound).
    */
  final case class HeavyHitter(source: String, word: String,
      mg_n: Long, n_seen: Long)

  final case class MgState(counts: Map[String, Long], seen: Long)

  /** (l) Streaming heavy hitters per source — a Misra–Gries summary
    * of at most k words per key, the constant-memory frequent-items
    * primitive for an unbounded token stream (the streaming face of
    * q_vocab_topk, which needs a corpus-wide aggregation). State is
    * ≤ k counters per source — O(keys·k) total, independent of
    * stream length — and every micro-batch re-emits the touched
    * keys' current summaries (Update-mode upsert by (source, word)).
    * The MG guarantees hold whatever the arrival order: any word
    * with true frequency > n_seen/k is present in the summary, and
    * each reported count undershoots its true count by at most
    * n_seen/k (spec-asserted against exact batch counts across
    * micro-batch splits). Within a batch, documents fold in doc_id
    * order and tokens in text order, so a replayed stream produces
    * byte-identical summaries.
    */
  // the Misra–Gries fold shared by the lifetime and TTL paths
  private def mgFold(docs: Seq[SourcedDoc], prev: Option[MgState],
      k: Int): MgState = {
    var m = prev.map(_.counts).getOrElse(Map.empty[String, Long])
    var seen = prev.map(_.seen).getOrElse(0L)
    docs.sortBy(_.doc_id).foreach { d =>
      d.text.split(" ").iterator.filter(_.nonEmpty).foreach { w =>
        seen += 1
        m.get(w) match {
          case Some(c) => m = m.updated(w, c + 1)
          case None if m.size < k => m = m.updated(w, 1L)
          case None => // decrement-all: the MG eviction step
            m = m.iterator.map { case (kw, c) => kw -> (c - 1) }
              .filter(_._2 > 0).toMap
        }
      }
    }
    MgState(m, seen)
  }

  def heavyHitters(docs: Dataset[SourcedDoc], k: Int = 8)
      : Dataset[HeavyHitter] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[MgState, HeavyHitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (src, batch, state: GroupState[MgState]) =>
          val next = mgFold(batch.toSeq, state.getOption, k)
          state.update(next)
          next.counts.iterator.map { case (w, c) =>
            HeavyHitter(src, w, c, next.seen) }
      }
  }

  /** A sourced document with its ingest event time — the TTL-bounded
    * sketch views' input shape.
    */
  final case class TimedSourcedDoc(source: String, doc_id: Long,
      text: String, tsUs: Long)

  final case class TimedSrcEvt(ts: Timestamp, source: String,
      doc_id: Long, text: String)

  /** [[heavyHitters]] with per-source event-time TTL: a source idle
    * past `stateTtl` against the watermark drops its MG summary (and
    * its n_seen denominator — the next event restarts the summary
    * from zero, the documented windowed-sketch trade). For streams
    * whose SOURCE population churns (per-domain crawl feeds); with a
    * fixed mixture dimension prefer the lifetime form. Eviction is
    * state-only by default (the sink keeps the last upsert);
    * `emitTombstones = true` emits `(source, "", 0, 0)` on timeout —
    * n_seen = 0 is impossible for a real summary row — so an upsert
    * sink can drop the source (see [[latest]]).
    */
  def heavyHittersTtl(docs: Dataset[TimedSourcedDoc], k: Int = 8,
      stateTtl: String = "7 days",
      watermarkDelay: String = "10 seconds",
      emitTombstones: Boolean = false): Dataset[HeavyHitter] = {
    import docs.sparkSession.implicits._
    docs.map(d => TimedSrcEvt(new Timestamp(d.tsUs / 1000L), d.source,
        d.doc_id, d.text))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.source)
      .flatMapGroupsWithState[MgState, HeavyHitter](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (src, batch, state: GroupState[MgState]) =>
          if (state.hasTimedOut) {
            state.remove()
            if (emitTombstones)
              Iterator.single(HeavyHitter(src, "", 0L, 0L))
            else Iterator.empty
          } else {
            val rows = batch.toSeq
            if (rows.isEmpty) Iterator.empty
            else {
              val next = mgFold(
                rows.map(t => SourcedDoc(t.source, t.doc_id, t.text)),
                state.getOption, k)
              state.update(next)
              val maxEvtMs = rows.iterator.map(_.ts.getTime).max
              state.setTimeoutTimestamp(
                math.max(maxEvtMs, state.getCurrentWatermarkMs() + 1),
                stateTtl)
              next.counts.iterator.map { case (w, c) =>
                HeavyHitter(src, w, c, next.seen) }
            }
          }
      }
  }

  /** A KMV cardinality estimate for one source as of the latest
    * batch: `est` mirrors q_vocab_kmv's formula bit-for-bit.
    */
  final case class KmvEstimate(source: String, k_used: Long,
      kth_h: Long, est: Double)

  final case class KmvState(mins: Seq[Long])

  /** (m) Streaming KMV distinct-count sketch per source — the
    * streaming face of q_vocab_kmv: state is the k smallest 60-bit
    * word hashes seen so far (a SORTED ≤ k vector — constant memory
    * per key, like every sketch here), updated per micro-batch by
    * merge-and-trim, which is exactly how two KMV sketches union at
    * scale. Because the k-minimum SET of a multiset is
    * order-independent, the final estimate is spec-proven EQUAL (not
    * approximately equal) to the batch operator's, however the stream
    * is micro-batched — the same convergence discipline as
    * StreamingIngest.latest.
    */
  // merge-and-trim + estimate, shared by the lifetime and TTL paths;
  // first 15 hex chars = top 60 bits, matching the SQL
  // conv(substring(md5(w), 1, 15), 16, 10) idiom
  private def kmvFold(docs: Iterator[SourcedDoc],
      prev: Option[KmvState], k: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(w: String): Long = {
      md.reset()
      val d = md.digest(w.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val incoming = docs.flatMap(d =>
      d.text.split(" ").iterator.filter(_.nonEmpty).map(h60))
    (prev.map(_.mins).getOrElse(Seq.empty) ++ incoming)
      .distinct.sorted.take(k)
  }

  private def kmvEmit(src: String, merged: Seq[Long], k: Int,
      state: GroupState[KmvState]): Iterator[KmvEstimate] =
    // a batch of only empty/whitespace docs for a fresh key has
    // no hashes: nothing to estimate yet — emit nothing rather
    // than crash on merged.last (the batch twin's length filter
    // simply omits such sources)
    if (merged.isEmpty) Iterator.empty
    else {
      state.update(KmvState(merged))
      val kth = merged.last
      val est =
        if (merged.size < k) merged.size.toDouble
        else (k - 1).toDouble * 1152921504606846976.0 / kth.toDouble
      Iterator.single(KmvEstimate(src, merged.size.toLong, kth, est))
    }

  def kmv(docs: Dataset[SourcedDoc], k: Int = 64)
      : Dataset[KmvEstimate] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[KmvState, KmvEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (src, batch, state: GroupState[KmvState]) =>
          kmvEmit(src, kmvFold(batch, state.getOption, k), k, state)
      }
  }

  /** [[kmv]] with per-source event-time TTL — same eviction contract
    * as [[heavyHittersTtl]]: an idle source's sketch (its k minimum
    * hashes) is dropped and a later event restarts the estimate.
    * Eviction is state-only by default; `emitTombstones = true` emits
    * `(source, 0, 0, 0.0)` on timeout (k_used = 0 is impossible for a
    * real estimate) so an upsert sink can drop the source.
    */
  def kmvTtl(docs: Dataset[TimedSourcedDoc], k: Int = 64,
      stateTtl: String = "7 days",
      watermarkDelay: String = "10 seconds",
      emitTombstones: Boolean = false): Dataset[KmvEstimate] = {
    import docs.sparkSession.implicits._
    docs.map(d => TimedSrcEvt(new Timestamp(d.tsUs / 1000L), d.source,
        d.doc_id, d.text))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.source)
      .flatMapGroupsWithState[KmvState, KmvEstimate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (src, batch, state: GroupState[KmvState]) =>
          if (state.hasTimedOut) {
            state.remove()
            if (emitTombstones)
              Iterator.single(KmvEstimate(src, 0L, 0L, 0.0))
            else Iterator.empty
          } else {
            val rows = batch.toSeq
            if (rows.isEmpty) Iterator.empty
            else {
              val merged = kmvFold(rows.iterator
                  .map(t => SourcedDoc(t.source, t.doc_id, t.text)),
                state.getOption, k)
              val out = kmvEmit(src, merged, k, state)
              // a whitespace-only batch for a fresh key updates no
              // state, and a timeout cannot be set without state
              if (state.exists) {
                val maxEvtMs = rows.iterator.map(_.ts.getTime).max
                state.setTimeoutTimestamp(
                  math.max(maxEvtMs, state.getCurrentWatermarkMs() + 1),
                  stateTtl)
              }
              out
            }
          }
      }
  }

  final case class QsRow(g: String, v: Double, k1: Long, k2: Long)

  /** One sampled row: the 60-bit key hash plus the tie-break keys and
    * the value it carries. The SAMPLE (the bottom-k set by hash) is
    * what the state holds — ≤ k entries per group, constant memory.
    */
  final case class QsEntry(h: Long, k1: Long, k2: Long, v: Double)
  final case class QsState(rows: Seq[QsEntry])
  final case class QsOut(g: String, k_used: Long, p50: Double,
      p90: Double, p99: Double)

  /** (q) Streaming bottom-k-by-hash quantile sample per group — the
    * streaming face of q_dq_quantile_sample's sample half: state is
    * the k rows with the SMALLEST key hashes seen so far (merge +
    * trim per micro-batch, exactly how two bottom-k samples union at
    * scale), and each update emits the discrete-ceil-rank p50/p90/p99
    * read off the current sample. The bottom-k SET of a keyed stream
    * is order-independent, so the converged sample — and therefore
    * every emitted quantile — is spec-proven EQUAL to the batch
    * operator's sample columns, however the stream is micro-batched.
    * De-dup is by the WHOLE entry (hash, keys, value): a redelivered
    * row is bit-identical, so at-least-once replay cannot
    * double-insert, while distinct rows that happen to share a
    * (k1, k2) key — the fixture has ~1.2k such pairs per 6k rows —
    * stay distinct, exactly as the batch operator keeps them.
    */
  // bottom-k merge + quantile readout shared by both paths
  private def qsFold(rows: Iterator[QsRow],
      prev: Option[QsState], k: Int): Seq[QsEntry] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val incoming = rows.map(r =>
      QsEntry(h60(s"${r.k1}:${r.k2}"), r.k1, r.k2, r.v))
    (prev.map(_.rows).getOrElse(Seq.empty) ++ incoming)
      .distinct.sortBy(e => (e.h, e.k1, e.k2, e.v)).take(k)
  }

  private def qsEmit(g: String, merged: Seq[QsEntry],
      state: GroupState[QsState]): Iterator[QsOut] =
    if (merged.isEmpty) Iterator.empty
    else {
      state.update(QsState(merged))
      val byV = merged.sortBy(e => (e.v, e.k1, e.k2))
      val n = byV.size.toLong
      def pick(p: Long): Double =
        byV(((p * n + 99L) / 100L).toInt - 1).v
      Iterator.single(QsOut(g, n, pick(50), pick(90), pick(99)))
    }

  def quantileSample(rows: Dataset[QsRow], k: Int = 64)
      : Dataset[QsOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.g)
      .flatMapGroupsWithState[QsState, QsOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, batch, state: GroupState[QsState]) =>
          qsEmit(g, qsFold(batch, state.getOption, k), state)
      }
  }

  /** A sampled row with its event time — [[quantileSampleTtl]]'s
    * input shape.
    */
  final case class TimedQsRow(g: String, v: Double, k1: Long, k2: Long,
      tsUs: Long)

  final case class TimedQsEvt(ts: Timestamp, g: String,
      v: Double, k1: Long, k2: Long)

  /** [[quantileSample]] with per-group event-time TTL — same
    * eviction contract as [[heavyHittersTtl]]: an idle group's
    * bottom-k sample is dropped and a later row restarts it.
    * Eviction is state-only by default; `emitTombstones = true` emits
    * `(g, 0, 0, 0, 0)` on timeout (k_used = 0 is impossible for a
    * real readout) so an upsert sink can drop the group.
    */
  def quantileSampleTtl(rows: Dataset[TimedQsRow], k: Int = 64,
      stateTtl: String = "7 days",
      watermarkDelay: String = "10 seconds",
      emitTombstones: Boolean = false): Dataset[QsOut] = {
    import rows.sparkSession.implicits._
    rows.map(r => TimedQsEvt(new Timestamp(r.tsUs / 1000L), r.g, r.v,
        r.k1, r.k2))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.g)
      .flatMapGroupsWithState[QsState, QsOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (g, batch, state: GroupState[QsState]) =>
          if (state.hasTimedOut) {
            state.remove()
            if (emitTombstones)
              Iterator.single(QsOut(g, 0L, 0.0, 0.0, 0.0))
            else Iterator.empty
          } else {
            val rowsSeq = batch.toSeq
            if (rowsSeq.isEmpty) Iterator.empty
            else {
              val merged = qsFold(rowsSeq.iterator
                  .map(t => QsRow(t.g, t.v, t.k1, t.k2)),
                state.getOption, k)
              val out = qsEmit(g, merged, state)
              if (state.exists) {
                val maxEvtMs = rowsSeq.iterator.map(_.ts.getTime).max
                state.setTimeoutTimestamp(
                  math.max(maxEvtMs, state.getCurrentWatermarkMs() + 1),
                  stateTtl)
              }
              out
            }
          }
      }
  }

  /** Streaming Count-Min-Sketch cell builder over a token stream.
    * CMS cells are ADDITIVE, so the streaming form is nothing more
    * than a bounded-key (rows × buckets ≤ 3·1024) streaming
    * aggregation — run it with Complete output mode and the sink
    * always holds the exact sketch of everything ingested so far,
    * bit-equal to the batch build over the same tokens (CmsSpec
    * proves split-invariance). Same single-md5 digest-slice bucketing
    * as the batch q_sketch_cms (row r's bucket = hex chars
    * [1+10r, 10+10r) of ONE md5(word), mod buckets), so a
    * batch-built sketch and a stream-built sketch are
    * interchangeable cell-for-cell.
    */
  def cms(words: Dataset[String], rows: Int = 3,
      buckets: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.functions._
    require(rows * 10 <= 32, "md5 has 32 hex chars: at most 3 x 10-char slices")
    words.toDF("word")
      .filter(length(col("word")) > 0)
      .withColumn("d", md5(col("word")))
      .withColumn("r", explode(array((0 until rows).map(lit): _*)))
      .select(col("r"),
        (conv(col("d").substr(lit(1) + lit(10) * col("r"), lit(10)),
          16, 10).cast("long") % buckets).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
  }

  final case class M4Event(series: String, tsUs: Long, eventId: Long,
      x: Double)

  /** q_ts_m4 as a watermarked tumbling-window aggregation — possible
    * PRECISELY because the batch operator's extreme points are
    * associative struct-min/-max (not windows): each micro-batch
    * folds its rows into the four per-bucket extreme structs and the
    * state-store merge across batches is the same struct comparison,
    * so the converged result is bit-equal to batch M4 over the same
    * events no matter how the stream is micro-batched (StreamingSpec
    * asserts it under adversarial splits). Spark's tumbling windows
    * are epoch-aligned, matching the batch `us div bucket` bucketing
    * exactly. State per key is 4 structs + a count — constant — and
    * the watermark expires closed pixels; this is the live-dashboard
    * serving path next to the batch backfill.
    */
  def m4(events: Dataset[M4Event], watermark: String = "1 minute",
      bucketWidth: String = "15 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermark)
      .groupBy(col("series"), window(col("eventTime"), bucketWidth))
      .agg(count(lit(1)).as("n"),
        min(struct(col("tsUs").as("us"), col("eventId").as("event_id"),
          col("x").as("value"))).as("pf"),
        max(struct(col("tsUs").as("us"), col("eventId").as("event_id"),
          col("x").as("value"))).as("pl"),
        min(struct(col("x").as("value"), col("tsUs").as("us"),
          col("eventId").as("event_id"))).as("pn"),
        max(struct(col("x").as("value"), (-col("tsUs")).as("nus"),
          (-col("eventId")).as("nid"))).as("px"))
      .select(col("series"),
        unix_micros(col("window.start")).as("bucket_us"), col("n"),
        col("pf.us").as("t_first"), col("pf.value").as("v_first"),
        col("pn.us").as("t_min"), col("pn.value").as("v_min"),
        (-col("px.nus")).as("t_max"), col("px.value").as("v_max"),
        col("pl.us").as("t_last"), col("pl.value").as("v_last"))
  }

  /** Streaming HyperLogLog register builder over a (source, text)
    * document stream: each register is max(rank) per (source, bucket)
    * — register max is associative AND idempotent, so a Complete-mode
    * aggregation's sink always holds exactly the registers the batch
    * q_vocab_hll would build over everything ingested so far (the
    * estimate is a stateless fold over ≤64 register rows per source,
    * done by the reader; StreamingSpec computes it from the sink and
    * asserts bit-equality with the batch estimates). Same md5 bucket/
    * rank derivation as the batch operator, shared verbatim. State is
    * ≤ 64 rows × sources — the constant-size profile sketch, live.
    */
  def hllRegisters(docs: Dataset[SourcedDoc]): DataFrame = {
    import org.apache.spark.sql.functions._
    val two54 = 18014398509481984L
    docs.toDF()
      .select(col("source"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .select(col("source"),
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long")
          .as("h"))
      .select(col("source"), expr(s"h div $two54").as("bucket"),
        (col("h") % two54).as("rem"))
      .select(col("source"), col("bucket"),
        when(col("rem") === 0, lit(55L))
          .otherwise(lit(55L) - length(bin(col("rem"))).cast("long"))
          .as("rank"))
      .groupBy("source", "bucket")
      .agg(max(col("rank")).as("m"))
  }

  /** q_ts_trend as a streaming aggregation: the five regression
    * sufficient statistics are plain BIGINT sums — the textbook
    * mergeable form — so a Complete-mode aggregation's converged
    * slope/r² are bit-equal to the batch fit over the same events
    * however the stream is micro-batched (StreamingSpec asserts it).
    * Same floor-cents y and day-index x as the batch operator.
    */
  def trend(events: Dataset[M4Event]): DataFrame = {
    import org.apache.spark.sql.functions._
    val st = events.toDF()
      .select(col("series"), expr("tsUs div 86400000000").as("dx"),
        floor(col("x") * 100.0).as("y"))
      .groupBy("series")
      .agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("y")).as("sy"),
        sum(col("dx") * col("y")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    st.select(col("series"), col("n"),
      when(varx === 0.0, lit(null).cast("double"))
        .otherwise(cov / varx / lit(100.0)).as("slope_per_day"),
      when(varx * vary === 0.0, lit(null).cast("double"))
        .otherwise(cov * cov / (varx * vary)).as("r2"))
  }

  /** A streamed embedding with its cohort key (scrape batch, model
    * version, …) — input shape of the centroid-sum twin.
    */
  final case class EmbedPoint(cohort: Int, embedding: Seq[Float])

  /** Streaming twin of the batch quantized centroid-sum stage
    * (graft.ops.Similarity.quantizedSums, which feeds the semantic
    * outlier / confusion / drift monitors): per (cohort, dim), the
    * exact 2^20-quantized integer sum and count. Integer sums are
    * the textbook mergeable form, so a Complete-mode aggregation's
    * converged state IS the batch result — StreamingSpec proves
    * bit-equality under adversarial micro-batching. State is
    * cohorts × 64 cells of two BIGINTs: constant for a monitor that
    * watches a handful of cohorts, regardless of stream length.
    *
    * Quantization mirrors Catalyst's Round exactly —
    * BigDecimal.valueOf(double).setScale(0, HALF_UP); JVM Math.round
    * differs on negative .5 ties and new BigDecimal(double) differs
    * on string-vs-binary representation of near-tie doubles.
    */
  def quantizedSums(points: Dataset[EmbedPoint]): DataFrame = {
    import points.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    points.flatMap { p =>
      p.embedding.iterator.zipWithIndex.map { case (v, i) =>
        (p.cohort, i,
          java.math.BigDecimal.valueOf(v.toDouble * 1048576.0)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
      }
    }.toDF("cohort", "pos", "q")
      .groupBy("cohort", "pos")
      .agg(sum(col("q")).as("sd"), count(lit(1)).as("n"))
  }

  /** A streamed embedding carrying both its class label and its
    * scrape-cohort key — input of the cohort-drift sufficient-stats
    * twin.
    */
  final case class LabeledEmbedPoint(label: Long, cohort: Int,
      embedding: Seq[Float])

  /** [[quantizedSums]] keyed additionally by label — the sufficient
    * statistics of q_embed_cohort_drift as a Complete-mode streaming
    * aggregation: per (label, cohort, dim), the exact 2^20-quantized
    * integer sum and count, mergeable across micro-batches by
    * construction. Spark allows one stateful aggregation per stream,
    * so the finishing reduction (per-label centroid cosine + L2
    * shift) is a labels×2×64-row BATCH read over the converged sink —
    * StreamingSpec proves the finished drift rows equal the batch
    * operator's bit-for-bit under adversarial micro-batching. State
    * is labels × cohorts × 64 cells of two BIGINTs — constant for a
    * monitor, regardless of stream length.
    */
  def labeledQuantizedSums(
      points: Dataset[LabeledEmbedPoint]): DataFrame = {
    import points.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    points.flatMap { p =>
      p.embedding.iterator.zipWithIndex.map { case (v, i) =>
        (p.label, p.cohort, i,
          java.math.BigDecimal.valueOf(v.toDouble * 1048576.0)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
      }
    }.toDF("label", "cohort", "pos", "q")
      .groupBy("label", "cohort", "pos")
      .agg(sum(col("q")).as("sd"), count(lit(1)).as("n"))
  }

  /** One decoded frame's exact pixel sum arriving on the stream —
    * the scene-segmentation twin's input (a video ingest path emits
    * these from its decode stage; frames may arrive out of order
    * across micro-batches).
    */
  final case class FrameEvt(doc_id: Long, frame_idx: Long, n_px: Long,
      psum: Long)

  final case class SceneState(frames: Seq[(Long, Long, Long)])

  final case class SceneOut(doc_id: Long, n_frames: Long,
      n_scenes: Long, longest_len: Long, longest_start: Long)

  /** Streaming twin of q_multimodal_video_scenes — the streaming
    * family's multimodal member: per doc, state holds the frame sums
    * seen so far (bounded by the container's frame count, NOT the
    * stream length — a container is finite even when the corpus
    * stream is not), and every micro-batch re-emits the touched
    * docs' CURRENT segmentation (Update-mode upsert). The cut rule
    * is the same integer cross-multiplication as the batch op, and
    * segmentation is recomputed from the sorted frame set, so the
    * converged output is EQUAL to the batch operator's however the
    * frames are micro-batched or reordered — the order-independence
    * the incremental lag-based form would lose (a frame arriving
    * between two already-adjacent frames changes BOTH its neighbors'
    * cuts). De-dup by frame_idx makes at-least-once redelivery a
    * no-op.
    */
  def sceneSegments(frames: Dataset[FrameEvt]): Dataset[SceneOut] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.doc_id)
      .flatMapGroupsWithState[SceneState, SceneOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (docId, batch, state: GroupState[SceneState]) =>
          val prev = state.getOption.map(_.frames).getOrElse(Seq.empty)
          val merged = (prev ++ batch.map(f =>
              (f.frame_idx, f.n_px, f.psum)))
            .distinctBy(_._1).sortBy(_._1)
          if (merged.isEmpty) Iterator.empty
          else {
            state.update(SceneState(merged))
            // recompute segmentation from the full (tiny) frame set:
            // scene id = running cut count, cut iff the exact integer
            // rule fires between consecutive frames
            var cuts = 0L
            var sceneStart = merged.head._1
            var sceneLen = 0L
            var bestLen = 0L
            var bestStart = merged.head._1
            var prevF: (Long, Long, Long) = null
            merged.foreach { f =>
              val isCut = prevF != null &&
                math.abs(f._3 * prevF._2 - prevF._3 * f._2) >
                  8L * f._2 * prevF._2
              if (isCut) {
                if (sceneLen > bestLen ||
                    (sceneLen == bestLen && sceneStart < bestStart)) {
                  bestLen = sceneLen; bestStart = sceneStart
                }
                cuts += 1
                sceneStart = f._1
                sceneLen = 0L
              }
              sceneLen += 1
              prevF = f
            }
            if (sceneLen > bestLen ||
                (sceneLen == bestLen && sceneStart < bestStart)) {
              bestLen = sceneLen; bestStart = sceneStart
            }
            Iterator.single(SceneOut(docId, merged.size.toLong,
              cuts + 1, bestLen, bestStart))
          }
      }
  }
}

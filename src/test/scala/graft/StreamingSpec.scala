package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.StreamRow

/** Structured Streaming ingest path: parquet-tier append, watermarked
  * windowed aggregation, and mapGroupsWithState series stats, all
  * driven through MemoryStream micro-batches.
  */
class StreamingSpec extends AnyFunSuite {

  private def rows(n: Int, tableOffset: Long = 0L): Seq[StreamRow] =
    (0 until n).map(i => StreamRow("ns", if (i % 2 == 0) "cpu" else "mem",
      (i * 10).toString, Map("host" -> s"h${i % 3}"),
      tableOffset + i * 30L * 1000000L)) // 30s apart

  test("stream lands in day-partitioned parquet readable by batch") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream-tier").toFile
    val ckpt = Files.createTempDirectory("stream-ckpt").toFile

    val mem = MemoryStream[StreamRow]
    val q = StreamingIngest.toParquetTier(mem.toDF(), out.getPath,
      ckpt.getPath)
    // two batches spanning a UTC day boundary
    mem.addData(rows(4))
    q.processAllAvailable()
    mem.addData(rows(4, 86400L * 1000000L))
    q.processAllAvailable()
    q.stop()

    val dayCol = graft.tier.ParquetTier.DayCol
    val read = spark.read.parquet(out.getPath)
    assert(read.count() == 8)
    // reserved-day directory partitioning exists (pruning at scale);
    // partition values are type-inferred as DATE on read — cast back
    val days = read.select(org.apache.spark.sql.functions.col(dayCol)
      .cast("string")).distinct().collect().map(_.getString(0))
    assert(days.toSet == Set("1970-01-01", "1970-01-02"))
    val pruned = read.filter(org.apache.spark.sql.functions.col(dayCol) ===
      "1970-01-02")
    assert(pruned.count() == 4)
  }

  test("engineSink lands micro-batches through the engine (WAL, " +
    "query visibility, auto-seal, auto bloom index); replayed batch " +
    "ids are no-ops") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val walDir = Files.createTempDirectory("esink-wal").toFile
    val tierDir = Files.createTempDirectory("esink-tier").toFile
    val ckpt = Files.createTempDirectory("esink-ckpt").toFile
    val engine = new graft.engine.LynxEngine(spark, walDir,
      1024 * 1024, Some(new graft.tier.ParquetTier(tierDir)),
      maxBufferedRows = 3, autoBloomColumns = Seq("host"))

    def srows(n: Int, off: Long = 0L): Seq[StreamRow] =
      (0 until n).map(i => StreamRow("events", "cpu", s"v$i",
        Map("host" -> s"h${i % 3}"), off + i * 1000000L + 1))

    val mem = MemoryStream[StreamRow]
    val q = StreamingIngest.engineSink(mem.toDS(), engine, ckpt.getPath)
    mem.addData(srows(2))
    q.processAllAvailable()
    // pre-seal rows are already engine-visible (the RAM tail)
    val r1 = engine.query("events",
      "SELECT count(*) AS c FROM cpu").get
    assert(r1.rows.head.getLong(0) == 2L)
    mem.addData(srows(4, 86400L * 1000000L))
    q.processAllAvailable()
    q.stop()
    val r2 = engine.query("events",
      "SELECT count(*) AS c FROM cpu").get
    assert(r2.rows.head.getLong(0) == 6L)
    // the row threshold auto-sealed into the tier (manifest exists),
    // and the configured bloom column got auto-indexed on that seal
    val tier2 = new graft.tier.ParquetTier(tierDir)
    assert(tier2.dataFiles("events", "cpu").nonEmpty,
      "auto-seal must have published streamed rows to the tier")
    assert(engine.valueBlooms.get.indexedColumns("events", "cpu")
      == Set("host"))

    // idempotence: re-delivering an ALREADY-APPLIED batch id (the
    // foreachBatch restart contract) is a no-op. The default sink id
    // is the canonical checkpoint path — unique per query by Spark's
    // own contract, so two streams on one engine can't share a lane.
    val sid = StreamingIngest.canonicalSinkId(ckpt.getPath)
    assert(engine.streamHighWaterMark(sid) >= 1L,
      "WAL-derived high-water mark must cover the applied batches")
    val dup = spark.createDataset(srows(2))
    assert(!StreamingIngest.applyEngineBatch(engine, sid, dup, 0L))
    val r3 = engine.query("events",
      "SELECT count(*) AS c FROM cpu").get
    assert(r3.rows.head.getLong(0) == 6L, "replayed batch must not land")
    // ...and a NEW id applies exactly once
    assert(StreamingIngest.applyEngineBatch(engine, sid, dup, 999L))
    val r4 = engine.query("events",
      "SELECT count(*) AS c FROM cpu").get
    assert(r4.rows.head.getLong(0) == 8L)
    // a SECOND stream (own checkpoint, batch ids restarting at 0)
    // gets its own lane: its batch 0 lands instead of being swallowed
    // by the first stream's high-water mark
    val ckpt2 = Files.createTempDirectory("esink-ckpt2").toFile
    val mem2 = MemoryStream[StreamRow]
    val q2 = StreamingIngest.engineSink(mem2.toDS(), engine,
      ckpt2.getPath)
    mem2.addData(Seq(StreamRow("events", "cpu", "second-stream",
      Map("host" -> "h9"), 999L * 1000000L)))
    q2.processAllAvailable()
    q2.stop()
    assert(engine.query("events",
      "SELECT count(*) AS c FROM cpu").get.rows.head.getLong(0) == 9L,
      "a second stream's batch 0 must land in its own hwm lane")
    // ...and the hwm survives a process restart, derived from the
    // WAL brackets alone (no side file): a fresh engine over the same
    // walDir refuses every batch id up to 999
    val engine2 = new graft.engine.LynxEngine(spark, walDir,
      1024 * 1024, Some(new graft.tier.ParquetTier(tierDir)),
      maxBufferedRows = 3, autoBloomColumns = Seq("host"))
    assert(engine2.streamHighWaterMark(sid) == 999L)
    assert(!StreamingIngest.applyEngineBatch(engine2, sid, dup, 999L))
    val r5 = engine2.query("events",
      "SELECT count(*) AS c FROM cpu").get
    assert(r5.rows.head.getLong(0) == 9L,
      "restart + re-delivery must not double-apply any batch")
  }

  test("engineSink exactly-once across a torn WAL bracket: a batch " +
    "whose commit marker never became durable is discarded at replay " +
    "and re-applies cleanly") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val walDir = Files.createTempDirectory("torn-wal").toFile
    val tierDir = Files.createTempDirectory("torn-tier").toFile
    val tier = new graft.tier.ParquetTier(tierDir)

    def srows(n: Int): Seq[StreamRow] =
      (0 until n).map(i => StreamRow("events", "cpu", s"v$i",
        Map("host" -> s"h$i"), i * 1000000L + 1))
    def reqs(rs: Seq[StreamRow]) = rs.map { r =>
      graft.core.WriteRequest(r.namespace, r.measurement, r.value,
        r.tags.map { case (k, v) => k -> graft.core.TagString(v) },
        r.timestampUs)
    }

    // batch 0 commits normally through the engine
    val e1 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(tier))
    assert(e1.writeStreamBatch("s", 0L, reqs(srows(2))))
    assert(e1.streamHighWaterMark("s") == 0L)
    e1.wal.close()

    // simulate the crash INSIDE batch 1's group commit: append the
    // BEGIN marker and the rows but never the COMMIT (the exact
    // prefix a torn tail can leave — every record individually
    // complete, the bracket not)
    val walFiles = walDir.listFiles().filter(_.getName.endsWith(".wal"))
      .sortBy(_.getName.stripSuffix(".wal").toLong)
    val tornSeg = walFiles.last
    val fos = new java.io.FileOutputStream(tornSeg, true)
    try {
      fos.write(graft.wal.WalCodec.encode(
        graft.core.StreamBatch.begin("s", 1L)))
      reqs(srows(4)).drop(2).foreach(w =>
        fos.write(graft.wal.WalCodec.encode(w)))
      fos.flush()
    } finally fos.close()

    // restart: the uncommitted bracket's rows must NOT surface, and
    // the hwm must still be batch 0's
    val e2 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(tier))
    assert(e2.streamHighWaterMark("s") == 0L,
      "uncommitted bracket must not advance the high-water mark")
    val r1 = e2.query("events", "SELECT count(*) AS c FROM cpu").get
    assert(r1.rows.head.getLong(0) == 2L,
      "rows of an uncommitted bracket must be discarded at replay")
    // the foreachBatch re-delivery of batch 1 (whole batch) applies
    // exactly once
    assert(e2.writeStreamBatch("s", 1L, reqs(srows(4))))
    val r2 = e2.query("events", "SELECT count(*) AS c FROM cpu").get
    assert(r2.rows.head.getLong(0) == 6L)
    // and a second delivery of it is a no-op
    assert(!e2.writeStreamBatch("s", 1L, reqs(srows(4))))
    assert(e2.query("events", "SELECT count(*) AS c FROM cpu").get
      .rows.head.getLong(0) == 6L)
  }

  test("stream high-water mark survives WAL truncation: checkpoint() " +
    "re-persists per-sink hwm records into the fresh segment") {
    val spark = SparkFixture.spark
    val walDir = Files.createTempDirectory("hwm-wal").toFile
    val tierDir = Files.createTempDirectory("hwm-tier").toFile
    val tier = new graft.tier.ParquetTier(tierDir)
    val e1 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(tier))
    val ws = (0 until 3).map(i => graft.core.WriteRequest("events",
      "cpu", s"v$i", Map("host" -> graft.core.TagString(s"h$i")),
      i * 1000000L + 1))
    assert(e1.writeStreamBatch("a", 7L, ws))
    assert(e1.writeStreamBatch("b", 3L, ws))
    // checkpoint seals everything and TRUNCATES the segments that
    // carried the brackets
    e1.checkpoint()
    e1.wal.close()
    val e2 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(tier))
    assert(e2.streamHighWaterMark("a") == 7L)
    assert(e2.streamHighWaterMark("b") == 3L)
    // sealed rows are served from the tier, not re-replayed
    assert(e2.query("events", "SELECT count(*) AS c FROM cpu").get
      .rows.head.getLong(0) == 6L)
  }

  test("writeStreamBatch under group-commit WAL: the bracket is " +
    "durable BEFORE the call returns (its own flush, not the timer), " +
    "while a plain buffered write is not — the ack precedes nothing") {
    val spark = SparkFixture.spark
    val walDir = Files.createTempDirectory("gc-stream-wal").toFile
    // timer at 60s: it will NOT fire during this test, so any
    // durability observed comes from explicit flushes alone
    val e = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      walGroupCommitMillis = 60000L)
    val ws = (0 until 3).map(i => graft.core.WriteRequest("events",
      "cpu", s"v$i", Map.empty, i * 1000000L + 1))
    assert(e.writeStreamBatch("s", 0L, ws))
    // a plain write afterwards only BUFFERS under group commit
    e.write(graft.core.WriteRequest("events", "cpu", "unflushed",
      Map.empty, 99L * 1000000L))
    // replay the live directory WITHOUT closing the wal (closing
    // would flush and hide the distinction): the bracket's rows and
    // hwm must be there; the buffered plain write must not
    val buf = new graft.buffer.MemBuffer
    val hwm = scala.collection.mutable.Map.empty[String, Long]
    graft.wal.Wal.replay(walDir, buf, _ => (), (s, b, _) =>
      hwm(s) = math.max(hwm.getOrElse(s, -1L), b))
    val vals = buf.tables("events").get("cpu")("1970-01-01").values
    assert(vals == Vector("v0", "v1", "v2"),
      "the bracket must be durable at writeStreamBatch return; the " +
        s"buffered plain write must not be (got $vals)")
    assert(hwm == Map("s" -> 0L))
    e.wal.close()
  }

  test("composition: engineSink batches seal manifest versions, a " +
    "mid-stream crash restarts with the WAL-derived hwm, and time " +
    "travel works across the restart") {
    val spark = SparkFixture.spark
    val walDir = Files.createTempDirectory("comp-wal").toFile
    val tierDir = Files.createTempDirectory("comp-tier").toFile

    def reqs(lo: Int, n: Int) = (lo until lo + n).map(i =>
      graft.core.WriteRequest("events", "cpu", s"v$i",
        Map("host" -> graft.core.TagString(s"h${i % 2}")),
        i * 1000000L + 1))

    // threshold 2: every 2-row batch seals a manifest version
    val e1 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(new graft.tier.ParquetTier(tierDir)), maxBufferedRows = 2,
      autoBloomColumns = Seq("host"))
    assert(e1.writeStreamBatch("s", 0L, reqs(0, 2))) // seals -> v1
    assert(e1.writeStreamBatch("s", 1L, reqs(2, 2))) // seals -> v2
    val versions = e1.tierVersions("events", "cpu").map(_._1)
    assert(versions.size == 2, s"two seals -> two versions: $versions")
    // batch 2 lands in the WAL + RAM tail only (below the threshold)
    assert(e1.writeStreamBatch("s", 2L, reqs(4, 1)))
    // crash: no checkpoint, no graceful close beyond releasing the
    // file handle (the rows' durability is the WAL's flush)
    e1.wal.close()

    // restart: WAL replay must restore the RAM tail, the manifests,
    // AND the stream hwm — then re-delivery of batch 2 is a no-op
    val e2 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(new graft.tier.ParquetTier(tierDir)), maxBufferedRows = 2,
      autoBloomColumns = Seq("host"))
    assert(e2.streamHighWaterMark("s") == 2L)
    assert(!e2.writeStreamBatch("s", 2L, reqs(4, 1)))
    assert(e2.query("events", "SELECT count(*) AS c FROM cpu").get
      .rows.head.getLong(0) == 5L,
      "2 sealed batches + 1 replayed RAM-tail row")
    // time travel ACROSS the restart: each pinned version sees
    // exactly the rows sealed up to it (and no RAM tail)
    val afterV = e2.tierVersions("events", "cpu").map(_._1)
    assert(afterV == versions, "restart must not mint new versions")
    assert(e2.query("events", "SELECT count(*) AS c FROM cpu",
      asOfVersion = Some(versions.head)).get.rows.head.getLong(0) == 2L)
    assert(e2.query("events", "SELECT count(*) AS c FROM cpu",
      asOfVersion = Some(versions.last)).get.rows.head.getLong(0) == 4L)
    // and the stream resumes: the NEXT batch applies and seals v3
    assert(e2.writeStreamBatch("s", 3L, reqs(5, 1)))
    assert(e2.query("events", "SELECT count(*) AS c FROM cpu").get
      .rows.head.getLong(0) == 6L)
    val v3 = e2.tierVersions("events", "cpu").map(_._1)
    assert(v3.size == 3, "the threshold seal after restart publishes v3")
  }

  test("watermarked tumbling windows aggregate per series") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[StreamRow]
    val agg = StreamingIngest.windowedCounts(mem.toDF(),
      watermark = "10 seconds", window_ = "1 minute")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Update).start()
    mem.addData(rows(4)) // ts 0s,30s,60s,90s → two 1-min windows
    q.processAllAvailable()
    q.stop()

    val res = spark.sql(
      """SELECT measurement, window_start, n, sum_value FROM win_agg
        |ORDER BY measurement, window_start""".stripMargin).collect()
    // cpu: ts 0s (v=0) and 60s (v=20) → two windows of n=1
    // mem: ts 30s (v=10) and 90s (v=30) → two windows of n=1
    assert(res.length == 4)
    assert(res.map(_.getString(0)).toSeq ==
      Seq("cpu", "cpu", "mem", "mem"))
    assert(res.map(_.getLong(2)).forall(_ == 1))
    assert(res.map(_.getDouble(3)).toSeq == Seq(0.0, 20.0, 10.0, 30.0))
  }

  test("session windows close on the inactivity gap") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[StreamRow]
    val sessions = StreamingIngest.sessionCounts(mem.toDF(),
      watermark = "10 seconds", gap = "30 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Complete).start()
    // cpu events at t=0s,10s,20s (one session) then t=120s (new one)
    mem.addData(Seq(0L, 10L, 20L, 120L).map(sec =>
      StreamRow("ns", "cpu", "1", Map.empty, sec * 1000000L)))
    q.processAllAvailable()
    q.stop()
    val res = spark.sql(
      """SELECT n FROM sess ORDER BY session_start""").collect()
      .map(_.getLong(0)).toSeq
    assert(res == Seq(3L, 1L))
  }

  test("streaming exact dedup drops repeated content across batches") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[StreamRow]
    val deduped = StreamingIngest.dedupExact(mem.toDS())
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    mem.addData(Seq(
      StreamRow("ns", "docs", "alpha", Map.empty, 1L),
      StreamRow("ns", "docs", "alpha", Map.empty, 2L), // dup in batch
      StreamRow("ns", "docs", "beta", Map.empty, 3L)))
    q.processAllAvailable()
    mem.addData(Seq(
      StreamRow("ns", "docs", "alpha", Map.empty, 4L), // dup across batch
      StreamRow("ns", "docs", "gamma", Map.empty, 5L)))
    q.processAllAvailable()
    q.stop()
    val vals = spark.sql("SELECT value FROM dedup_stream")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(vals == Seq("alpha", "beta", "gamma"))
  }

  test("bloom dedup flags every replay, never a first occurrence here, " +
    "and is micro-batch-split invariant") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // values with known replays: a (x3), b (x2), c/d/e once
    val vals = Seq("a", "b", "c", "a", "d", "b", "a", "e")
    val data = vals.zipWithIndex.map { case (v, i) =>
      StreamRow("ns", "docs", v, Map.empty, (i + 1) * 1000000L)
    }
    val expected = Seq( // (value, ts, maybe_dup): replay iff seen before
      ("a", 1, false), ("b", 2, false), ("c", 3, false), ("a", 4, true),
      ("d", 5, false), ("b", 6, true), ("a", 7, true), ("e", 8, false))

    def run(name: String, batches: Seq[Seq[StreamRow]])
        : Seq[(String, Int, Boolean)] = {
      val mem = MemoryStream[StreamRow]
      val q = StreamingIngest.bloomDedup(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      spark.sql(s"SELECT value, timestampUs, maybe_dup FROM $name")
        .collect()
        .map(r => (r.getString(0), (r.getLong(1) / 1000000L).toInt,
          r.getBoolean(2)))
        .sortBy(_._2).toSeq
    }

    // one batch with everything vs one row per micro-batch
    val oneBatch = run("bloom_one", Seq(data))
    val perRow = run("bloom_split", data.map(Seq(_)))
    assert(oneBatch == expected,
      s"single-batch flags diverged: $oneBatch")
    assert(perRow == expected,
      s"per-row flags diverged: $perRow")
  }

  test("rotating bloom dedup forgets after two generations and keeps " +
    "remembering across one") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val secUs = 1000000L
    def row(v: String, tSec: Long) =
      StreamRow("ns", "docs", v, Map.empty, tSec * secUs)
    // period 10 s: v@1 seeds gen [0,10); dup@5 flags (same gen);
    // dup@12 flags (gen [10,20) probes the retired [0,10) bitmap);
    // w@13 inserts into [10,20); dup-of-v@25 jumps ≥2 periods past
    // v's last insert... v was ALSO inserted at 12 (gen [10,20)), so
    // at 25 (gen [20,30)) the previous generation [10,20) still holds
    // v → flagged. x@26 is fresh; dup-of-w@26: w's only insert was
    // gen [10,20), which at gen [20,30) is the PREV bitmap → flagged;
    // at gen [30,40) (dup-of-w@31... would forget). Keep it simple:
    // y@45 then dup-of-x@46: x@26 lives in gen [20,30); 46 is gen
    // [40,50) — two jumps — x is forgotten → NOT flagged.
    val data = Seq(
      row("v", 1), row("v", 5), row("v", 12), row("w", 13),
      row("v", 25), row("x", 26), row("w", 26),
      row("y", 45), row("x", 46))
    val expected = Seq(
      ("v", 1L, false), ("v", 5L, true), ("v", 12L, true),
      ("w", 13L, false), ("v", 25L, true), ("w", 26L, true),
      ("x", 26L, false), ("y", 45L, false), ("x", 46L, false))

    val mem = MemoryStream[StreamRow]
    val q = StreamingIngest.bloomDedup(mem.toDS(),
        rotatePeriodUs = 10L * secUs)
      .writeStream.format("memory").queryName("bloom_rot")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .start()
    // feed in two batches to cross generations across micro-batches
    mem.addData(data.take(4)); q.processAllAvailable()
    mem.addData(data.drop(4)); q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT value, timestampUs, maybe_dup FROM bloom_rot")
      .collect()
      .map(r => (r.getString(0), r.getLong(1) / secUs, r.getBoolean(2)))
      .sortBy(t => (t._2, t._1)).toSeq
    assert(got == expected, s"rotation flags diverged: $got")
  }

  test("TTL-bounded exact dedup drops in-window dups, re-emits after " +
    "expiry, and keeps state bounded under key churn") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val mem = MemoryStream[StreamRow]
    val deduped = StreamingIngest.dedupExact(mem.toDS(),
      stateTtl = "1 minute", watermarkDelay = "0 seconds")
    val q = deduped.writeStream.format("memory").queryName("dedup_ttl")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .start()

    def stateRows(): Long =
      q.lastProgress.stateOperators.apply(0).numRowsTotal

    // batch 1: alpha + an in-batch dup → one emit, one state key
    mem.addData(Seq(
      StreamRow("ns", "docs", "alpha", Map.empty, t0),
      StreamRow("ns", "docs", "alpha", Map.empty, t0 + 1L)))
    q.processAllAvailable()
    // batch 2 (still inside the TTL window): cross-batch dup dropped
    mem.addData(Seq(
      StreamRow("ns", "docs", "alpha", Map.empty, t0 + 2L)))
    q.processAllAvailable()
    // churn: 5 batches of distinct content, each an event-hour later —
    // every earlier batch's keys are idle past the 1-minute TTL once
    // the watermark advances, so state must stay O(one batch's keys)
    mem.addData((0 until 8).map(i =>
      StreamRow("ns", "docs", s"churn_0_$i", Map.empty, t0 + hourUs)))
    q.processAllAvailable()
    val afterFirstChurn = stateRows()
    (1 to 4).foreach { b =>
      mem.addData((0 until 8).map(i =>
        StreamRow("ns", "docs", s"churn_${b}_$i", Map.empty,
          t0 + (b + 1) * hourUs)))
      q.processAllAvailable()
    }
    val afterChurn = stateRows()
    assert(afterChurn <= 2 * afterFirstChurn,
      s"dedup state must stay bounded by the active TTL window " +
        s"($afterChurn rows after churn vs $afterFirstChurn — " +
        "event-time eviction is not firing)")
    // alpha's key expired hours ago (event time): the replay re-emits
    // — the documented windowed-dedup trade, and the proof of eviction
    mem.addData(Seq(
      StreamRow("ns", "docs", "alpha", Map.empty, t0 + 7 * hourUs)))
    q.processAllAvailable()
    q.stop()
    val alphas = spark.sql(
      "SELECT timestampUs FROM dedup_ttl WHERE value = 'alpha'")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(alphas == Seq(t0, t0 + 7 * hourUs),
      s"expected the first alpha and the post-expiry replay, got $alphas")
  }

  test("exact dedup runs on the RocksDB state store provider — the " +
    "spill-to-disk state backend a forever-running ingest configures") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamRow]
      val q = StreamingIngest.dedupExact(mem.toDS())
        .writeStream.format("memory").queryName("dedup_rocks")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .start()
      mem.addData(Seq(
        StreamRow("ns", "docs", "alpha", Map.empty, 1L),
        StreamRow("ns", "docs", "beta", Map.empty, 2L)))
      q.processAllAvailable()
      mem.addData(Seq(
        StreamRow("ns", "docs", "alpha", Map.empty, 3L), // dup
        StreamRow("ns", "docs", "gamma", Map.empty, 4L)))
      q.processAllAvailable()
      // the state store really is RocksDB, not the default HDFS map
      val providers = q.lastProgress.stateOperators
        .map(_.customMetrics.keySet())
      assert(providers.exists(_.toString.contains("rocksdb")),
        s"expected rocksdb custom metrics, got $providers")
      q.stop()
      val vals = spark.sql("SELECT value FROM dedup_rocks")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(vals == Seq("alpha", "beta", "gamma"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming ewma is bit-identical to the sequential fold, " +
    "however the stream is micro-batched") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{EwmaOut, EwmaPoint}

    val pts = (0 until 40).map(i =>
      EwmaPoint(if (i % 2 == 0) "cpu" else "mem",
        i.toLong * 3600000000L, math.sin(i) * 100 + i))
    // ground truth: the q_ts_ewma fold (0.5·x + 0.5·prev, in order)
    val expected = pts.groupBy(_.series).flatMap { case (s, g) =>
      var acc = Option.empty[Double]
      g.sortBy(_.bucketUs).map { p =>
        val e = acc.fold(p.x)(prev => 0.5 * p.x + 0.5 * prev)
        acc = Some(e)
        (s, p.bucketUs) -> e
      }
    }

    def run(splits: Seq[Seq[EwmaPoint]],
        name: String): Map[(String, Long), Double] = {
      val mem = MemoryStream[EwmaPoint]
      val q = StreamingIngest.ewma(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[EwmaOut].collect()
        .map(o => (o.series, o.bucketUs) -> o.ewma).toMap
    }

    // exact == on doubles: the state handoff must not perturb a bit
    assert(run(Seq(pts), "ewma_one") == expected)
    assert(run(Seq(pts.take(13), pts.slice(13, 27), pts.drop(27)),
      "ewma_three") == expected)
  }

  test("streaming CMS cells in Complete mode equal the batch sketch " +
    "regardless of micro-batching (cells are additive)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val words = (0 until 300).map(i => s"w${i % 17}")
    val batch = StreamingIngest.cms(words.toDS())
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    val mem = MemoryStream[String]
    val q = StreamingIngest.cms(mem.toDS()).writeStream
      .format("memory").queryName("cms_cells")
      .outputMode(OutputMode.Complete).start()
    Seq(words.take(100), words.slice(100, 250), words.drop(250))
      .foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cms_cells")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
  }

  test("streaming m4 converges to the batch extreme points exactly, " +
    "however micro-batched") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q_ts_m4")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq).toMap

    val evs = graft.ops.Tables.t(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"))
      .collect()
      .map(r => StreamingIngest.M4Event(r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    // adversarial splits: a 1-row head, a big middle, a tail — and
    // NOT time-ordered within batches (input order must not matter)
    val mem = MemoryStream[StreamingIngest.M4Event]
    val q = StreamingIngest.m4(mem.toDS()).writeStream
      .format("memory").queryName("m4_stream")
      .outputMode(OutputMode.Complete).start()
    Seq(evs.take(1), evs.slice(1, evs.length / 2).reverse,
      evs.drop(evs.length / 2))
      .foreach { s => mem.addData(s.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("m4_stream")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq).toMap
    assert(streamed == batch)
  }

  test("streaming trend's sufficient statistics merge to the batch " +
    "slope and r2 exactly, however micro-batched") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q_ts_trend")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

    val evs = graft.ops.Tables.t(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"))
      .collect()
      .map(r => StreamingIngest.M4Event(r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    val mem = MemoryStream[StreamingIngest.M4Event]
    val q = StreamingIngest.trend(mem.toDS()).writeStream
      .format("memory").queryName("trend_stream")
      .outputMode(OutputMode.Complete).start()
    Seq(evs.take(7), evs.slice(7, 2 * evs.length / 3).reverse,
      evs.drop(2 * evs.length / 3))
      .foreach { s => mem.addData(s.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("trend_stream")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(streamed == batch)
  }

  test("streaming labeled centroid sums converge to the batch cohort " +
    "drift exactly, however micro-batched") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q_embed_cohort_drift")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5)))).toMap

    val pts = graft.ops.Tables.t(spark, dir, "embeddings")
      .collect()
      .map(r => StreamingIngest.LabeledEmbedPoint(
        r.getInt(2).toLong,
        if (r.getLong(0) % 2 == 0) 0 else 1,
        r.getSeq[Float](1)))
    val mem = MemoryStream[StreamingIngest.LabeledEmbedPoint]
    val q = StreamingIngest.labeledQuantizedSums(mem.toDS())
      .writeStream.format("memory").queryName("drift_sums")
      .outputMode(OutputMode.Complete).start()
    // adversarial splits incl. a reversed middle slice
    Seq(pts.take(13), pts.slice(13, 2 * pts.length / 3).reverse,
      pts.drop(2 * pts.length / 3))
      .foreach { s => mem.addData(s.toSeq); q.processAllAvailable() }
    q.stop()
    // finishing reduction over the CONVERGED sufficient stats — the
    // same math as the batch operator's tail
    val sums = spark.table("drift_sums")
      .withColumn("m", col("sd").cast("double") /
        (col("n") * 1048576.0))
    val a = sums.filter(col("cohort") === 0)
      .select(col("label"), col("pos"), col("m").as("ma"),
        col("n").as("na"))
    // fresh attribute ids on the b side: both legs read the same
    // sink view, and a self-join over identical lineage trips the
    // conflicting-references check
    val b = sums.filter(col("cohort") === 1)
      .select(col("label"), col("pos"), col("m"), col("n"))
      .toDF("label2", "pos2", "mb", "nb")
    val finished = a.join(b,
        col("label") === col("label2") && col("pos") === col("pos2"))
      .groupBy("label")
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        sum(col("ma") * col("mb")).as("dot"),
        sum(col("ma") * col("ma")).as("aa"),
        sum(col("mb") * col("mb")).as("bb"),
        sum((col("ma") - col("mb")) * (col("ma") - col("mb")))
          .as("d2"))
      .select(col("label"), col("n_a"), col("n_b"),
        round(col("dot") / (sqrt(col("aa")) * sqrt(col("bb"))), 9)
          .as("cos_ab"),
        round(sqrt(col("d2")), 9).as("l2_shift"))
      .withColumn("drifted",
        col("cos_ab") < 0.98 || col("l2_shift") > 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(finished == batch,
      "converged streaming sufficient stats must finish to the " +
        "batch drift rows exactly")
  }

  test("streaming markov transitions are split-invariant and match " +
    "the sequential per-user fold") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{MarkovEvent, MarkovTransition}

    val types = Vector("view", "click", "buy", "refund")
    val evs = for (u <- 0L until 3L; i <- 0 until 20) yield
      MarkovEvent(u, i.toLong * 1000000L, u * 100 + i,
        types(((u + i) * 7 % 4).toInt))
    // ground truth: consecutive pairs of each user's ordered stream
    val expected = evs.groupBy(_.userId).flatMap { case (u, g) =>
      val s = g.sortBy(e => (e.tsUs, e.eventId))
      s.zip(s.tail).map(p =>
        MarkovTransition(u, p._1.eventType, p._2.eventType, p._2.tsUs))
    }.toSet

    def run(splits: Seq[Seq[MarkovEvent]], name: String): Set[MarkovTransition] = {
      val mem = MemoryStream[MarkovEvent]
      val q = StreamingIngest.markovTransitions(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[MarkovTransition].collect().toSet
    }

    assert(run(Seq(evs), "markov_one") == expected)
    // batch boundaries mid-user-stream: the state handoff must not
    // drop or duplicate the boundary-straddling transition
    assert(run(Seq(evs.take(17), evs.slice(17, 44), evs.drop(44)),
      "markov_three") == expected)
  }

  test("streaming seq-novelty flags transitions against the frozen " +
    "batch dictionary, split-invariantly, unseen paths maximally rare") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{MarkovEvent, NoveltyFlag}

    // train the dictionary on a skewed static corpus: 1000 view→click
    // transitions + ONE buy→refund (total 1001, so the 0.1% rule —
    // n·1000 < tot — marks exactly the singleton rare)
    val trainRows = (0L until 2002L).map { i =>
      val (a, b) = if (i < 2000) ("view", "click") else ("buy", "refund")
      (i / 2, new java.sql.Timestamp(i * 1000), i, if (i % 2 == 0) a else b)
    }
    val train = trainRows
      .toDF("user_id", "ts", "event_id", "event_type")
    val dict = StreamingIngest.transitionDict(train)

    val evs = Seq(
      MarkovEvent(1L, 1000000L, 1L, "view"),
      MarkovEvent(1L, 2000000L, 2L, "click"),   // common transition
      MarkovEvent(1L, 3000000L, 3L, "buy"),
      MarkovEvent(1L, 4000000L, 4L, "refund"),  // rare (n=1 of 1001)
      MarkovEvent(1L, 5000000L, 5L, "view"),    // refund→view unseen
      MarkovEvent(2L, 1000000L, 6L, "view"),
      MarkovEvent(2L, 2000000L, 7L, "click"))

    def run(splits: Seq[Seq[MarkovEvent]], name: String)
        : Set[NoveltyFlag] = {
      val mem = MemoryStream[MarkovEvent]
      val q = StreamingIngest.seqNovelty(mem.toDS(), dict).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[NoveltyFlag].collect().toSet
    }

    val one = run(Seq(evs), "novelty_one")
    def flag(u: Long, src: String, dst: String) =
      one.find(f => f.userId == u && f.src == src && f.dst == dst).get
    assert(!flag(1L, "view", "click").rare, "dominant path not rare")
    assert(!flag(2L, "view", "click").rare)
    assert(flag(1L, "buy", "refund").rare, "tail path rare")
    assert(flag(1L, "click", "buy").rare, "unseen path rare")
    assert(flag(1L, "click", "buy").n == 0L)
    assert(flag(1L, "refund", "view").rare && "view" == flag(1L,
      "refund", "view").dst)
    // split boundaries mid-stream change nothing
    assert(run(Seq(evs.take(3), evs.slice(3, 5), evs.drop(5)),
      "novelty_split") == one)
  }

  test("streaming cusum with the batch profile reproduces the batch " +
    "change-point rows bit-for-bit across micro-batch splits") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{CusumOut, EwmaPoint}
    val dir = "/root/testdata/sf0.001"

    // batch ground truth over the real fixture, already bucket-ordered
    val batch = SparkEntry.queries("q_ts_cusum")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(batch.nonEmpty)
    val truth = batch.map(b => (b._1, b._2) -> (b._4, b._5, b._6)).toMap

    // the batch operator's whole-series (mu, sigma), same fold order
    val profile = batch.groupBy(_._1).map { case (s, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val mu = xs.reduceLeft(_ + _) / xs.length
      val sigma = math.sqrt(
        xs.map(x => (x - mu) * (x - mu)).reduceLeft(_ + _) / xs.length)
      s -> (mu, sigma)
    }
    val pts = batch.map(b => EwmaPoint(b._1, b._2, b._3)).toSeq

    def run(splits: Seq[Seq[EwmaPoint]], name: String)
        : Map[(String, Long), (Double, Double, Boolean)] = {
      val mem = MemoryStream[EwmaPoint]
      val q = StreamingIngest.cusum(mem.toDS(), profile).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[CusumOut].collect()
        .map(o => (o.series, o.bucketUs) ->
          (o.cusumPos, o.cusumNeg, o.isShift)).toMap
    }

    assert(run(Seq(pts), "cusum_one") == truth)
    val n = pts.length
    assert(run(Seq(pts.take(n / 3), pts.slice(n / 3, 2 * n / 3),
      pts.drop(2 * n / 3)), "cusum_three") == truth)
  }

  test("streaming holt reproduces the batch level+trend fold " +
    "bit-for-bit across micro-batch splits") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{EwmaPoint, HoltOut}

    val pts = (0 until 40).map(i =>
      EwmaPoint(if (i % 2 == 0) "cpu" else "mem",
        i.toLong * 3600000000L, math.sin(i) * 100 + i))
    // ground truth: the q_ts_holt fold (same expression order)
    val expected = pts.groupBy(_.series).flatMap { case (s, g) =>
      var l = 0.0; var b = 0.0; var first = true
      g.sortBy(_.bucketUs).map { p =>
        if (first) { l = p.x; b = 0.0; first = false }
        else {
          val lp = l
          l = 0.5 * p.x + 0.5 * (lp + b)
          b = 0.25 * (l - lp) + 0.75 * b
        }
        (s, p.bucketUs) -> (l, b, l + b)
      }
    }

    def run(splits: Seq[Seq[EwmaPoint]],
        name: String): Map[(String, Long), (Double, Double, Double)] = {
      val mem = MemoryStream[EwmaPoint]
      val q = StreamingIngest.holt(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[HoltOut].collect()
        .map(o => (o.series, o.bucketUs) -> (o.level, o.trend, o.forecast))
        .toMap
    }

    assert(run(Seq(pts), "holt_one") == expected)
    assert(run(Seq(pts.take(7), pts.slice(7, 29), pts.drop(29)),
      "holt_three") == expected)
  }

  test("streaming rate and anomaly ops reproduce the batch " +
    "operators bit-for-bit on the same bucket sequence") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{AnomalyOut, EwmaPoint,
      RateOut}
    val dir = "/root/testdata/sf0.001"

    val rateRows = SparkEntry.queries("q_ts_rate")(spark, dir).collect()
    val buckets = rateRows
      .map(r => EwmaPoint(r.getString(0), r.getLong(1), r.getDouble(3)))
      .sortBy(p => (p.series, p.bucketUs)).toSeq
    val expRate = rateRows.filter(!_.isNullAt(4))
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    val expAnom = SparkEntry.queries("q_ts_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6))).toMap
    assert(expRate.nonEmpty && expAnom.nonEmpty)

    // three micro-batches, split mid-series: the state handoff must
    // not perturb a bit of any delta, mean, or z-score
    val splits = Seq(buckets.take(300), buckets.slice(300, 600),
      buckets.drop(600))

    val memR = MemoryStream[EwmaPoint]
    val qr = StreamingIngest.rate(memR.toDS()).writeStream
      .format("memory").queryName("rate_par")
      .outputMode(OutputMode.Append).start()
    splits.foreach { s => memR.addData(s); qr.processAllAvailable() }
    qr.stop()
    val gotRate = spark.table("rate_par").as[RateOut].collect()
      .map(o => (o.series, o.bucketUs) -> (o.delta, o.ratePerS)).toMap
    assert(gotRate == expRate)

    val memA = MemoryStream[EwmaPoint]
    val qa = StreamingIngest.anomaly(memA.toDS()).writeStream
      .format("memory").queryName("anom_par")
      .outputMode(OutputMode.Append).start()
    splits.foreach { s => memA.addData(s); qa.processAllAvailable() }
    qa.stop()
    val gotAnom = spark.table("anom_par").as[AnomalyOut].collect()
      .map(o => (o.series, o.bucketUs) ->
        (o.nHist, o.mean, o.z, o.isAnomaly)).toMap
    assert(gotAnom == expAnom)
  }

  test("mapGroupsWithState accumulates per-series lifetime stats") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[StreamRow]
    val stats = StreamingIngest.seriesStats(mem.toDS())
    val q = stats.writeStream.format("memory").queryName("series_stats")
      .outputMode(OutputMode.Update).start()
    mem.addData(rows(4))
    q.processAllAvailable()
    mem.addData(rows(4, 86400L * 1000000L))
    q.processAllAvailable()
    q.stop()

    // last update per series reflects all 4 rows seen for it
    val res = spark.sql(
      """SELECT measurement, max(n) AS n FROM series_stats
        |GROUP BY measurement ORDER BY measurement""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(res.toSeq == Seq(("cpu", 4L), ("mem", 4L)))
  }

  test("jvm minhash mirrors the sql signature bit-for-bit") {
    val spark = SparkFixture.spark
    val dir = "/root/testdata/sf0.001"
    val sql = graft.ops.Dedup.minHashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (1 to 16).map(i => r.getLong(i)).toSeq).toMap
    val texts = graft.ops.Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(sql.nonEmpty)
    texts.foreach { case (id, text) =>
      val jvm = graft.ops.Dedup.jvmMinHash(text)
      (jvm, sql.get(id)) match {
        case (Some(sig), Some(want)) =>
          assert(sig.toSeq == want, s"doc $id signature mismatch")
        case (None, None) => // < 3 tokens on both sides
        case other => fail(s"doc $id presence mismatch: $other")
      }
    }
  }

  test("streaming near-dup candidates recover the batch LSH pairs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"

    // batch ground truth: candidate pairs whose true jaccard is high
    // (planted dups ~0.9) — streaming banding must catch these too
    val truth = graft.ops.Dedup.qMinHashLsh.run(spark, dir).collect()
      .filter(_.getDouble(2) >= 0.5)
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(truth.nonEmpty, "fixture should contain high-jaccard pairs")

    // constant event time: the watermark never passes any bucket's
    // TTL, so this exercises pure candidate recall (expiry is the
    // dedicated TTL specs' job)
    val docs = graft.ops.Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => StreamingIngest.TimedDoc(r.getLong(0), r.getString(1),
        1700000000000000L))

    val mem = MemoryStream[StreamingIngest.TimedDoc]
    val cands = StreamingIngest.nearDupCandidates(mem.toDS())
    val q = cands.writeStream.format("memory").queryName("near_dup")
      .outputMode(OutputMode.Append).start()
    val (first, second) = docs.splitAt(docs.length / 2)
    mem.addData(first.toSeq)
    q.processAllAvailable()
    mem.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT doc_id, dup_of FROM near_dup").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(got.forall { case (a, b) => a != b })
    assert(truth.subsetOf(got),
      s"streaming missed batch pairs: ${truth -- got}")
  }

  test("near-dup bucket state is TTL-bounded under key churn") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val hourUs = 3600L * 1000000L
    // distinct texts → distinct band buckets per batch (key churn);
    // each batch's event time is an hour later, so with a 1-minute
    // TTL and zero watermark delay every earlier batch's buckets are
    // past expiry as soon as the watermark advances — state must stay
    // O(one batch's keys), not accumulate across the stream
    def batchDocs(base: Long, tsUs: Long): Seq[StreamingIngest.TimedDoc] =
      (0 until 8).map { i =>
        val id = base + i
        StreamingIngest.TimedDoc(id,
          s"unique document $id with entirely distinct content " +
            (0 until 30).map(j => s"w${id}_$j").mkString(" "), tsUs)
      }

    val mem = MemoryStream[StreamingIngest.TimedDoc]
    val cands = StreamingIngest.nearDupCandidates(mem.toDS(),
      stateTtl = "1 minute", watermarkDelay = "0 seconds")
    val q = cands.writeStream.format("memory").queryName("ttl_churn")
      .outputMode(OutputMode.Append).start()

    def stateRows(): Long =
      q.lastProgress.stateOperators.apply(0).numRowsTotal

    val t0 = 1700000000000000L
    mem.addData(batchDocs(0, t0))
    q.processAllAvailable()
    val afterFirst = stateRows()
    assert(afterFirst > 0, "first batch must create bucket state")

    (1 to 4).foreach { b =>
      mem.addData(batchDocs(b * 100L, t0 + b * hourUs))
      q.processAllAvailable()
    }
    val afterChurn = stateRows()
    assert(afterChurn <= 2 * afterFirst,
      s"state must stay bounded by the active window " +
        s"($afterChurn rows after churn vs $afterFirst after batch 1 " +
        "— event-time TTL eviction is not firing)")
    q.stop()
  }

  test("an expired bucket still catches duplicates that co-occur later") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val text = "the quick brown fox jumps over the lazy dog " +
      (0 until 40).map(j => s"shared$j").mkString(" ")

    val mem = MemoryStream[StreamingIngest.TimedDoc]
    val cands = StreamingIngest.nearDupCandidates(mem.toDS(),
      stateTtl = "1 minute", watermarkDelay = "0 seconds")
    val q = cands.writeStream.format("memory").queryName("ttl_reappear")
      .outputMode(OutputMode.Append).start()

    // batch 1: the original — its buckets will expire an event-hour on
    mem.addData(Seq(StreamingIngest.TimedDoc(1L, text, t0)))
    q.processAllAvailable()
    // an unrelated batch an hour later advances the watermark past
    // doc 1's TTL, evicting its idle buckets
    mem.addData(Seq(StreamingIngest.TimedDoc(2L,
      (0 until 40).map(j => s"filler$j unrelated$j").mkString(" "),
      t0 + hourUs)))
    q.processAllAvailable()
    // batch 3: two fresh duplicates land in the SAME (reappearing)
    // buckets — state restarted empty but must catch the pair
    mem.addData(Seq(
      StreamingIngest.TimedDoc(3L, text, t0 + 2 * hourUs),
      StreamingIngest.TimedDoc(4L, text, t0 + 2 * hourUs)))
    q.processAllAvailable()
    q.stop()

    val pairs = spark.sql("SELECT doc_id, dup_of FROM ttl_reappear")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((4L, 3L)),
      s"post-expiry co-occurring duplicates must be caught, got $pairs")
    // and the evicted original is indeed missed — the windowed trade
    assert(!pairs.exists(_._2 == 1L),
      "doc 1's buckets should have expired before docs 3/4 arrived")
  }

  test("streaming contamination reproduces the batch gate verdicts") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"

    // batch ground truth: (doc_id → n_grams, n_hit, is_contaminated)
    val truth = graft.ops.TextOps.qContamination.run(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(4))).toMap
    assert(truth.nonEmpty && truth.values.exists(_._2 > 0),
      "fixture should contain contaminated docs")

    val docsDf = graft.ops.Tables.t(spark, dir, "documents")
    val bench = graft.ops.TextOps.contamGrams(
      docsDf.filter($"source" === "src0")).select("g").distinct()
    val corpus = docsDf.filter($"source" =!= "src0")
      .select("doc_id", "text").collect()
      .map(r => StreamingIngest.DocRow(r.getLong(0), r.getString(1)))

    val mem = MemoryStream[StreamingIngest.DocRow]
    val out = StreamingIngest.contamination(mem.toDS(), bench)
    val q = out.writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Update).start()
    val (first, second) = corpus.splitAt(corpus.length / 2)
    mem.addData(first.toSeq)
    q.processAllAvailable()
    mem.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()

    // latest update per doc = the one with the most grams tallied
    val got = spark.sql(
      "SELECT doc_id, n_grams, n_hit, is_contaminated FROM contam")
      .collect().groupBy(_.getLong(0)).map { case (id, rs) =>
        val r = rs.maxBy(_.getLong(1))
        id -> (r.getLong(1), r.getLong(2), r.getBoolean(3))
      }
    assert(got == truth,
      "streaming verdicts must be bit-identical to batch q_contamination")
  }

  test("streaming winnow decontamination reproduces the batch " +
    "verdicts statelessly") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"

    // batch ground truth: (doc_id → n_fp, n_hit, is_contaminated)
    val truth = graft.ops.TextOps.qWinnowContam.run(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(truth.nonEmpty)

    val docsDf = graft.ops.Tables.t(spark, dir, "documents")
    // bench fingerprint set via the JVM twin — WinnowSpec proves it
    // identical to the SQL selection the batch bench side uses
    val benchFp = docsDf.filter($"source" === "src0")
      .select("text").collect()
      .flatMap(r => graft.ops.TextOps.jvmWinnow(r.getString(0)).map(_._2))
      .toSet
    assert(benchFp.nonEmpty)
    val corpus = docsDf.filter($"source" =!= "src0")
      .select("doc_id", "text").collect()
      .map(r => StreamingIngest.DocRow(r.getLong(0), r.getString(1)))

    val mem = MemoryStream[StreamingIngest.DocRow]
    val out = StreamingIngest.winnowContamination(mem.toDS(), benchFp)
    val q = out.writeStream.format("memory").queryName("winnow_contam")
      .outputMode(OutputMode.Append).start()
    val (first, second) = corpus.splitAt(corpus.length / 2)
    mem.addData(first.toSeq)
    q.processAllAvailable()
    mem.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.sql(
      "SELECT doc_id, n_fp, n_hit, is_contaminated FROM winnow_contam")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(got == truth,
      "stateless streaming verdicts must equal batch q_winnow_contamination")
  }

  test("streaming sessionize closes the batch operator's sessions " +
    "exactly, however the stream is micro-batched") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{SessEvent, SessionOut}
    val dir = "/root/testdata/sf0.001"

    // batch ground truth: every q_ts_sessionize row, keyed for lookup
    val truth = SparkEntry.queries("q_ts_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap

    // the same events as SessEvents, in global event-time order (which
    // preserves per-user order — the op's cross-batch contract), plus a
    // past-gap sentinel per user so every real session gets closed; the
    // sentinel's own session stays open and is never emitted
    val ev = graft.ops.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type")
      .collect().map(r => SessEvent(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
      .sortBy(e => (e.us, e.eventId))
    val sentinels = ev.groupBy(_.userId).map { case (u, es) =>
      SessEvent(u, es.map(_.us).max + 1800000001L, -1L, "sentinel")
    }.toSeq

    def run(splits: Seq[Seq[SessEvent]], name: String)
        : Map[(Long, Long), (Long, Long, Long, Long, Long)] = {
      val mem = MemoryStream[SessEvent]
      val q = StreamingIngest.sessionize(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[SessionOut].collect()
        .map(o => (o.userId, o.sessionId) ->
          (o.nEvents, o.startUs, o.endUs, o.durationUs, o.nPurchases))
        .toMap
    }

    val whole = run(Seq(ev.toSeq ++ sentinels), "sess_one")
    assert(whole == truth,
      "single-batch streaming sessions must equal the batch rows")
    val n = ev.length
    val three = run(Seq(ev.take(n / 3).toSeq,
      ev.slice(n / 3, 2 * n / 3).toSeq,
      ev.drop(2 * n / 3).toSeq ++ sentinels), "sess_three")
    assert(three == truth,
      "micro-batch boundaries must not change any session")
  }

  test("stream-vs-static incremental dedup matches the batch band " +
    "join and keeps zero state") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{CorpusHit, DocRow, TimedDoc}

    val docs = graft.ops.Tables.t(spark, "/root/testdata/sf0.001",
        "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val corpus = docs.filter(_._3.length <= 4)
    val incoming = docs.filter(_._3.length > 4)

    // ground truth: every (new, old) pair sharing any band key,
    // derived with the same jvm hash math as both operators
    def bands(text: String): Set[String] =
      graft.ops.Dedup.jvmMinHash(text).toSeq
        .flatMap(graft.ops.Dedup.jvmBands(_).toSeq)
        .map { case (b, v) => s"$b:$v" }.toSet
    val oldBands = corpus.map(d => d._1 -> bands(d._2))
    val expected = (for {
      (nid, ntext, _) <- incoming
      nb = bands(ntext)
      (oid, ob) <- oldBands
      if (nb intersect ob).nonEmpty
    } yield (nid, oid)).toSet
    assert(expected.nonEmpty, "fixture plants cross-source near-dups")

    val idx = StreamingIngest.corpusBandIndex(
      corpus.map(d => DocRow(d._1, d._2)).toSeq.toDS())
    val mem = MemoryStream[TimedDoc]
    val q = StreamingIngest.incrementalDedup(mem.toDS(), idx)
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode(OutputMode.Append).start()
    val timed = incoming.zipWithIndex
      .map { case ((id, t, _), i) => TimedDoc(id, t, i.toLong * 1000000L) }
    val n = timed.length
    mem.addData(timed.take(n / 2).toSeq); q.processAllAvailable()
    mem.addData(timed.drop(n / 2).toSeq); q.processAllAvailable()
    val stateOps = Option(q.lastProgress)
      .map(_.stateOperators.length).getOrElse(0)
    q.stop()
    val got = spark.table("inc_dedup").as[CorpusHit].collect()
      .map(h => (h.doc_id, h.corpus_doc)).toSet
    assert(got == expected,
      "stream-static probe must reproduce the batch band join exactly")
    assert(stateOps == 0,
      "incremental dedup must be stateless — no state store operators")
  }

  test("streaming keep-latest converges to the batch compaction " +
    "however the stream is micro-batched") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{KeyedEvent, LatestOut}
    val dir = "/root/testdata/sf0.001"

    val expected = graft.ops.Dedup.qLatest.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
      .toMap

    val events = graft.ops.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_type", "event_id",
        "unix_micros(ts) AS us", "value")
      .collect()
      .map(r => KeyedEvent(r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))

    def run(splits: Seq[Seq[KeyedEvent]], name: String)
        : Map[(Long, String), (Long, Long, Double, Long)] = {
      val mem = MemoryStream[KeyedEvent]
      val q = StreamingIngest.latest(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      // n_versions grows monotonically per key, so the max-n row IS
      // the final upsert for that key
      spark.table(name).as[LatestOut].collect()
        .groupBy(o => (o.user_id, o.event_type))
        .map { case (k, os) =>
          val last = os.maxBy(_.n_versions)
          k -> ((last.latest_event_id, last.latest_us,
            last.latest_value, last.n_versions))
        }
    }

    assert(run(Seq(events.toSeq), "latest_one") == expected)
    // adversarial split: newest rows arrive FIRST (state must refuse
    // to regress), then a mid slice, then the rest
    val byTs = events.sortBy(e => (-e.tsUs, -e.event_id)).toSeq
    val n = byTs.length
    assert(run(Seq(byTs.take(n / 3), byTs.slice(n / 3, 2 * n / 3),
      byTs.drop(2 * n / 3)), "latest_rev") == expected)
  }

  test("streaming HLL registers equal the batch sketch exactly — " +
    "register max is associative and idempotent, so no distinct and " +
    "no ordering is needed") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.SourcedDoc
    val dir = "/root/testdata/sf0.001"

    val expected = graft.ops.TextOps.qVocabHll.run(spark, dir).collect()
      .filter(_.getString(0) != "__all__")
      .map(r => r.getString(0) -> r.getDouble(3)).toMap

    val docs = graft.ops.Tables.t(spark, dir, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => SourcedDoc(r.getString(0), r.getLong(1), r.getString(2)))
    val mem = MemoryStream[SourcedDoc]
    val q = StreamingIngest.hllRegisters(mem.toDS()).writeStream
      .format("memory").queryName("hll_regs")
      .outputMode(OutputMode.Complete).start()
    Seq(docs.take(50), docs.slice(50, 300).reverse, docs.drop(300))
      .foreach { s => mem.addData(s.toSeq); q.processAllAvailable() }
    q.stop()
    // the estimate is a stateless fold over <= 64 register rows per
    // source — the same arithmetic as the batch query, so bit-equal
    val regs = spark.table("hll_regs").collect()
      .groupBy(_.getString(0))
    val streamed = regs.map { case (src, rows) =>
      val present = rows.map(r => r.getLong(2))
      val s = present.map(m => 1L << (55 - m)).sum +
        (64L - present.length) * 36028797018963968L
      src -> (0.709 * 4096.0 * 36028797018963968.0 / s.toDouble)
    }
    assert(streamed == expected)
  }

  test("streaming KMV sketch equals the batch estimate exactly, " +
    "however the stream is micro-batched") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{KmvEstimate, SourcedDoc}
    val dir = "/root/testdata/sf0.001"

    // batch truth: q_vocab_kmv's per-source rows (k_used, kth_h, est)
    val expected = graft.ops.TextOps.qVocabKmv.run(spark, dir).collect()
      .filter(_.getString(0) != "__all__")
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

    val docs = graft.ops.Tables.t(spark, dir, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => SourcedDoc(r.getString(0), r.getLong(1), r.getString(2)))

    def run(splits: Seq[Seq[SourcedDoc]], name: String)
        : Map[String, (Long, Long, Double)] = {
      val mem = MemoryStream[SourcedDoc]
      val q = StreamingIngest.kmv(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      // memory-sink rows append in batch order; last row per source
      // is the final estimate
      spark.table(name).as[KmvEstimate].collect()
        .foldLeft(Map.empty[String, (Long, Long, Double)]) { (m, e) =>
          m.updated(e.source, (e.k_used, e.kth_h, e.est))
        }
    }

    assert(run(Seq(docs.toSeq), "kmv_one") == expected)
    assert(run(Seq(docs.take(70).toSeq, docs.slice(70, 400).toSeq,
      docs.drop(400).toSeq), "kmv_three") == expected,
      "k-minimum sets are order-independent — estimates must be EQUAL")

    // a fresh source whose first batch is all-whitespace must not
    // crash the query (no hashes yet → no estimate); its real tokens
    // arriving later produce the normal estimate
    val weird = Seq(
      Seq(SourcedDoc("empty_src", 1L, "   "), docs.head),
      Seq(SourcedDoc("empty_src", 2L, "late words arrive")))
    val got = run(weird, "kmv_empty")
    assert(got("empty_src")._1 == 3L,
      "post-empty tokens must still be sketched")
  }

  test("streaming bottom-k quantile sample equals the batch sample " +
    "quantiles exactly, across splits and duplicate redelivery") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{QsOut, QsRow}
    val dir = "/root/testdata/sf0.001"

    // batch truth: q_dq_quantile_sample's sample columns per g
    val expected = graft.ops.DataQuality.qQuantileSample.run(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))))
      .toMap

    val rows = graft.ops.Tables.t(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber")
      .collect()
      .map(r => QsRow(r.getString(0), r.getDouble(1), r.getLong(2),
        r.getAs[Number](3).longValue()))

    def run(splits: Seq[Seq[QsRow]], name: String)
        : Map[String, (Long, Double, Double, Double)] = {
      val mem = MemoryStream[QsRow]
      val q = StreamingIngest.quantileSample(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[QsOut].collect()
        .foldLeft(Map.empty[String, (Long, Double, Double, Double)]) {
          (m, e) => m.updated(e.g, (e.k_used, e.p50, e.p90, e.p99))
        }
    }

    assert(run(Seq(rows.toSeq), "qs_one") == expected)
    assert(run(Seq(rows.take(900).toSeq, rows.slice(900, 3000).reverse.toSeq,
      rows.drop(3000).toSeq), "qs_three") == expected,
      "bottom-k sets are order-independent — quantiles must be EQUAL")
    // at-least-once redelivery: replaying a slice must not change the
    // sample (de-dup by key), so the converged quantiles are identical
    assert(run(Seq(rows.take(2000).toSeq, rows.slice(500, 2000).toSeq,
      rows.drop(2000).toSeq), "qs_replay") == expected,
      "duplicate redelivery must leave the sample unchanged")
  }

  test("streaming Misra-Gries summaries honor the frequency and " +
    "error bounds against exact counts, across micro-batch splits") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{HeavyHitter, SourcedDoc}
    val k = 8

    val docs = graft.ops.Tables.t(spark, "/root/testdata/sf0.001",
        "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => SourcedDoc(r.getString(0), r.getLong(1), r.getString(2)))

    // exact per-(source, word) truth and per-source token totals
    val exact = docs.flatMap(d =>
        d.text.split(" ").filter(_.nonEmpty).map(w => (d.source, w)))
      .groupBy(identity).map { case (kw, g) => kw -> g.length.toLong }
    val totals = exact.groupBy(_._1._1)
      .map { case (s, m) => s -> m.values.sum }

    def run(splits: Seq[Seq[SourcedDoc]], name: String)
        : Map[String, Map[String, Long]] = {
      val mem = MemoryStream[SourcedDoc]
      val q = StreamingIngest.heavyHitters(mem.toDS(), k).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[HeavyHitter].collect()
        .groupBy(_.source)
        .map { case (s, hs) =>
          val lastSeen = hs.map(_.n_seen).max
          s -> hs.filter(_.n_seen == lastSeen)
            .map(h => h.word -> h.mg_n).toMap
        }
    }

    for ((splits, name) <- Seq(
        (Seq(docs.toSeq), "mg_one"),
        (Seq(docs.take(100).toSeq, docs.slice(100, 350).toSeq,
          docs.drop(350).toSeq), "mg_three"))) {
      val got = run(splits, name)
      totals.foreach { case (src, nTok) =>
        val summary = got.getOrElse(src, Map.empty)
        assert(summary.size <= k, s"$name/$src state exceeded k")
        val bound = nTok / k
        exact.foreach { case ((s, w), trueN) if s == src =>
          // guarantee 1: every > n/k word survives in the summary
          if (trueN > bound)
            assert(summary.contains(w),
              s"$name/$src lost heavy hitter '$w' ($trueN > $bound)")
          // guarantee 2: reported counts undershoot by at most n/k
          summary.get(w).foreach { est =>
            assert(est <= trueN && trueN - est <= bound,
              s"$name/$src '$w': est $est vs true $trueN (bound $bound)")
          }
        case _ => ()
        }
      }
    }
  }

  test("streaming quantized centroid sums equal the batch stage " +
    "cell-for-cell under adversarial micro-batching") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingIngest.EmbedPoint

    // negatives and EXACT half-ties (odd/2^21 scales to k + 0.5) so a
    // rounding-mode drift between the twin and Catalyst's Round fails
    val pts = (0 until 40).map { i =>
      val emb = (0 until 8).map { d =>
        if ((i + d) % 5 == 0)
          ((2 * (i + d) + 1).toFloat / 2097152.0f) *
            (if (d % 2 == 0) 1 else -1)
        else ((i * 37 + d * 11) % 100 - 50) / 64.0f
      }
      EmbedPoint(i % 3, emb)
    }
    val mem = MemoryStream[EmbedPoint]
    val q = StreamingIngest.quantizedSums(mem.toDS())
      .writeStream.format("memory").queryName("qsums")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .start()
    pts.grouped(13).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.sql("SELECT cohort, pos, sd, n FROM qsums")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    val batch = graft.ops.Similarity
      .quantizedSums(pts.toDF(), org.apache.spark.sql.functions.col("cohort"))
      .collect()
      .map(r => r.getInt(0) -> (r.getSeq[Long](1).toSeq, r.getLong(2)))
      .toMap
    assert(got.nonEmpty && batch.nonEmpty)
    got.foreach { case ((cohort, pos), (sd, n)) =>
      val (sarr, bn) = batch(cohort)
      assert(sd == sarr(pos) && n == bn,
        s"cell ($cohort,$pos): stream ($sd,$n) != batch (${sarr(pos)},$bn)")
    }
    assert(got.size == batch.size * 8, "missing cells")
  }

  test("TTL dedup batch/stream parity: the streaming TTL dedup and " +
    "q_dedup_ttl's gap-island rule keep the same rows") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 30 s event-time grid, TTL 1 minute. Gaps are either <= TTL or
    // >= TTL + 2 grid steps: the streaming eviction fires at a batch
    // whose START watermark (previous batch's max event time) exceeds
    // last_seen + TTL, so a gap in (TTL, TTL + 1 step] would still be
    // state-resident when the dup arrives — the island rule assumes
    // watermark progress between arrivals (see q_dedup_ttl's doc).
    val stepUs = 30L * 1000000L
    val ttlUs = 60L * 1000000L
    val t0 = 1700000000000000L
    val script: Seq[(Int, String)] = Seq(
      0 -> "A", 0 -> "B", 0 -> "clk", 1 -> "A", 1 -> "clk",
      2 -> "clk", 3 -> "C", 3 -> "clk", 4 -> "clk", 5 -> "B",
      5 -> "clk", 6 -> "clk", 7 -> "A", 7 -> "clk", 8 -> "A",
      8 -> "clk", 9 -> "clk", 10 -> "B", 10 -> "clk", 11 -> "clk")

    val mem = MemoryStream[StreamRow]
    val q = StreamingIngest.dedupExact(mem.toDS(),
      stateTtl = "1 minute", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("dedup_parity")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .start()
    script.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (tick, rows) =>
      mem.addData(rows.map { case (_, key) =>
        StreamRow("ns", "docs", key, Map.empty, t0 + tick * stepUs)
      })
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.sql(
      "SELECT value, timestampUs FROM dedup_parity")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // q_dedup_ttl's island rule, applied to the same arrivals: a row
    // is kept iff it is its key's first, or the gap from the PREVIOUS
    // arrival (kept or dropped — the streaming state refreshes on
    // traffic) exceeds the TTL
    val expected = script.groupBy(_._2).toSeq.flatMap { case (key, ticks) =>
      val ts = ticks.map(t => t0 + t._1 * stepUs).sorted
      ts.zip(Long.MinValue +: ts.init).collect {
        case (t, prev) if prev == Long.MinValue || t - prev > ttlUs =>
          (key, t)
      }
    }.toSet
    assert(streamed == expected,
      s"stream kept ${streamed.toSeq.sorted}, island rule expects " +
        s"${expected.toSeq.sorted}")
  }

  test("TTL-bounded latest evicts idle keys under churn, converges " +
    "to batch compaction inside the window, and resurrects a stale " +
    "key after expiry (proving the eviction fired)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{KeyedEvent, LatestOut}

    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val mem = MemoryStream[KeyedEvent]
    val q = StreamingIngest.latest(mem.toDS(), stateTtl = "1 minute",
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("latest_ttl")
      .outputMode(OutputMode.Update).start()
    def stateRows(): Long =
      q.lastProgress.stateOperators.apply(0).numRowsTotal

    // key (1, click): two versions inside the window -> in-window
    // convergence parity: latest is event 12, n_versions 2
    mem.addData(Seq(
      KeyedEvent(1L, "click", 11L, t0, 1.0),
      KeyedEvent(1L, "click", 12L, t0 + 1L, 2.0)))
    q.processAllAvailable()
    // churn: 5 batches of fresh keys, each an event-hour later; every
    // earlier batch's keys idle past the 1-minute TTL as the
    // watermark advances -> state stays O(one batch's keys)
    mem.addData((0 until 8).map(i =>
      KeyedEvent(100L + i, "churn0", 1L, t0 + hourUs, 0.0)))
    q.processAllAvailable()
    val afterFirstChurn = stateRows()
    (1 to 4).foreach { b =>
      mem.addData((0 until 8).map(i =>
        KeyedEvent(100L + 10 * b + i, s"churn$b", 1L,
          t0 + (b + 1) * hourUs, 0.0)))
      q.processAllAvailable()
    }
    assert(stateRows() <= 2 * afterFirstChurn,
      s"latest state must stay bounded by the active TTL window " +
        s"(${stateRows()} rows vs $afterFirstChurn after first churn)")
    // key (1, click) expired hours ago: a fresh event for it
    // restarts n_versions at 1 instead of continuing at 3 - the
    // documented forgotten-count trade AND the proof of eviction
    // (an event behind the watermark would be dropped outright by
    // the standard late-data rule, so ts must be current)
    mem.addData(Seq(KeyedEvent(1L, "click", 10L, t0 + 7 * hourUs, 9.0)))
    q.processAllAvailable()
    q.stop()
    val clicks = spark.table("latest_ttl").as[LatestOut].collect()
      .filter(o => o.user_id == 1L && o.event_type == "click")
    val inWindow = clicks.filter(_.n_versions == 2L)
    assert(inWindow.nonEmpty && inWindow.head.latest_event_id == 12L,
      "in-window upsert must converge to the batch compaction")
    assert(clicks.exists(o =>
        o.latest_event_id == 10L && o.n_versions == 1L),
      "a post-expiry event must restart the key (eviction really " +
        s"fired): ${clicks.toSeq}")
  }

  test("TTL-bounded sketch views (heavy hitters / KMV / quantile " +
    "sample) evict idle sources and match their lifetime twins " +
    "inside the window") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{
      HeavyHitter, KmvEstimate, QsOut, QsRow, SourcedDoc, TimedQsRow,
      TimedSourcedDoc}

    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val docs = Seq(
      TimedSourcedDoc("web", 1L, "a a b c", t0),
      TimedSourcedDoc("web", 2L, "a b b d", t0 + 1L))

    // heavy hitters: in-window summary equals the lifetime twin's
    val memH = MemoryStream[TimedSourcedDoc]
    val qh = StreamingIngest.heavyHittersTtl(memH.toDS(),
        k = 8, stateTtl = "1 minute", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("hh_ttl")
      .outputMode(OutputMode.Update).start()
    memH.addData(docs)
    qh.processAllAvailable()
    val memH0 = MemoryStream[SourcedDoc]
    val qh0 = StreamingIngest.heavyHitters(memH0.toDS(), k = 8)
      .writeStream.format("memory").queryName("hh_life")
      .outputMode(OutputMode.Update).start()
    memH0.addData(docs.map(d => SourcedDoc(d.source, d.doc_id, d.text)))
    qh0.processAllAvailable()
    def summary(t: String): Set[(String, String, Long, Long)] = {
      val rows = spark.table(t).as[HeavyHitter].collect()
      val lastSeen = rows.map(_.n_seen).max
      rows.filter(_.n_seen == lastSeen)
        .map(h => (h.source, h.word, h.mg_n, h.n_seen)).toSet
    }
    assert(summary("hh_ttl") == summary("hh_life"),
      "in-window TTL summary must equal the lifetime twin's")
    // churn sources hours later: web's summary idles out
    memH.addData(Seq(TimedSourcedDoc("s1", 3L, "x", t0 + hourUs)))
    qh.processAllAvailable()
    memH.addData(Seq(TimedSourcedDoc("s2", 4L, "y", t0 + 2 * hourUs)))
    qh.processAllAvailable()
    val hhState = qh.lastProgress.stateOperators.apply(0).numRowsTotal
    assert(hhState <= 2,
      s"idle sources must evict ($hhState state rows; web + 2 churn " +
        "sources would be 3 without eviction)")
    // a post-expiry web doc restarts n_seen from zero
    memH.addData(Seq(TimedSourcedDoc("web", 5L, "z z", t0 + 3 * hourUs)))
    qh.processAllAvailable()
    qh.stop(); qh0.stop()
    val webRestart = spark.table("hh_ttl").as[HeavyHitter].collect()
      .filter(h => h.source == "web" && h.word == "z")
    assert(webRestart.nonEmpty && webRestart.head.n_seen == 2L,
      "post-expiry source must restart its MG denominator")

    // KMV + quantile sample: same contract, asserted on eviction and
    // in-window equality of the emitted estimate/readout
    val memK = MemoryStream[TimedSourcedDoc]
    val qk = StreamingIngest.kmvTtl(memK.toDS(), k = 4,
        stateTtl = "1 minute", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("kmv_ttl")
      .outputMode(OutputMode.Update).start()
    memK.addData(docs)
    qk.processAllAvailable()
    val memK0 = MemoryStream[SourcedDoc]
    val qk0 = StreamingIngest.kmv(memK0.toDS(), k = 4)
      .writeStream.format("memory").queryName("kmv_life")
      .outputMode(OutputMode.Update).start()
    memK0.addData(docs.map(d => SourcedDoc(d.source, d.doc_id, d.text)))
    qk0.processAllAvailable()
    def kmvLast(t: String): Set[(String, Long, Long, Double)] =
      spark.table(t).as[KmvEstimate].collect()
        .map(e => (e.source, e.k_used, e.kth_h, e.est)).toSet
    assert(kmvLast("kmv_ttl") == kmvLast("kmv_life"))
    memK.addData(Seq(TimedSourcedDoc("s1", 3L, "x", t0 + hourUs)))
    qk.processAllAvailable()
    memK.addData(Seq(TimedSourcedDoc("s2", 4L, "y", t0 + 2 * hourUs)))
    qk.processAllAvailable()
    assert(qk.lastProgress.stateOperators.apply(0).numRowsTotal <= 2,
      "idle KMV sources must evict")
    qk.stop(); qk0.stop()

    val memQ = MemoryStream[TimedQsRow]
    val qq = StreamingIngest.quantileSampleTtl(memQ.toDS(), k = 4,
        stateTtl = "1 minute", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("qs_ttl")
      .outputMode(OutputMode.Update).start()
    memQ.addData(Seq(
      TimedQsRow("g", 1.0, 1L, 1L, t0), TimedQsRow("g", 5.0, 2L, 1L, t0)))
    qq.processAllAvailable()
    val memQ0 = MemoryStream[QsRow]
    val qq0 = StreamingIngest.quantileSample(memQ0.toDS(), k = 4)
      .writeStream.format("memory").queryName("qs_life")
      .outputMode(OutputMode.Update).start()
    memQ0.addData(Seq(QsRow("g", 1.0, 1L, 1L), QsRow("g", 5.0, 2L, 1L)))
    qq0.processAllAvailable()
    def qsLast(t: String): Set[(String, Long, Double, Double, Double)] =
      spark.table(t).as[QsOut].collect()
        .map(o => (o.g, o.k_used, o.p50, o.p90, o.p99)).toSet
    assert(qsLast("qs_ttl") == qsLast("qs_life"))
    memQ.addData(Seq(TimedQsRow("h1", 2.0, 3L, 1L, t0 + hourUs)))
    qq.processAllAvailable()
    memQ.addData(Seq(TimedQsRow("h2", 3.0, 4L, 1L, t0 + 2 * hourUs)))
    qq.processAllAvailable()
    assert(qq.lastProgress.stateOperators.apply(0).numRowsTotal <= 2,
      "idle quantile-sample groups must evict")
    qq.stop(); qq0.stop()
  }

  test("streaming scene segmentation converges to the batch operator " +
    "across splits, reordering, and duplicate redelivery") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{FrameEvt, SceneOut}
    val dir = "/root/testdata/sf0.001"

    // batch truth: the operator's full output per doc
    val expected = graft.ops.Multimodal.qVideoScenes.run(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))))
      .toMap

    // the stream input: every frame's exact sums, derived by the same
    // codec kernel the batch op uses
    val media = graft.ops.Tables.t(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)]
      .map(t => (t._1, graft.ops.Multimodal.synthesizeFrames(
        t._2.getBytes("UTF-8"))))
    val frames = graft.ops.Multimodal.frameSums(media).collect()
      .map(f => FrameEvt(f.doc_id, f.frame_idx, f.n_px, f.psum))

    def run(splits: Seq[Seq[FrameEvt]], name: String)
        : Map[Long, (Long, Long, Long, Long)] = {
      val mem = MemoryStream[FrameEvt]
      val q = StreamingIngest.sceneSegments(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      splits.foreach { s => mem.addData(s); q.processAllAvailable() }
      q.stop()
      // n_frames grows monotonically per doc, so the max-frame row IS
      // the final upsert
      spark.table(name).as[SceneOut].collect()
        .groupBy(_.doc_id)
        .map { case (d, os) =>
          val last = os.maxBy(_.n_frames)
          d -> ((last.n_frames, last.n_scenes, last.longest_len,
            last.longest_start))
        }
    }

    assert(run(Seq(frames.toSeq), "scenes_one") == expected)
    // adversarial: frames arrive REVERSED and split mid-doc, plus a
    // replayed slice (at-least-once) — the sorted-set recompute must
    // converge identically
    val rev = frames.sortBy(f => (-f.doc_id, -f.frame_idx)).toSeq
    val n = rev.length
    assert(run(Seq(rev.take(n / 3), rev.slice(n / 3, 2 * n / 3),
      rev.take(50), rev.drop(2 * n / 3)), "scenes_rev") == expected,
      "out-of-order + redelivered frames must converge to the batch " +
        "segmentation")
  }

  test("TTL-bounded sessionize flushes idle open sessions as closed, " +
    "keeps in-window gap closure, and restarts a returning user at " +
    "session 1 (proving the eviction fired)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{SessEvent, SessionOut}

    val minUs = 60L * 1000000L
    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val mem = MemoryStream[SessEvent]
    // gap 1 min, TTL 10 min (≥ gap: a flush can never preempt a live
    // continuation)
    val q = StreamingIngest.sessionize(mem.toDS(), gapUs = minUs,
        stateTtl = "10 minutes", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_ttl")
      .outputMode(OutputMode.Append).start()

    // user 1: two events 1s apart (one open session); user 2: a
    // past-gap pair — the in-window gap rule must close session 1
    mem.addData(Seq(
      SessEvent(1L, t0, 1L, "view"),
      SessEvent(1L, t0 + 1000000L, 2L, "purchase"),
      SessEvent(2L, t0, 1L, "view"),
      SessEvent(2L, t0 + 2 * minUs, 2L, "view")))
    q.processAllAvailable()
    // churn batches advance the watermark hours past the TTL: the
    // idle open sessions must be FLUSHED as closed and evicted
    // (timeouts fire against the previous batch's watermark, so two
    // advancing batches guarantee the flush is processed)
    mem.addData(Seq(SessEvent(99L, t0 + hourUs, 1L, "view")))
    q.processAllAvailable()
    mem.addData(Seq(SessEvent(99L, t0 + 2 * hourUs, 2L, "view")))
    q.processAllAvailable()
    // user 1 returns hours later: state was evicted, so this must
    // restart at sessionId 1 (not 2); flushed by the final churn
    mem.addData(Seq(SessEvent(1L, t0 + 3 * hourUs, 3L, "view")))
    q.processAllAvailable()
    mem.addData(Seq(SessEvent(99L, t0 + 4 * hourUs, 3L, "view")))
    q.processAllAvailable()
    mem.addData(Seq(SessEvent(99L, t0 + 5 * hourUs, 4L, "view")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_ttl").as[SessionOut].collect().toSeq
    val u2 = out.filter(_.userId == 2L)
    assert(u2.exists(s => s.sessionId == 1L && s.nEvents == 1L &&
        s.startUs == t0 && s.endUs == t0),
      s"in-window gap closure must emit user 2's first session: $u2")
    val u1 = out.filter(_.userId == 1L).sortBy(_.startUs)
    assert(u1.exists(s => s.sessionId == 1L && s.nEvents == 2L &&
        s.startUs == t0 && s.endUs == t0 + 1000000L &&
        s.nPurchases == 1L),
      s"the idle open session must be TTL-flushed as closed: $u1")
    assert(u1.exists(s => s.sessionId == 1L &&
        s.startUs == t0 + 3 * hourUs),
      "a returning user must restart at session 1 — eviction really " +
        s"fired: $u1")
  }

  test("TTL-bounded ewma re-seeds an evicted series and keeps the " +
    "in-window recurrence bit-identical") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{EwmaOut, EwmaPoint}

    val minUs = 60L * 1000000L
    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val mem = MemoryStream[EwmaPoint]
    val q = StreamingIngest.ewma(mem.toDS(), stateTtl = "10 minutes",
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ewma_ttl")
      .outputMode(OutputMode.Append).start()

    mem.addData(Seq(EwmaPoint("s", t0, 10.0),
      EwmaPoint("s", t0 + minUs, 20.0)))
    q.processAllAvailable()
    mem.addData(Seq(EwmaPoint("churn", t0 + hourUs, 1.0)))
    q.processAllAvailable()
    mem.addData(Seq(EwmaPoint("churn", t0 + 2 * hourUs, 1.0)))
    q.processAllAvailable()
    // series "s" idled past the TTL: its recurrence must RE-SEED
    // (ewma = x), not continue from the forgotten 15.0
    mem.addData(Seq(EwmaPoint("s", t0 + 3 * hourUs, 40.0)))
    q.processAllAvailable()
    q.stop()

    val s = spark.table("ewma_ttl").as[EwmaOut].collect()
      .filter(_.series == "s").sortBy(_.bucketUs).toSeq
    assert(s.map(_.ewma) == Seq(10.0, 15.0, 40.0),
      s"expected in-window fold 10,15 then a re-seeded 40, got $s")
  }

  test("TTL-bounded markov transitions break the pair across an " +
    "eviction and resume within the new window") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{MarkovEvent, MarkovTransition}

    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val mem = MemoryStream[MarkovEvent]
    val q = StreamingIngest.markovTransitions(mem.toDS(),
        stateTtl = "10 minutes", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("markov_ttl")
      .outputMode(OutputMode.Append).start()

    mem.addData(Seq(MarkovEvent(1L, t0, 1L, "view"),
      MarkovEvent(1L, t0 + 1000000L, 2L, "click")))
    q.processAllAvailable()
    mem.addData(Seq(MarkovEvent(99L, t0 + hourUs, 1L, "view")))
    q.processAllAvailable()
    mem.addData(Seq(MarkovEvent(99L, t0 + 2 * hourUs, 2L, "view")))
    q.processAllAvailable()
    // user 1's last-event record evicted: the return event emits NO
    // transition across the idle gap; the one after it pairs normally
    mem.addData(Seq(
      MarkovEvent(1L, t0 + 3 * hourUs, 3L, "purchase"),
      MarkovEvent(1L, t0 + 3 * hourUs + 1000000L, 4L, "refund")))
    q.processAllAvailable()
    q.stop()

    val t = spark.table("markov_ttl").as[MarkovTransition].collect()
      .filter(_.userId == 1L).sortBy(_.tsUs)
      .map(x => (x.src, x.dst)).toSeq
    assert(t == Seq(("view", "click"), ("purchase", "refund")),
      "the cross-eviction pair (click → purchase) must NOT be " +
        s"emitted, and in-window pairs must: $t")
  }

  test("TTL-bounded holt/cusum/rate re-seed evicted series and keep " +
    "the in-window recurrences bit-identical") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{CusumOut, EwmaPoint,
      HoltOut, RateOut}

    val minUs = 60L * 1000000L
    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    // one shared event script: two in-window buckets, churn on
    // another series to advance the watermark past the TTL, then a
    // post-eviction bucket for "s"
    def feed[O: org.apache.spark.sql.Encoder](
        mk: org.apache.spark.sql.Dataset[EwmaPoint] =>
          org.apache.spark.sql.Dataset[O], name: String): Seq[O] = {
      val mem = MemoryStream[EwmaPoint]
      val q = mk(mem.toDS()).writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Append).start()
      mem.addData(Seq(EwmaPoint("s", t0, 10.0),
        EwmaPoint("s", t0 + minUs, 20.0)))
      q.processAllAvailable()
      mem.addData(Seq(EwmaPoint("churn", t0 + hourUs, 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(EwmaPoint("churn", t0 + 2 * hourUs, 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(EwmaPoint("s", t0 + 3 * hourUs, 40.0),
        EwmaPoint("s", t0 + 3 * hourUs + minUs, 50.0)))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[O].collect().toSeq
    }

    // holt: in-window fold l1=10 b1=0, then l=0.5·20+0.5·10=15,
    // b=0.25·5=1.25; post-eviction the recurrence re-seeds at l=40 b=0
    val h = feed[HoltOut](ds => StreamingIngest.holt(ds,
      stateTtl = "10 minutes", watermarkDelay = "0 seconds"),
      "holt_ttl").filter(_.series == "s").sortBy(_.bucketUs)
    assert(h.map(o => (o.level, o.trend)) ==
      Seq((10.0, 0.0), (15.0, 1.25), (40.0, 0.0),
        (0.5 * 50 + 0.5 * 40, 0.25 * (45.0 - 40.0))),
      s"holt must re-seed after eviction: $h")

    // cusum: μ=10 σ=2 ⇒ slack k=1; x=10,20 gives cp 0,9; a surviving
    // state would carry cp=9 into the post-eviction bucket (40 ⇒
    // cp=9+29=38) — re-seeded it must read 29
    val c = feed[CusumOut](ds => StreamingIngest.cusum(ds,
      Map("s" -> ((10.0, 2.0))), stateTtl = "10 minutes",
      watermarkDelay = "0 seconds"),
      "cusum_ttl").filter(_.series == "s").sortBy(_.bucketUs)
    assert(c.map(_.cusumPos) == Seq(0.0, 9.0, 29.0, 29.0 + 39.0),
      s"cusum must reset its accumulators on eviction: $c")

    // rate: the first bucket of a (re-)seeded series emits nothing —
    // so the post-eviction bucket at t0+3h MUST be absent (a
    // surviving state would have emitted a 3h-gap rate), and the one
    // after it emits against the new predecessor only
    val r = feed[RateOut](ds => StreamingIngest.rate(ds,
      stateTtl = "10 minutes", watermarkDelay = "0 seconds"),
      "rate_ttl").filter(_.series == "s").sortBy(_.bucketUs)
    assert(r.map(_.bucketUs) ==
      Seq(t0 + minUs, t0 + 3 * hourUs + minUs),
      s"the cross-eviction delta must NOT be emitted: $r")
    assert(r.last.delta == 10.0 && r.last.ratePerS == 10.0 / 60.0)
  }

  test("TTL-bounded anomaly and seriesStats drop idle state: history " +
    "warm-up and lifetime counters restart after eviction") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{AnomalyOut, EwmaPoint,
      SeriesUpdate, StreamRow}

    val minUs = 60L * 1000000L
    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L

    // anomaly with minHist=2: buckets 1-2 warm up, bucket 3 scores;
    // post-eviction the warm-up must restart (nothing scores until
    // two NEW buckets accumulate)
    val mem = MemoryStream[EwmaPoint]
    val q = StreamingIngest.anomaly(mem.toDS(), window = 4,
        minHist = 2, zThresh = 0.5, stateTtl = "10 minutes",
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("anom_ttl")
      .outputMode(OutputMode.Append).start()
    mem.addData(Seq(EwmaPoint("s", t0, 10.0),
      EwmaPoint("s", t0 + minUs, 20.0),
      EwmaPoint("s", t0 + 2 * minUs, 100.0)))
    q.processAllAvailable()
    mem.addData(Seq(EwmaPoint("churn", t0 + hourUs, 1.0)))
    q.processAllAvailable()
    mem.addData(Seq(EwmaPoint("churn", t0 + 2 * hourUs, 1.0)))
    q.processAllAvailable()
    // with surviving state these two buckets would BOTH score
    // (hist already ≥ 2); re-seeded, neither can
    mem.addData(Seq(EwmaPoint("s", t0 + 3 * hourUs, 50.0),
      EwmaPoint("s", t0 + 3 * hourUs + minUs, 60.0)))
    q.processAllAvailable()
    q.stop()
    val a = spark.table("anom_ttl").as[AnomalyOut].collect()
      .filter(_.series == "s").sortBy(_.bucketUs)
    assert(a.map(_.bucketUs).toSeq == Seq(t0 + 2 * minUs),
      s"post-eviction buckets must re-warm-up, not score: ${a.toSeq}")

    // seriesStats: lifetime n restarts at the post-eviction row
    val memR = MemoryStream[StreamRow]
    val qr = StreamingIngest.seriesStats(memR.toDS(),
        stateTtl = "10 minutes", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("stats_ttl")
      .outputMode(OutputMode.Update).start()
    memR.addData(Seq(StreamRow("ns", "cpu", "1", Map.empty, t0),
      StreamRow("ns", "cpu", "2", Map.empty, t0 + minUs)))
    qr.processAllAvailable()
    memR.addData(Seq(StreamRow("ns", "other", "x", Map.empty,
      t0 + hourUs)))
    qr.processAllAvailable()
    memR.addData(Seq(StreamRow("ns", "other", "y", Map.empty,
      t0 + 2 * hourUs)))
    qr.processAllAvailable()
    memR.addData(Seq(StreamRow("ns", "cpu", "9", Map.empty,
      t0 + 3 * hourUs)))
    qr.processAllAvailable()
    qr.stop()
    val st = spark.table("stats_ttl").as[SeriesUpdate].collect()
      .filter(_.measurement == "cpu").sortBy(_.n)
    assert(st.exists(u => u.n == 2 && u.lastValue == "2"),
      s"in-window fold must count both rows: ${st.toSeq}")
    assert(st.map(_.n).max == 2 &&
      st.count(u => u.n == 1 && u.lastValue == "9") == 1,
      "the post-eviction row must RESTART the lifetime count at 1 " +
        s"(surviving state would say 3): ${st.toSeq}")
  }

  test("TTL-bounded latest with emitTombstones emits an n_versions=0 " +
    "delete marker when a key evicts") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIngest.{KeyedEvent, LatestOut}

    val hourUs = 3600L * 1000000L
    val t0 = 1700000000000000L
    val mem = MemoryStream[KeyedEvent]
    val q = StreamingIngest.latest(mem.toDS(), stateTtl = "1 minute",
        watermarkDelay = "0 seconds", emitTombstones = true)
      .writeStream.format("memory").queryName("latest_tomb")
      .outputMode(OutputMode.Update).start()

    mem.addData(Seq(KeyedEvent(1L, "click", 11L, t0, 1.0)))
    q.processAllAvailable()
    mem.addData(Seq(KeyedEvent(99L, "churn", 1L, t0 + hourUs, 0.0)))
    q.processAllAvailable()
    mem.addData(Seq(KeyedEvent(99L, "churn", 2L, t0 + 2 * hourUs, 0.0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("latest_tomb").as[LatestOut].collect().toSeq
    assert(rows.exists(o => o.user_id == 1L && o.event_type == "click" &&
        o.n_versions == 0L),
      "the evicted key must surface a tombstone an upsert sink can " +
        s"apply as a delete: $rows")
    // a real upsert can never be mistaken for one
    assert(rows.filter(_.n_versions > 0L)
        .forall(o => o.latest_event_id > 0L), s"corrupt upserts: $rows")
  }

  test("checkpoint reset is machine-detected at the engine: an " +
    "already-applied batch id from a DIFFERENT streaming query " +
    "fails loudly instead of silently skipping") {
    val spark = SparkFixture.spark
    val walDir = Files.createTempDirectory("reset-wal").toFile
    val e = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      None)
    def ws(i: Int) = Seq(graft.core.WriteRequest("events", "cpu",
      s"v$i", Map.empty, i * 1000000L + 1))
    assert(e.writeStreamBatch("lane", 0L, ws(0), "query-A"))
    assert(e.writeStreamBatch("lane", 1L, ws(1), "query-A"))
    assert(e.streamQueryId("lane") == "query-A")
    // same-query re-delivery: the normal exactly-once skip
    assert(!e.writeStreamBatch("lane", 1L, ws(1), "query-A"))
    // unknown caller identity (pre-qid WALs): degrades to the skip
    assert(!e.writeStreamBatch("lane", 1L, ws(1)))
    // DIFFERENT query at-or-below the hwm: the reset signature
    val ex = intercept[IllegalStateException] {
      e.writeStreamBatch("lane", 0L, ws(0), "query-B")
    }
    assert(ex.getMessage.contains("stream reset detected"))
    // the sink's fast path (skip-before-collect) must detect it too
    val ex2 = intercept[IllegalStateException] {
      e.assertNoStreamReset("lane", 1L, "query-B")
    }
    assert(ex2.getMessage.contains("stream reset detected"))
    // ABOVE the hwm a new query continues the lane (explicit sinkId
    // across a checkpoint move) and the lane adopts its identity
    assert(e.writeStreamBatch("lane", 2L, ws(2), "query-B"))
    assert(e.streamQueryId("lane") == "query-B")
    intercept[IllegalStateException] {
      e.assertNoStreamReset("lane", 2L, "query-A")
    }
    // rows landed exactly once throughout
    assert(e.query("events", "SELECT count(*) AS c FROM cpu").get
      .rows.head.getLong(0) == 3L)
  }

  test("reset detection survives engine restart AND WAL truncation: " +
    "the lane's query id rides brackets and the checkpoint() hwm " +
    "carry-over records") {
    val spark = SparkFixture.spark
    val walDir = Files.createTempDirectory("resetsurv-wal").toFile
    val tierDir = Files.createTempDirectory("resetsurv-tier").toFile
    val tier = new graft.tier.ParquetTier(tierDir)
    val e1 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(tier))
    val ws = (0 until 3).map(i => graft.core.WriteRequest("events",
      "cpu", s"v$i", Map.empty, i * 1000000L + 1))
    assert(e1.writeStreamBatch("lane", 4L, ws, "query-A"))
    e1.wal.close()
    // restart (brackets intact): identity replayed from the bracket
    val e2 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(tier))
    assert(e2.streamQueryId("lane") == "query-A")
    intercept[IllegalStateException] {
      e2.assertNoStreamReset("lane", 0L, "query-B")
    }
    // checkpoint() seals + TRUNCATES the bracket-carrying segments;
    // the carry-over hwm record must keep the identity too
    e2.checkpoint()
    e2.wal.close()
    val e3 = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      Some(tier))
    assert(e3.streamHighWaterMark("lane") == 4L)
    assert(e3.streamQueryId("lane") == "query-A",
      "the qid must survive WAL truncation via the hwm carry-over")
    val ex = intercept[IllegalStateException] {
      e3.assertNoStreamReset("lane", 0L, "query-B")
    }
    assert(ex.getMessage.contains("stream reset detected"))
  }

  test("e2e: deleting and recreating the SAME checkpoint path fails " +
    "the restarted stream loudly — never a silent skip (the classic " +
    "operational mistake, round-12 verdict item 1)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val walDir = Files.createTempDirectory("resete2e-wal").toFile
    val ckpt = Files.createTempDirectory("resete2e-ckpt").toFile
    val e = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      None)
    def srows(n: Int, off: Long = 0L): Seq[StreamRow] =
      (0 until n).map(i => StreamRow("events", "cpu", s"v$i",
        Map.empty, off + i * 1000000L + 1))
    val mem = MemoryStream[StreamRow]
    val q = StreamingIngest.engineSink(mem.toDS(), e, ckpt.getPath)
    mem.addData(srows(3))
    q.processAllAvailable()
    mem.addData(srows(3, 100L * 1000000L))
    q.processAllAvailable()
    q.stop()
    assert(e.query("events", "SELECT count(*) AS c FROM cpu").get
      .rows.head.getLong(0) == 6L)
    // wipe the checkpoint and reuse the SAME path: batch ids restart
    // at 0 under a fresh query id — the WAL lane remembers both
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(ckpt)
    ckpt.mkdirs()
    val mem2 = MemoryStream[StreamRow]
    val q2 = StreamingIngest.engineSink(mem2.toDS(), e, ckpt.getPath)
    mem2.addData(srows(2, 200L * 1000000L))
    val ex = intercept[Exception] { q2.processAllAvailable() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("stream reset detected")),
      s"expected a loud reset error, got: ${chain(ex)}")
    q2.stop()
    // nothing was silently dropped OR double-applied
    assert(e.query("events", "SELECT count(*) AS c FROM cpu").get
      .rows.head.getLong(0) == 6L)
  }

  test("default sink lane id canonicalizes path spelling and never " +
    "mangles URI checkpoint locations") {
    val d = Files.createTempDirectory("canon-ckpt").toFile
    val a = StreamingIngest.canonicalSinkId(d.getPath)
    assert(StreamingIngest.canonicalSinkId(d.getPath + "/") == a)
    assert(StreamingIngest.canonicalSinkId(d.getPath + "/.") == a)
    val sneaky = d.getParent + "/../" +
      new java.io.File(d.getParent).getName + "/" + d.getName
    assert(StreamingIngest.canonicalSinkId(sneaky) == a,
      "a differently-spelled equivalent path must map to ONE lane")
    assert(StreamingIngest.canonicalSinkId("s3://bucket/ck/pt/") ==
      "s3://bucket/ck/pt",
      "URI locations must not be run through java.io.File")
    assert(StreamingIngest.canonicalSinkId("s3://bucket/a/../b") ==
      "s3://bucket/b")
  }

  test("lane-name migration: a WAL whose default lane was keyed by " +
    "the legacy absolute path keeps that lane when the canonical " +
    "spelling differs — the hwm is never orphaned by an upgrade") {
    val spark = SparkFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val walDir = Files.createTempDirectory("lanemig-wal").toFile
    val e = new graft.engine.LynxEngine(spark, walDir, 1024 * 1024,
      None)
    // a checkpoint path whose absolute and canonical spellings differ
    // (symlink indirection — the upgrade hazard)
    val real = Files.createTempDirectory("lanemig-real")
    val link = new java.io.File(real.getParent.toFile,
      s"lanemig-link-${System.nanoTime()}")
    java.nio.file.Files.createSymbolicLink(link.toPath, real)
    val ckptPath = new java.io.File(link, "ckpt").getPath
    val legacy = new java.io.File(ckptPath).getAbsolutePath
    val canonical = StreamingIngest.canonicalSinkId(ckptPath)
    assume(legacy != canonical, "needs a path where the two differ")
    // pre-upgrade WAL state: batches 0..1 committed under the LEGACY id
    val ws = Seq(graft.core.WriteRequest("events", "cpu", "old",
      Map.empty, 1L))
    assert(e.writeStreamBatch(legacy, 0L, ws))
    assert(e.writeStreamBatch(legacy, 1L, ws))
    // post-upgrade engineSink on the same checkpoint path: the lane
    // resolves to the legacy id, so re-delivery of batch <= 1 skips
    // and the next batch continues the SAME lane
    val mem = MemoryStream[StreamRow]
    val q = StreamingIngest.engineSink(mem.toDS(), e, ckptPath)
    mem.addData(Seq(StreamRow("events", "cpu", "new", Map.empty, 2L)))
    q.processAllAvailable()
    q.stop()
    assert(e.streamHighWaterMark(legacy) >= 0L,
      "the legacy lane must keep advancing")
    assert(e.streamHighWaterMark(canonical) == -1L,
      "no second lane may open for the same checkpoint")
    // a RESPELLED equivalent path (through the real dir instead of
    // the symlink) still finds the legacy lane: migration matches any
    // recorded lane whose spelling canonicalizes to this checkpoint
    val respelled = new java.io.File(real.toFile, "ckpt").getPath
    val mem1b = MemoryStream[StreamRow]
    val q1b = StreamingIngest.engineSink(mem1b.toDS(), e, respelled)
    mem1b.addData(Seq(StreamRow("events", "cpu", "new2", Map.empty, 3L)))
    q1b.processAllAvailable()
    q1b.stop()
    assert(e.streamHighWaterMark(legacy) >= 0L &&
      e.streamHighWaterMark(canonical) == -1L,
      "a respelled restart must keep the one legacy lane")

    // a FRESH checkpoint (no legacy lane) uses the canonical id
    val ckpt2 = new java.io.File(link, "ckpt2").getPath
    val mem2 = MemoryStream[StreamRow]
    val q2 = StreamingIngest.engineSink(mem2.toDS(), e, ckpt2)
    mem2.addData(Seq(StreamRow("events", "mem", "x", Map.empty, 3L)))
    q2.processAllAvailable()
    q2.stop()
    assert(e.streamHighWaterMark(
      StreamingIngest.canonicalSinkId(ckpt2)) >= 0L)
  }

  test("readQueryId resolves file:-scheme checkpoint spellings — " +
    "reset detection engages for them instead of silently degrading") {
    val d = Files.createTempDirectory("qid-uri").toFile
    java.nio.file.Files.write(
      new java.io.File(d, "metadata").toPath,
      """{"id":"abc-123"}""".getBytes("UTF-8"))
    assert(StreamingIngest.readQueryId(d.getPath)
      .contains("abc-123"))
    assert(StreamingIngest.readQueryId("file://" + d.getPath)
      .contains("abc-123"), "file:// spelling must resolve")
    assert(StreamingIngest.readQueryId("file:" + d.getPath)
      .contains("abc-123"), "file: spelling must resolve")
    // a genuinely remote scheme degrades to None (with a warning)
    assert(StreamingIngest.readQueryId("s3://bucket/ckpt").isEmpty)
  }
}

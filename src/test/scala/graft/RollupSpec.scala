package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TagString, WriteRequest}
import graft.engine.LynxEngine
import graft.tier.ParquetTier

/** Incremental rollup maintenance: a warm rollup serve after a new
  * seal aggregates ONLY the new segment's files and still equals a
  * full re-aggregation — including across a compaction file swap.
  */
class RollupSpec extends AnyFunSuite {

  private def engineWithTier(): (LynxEngine, ParquetTier) = {
    val walDir = Files.createTempDirectory("rollup-wal").toFile
    val tierDir = Files.createTempDirectory("rollup-tier").toFile
    val tier = new ParquetTier(tierDir)
    (new LynxEngine(SparkFixture.spark, walDir, 1024 * 1024, Some(tier)),
      tier)
  }

  /** Full re-aggregation through the engine's own SQL surface, with
    * the same exact-decimal sum the rollup maintains.
    */
  private def fullAgg(e: LynxEngine): Seq[(Option[String], Long, Double)] =
    e.query("ns",
      """SELECT host, count(*) AS c,
        |CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s
        |FROM cpu GROUP BY host ORDER BY host""".stripMargin)
      .get.rows
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2)))

  test("second serve after a seal reads only the new segment; result " +
    "equals the full re-aggregation, also across compaction") {
    val (e, tier) = engineWithTier()
    (1 to 10).foreach(i =>
      e.write(WriteRequest("ns", "cpu", i.toString,
        Map("host" -> TagString(if (i % 2 == 0) "a" else "b")),
        i.toLong)))
    e.checkpoint() // segment 1 published
    val store = e.rollups.get

    val r1 = store.rollup("ns", "cpu", "host", "value")
    val firstFiles = store.lastComputedFiles
    assert(firstFiles.nonEmpty, "cold serve must aggregate the segment")
    assert(r1 == Seq(
      (Some("a"), 5L, 30.0), (Some("b"), 5L, 25.0)))

    // warm serve: nothing new → zero files aggregated
    val r1b = store.rollup("ns", "cpu", "host", "value")
    assert(store.lastComputedFiles.isEmpty,
      "fully warm serve must not touch any file")
    assert(r1b == r1)

    // new seal: the refresh aggregates ONLY the new segment
    (11 to 14).foreach(i =>
      e.write(WriteRequest("ns", "cpu", i.toString,
        Map("host" -> TagString("a")), i.toLong)))
    e.checkpoint()
    val r2 = store.rollup("ns", "cpu", "host", "value")
    assert(store.lastComputedFiles.nonEmpty)
    assert(store.lastComputedFiles.toSet.intersect(firstFiles.toSet).isEmpty,
      "refresh must not re-aggregate already-cached segments")
    assert(r2 == fullAgg(e),
      "incrementally merged rollup must equal the full re-aggregation")
    assert(r2.find(_._1 == Some("a")).get._2 == 9L)

    // compaction swaps the file list: the swapped files are "new"
    // exactly once, the result is unchanged, stale partials prunable
    val cellsBefore = store.cachedCells
    e.compact("ns", "cpu")
    val r3 = store.rollup("ns", "cpu", "host", "value")
    assert(r3 == r2, "compaction must not change the served rollup")
    assert(store.lastComputedFiles.nonEmpty,
      "compacted files are aggregated once")
    store.prune()
    assert(store.cachedCells <= cellsBefore,
      "pruning after compaction must not grow the cache")
    val r4 = store.rollup("ns", "cpu", "host", "value")
    assert(store.lastComputedFiles.isEmpty && r4 == r2,
      "post-prune serve is warm and unchanged")
  }

  test("day-bounded serve merges only in-range day partitions and " +
    "reuses the all-time serve's partials") {
    val (e, _) = engineWithTier()
    val dayUs = 86400L * 1000000L
    // 3 rows on 1970-01-01, 2 rows on 1970-01-02
    Seq(1L, 2L, 3L).foreach(i =>
      e.write(WriteRequest("ns", "cpu", i.toString,
        Map("host" -> TagString("a")), i)))
    Seq(4L, 5L).foreach(i =>
      e.write(WriteRequest("ns", "cpu", i.toString,
        Map("host" -> TagString("a")), dayUs + i)))
    e.checkpoint()
    val store = e.rollups.get
    // cold all-time serve computes both day partitions
    val all = store.rollup("ns", "cpu", "host", "value")
    assert(all == Seq((Some("a"), 5L, 15.0)))
    // the bounded pane reuses those partials: zero files computed,
    // and the merge walks only day-1 files
    val d1 = store.rollup("ns", "cpu", "host", "value",
      Some(("1970-01-01", "1970-01-01")))
    assert(store.lastComputedFiles.isEmpty,
      "bounded serve must reuse the all-time partials")
    assert(d1 == Seq((Some("a"), 3L, 6.0)))
    val d2 = store.rollup("ns", "cpu", "host", "value",
      Some(("1970-01-02", "1970-01-02")))
    assert(d2 == Seq((Some("a"), 2L, 9.0)))
  }

  test("rollup partials persist under the tier root: a restarted " +
    "store serves warm (ZERO files computed) and prune GCs disk too") {
    val (e, tier) = engineWithTier()
    (1 to 10).foreach(i =>
      e.write(WriteRequest("ns", "cpu", i.toString,
        Map("host" -> TagString(if (i % 2 == 0) "a" else "b")),
        i.toLong)))
    e.checkpoint()
    val store = e.rollups.get
    val r1 = store.rollup("ns", "cpu", "host", "value")
    assert(store.lastComputedFiles.nonEmpty)
    // restart: a FRESH store over a fresh tier handle on the same root
    def freshStore() = new graft.engine.RollupStore(SparkFixture.spark,
      new ParquetTier(new java.io.File(tier.rootPath)))
    val store2 = freshStore()
    val r2 = store2.rollup("ns", "cpu", "host", "value")
    assert(store2.lastComputedFiles.isEmpty,
      "restarted serve must be warm from persisted partials")
    assert(r2 == r1)
    // compaction kills the old files; prune on the restarted store
    // must GC their partials from disk as well — so a THIRD store
    // computes exactly the compacted files and nothing stale
    e.compact("ns", "cpu")
    store2.prune()
    assert(store2.cachedCells == 0,
      "all pre-compaction partials must be pruned")
    val store3 = freshStore()
    val r3 = store3.rollup("ns", "cpu", "host", "value")
    assert(r3 == r1, "post-compaction serve is unchanged")
    assert(store3.lastComputedFiles.nonEmpty,
      "the compacted files are new to the index")
    // and once computed, the NEXT restart is warm again
    val store4 = freshStore()
    store4.rollup("ns", "cpu", "host", "value")
    assert(store4.lastComputedFiles.isEmpty)
  }

  test("prune on a store that never served stays non-resident: the " +
    "sweep must not grow the serving cache, and the persisted index " +
    "survives intact") {
    val (e, tier) = engineWithTier()
    (1 to 6).foreach(i =>
      e.write(WriteRequest("ns", "cpu", i.toString,
        Map("host" -> TagString("a")), i.toLong)))
    e.checkpoint()
    val store = e.rollups.get
    store.rollup("ns", "cpu", "host", "value") // persists partials
    def freshStore() = new graft.engine.RollupStore(SparkFixture.spark,
      new ParquetTier(new java.io.File(tier.rootPath)))
    // a maintenance-only store: prune loads each persisted rollup
    // for the sweep but must NOT keep it resident (all files live →
    // nothing to drop, nothing to retain)
    val sweeper = freshStore()
    sweeper.prune()
    assert(sweeper.cachedCells == 0,
      "sweep-only loads must leave the cache when prune returns")
    // the persisted partials were untouched: a serving store is
    // still warm (zero files computed)
    val server = freshStore()
    val r = server.rollup("ns", "cpu", "host", "value")
    assert(server.lastComputedFiles.isEmpty,
      "prune must not disturb live persisted partials")
    assert(r == Seq((Some("a"), 6L, 21.0)))
    // and the sweeper itself can still serve AFTER its sweep (the
    // dropped load latch reloads lazily)
    assert(sweeper.rollup("ns", "cpu", "host", "value") == r)
    assert(sweeper.lastComputedFiles.isEmpty)
  }

  test("a group column above the cardinality bound fails fast with " +
    "the bound in the error and leaves no driver state behind") {
    val (e, tier) = engineWithTier()
    // 6 distinct hosts in one segment; a bound of 3 must reject
    (1 to 6).foreach(i =>
      e.write(WriteRequest("ns", "cpu", "1",
        Map("host" -> TagString(s"h$i")), i.toLong)))
    e.checkpoint()
    val store = new graft.engine.RollupStore(SparkFixture.spark, tier,
      maxGroups = 3)
    val err = intercept[IllegalArgumentException] {
      store.rollup("ns", "cpu", "host", "value")
    }
    assert(err.getMessage.contains("3") &&
      err.getMessage.contains("host"),
      s"error must name the column and the bound: ${err.getMessage}")
    assert(store.cachedCells == 0,
      "a rejected rollup must not grow the partial cache")
    // the same store still serves a bounded-cardinality rollup: the
    // rejection is per-request, not a poisoned key
    val ok = store.rollup("ns", "cpu", "value", "value")
    assert(ok == Seq((Some("1"), 6L, 6.0)))
    assert(store.cachedCells > 0)
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TagNumber, TagString, WriteRequest}
import graft.engine.{LynxEngine, Sinks}
import graft.tier.ParquetTier

/** End-to-end query tests mirroring the reference's `query_results`
  * golden-output test (reference lynx.rs:313-387) plus the gatekeeper
  * suite (lynx.rs:389-401), and the tier/pruning extension.
  */
class EngineSpec extends AnyFunSuite {

  private def newEngine(tier: Option[ParquetTier] = None): LynxEngine = {
    val dir = Files.createTempDirectory("engine-spec").toFile
    new LynxEngine(SparkFixture.spark, dir, 1024 * 1024, tier)
  }

  test("golden query result matches the reference (lynx.rs:313-346)") {
    val e = newEngine()
    e.write(WriteRequest("events", "clicks", "search_button", Map.empty, 1))
    val r1 = e.query("events", "SELECT * FROM clicks").get
    assert(Sinks.toTable(r1) == Seq(
      "+----------------------------+---------------+",
      "| timestamp                  | value         |",
      "+----------------------------+---------------+",
      "| 1970-01-01T00:00:00.000001 | search_button |",
      "+----------------------------+---------------+").mkString("\n"))

    // second write visible on re-query (lynx.rs:347-375)
    e.write(WriteRequest("events", "clicks", "search_button", Map.empty, 100))
    val r2 = e.query("events", "SELECT * FROM clicks").get
    assert(Sinks.toTable(r2) == Seq(
      "+----------------------------+---------------+",
      "| timestamp                  | value         |",
      "+----------------------------+---------------+",
      "| 1970-01-01T00:00:00.000001 | search_button |",
      "| 1970-01-01T00:00:00.000100 | search_button |",
      "+----------------------------+---------------+").mkString("\n"))
  }

  test("unknown namespace or table → None → 404 (lynx.rs:377-387)") {
    val e = newEngine()
    assert(e.query("not_exist", "SELECT * FROM not_exist_table").isEmpty)
    e.write(WriteRequest("events", "clicks", "x", Map.empty, 1))
    assert(e.query("events", "SELECT * FROM no_such_table").isEmpty)
  }

  test("tags widen the schema; missing tags are NULL; numbers stringify " +
    "(lynx.rs:93-134)") {
    val e = newEngine()
    e.write(WriteRequest("ns", "cpu", "1",
      Map("host" -> TagString("h1")), 1))
    e.write(WriteRequest("ns", "cpu", "2",
      Map("region" -> TagString("eu"), "n" -> TagNumber(-1L)), 2))
    val r = e.query("ns",
      "SELECT value, host, region, n FROM cpu ORDER BY timestamp").get
    assert(r.schema.fieldNames.toSeq == Seq("value", "host", "region", "n"))
    val rows = r.rows.map(row => (0 until 4).map(row.get))
    assert(rows(0) == Seq("1", "h1", null, null))
    // u64 render of raw bits -1 (reference wal.rs:164-171 Display)
    assert(rows(1) == Seq("2", null, "eu", "18446744073709551615"))
  }

  test("numeric analytics via CAST on the string value column") {
    val e = newEngine()
    (1 to 10).foreach(i =>
      e.write(WriteRequest("m", "cpu", i.toString,
        Map("host" -> TagString(if (i % 2 == 0) "a" else "b")), i.toLong)))
    val r = e.query("m",
      """SELECT host, sum(CAST(value AS BIGINT)) AS s FROM cpu
        |GROUP BY host ORDER BY host""".stripMargin).get
    assert(r.rows.map(r0 => (r0.getString(0), r0.getLong(1))) ==
      Seq(("a", 30L), ("b", 25L)))
  }

  test("multi-table join within one namespace (improvement, SURVEY §3.4)") {
    val e = newEngine()
    e.write(WriteRequest("ns", "cpu", "9", Map("host" -> TagString("h1")), 1))
    e.write(WriteRequest("ns", "meta", "zone-a",
      Map("host" -> TagString("h1")), 1))
    val r = e.query("ns",
      """SELECT c.value AS v, m.value AS zone
        |FROM cpu c JOIN meta m ON c.host = m.host""".stripMargin).get
    assert(r.rows.map(r0 => (r0.getString(0), r0.getString(1))) ==
      Seq(("9", "zone-a")))
  }

  test("CTEs pass the gatekeeper (improvement over lynx.rs:161-167)") {
    val e = newEngine()
    e.write(WriteRequest("ns", "cpu", "5", Map.empty, 1))
    val r = e.query("ns",
      "WITH t AS (SELECT CAST(value AS INT) v FROM cpu) SELECT v + 1 AS v2 FROM t")
    assert(r.get.rows.head.getInt(0) == 6)
  }

  test("gatekeeper rejects non-SELECT and FROM-less SQL (lynx.rs:389-401)") {
    val s = SparkFixture.spark
    assert(LynxEngine.referencedTables(s, "SELECT * FROM foo") == Seq("foo"))
    assert(LynxEngine.referencedTables(s,
      "SELECT name, age FROM people") == Seq("people"))
    intercept[IllegalArgumentException] {
      LynxEngine.referencedTables(s, "SELECT *")
    }
    intercept[IllegalArgumentException] {
      LynxEngine.referencedTables(s, "INSERT INTO my_table (id) VALUES (1)")
    }
    intercept[IllegalArgumentException] {
      LynxEngine.referencedTables(s, "DROP TABLE foo")
    }
    // CTAS/CACHE AS SELECT contain an UnresolvedRelation but are DDL
    intercept[IllegalArgumentException] {
      LynxEngine.referencedTables(s, "CREATE TABLE p AS SELECT * FROM foo")
    }
    intercept[IllegalArgumentException] {
      LynxEngine.referencedTables(s, "CACHE TABLE p AS SELECT * FROM foo")
    }
    // relations inside subquery expressions are collected
    assert(LynxEngine.referencedTables(s,
      "SELECT * FROM a WHERE x IN (SELECT y FROM b)").toSet == Set("a", "b"))
  }

  test("WAL replay restores queryability across restarts (wal.rs:465-547)") {
    val dir = Files.createTempDirectory("engine-replay").toFile
    val e1 = new LynxEngine(SparkFixture.spark, dir, 256)
    (0 until 8).foreach(i =>
      e1.write(WriteRequest("ns", "cpu", i.toString, Map.empty, i.toLong)))
    e1.wal.close()
    val e2 = new LynxEngine(SparkFixture.spark, dir, 256)
    assert(e2.replayedSegments.nonEmpty)
    val r = e2.query("ns",
      "SELECT count(*) AS n, sum(CAST(value AS BIGINT)) AS s FROM cpu").get
    assert(r.rows.head.getLong(0) == 8 && r.rows.head.getLong(1) == 28)
  }

  test("checkpoint seals everything, truncates the WAL, survives restart") {
    val walDir = Files.createTempDirectory("ckpt-wal").toFile
    val tierDir = Files.createTempDirectory("ckpt-tier").toFile
    val e1 = new LynxEngine(SparkFixture.spark, walDir, 256, // tiny segs
      Some(new ParquetTier(tierDir)))
    (1 to 20).foreach(i =>
      e1.write(WriteRequest("ns", "cpu", i.toString, Map.empty, i.toLong)))
    (1 to 5).foreach(i =>
      e1.write(WriteRequest("ns", "mem", i.toString, Map.empty, i.toLong)))
    assert(walDir.listFiles().count(_.getName.endsWith(".wal")) > 1)
    e1.checkpoint()
    // only the fresh active segment remains
    assert(walDir.listFiles().count(_.getName.endsWith(".wal")) == 1)
    // post-checkpoint write goes to the new segment
    e1.write(WriteRequest("ns", "cpu", "21", Map.empty, 21L))
    e1.wal.close()
    val e2 = new LynxEngine(SparkFixture.spark, walDir, 256,
      Some(new ParquetTier(tierDir)))
    val r = e2.query("ns",
      "SELECT count(*) AS n, sum(CAST(value AS BIGINT)) AS s FROM cpu").get
    assert(r.rows.head.getLong(0) == 21)
    assert(r.rows.head.getLong(1) == 21 * 22 / 2)
    val rm = e2.query("ns", "SELECT count(*) AS n FROM mem").get
    assert(rm.rows.head.getLong(0) == 5)
  }

  test("restart after seal does not double-count sealed rows") {
    val walDir = Files.createTempDirectory("seal-replay-wal").toFile
    val tierDir = Files.createTempDirectory("seal-replay-tier").toFile
    val e1 = new LynxEngine(SparkFixture.spark, walDir, 1024 * 1024,
      Some(new ParquetTier(tierDir)))
    (1 to 10).foreach(i =>
      e1.write(WriteRequest("ns", "cpu", i.toString, Map.empty, i.toLong)))
    e1.seal("ns", "cpu")
    // post-seal writes stay in RAM
    (11 to 13).foreach(i =>
      e1.write(WriteRequest("ns", "cpu", i.toString, Map.empty, i.toLong)))
    e1.wal.close()
    // restart on the same WAL + tier
    val e2 = new LynxEngine(SparkFixture.spark, walDir, 1024 * 1024,
      Some(new ParquetTier(tierDir)))
    val r = e2.query("ns", "SELECT count(*) AS n FROM cpu").get
    assert(r.rows.head.getLong(0) == 13,
      "sealed rows must not replay into the buffer again")
  }

  test("simple time-range query prunes tier day partitions") {
    val spark = SparkFixture.spark
    val dayUs = 86400L * 1000000L
    // bounds extraction on the parsed plan
    val b1 = LynxEngine.dayBounds(LynxEngine.parse(spark,
      """SELECT * FROM cpu WHERE timestamp >= TIMESTAMP '1970-01-03
        | 00:00:00' AND timestamp < TIMESTAMP '1970-01-05 00:00:00'"""
        .stripMargin.replace("\n", "")))
    assert(b1.contains(("1970-01-03", "1970-01-05")))
    // subqueries and joins disable pruning (conservative)
    assert(LynxEngine.dayBounds(LynxEngine.parse(spark,
      """SELECT * FROM cpu WHERE value IN
        |(SELECT value FROM cpu WHERE timestamp > TIMESTAMP
        |'1970-01-03 00:00:00')""".stripMargin.replace("\n", " "))).isEmpty)
    // end-to-end: data across 4 days, bounded query stays correct
    val tierDir = Files.createTempDirectory("prune-tier").toFile
    val e = newEngine(Some(new ParquetTier(tierDir)))
    (0 until 4).foreach(d =>
      e.write(WriteRequest("ns", "cpu", d.toString, Map.empty,
        d * dayUs + 1)))
    e.seal("ns", "cpu")
    val r = e.query("ns",
      """SELECT value FROM cpu WHERE timestamp >=
        |TIMESTAMP '1970-01-02 00:00:00' AND timestamp <
        |TIMESTAMP '1970-01-04 00:00:00' ORDER BY timestamp"""
        .stripMargin.replace("\n", " ")).get
    assert(r.rows.map(_.getString(0)) == Seq("1", "2"))
  }

  test("tier compaction merges seal files and preserves results") {
    val tierDir = Files.createTempDirectory("compact-tier").toFile
    val tier = new ParquetTier(tierDir)
    val e = newEngine(Some(tier))
    // 5 seals → 5 files in the same day partition
    (1 to 5).foreach { i =>
      e.write(WriteRequest("ns", "cpu", i.toString, Map.empty, i.toLong))
      e.seal("ns", "cpu")
    }
    val dayDir = new java.io.File(tierDir, "ns/cpu/day=1970-01-01")
    def files() = dayDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() == 5)
    e.compact("ns", "cpu")
    assert(files() == 1)
    val r = e.query("ns",
      "SELECT sum(CAST(value AS BIGINT)) AS s FROM cpu").get
    assert(r.rows.head.getLong(0) == 15)
  }

  test("property: random writes round-trip through SQL unchanged") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val e = newEngine()
    val genW: Gen[WriteRequest] = for {
      v <- Gen.asciiPrintableStr
      tag <- Gen.option(Gen.oneOf(
        graft.core.TagString("x"): graft.core.TagValue,
        graft.core.TagNumber(-5L): graft.core.TagValue))
      ts <- Gen.choose(0L, 4102444800000000L) // 1970..2100, micros
    } yield WriteRequest("prop", "m",
      v, tag.map(t => Map("t" -> t)).getOrElse(Map.empty), ts)
    val writes = (1 to 100).map(i =>
      genW.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    writes.foreach(e.write)
    val r = e.query("prop",
      "SELECT timestamp, value, t FROM m ORDER BY timestamp, value").get
    assert(r.rows.size == 100)
    val got = r.rows.map(row =>
      (graft.engine.Sinks.formatCell(row.get(0)), row.getString(1),
        Option(row.getString(2))))
    val want = writes.sortBy(w => (w.timestamp, w.value)).map { w =>
      (graft.engine.Sinks.formatCell(new java.sql.Timestamp(0) {
        setTime(Math.floorDiv(w.timestamp, 1000L))
        setNanos((Math.floorMod(w.timestamp, 1000000L) * 1000L).toInt)
      }), w.value, w.metadata.get("t").map(_.render))
    }
    assert(got == want)
  }

  test("sealed parquet tier unions with the in-RAM tail") {
    val tierDir = Files.createTempDirectory("tier-spec").toFile
    val e = newEngine(Some(new ParquetTier(tierDir)))
    e.write(WriteRequest("ns", "cpu", "1", Map("host" -> TagString("h1")), 1))
    e.seal("ns", "cpu")
    assert(e.buffer.partitions("ns", "cpu") == 0)
    // tier-only query
    val r1 = e.query("ns", "SELECT value, host FROM cpu").get
    assert(r1.rows.map(r0 => (r0.getString(0), r0.getString(1))) ==
      Seq(("1", "h1")))
    // new write with a NEW tag key → widened schema over the union
    e.write(WriteRequest("ns", "cpu", "2",
      Map("zone" -> TagString("z1")), 86400L * 1000000L))
    val r2 = e.query("ns",
      "SELECT value, host, zone FROM cpu ORDER BY timestamp").get
    val rows = r2.rows.map(r0 => (0 until 3).map(r0.get))
    assert(rows == Seq(Seq("1", "h1", null), Seq("2", null, "z1")))
  }
}

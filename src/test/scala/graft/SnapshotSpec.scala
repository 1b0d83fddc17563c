package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TagString, WriteRequest}
import graft.engine.LynxEngine
import graft.tier.ParquetTier

/** Snapshot export/import — the backup/restore half of the
  * one-box-per-namespace deployment story (VERDICT r13 "What's
  * missing" #1) — and the write fence that makes namespace migration
  * drain-safe. Round-trip equality, CRC tamper detection, version
  * preservation, and the fence's durability across restart are all
  * pinned here.
  */
class SnapshotSpec extends AnyFunSuite {

  private def engineAt(walDir: java.io.File,
      tierDir: java.io.File): LynxEngine =
    new LynxEngine(SparkFixture.spark, walDir, 1024 * 1024,
      Some(new ParquetTier(tierDir)))

  private def freshEngine(): (LynxEngine, java.io.File, java.io.File) = {
    val w = Files.createTempDirectory("snap-wal").toFile
    val t = Files.createTempDirectory("snap-tier").toFile
    (engineAt(w, t), w, t)
  }

  private def canon(e: LynxEngine, ns: String, sql: String,
      asOf: Option[Long] = None): Seq[String] =
    e.query(ns, sql, asOf).get.rows
      .map(_.toSeq.map(String.valueOf).mkString("")).sorted

  test("export at a pinned version / import on a fresh engine: every " +
    "query and time-travel read answers identically, the version " +
    "number is preserved, and later seals continue past it") {
    val (a, _, _) = freshEngine()
    // two days of rows, sealed in two batches → two manifest versions
    (0 until 6).foreach { i =>
      a.write(WriteRequest("prod", "cpu", s"v$i",
        Map("host" -> TagString(s"h${i % 2}")),
        (i.toLong * 20 * 3600) * 1000000L))
    }
    a.seal("prod", "cpu")
    (6 until 9).foreach { i =>
      a.write(WriteRequest("prod", "cpu", s"v$i",
        Map("host" -> TagString("h9")),
        (i.toLong * 20 * 3600) * 1000000L))
    }
    a.seal("prod", "cpu")
    val versions = a.tierVersions("prod", "cpu").map(_._1)
    assert(versions.size == 2)
    val current = versions.last

    val dest = Files.createTempDirectory("snap-out").toFile
    val files = a.exportSnapshot("prod", "cpu", None, dest)
    assert(files > 0)
    assert(new java.io.File(dest, "_snapshot.json").isFile)

    val (b, _, _) = freshEngine()
    val imported = b.importSnapshot("prod", "cpu", dest)
    assert(imported == current,
      s"import must preserve the exported version ($current), got " +
        s"$imported")
    // full equality across query shapes: full scan, filtered,
    // aggregated, day-pruned
    Seq(
      "SELECT * FROM cpu",
      "SELECT value FROM cpu WHERE host = 'h0'",
      "SELECT host, count(*) AS c FROM cpu GROUP BY host",
      "SELECT count(*) AS c FROM cpu WHERE timestamp >= " +
        "'1970-01-03 00:00:00'"
    ).foreach { sql =>
      assert(canon(b, "prod", sql) == canon(a, "prod", sql),
        s"divergence after import: $sql")
    }
    // time travel at the imported version answers on B
    assert(canon(b, "prod", "SELECT * FROM cpu", Some(current)) ==
      canon(a, "prod", "SELECT * FROM cpu", Some(current)))
    // later writes/seals on B continue past the imported version
    b.write(WriteRequest("prod", "cpu", "post-import",
      Map.empty, 1L))
    b.seal("prod", "cpu")
    val bVersions = b.tierVersions("prod", "cpu").map(_._1)
    assert(bVersions == Seq(current, current + 1),
      s"seals must continue at version+1: $bVersions")
  }

  test("export pins an EXPLICIT older version; a tampered snapshot " +
    "fails import loudly with nothing published") {
    val (a, _, _) = freshEngine()
    (0 until 4).foreach { i =>
      a.write(WriteRequest("prod", "mem", s"v$i", Map.empty,
        i.toLong * 1000000L))
    }
    a.seal("prod", "mem")
    (4 until 8).foreach { i =>
      a.write(WriteRequest("prod", "mem", s"v$i", Map.empty,
        i.toLong * 1000000L))
    }
    a.seal("prod", "mem")
    val v1 = a.tierVersions("prod", "mem").map(_._1).head

    // version-pinned export: only v1's rows travel
    val oldDest = Files.createTempDirectory("snap-v1").toFile
    a.exportSnapshot("prod", "mem", Some(v1), oldDest)
    val (b, _, _) = freshEngine()
    b.importSnapshot("prod", "mem", oldDest)
    assert(canon(b, "prod", "SELECT * FROM mem") ==
      canon(a, "prod", "SELECT * FROM mem", asOf = Some(v1)))

    // tamper: flip a byte in a data file → CRC mismatch, import
    // refuses, nothing is visible on the target
    val dest = Files.createTempDirectory("snap-tampered").toFile
    a.exportSnapshot("prod", "mem", None, dest)
    val victim = Files.walk(dest.toPath).iterator()
    val dataFile = {
      var f: java.io.File = null
      while (victim.hasNext && f == null) {
        val p = victim.next().toFile
        if (p.isFile && p.getName.endsWith(".parquet")) f = p
      }
      f
    }
    assert(dataFile != null)
    val bytes = Files.readAllBytes(dataFile.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x41).toByte
    Files.write(dataFile.toPath, bytes)
    val (c, _, _) = freshEngine()
    val ex = intercept[IllegalArgumentException] {
      c.importSnapshot("prod", "mem", dest)
    }
    assert(ex.getMessage.contains("CRC mismatch"), ex.getMessage)
    assert(c.query("prod", "SELECT * FROM mem").isEmpty,
      "a failed import must publish NOTHING")
    assert(c.tierVersions("prod", "mem").isEmpty)

    // an unknown version refuses export; a non-fresh target refuses
    // import
    intercept[IllegalArgumentException] {
      a.exportSnapshot("prod", "mem", Some(999L),
        Files.createTempDirectory("snap-none").toFile)
    }
    val nf = intercept[IllegalArgumentException] {
      b.importSnapshot("prod", "mem", oldDest)
    }
    assert(nf.getMessage.contains("fresh"), nf.getMessage)
  }

  test("pathy namespace/table names are rejected everywhere they " +
    "would become tier path segments: ingest doors, snapshot " +
    "export/import, and the tier itself (no traversal out of the " +
    "root); a pathy namespace QUERY reads as unknown, never as a " +
    "host directory listing") {
    val (e, _, tierDir) = freshEngine()
    // a real snapshot so the import rejections below exercise the
    // NAME validation, not a missing-manifest shortcut
    e.write(WriteRequest("prod", "t", "v", Map.empty, 1L))
    e.seal("prod", "t")
    val snap = Files.createTempDirectory("snap-valid").toFile
    e.exportSnapshot("prod", "t", None, snap)
    for (bad <- Seq("..", "a/b", "../../tmp/evil", ".", "a\\b")) {
      intercept[IllegalArgumentException] {
        e.write(WriteRequest(bad, "t", "v", Map.empty, 1L))
      }
      intercept[IllegalArgumentException] {
        e.write(WriteRequest("ns", bad, "v", Map.empty, 1L))
      }
      intercept[IllegalArgumentException] {
        e.writeBatch(Seq(WriteRequest(bad, "t", "v", Map.empty, 1L)))
      }
      intercept[IllegalArgumentException] {
        e.importSnapshot(bad, "t2", snap)
      }
      intercept[IllegalArgumentException] {
        e.importSnapshot("ns", bad, snap)
      }
      intercept[IllegalArgumentException] {
        e.exportSnapshot("prod", bad, None,
          Files.createTempDirectory("snap-evil").toFile)
      }
    }
    // a traversal "namespace" in a query is an unknown namespace
    // (404 path), not a directory listing of the host filesystem
    assert(e.query("../..", "SELECT * FROM t").isEmpty)
    // nothing escaped the tier root
    assert(Option(tierDir.getParentFile.listFiles()).get
      .forall(f => f.getName != "evil"))
  }

  test("an interrupted import (crash between file moves and the " +
    "manifest commit) never serves a partial table: reads refuse " +
    "loudly and a re-run auto-recovers") {
    val (a, _, _) = freshEngine()
    (0 until 4).foreach { i =>
      a.write(WriteRequest("prod", "evt", s"v$i", Map.empty,
        i.toLong * 1000000L))
    }
    a.seal("prod", "evt")
    val dest = Files.createTempDirectory("snap-interrupt").toFile
    a.exportSnapshot("prod", "evt", None, dest)

    // simulate the crash window on a fresh engine: the pending
    // marker exists and SOME files moved, but no manifest was
    // committed
    val (b, _, bTier) = freshEngine()
    val tableDir = new java.io.File(
      new java.io.File(bTier, "prod"), "evt")
    tableDir.mkdirs()
    Files.write(new java.io.File(tableDir, "_import-pending").toPath,
      Array.empty[Byte])
    val aDataFile = Files.walk(dest.toPath).iterator()
    var src: java.io.File = null
    while (aDataFile.hasNext && src == null) {
      val p = aDataFile.next().toFile
      if (p.isFile && p.getName.endsWith(".parquet")) src = p
    }
    val partial = new java.io.File(tableDir,
      dest.toPath.relativize(src.toPath).toString)
    partial.getParentFile.mkdirs()
    Files.copy(src.toPath, partial.toPath)
    // reads refuse (loud) instead of serving the partial subset
    val ex = intercept[IllegalStateException] {
      b.query("prod", "SELECT * FROM evt")
    }
    assert(ex.getMessage.contains("interrupted snapshot import"),
      ex.getMessage)
    // re-running the import auto-recovers and publishes the whole
    // snapshot
    b.importSnapshot("prod", "evt", dest)
    assert(canon(b, "prod", "SELECT * FROM evt") ==
      canon(a, "prod", "SELECT * FROM evt"))
  }

  test("write fence: every ingest door refuses a fenced namespace " +
    "with the dedicated exception, other namespaces flow, the fence " +
    "survives restart, and unfence restores writes") {
    val spark = SparkFixture.spark
    import org.apache.spark.sql.functions._
    val walDir = Files.createTempDirectory("fence-wal").toFile
    val tierDir = Files.createTempDirectory("fence-tier").toFile
    val e = engineAt(walDir, tierDir)
    e.write(WriteRequest("prod", "cpu", "pre", Map.empty, 1L))
    e.fence("prod")
    assert(e.isFenced("prod"))
    intercept[LynxEngine.NamespaceFencedException] {
      e.write(WriteRequest("prod", "cpu", "blocked", Map.empty, 2L))
    }
    intercept[LynxEngine.NamespaceFencedException] {
      e.writeBatch(Seq(
        WriteRequest("prod", "cpu", "blocked", Map.empty, 3L)))
    }
    intercept[LynxEngine.NamespaceFencedException] {
      e.writeStreamBatch("sink-1", 0L,
        Seq(WriteRequest("prod", "cpu", "blocked", Map.empty, 4L)))
    }
    intercept[LynxEngine.NamespaceFencedException] {
      e.ingestDataset("prod", "cpu", spark.range(1).select(
        timestamp_micros(col("id")).as("timestamp"),
        lit("x").as("value")))
    }
    // reads still serve; other namespaces write freely
    assert(canon(e, "prod", "SELECT * FROM cpu").size == 1)
    e.write(WriteRequest("other", "cpu", "flows", Map.empty, 5L))
    // durable: a restarted engine still refuses
    e.wal.close()
    val e2 = engineAt(walDir, tierDir)
    assert(e2.isFenced("prod"),
      "the fence must survive an engine restart (a crash mid-" +
        "migration must not reopen the old owner to writes)")
    intercept[LynxEngine.NamespaceFencedException] {
      e2.write(WriteRequest("prod", "cpu", "blocked", Map.empty, 6L))
    }
    e2.unfence("prod")
    e2.write(WriteRequest("prod", "cpu", "resumed", Map.empty, 7L))
    assert(canon(e2, "prod", "SELECT * FROM cpu").size == 2)
  }
}

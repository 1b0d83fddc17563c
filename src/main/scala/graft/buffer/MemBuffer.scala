package graft.buffer

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.collection.immutable.TreeMap
import scala.collection.mutable

import graft.core.{TagValue, WriteRequest}

/** Columnar (structure-of-arrays) measurements of one daily partition
  * (reference lynx.rs:21-26): parallel vectors for timestamps, tag
  * maps, and values.
  */
final class Measurements {
  val timestamps: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty
  val metadata: mutable.ArrayBuffer[Map[String, TagValue]] =
    mutable.ArrayBuffer.empty
  val values: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty

  def append(w: WriteRequest): Unit = {
    timestamps += w.timestamp
    metadata += w.metadata
    values += w.value
  }
  def size: Int = timestamps.size

  /** Immutable deep copy for snapshot reads. */
  def snapshot: MeasurementsView =
    MeasurementsView(timestamps.toVector, metadata.toVector, values.toVector)
}

/** Immutable snapshot of one partition. */
final case class MeasurementsView(
    timestamps: Vector[Long],
    metadata: Vector[Map[String, TagValue]],
    values: Vector[String])

object PartitionKey {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  /** UTC day key from a microsecond timestamp (reference buffer.rs:11,
    * 23-27; daily granularity is fixed, README.md:11).
    */
  def fromMicros(micros: Long): String = {
    val instant = Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    LocalDate.ofInstant(instant, ZoneOffset.UTC).format(fmt)
  }
}

/** In-memory buffer: namespace → table → day partition → Measurements
  * (reference buffer.rs:38-42). A single lock guards the hierarchy,
  * like the reference's `Arc<Mutex<…>>`; snapshot reads deep-copy
  * under the lock (reference buffer.rs:110-115) so queries never see
  * in-flight appends.
  */
final class MemBuffer {
  private val root: mutable.TreeMap[String,
    mutable.TreeMap[String, mutable.TreeMap[String, Measurements]]] =
    mutable.TreeMap.empty
  private val lock = new Object

  // Per-(ns, table) mutation counter: strictly increases on every
  // insert and drain, so any cache keyed on (revision, tier version)
  // can never serve stale buffered rows (see LynxEngine's result
  // cache). Read it under the same engine lock as the snapshot.
  private val revs = mutable.Map.empty[(String, String), Long]

  def revision(namespace: String, table: String): Long =
    lock.synchronized(revs.getOrElse((namespace, table), 0L))

  def insert(w: WriteRequest): Unit = lock.synchronized {
    val ns = root.getOrElseUpdate(w.namespace, mutable.TreeMap.empty)
    val table = ns.getOrElseUpdate(w.measurement, mutable.TreeMap.empty)
    val part = table.getOrElseUpdate(
      PartitionKey.fromMicros(w.timestamp), new Measurements)
    part.append(w)
    val key = (w.namespace, w.measurement)
    revs(key) = revs.getOrElse(key, 0L) + 1
  }

  /** Batched insert — the write-lane twin of Wal.writeAll: ONE lock
    * hold for the whole batch, the (ns, table, day) partition
    * resolved once per run of same-destination rows (a batch body is
    * almost always one table, one or two days), and the
    * micros→day-string formatting memoized per distinct epoch day
    * instead of paid per row (Instant/LocalDate/format was the
    * hottest row-wise cost in the driver ingest lane). Row order
    * within every partition is exactly ws order, and per-(ns, table)
    * revisions advance by the group's row count — the same strict
    * monotonicity insert() gives the MVCC result cache.
    */
  def insertAll(ws: Seq[WriteRequest]): Unit =
    if (ws.nonEmpty) lock.synchronized {
      val dayMemo = mutable.LongMap.empty[String]
      var lastNs: String = null
      var lastTable: String = null
      var lastDay: String = null
      var lastPart: Measurements = null
      ws.foreach { w =>
        val epochDay = Math.floorDiv(w.timestamp, 86400000000L)
        val day = dayMemo.getOrElseUpdate(epochDay,
          PartitionKey.fromMicros(w.timestamp))
        // day strings come from the memo, so `ne` is enough there
        if (lastPart == null || w.namespace != lastNs ||
            w.measurement != lastTable || (day ne lastDay)) {
          val ns = root.getOrElseUpdate(w.namespace,
            mutable.TreeMap.empty)
          val table = ns.getOrElseUpdate(w.measurement,
            mutable.TreeMap.empty)
          lastPart = table.getOrElseUpdate(day, new Measurements)
          lastNs = w.namespace
          lastTable = w.measurement
          lastDay = day
        }
        lastPart.append(w)
      }
      ws.groupBy(w => (w.namespace, w.measurement)).foreach {
        case (key, rows) =>
          revs(key) = revs.getOrElse(key, 0L) + rows.size
      }
    }

  /** Snapshot of all tables of a namespace (None if unknown —
    * surfaces as HTTP 404, reference lynx.rs:144-148).
    */
  def tables(namespace: String)
      : Option[TreeMap[String, TreeMap[String, MeasurementsView]]] =
    lock.synchronized {
      root.get(namespace).map { ns =>
        TreeMap.from(ns.map { case (t, parts) =>
          t -> TreeMap.from(parts.map { case (day, m) => day -> m.snapshot })
        })
      }
    }

  /** Drain a table's partitions (used by the parquet tier when sealing
    * buffered data to columnar storage; not part of the reference,
    * which never evicts — SURVEY.md §3.3).
    */
  def drainTable(namespace: String, table: String)
      : Option[TreeMap[String, MeasurementsView]] = lock.synchronized {
    root.get(namespace).flatMap { ns =>
      ns.remove(table).map { parts =>
        val key = (namespace, table)
        revs(key) = revs.getOrElse(key, 0L) + 1
        TreeMap.from(parts.map { case (day, m) => day -> m.snapshot })
      }
    }
  }

  /** True when no rows are buffered (empty namespaces/tables left by
    * drains count as empty) — the WAL-truncation precondition.
    */
  def isEmpty: Boolean = lock.synchronized {
    root.valuesIterator.flatMap(_.valuesIterator)
      .flatMap(_.valuesIterator).forall(_.size == 0)
  }

  /** Buffered row count per (namespace, table) — used by the engine
    * to rebuild its auto-seal counters after WAL replay.
    */
  def rowCounts: Map[(String, String), Int] = lock.synchronized {
    root.iterator.flatMap { case (ns, tables) =>
      tables.iterator.map { case (t, parts) =>
        (ns, t) -> parts.valuesIterator.map(_.size).sum
      }
    }.toMap
  }

  // Introspection (reference buffer.rs:120-144).
  def partitions(namespace: String, table: String): Int = lock.synchronized {
    root.get(namespace).flatMap(_.get(table)).map(_.size).getOrElse(0)
  }
  def namespaceCount: Int = lock.synchronized(root.size)
  def tableCount(namespace: String): Int =
    lock.synchronized(root.get(namespace).map(_.size).getOrElse(0))
  def containsNamespace(namespace: String): Boolean =
    lock.synchronized(root.contains(namespace))
}

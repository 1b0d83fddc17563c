package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.buffer.{MemBuffer, PartitionKey}
import graft.core.{TagNumber, TagString, WriteRequest}

/** Mirrors the reference's buffer tests (reference buffer.rs:156-212,
  * lynx.rs:182-311): namespace/table/partition counts after mixed
  * inserts, daily partition split, snapshot isolation.
  */
class BufferSpec extends AnyFunSuite {

  private def w(ns: String, table: String, value: String, ts: Long) =
    WriteRequest(ns, table, value, Map.empty, ts)

  test("partition key is the UTC day of the microsecond timestamp") {
    assert(PartitionKey.fromMicros(1L) == "1970-01-01")
    // 2023-11-14T00:00:00Z = 1699920000 s
    assert(PartitionKey.fromMicros(1699920000L * 1000000L) == "2023-11-14")
    // one microsecond before midnight is still the previous day
    assert(PartitionKey.fromMicros(1699920000L * 1000000L - 1L) ==
      "2023-11-13")
    assert(PartitionKey.fromMicros(-1L) == "1969-12-31")
  }

  test("writes on the same UTC day share a partition (lynx.rs:216-227)") {
    val b = new MemBuffer
    b.insert(w("events", "clicks", "event1", 1))
    b.insert(w("events", "clicks", "event2", 2))
    assert(b.partitions("events", "clicks") == 1)
    val parts = b.tables("events").get("clicks")
    assert(parts("1970-01-01").values == Vector("event1", "event2"))
    assert(parts("1970-01-01").timestamps == Vector(1L, 2L))
  }

  test("writes a day apart split partitions (lynx.rs:265-311)") {
    val b = new MemBuffer
    val dayUs = 86400L * 1000000L
    b.insert(w("events", "clicks", "event1", 1))
    b.insert(w("events", "clicks", "event2", dayUs + 1))
    assert(b.partitions("events", "clicks") == 2)
    val parts = b.tables("events").get("clicks")
    assert(parts("1970-01-01").values == Vector("event1"))
    assert(parts("1970-01-02").values == Vector("event2"))
  }

  test("namespace/table counts across namespaces (buffer.rs:156-212)") {
    val b = new MemBuffer
    b.insert(w("ns1", "t1", "a", 1))
    b.insert(w("ns1", "t2", "b", 1))
    b.insert(w("ns2", "t1", "c", 1))
    assert(b.namespaceCount == 2)
    assert(b.tableCount("ns1") == 2)
    assert(b.tableCount("ns2") == 1)
    assert(b.containsNamespace("ns1"))
    assert(!b.containsNamespace("nope"))
    assert(b.tables("nope").isEmpty)
  }

  test("snapshot is isolated from later appends (buffer.rs:110-115)") {
    val b = new MemBuffer
    b.insert(w("ns", "t", "a", 1))
    val snap = b.tables("ns").get
    b.insert(w("ns", "t", "b", 2))
    assert(snap("t")("1970-01-01").values == Vector("a"))
    assert(b.tables("ns").get("t")("1970-01-01").values ==
      Vector("a", "b"))
  }

  test("metadata rides along and drainTable empties the table") {
    val b = new MemBuffer
    b.insert(WriteRequest("ns", "t", "v",
      Map("host" -> TagString("h1"), "n" -> TagNumber(-1L)), 5))
    val drained = b.drainTable("ns", "t").get
    assert(drained("1970-01-01").metadata.head("host") == TagString("h1"))
    // u64 semantics: raw bits -1 renders as 18446744073709551615
    assert(drained("1970-01-01").metadata.head("n").render ==
      "18446744073709551615")
    assert(b.partitions("ns", "t") == 0)
  }
}

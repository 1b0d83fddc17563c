package graft.core

/** Tag value ADT mirroring the reference's `TagValue::String | Number`
  * (reference wal.rs:158-162). Numbers are u64 in the reference; we
  * store the raw 64 bits and render via unsigned formatting so the
  * query-time stringification (reference lynx.rs:128, Display at
  * wal.rs:164-171) matches for the full unsigned range.
  */
sealed trait TagValue {
  /** Query-time rendering — both variants surface as strings. */
  def render: String = this match {
    case TagString(s) => s
    case TagNumber(bits) => java.lang.Long.toUnsignedString(bits)
  }
}
final case class TagString(s: String) extends TagValue
final case class TagNumber(bits: Long) extends TagValue

/** Reserved namespace for WAL seal markers: when a table's RAM tail
  * is sealed to the parquet tier, the engine appends a marker record
  * (same codec as data records, so the segment format stays
  * reference-compatible) with this namespace, `measurement` = sealed
  * table, `value` = sealed namespace. Replay drops buffered rows for
  * that table up to the marker — they live in the tier now — fixing
  * restart double-counting. The NUL prefix cannot collide with JSON
  * ingest (the HTTP layer never produces it).
  */
object SealMarker {
  val Namespace = "\u0000lynx.seal"
  /** Tag keys carrying the staged-seal commit record: the staging dir
    * id and the newline-joined relative file list. Replay re-drives
    * the (idempotent) tier publish from them, making the seal atomic —
    * a marker without a publish is completed at replay; staged files
    * without a marker are discarded and their rows replay into the
    * buffer.
    */
  val StagingTag = "staging"
  val FilesTag = "files"

  def apply(namespace: String, table: String,
      stagingId: String = "", files: Seq[String] = Nil): WriteRequest =
    WriteRequest(Namespace, table, namespace,
      if (stagingId.isEmpty) Map.empty
      else Map(
        StagingTag -> TagString(stagingId),
        FilesTag -> TagString(files.mkString("\n"))),
      0L)
}

/** The unit of ingest (reference wal.rs:18-25): one measurement point.
  * `value` is always a string — numeric analytics CAST in SQL.
  * `timestamp` is microseconds since epoch (reference buffer.rs:24-25).
  */
final case class WriteRequest(
    namespace: String,
    measurement: String,
    value: String,
    metadata: Map[String, TagValue],
    timestamp: Long)

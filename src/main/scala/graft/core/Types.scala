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
  /** Marks a BULK-INGEST seal: the staged files came from an
    * executor-side dataset write, not from draining the RAM tail —
    * replay must re-drive the (idempotent) publish but MUST NOT drain
    * the table's buffer (rows buffered before the marker were never
    * part of this seal; draining them would lose acknowledged,
    * unsealed writes).
    */
  val BulkTag = "bulk"

  def apply(namespace: String, table: String,
      stagingId: String = "", files: Seq[String] = Nil,
      bulk: Boolean = false): WriteRequest =
    WriteRequest(Namespace, table, namespace,
      (if (stagingId.isEmpty) Map.empty[String, TagValue]
       else Map[String, TagValue](
         StagingTag -> TagString(stagingId),
         FilesTag -> TagString(files.mkString("\n")))) ++
        (if (bulk) Map[String, TagValue](BulkTag -> TagString("1"))
         else Map.empty[String, TagValue]),
      0L)

  /** Whether a seal marker is a bulk-ingest marker. */
  def isBulk(w: WriteRequest): Boolean =
    w.metadata.contains(BulkTag)
}

/** Reserved namespace for streaming micro-batch brackets: the engine
  * write plane makes a stream batch exactly-once by writing
  * BEGIN(sink, batchId) + the batch's rows + COMMIT(sink, batchId) in
  * ONE WAL group commit. Replay stages rows between a begin and its
  * commit and inserts them only when the commit is present — a torn
  * tail that cut the bracket short discards the partial rows, and the
  * streaming source re-delivers the whole batch (its id is above the
  * replayed high-water mark). The high-water mark itself is DERIVED
  * from the WAL: replay surfaces the highest committed batchId per
  * sink, and checkpoint() re-persists it as an HWM record after WAL
  * truncation so the mark survives segment GC. Same codec as data
  * records; the NUL prefix cannot collide with JSON ingest.
  */
object StreamBatch {
  val Namespace = "\u0000lynx.batch"
  /** record kinds, carried in `value` */
  val Begin = "begin"
  val Commit = "commit"
  val Hwm = "hwm"
  /** tag key carrying the batch id (TagNumber) */
  val IdTag = "id"
  /** Tag key carrying the STREAMING QUERY IDENTITY (TagString) — the
    * stable id Spark persists in the checkpoint's metadata file. A
    * lane remembers the query id of its committed brackets; a batch
    * arriving at-or-below the high-water mark FROM A DIFFERENT query
    * id is a checkpoint RESET (the dir was wiped and recreated, so
    * batch ids restarted at 0 while the WAL still holds the old
    * mark) and must fail loudly instead of being silently skipped as
    * a replay. Optional: absent on brackets from callers without a
    * checkpoint identity (detection then degrades to the documented
    * fresh-checkpoint discipline).
    */
  val QidTag = "qid"

  private def mk(sinkId: String, kind: String, batchId: Long,
      qid: String): WriteRequest =
    WriteRequest(Namespace, sinkId, kind,
      if (qid.isEmpty) Map(IdTag -> TagNumber(batchId))
      else Map(IdTag -> TagNumber(batchId), QidTag -> TagString(qid)),
      0L)

  def begin(sinkId: String, batchId: Long,
      qid: String = ""): WriteRequest =
    mk(sinkId, Begin, batchId, qid)
  def commit(sinkId: String, batchId: Long,
      qid: String = ""): WriteRequest =
    mk(sinkId, Commit, batchId, qid)
  /** Standalone checkpoint of an already-committed high-water mark —
    * written after WAL truncation so the mark outlives the segments
    * that carried the original brackets. Carries the lane's query id
    * so reset detection survives segment GC too.
    */
  def hwm(sinkId: String, batchId: Long,
      qid: String = ""): WriteRequest =
    mk(sinkId, Hwm, batchId, qid)

  /** The batch id of a marker record; -1 when absent/malformed. */
  def idOf(w: WriteRequest): Long =
    w.metadata.get(IdTag) match {
      case Some(TagNumber(bits)) => bits
      case _ => -1L
    }

  /** The streaming-query id of a marker record; "" when absent. */
  def qidOf(w: WriteRequest): String =
    w.metadata.get(QidTag) match {
      case Some(TagString(s)) => s
      case _ => ""
    }
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

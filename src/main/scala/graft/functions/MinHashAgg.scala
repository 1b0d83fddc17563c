package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_minhash(sh)` — the K=16 permutation-minima MinHash signature
  * as a NATIVE Catalyst aggregate over pre-hashed shingles (the
  * custom-aggregate slot SURVEY.md §7.3 reserves for "MinHash-sketch
  * TypedImperativeAggregate for scalable dedup"): constant 16-long
  * state per group, O(K) update per shingle, merge = elementwise min.
  *
  * Bit-contract (shared verbatim with the SQL formulation in
  * graft.ops.Dedup — MinHashSpec pins the two together, and
  * q_dedup_minhash_native is oracle-checked against the SAME DuckDB
  * SQL as q_dedup_minhash_lsh): the input is the 60-bit md5-prefix
  * shingle hash, folded to 32 bits by mod 2^32, and permutation i's
  * min is over ((2i+1)·x + 7919i + 13) mod (2^31−1).
  *
  * Positioning vs the composed 16-column min() aggregate (measured,
  * SCALE_SMOKE.md round 9): a TypedImperativeAggregate plans as
  * ObjectHashAggregate, which by default falls back to SORT-based
  * aggregation past 128 distinct groups — a full sort of the shingle
  * stream on any real corpus, and the bulk of the pre-r9 "~1.6×
  * slower" gap. With the fallback threshold raised (set at the call
  * site, q_dedup_minhash_native) the native form measures AT PARITY
  * with the codegen'd composed form at the 10× smoke (0.9–1.15×
  * across runs, inside noise), so both are production paths. The
  * native form's unique value: a single `graft_minhash(sh)` call
  * usable from the engine's SQL surface (no 16-expression
  * boilerplate), one ArrayType signature column for sketch
  * storage/streaming state, and K scaling without widening the
  * aggregate row. Semantics are identical by construction and pinned
  * by MinHashSpec + the shared DuckDB oracle.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import MinHashAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // empty group → null signature
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_minhash requires a BIGINT shingle hash, got " +
          child.dataType.sql)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(K)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long] % 4294967296L
      var i = 0
      while (i < K) {
        val h = (x * (2L * i + 1) + 7919L * i + 13) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(0) == Long.MaxValue) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(K * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(K)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
}

object MinHashAgg {
  /** Signature width; must match graft.ops.Dedup's K (MinHashSpec
    * asserts bit-equality of the two pipelines, so a drift fails CI).
    */
  val K = 16
  private val P = 2147483647L // 2^31 − 1
}

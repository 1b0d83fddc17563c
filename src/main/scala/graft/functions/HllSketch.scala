package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_hll(str)` — HyperLogLog distinct-count estimate as a NATIVE
  * Catalyst aggregate (the custom-AGGREGATE slot of the extension
  * taxonomy, next to the scalar expressions graft_dot/graft_nfc, the
  * whole-operator plans and the optimizer rule): a 64-byte register
  * buffer, O(1) update per row, merge = elementwise max — the exact
  * distributed-sketch shape Spark's own approx_count_distinct uses,
  * but bit-deterministic CROSS-ENGINE and bit-equal to this repo's
  * SQL-composed HLL (q_vocab_hll) and streaming register builder
  * ([[graft.streaming.StreamingIngest.hllRegisters]]).
  *
  * Hash contract (shared verbatim with the SQL formulations): the
  * word's md5 hex chars [1,15] form a 60-bit value — computed here as
  * the first 8 digest bytes big-endian, shifted right 4 — whose top 6
  * bits select the register and whose 54-bit remainder contributes
  * rank = 55 − bitlength(rem) (55 when the remainder is zero). The
  * estimate is the same log-free scaled-integer fold: the register
  * sum Σ2^(55−m) is an exact BIGINT (empty register m=0 contributes
  * 2^55), and α·m²·2^55 / S is the one double division. No distinct
  * is needed upstream — register max is idempotent — which is the
  * whole point of aggregating the sketch instead of the values.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_hll requires a string argument, got ${child.dataType.sql}")
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](64)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val md = HllSketch.digest.get()
      md.reset()
      val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
      // first 15 hex chars of the digest = first 8 bytes big-endian,
      // dropped low nibble — the conv(substring(md5(w),1,15),16,10)
      // idiom without string materialization
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4 // 60 bits
      val bucket = (h >>> 54).toInt // top 6 bits
      val rem = h & ((1L << 54) - 1)
      val rank =
        if (rem == 0L) 55
        else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 64) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var i = 0
    while (i < 64) { s += 1L << (55 - buf(i)); i += 1 }
    0.709 * 4096.0 * 36028797018963968.0 / s.toDouble
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HllSketch = copy(child = c.head)
}

object HllSketch {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeSet, BindReferences, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode,
  LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.types.LongType

/** A whole-operator INTERVAL join (point-in-range), the second
  * operator built the brief's option-(c) way after [[AsofJoin]]: a
  * custom `LogicalPlan`, a `SparkStrategy`, and a `SparkPlan` whose
  * distribution/ordering contracts let EnsureRequirements plan the
  * exchanges — the operator itself is one streaming merge sweep per
  * co-partition with an active-interval buffer.
  *
  * Semantics (INNER): emit (l, r) for every left point row and right
  * interval row with equal keys and `start <= t < end` (half-open,
  * the window convention). Null keys/times never match. Time columns
  * are LongType epoch micros.
  *
  * Why a native operator: Spark plans a range predicate join either
  * as a key-equi-join with a residual filter (fine — but it buffers
  * every equal-key right row per partition pair in the sort-merge
  * buffer) or, keyless, as a nested loop. The sweep here holds only
  * the ACTIVE intervals: rights are admitted when their start passes
  * the advancing left time and retired the moment their end does, so
  * per-key state is the max concurrent-overlap degree, not the key's
  * row count. Compare q_ts_interval_join (the composed scale path:
  * bucketize + explode ×2 + equi-join + residual) — the native
  * operator needs no bucket granularity choice and no ×2 row
  * explosion; both scale, and q_ts_interval_native proves they agree
  * bit-for-bit.
  */
case class IntervalJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightStart: Attribute, rightEnd: Attribute)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  // all child columns reach the output — block column pruning below
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, lt, rs, re) =>
      Seq(IntervalJoinExec(planLater(l), planLater(r),
        lk, rk, lt, rs, re))
    case _ => Nil
  }
}

case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightStart: Attribute, rightEnd: Attribute)
  extends BinaryExecNode {

  require(leftTime.dataType == LongType &&
    rightStart.dataType == LongType && rightEnd.dataType == LongType,
    "interval-join time columns must be LongType epoch micros")
  require(leftKey.dataType == rightKey.dataType,
    "interval-join key columns must share a data type")

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey), requireAllClusterKeys = true) ::
      ClusteredDistribution(Seq(rightKey),
        requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending),
      SortOrder(rightStart, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    type Expr = org.apache.spark.sql.catalyst.expressions.Expression
    val lkB = BindReferences.bindReference(leftKey: Expr, left.output)
    val ltB = BindReferences.bindReference(leftTime: Expr, left.output)
    val rkB = BindReferences.bindReference(rightKey: Expr, right.output)
    val rsB = BindReferences.bindReference(rightStart: Expr, right.output)
    val reB = BindReferences.bindReference(rightEnd: Expr, right.output)
    val outAttrs = output
    val inAttrs = left.output ++ right.output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, inAttrs)
      val rBuf = rIt.buffered
      // the sweep's state: right rows of the CURRENT key admitted
      // (start <= t) and not yet retired (end > t). Rows are copied
      // out of the sorter's reuse window and keys re-derived from the
      // copy (see AsofJoinExec's candKey note).
      val active = new scala.collection.mutable.ArrayBuffer[
        (InternalRow, Long)] // (copied right row, end)
      var activeKey: Any = null
      lIt.flatMap { lrow =>
        val lkv = lkB.eval(lrow)
        val ltvAny = ltB.eval(lrow)
        if (lkv == null || ltvAny == null) Iterator.empty
        else {
          val t = ltvAny.asInstanceOf[Long]
          // a new key invalidates the previous key's active set
          if (activeKey == null || keyOrd.compare(activeKey, lkv) != 0)
            active.clear()
          // admit right rows up to (key, start <= t); discard keys
          // before ours
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val rkv = rkB.eval(peek)
            val rsv = rsB.eval(peek)
            val rev = reB.eval(peek)
            if (rkv == null || rsv == null || rev == null) rBuf.next()
            else {
              val c = keyOrd.compare(rkv, lkv)
              if (c < 0) rBuf.next()
              else if (c == 0 && rsv.asInstanceOf[Long] <= t) {
                val copy = rBuf.next().copy()
                val end = rev.asInstanceOf[Long]
                if (end > t) active += ((copy, end))
                // else: already expired relative to this (and every
                // later) left time — never admit
              } else advancing = false
            }
          }
          // deep-copy buffer-backed key types: lkv points into the
          // left sorter's reuse window, and activeKey must survive
          // into the next row's comparison
          activeKey = lkv match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
            case a: Array[Byte] => a.clone()
            case other => other
          }
          // retire intervals whose end has passed (t is nondecreasing
          // within a key, so they can never match again)
          var i = 0
          while (i < active.length) {
            if (active(i)._2 <= t) { active.remove(i) } else i += 1
          }
          // every surviving interval matches: start <= t (admission)
          // and end > t (retirement). LAZY map, never materialized:
          // resultProj reuses one UnsafeRow buffer, so each emitted
          // row must be consumed (or copied downstream) before the
          // next projection — flatMap drains this iterator fully
          // before the next left row mutates `active`
          active.iterator.map { case (r, _) =>
            resultProj(joined(lrow, r))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: register the strategy (idempotent) and build the
  * joined DataFrame; columns by name, right side renamed by the
  * caller when names overlap.
  */
object GraftInterval {
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
  }

  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightStart: String, rightEnd: String)
      : DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def att(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    val node = IntervalJoin(lp, rp, att(lp, leftKey), att(rp, rightKey),
      att(lp, leftTime), att(rp, rightStart), att(rp, rightEnd))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}
